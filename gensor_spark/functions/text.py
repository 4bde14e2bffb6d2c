"""Text-analysis column functions for training-data pipelines.

Everything here is a pure Catalyst expression (``pyspark.sql.functions`` +
higher-order functions) — no Python UDFs, so the hot path stays inside
whole-stage codegen and scales linearly with no JVM↔Python crossings.

Cross-engine determinism: every hash is derived from ``md5`` (available and
bit-identical in Spark, DuckDB, and any ANSI engine), so the DuckDB oracle
SQL in ``gensor_spark.queries_text`` reproduces each value exactly. In a
production deployment the hash is pluggable — ``xxhash64`` is the faster
JVM-intrinsic choice — but md5 is the verifiable common ground.

The reference (gensor) has no text surface; these operators are the
training-data-pipeline extension mandated by the build brief, expressed in
the same engine style as the time-series operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tokenizer: lowercase split on non-alphanumeric runs (RE2/Java compatible)
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: BPE-ish token pattern: letter runs, digit runs, single punctuation marks
BPEISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

#: tiny per-language stopword lists for the n-gram/stopword language heuristic.
#: Order matters: ties break toward the earlier language.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "por", "con"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "dans", "pour", "que"),
}

#: minimum stopword hits before we claim a language (else "unknown")
LANGID_MIN_HITS = 2

#: CJK ratio above which a doc is classified "zh"
CJK_RATIO = 0.2


def tokens(text: Column) -> Column:
    """Lowercased alphanumeric tokens as ``array<string>``."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != "")


def md5int(s: Column) -> Column:
    """Deterministic 32-bit hash of a string: first 8 hex chars of md5.

    Bit-identical in Spark (``conv(substr(md5(x),1,8),16,10)``) and DuckDB
    (``('0x'||substr(md5(x),1,8))::BIGINT``) — the cross-engine contract all
    dedup/LSH operators build on.
    """
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def seeded_hash(seed: Column | int, s: Column) -> Column:
    """``md5int(seed || ':' || s)`` — one member of a cheap hash family."""
    seed_col = F.lit(seed) if isinstance(seed, int) else seed
    return md5int(F.concat(seed_col.cast("string"), F.lit(":"), s))


def shingles(toks: Column, k: int = 3) -> Column:
    """``k``-token shingles joined by spaces; empty array when < k tokens.

    Guard: Spark's ``sequence(1, n)`` DESCENDS for n < 1 (it would emit
    ``[1, 0]``), so short docs must short-circuit to an empty array.
    """
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(n >= k, make).otherwise(F.array().cast("array<string>"))


def bpeish_token_count(text: Column) -> Column:
    """Count of BPE-ish tokens (letter runs / digit runs / punct marks)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPEISH_RE), F.lit(0)))


def stopword_count(toks: Column, lang: str) -> Column:
    """Stopword occurrences (with multiplicity) for one language."""
    stop = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def cjk_count(text: Column) -> Column:
    """Number of CJK-unified-ideograph characters (U+4E00..U+9FFF)."""
    return F.length(F.regexp_replace(text, "[^一-鿿]", ""))


def lang_id(text: Column) -> Column:
    """Heuristic language ID: CJK ratio, else argmax stopword score.

    Deterministic tie-break: languages compared in STOPWORDS order, strict
    ``>`` — an earlier language keeps the crown on equal score. Returns
    'unknown' when the best score is below LANGID_MIN_HITS.
    """
    toks = tokens(text)
    is_zh = cjk_count(text) >= CJK_RATIO * F.greatest(F.length(text), F.lit(1))
    langs = list(STOPWORDS)
    # argmax as ONE aggregate fold over an array of (score, lang) structs:
    # each score expression appears exactly once. The naive nested-CASE fold
    # re-embeds every prior score subtree at each nesting level — measured
    # 3.2s vs 0.2s for the same scores at sf0.1 (expression-duplication
    # blowup, not compute). Strict > keeps the earlier language on ties,
    # identical to the left-to-right CASE chain and the SQL oracle.
    entries = [
        F.struct(stopword_count(toks, lg).alias("s"), F.lit(lg).alias("lang"))
        for lg in langs
    ]
    best = F.aggregate(
        F.array(*entries[1:]),
        entries[0],
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc),
        lambda acc: F.when(acc["s"] >= LANGID_MIN_HITS, acc["lang"]).otherwise(
            F.lit("unknown")
        ),
    )
    return F.when(is_zh, F.lit("zh")).otherwise(best)


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: lengths, punctuation/stopword/digit ratios.

    All ratios are computed against ``greatest(x, 1)`` denominators so empty
    docs yield 0.0 instead of null — the mask-don't-crash convention.
    """
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_alnum = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[^\.,;:!?'\"()\[\]{}-]", ""))
    n_stop = stopword_count(toks, "en")
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    safe = lambda num, den: num.cast("double") / F.greatest(den, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": safe(n_punct, n_chars),
        "alnum_ratio": safe(n_alnum, n_chars),
        "digit_ratio": safe(n_digit, n_chars),
        "stopword_ratio": safe(n_stop, n_tokens),
        "mean_token_len": safe(tok_chars, n_tokens),
    }


def token_entropy(toks: Column) -> Column:
    """Shannon entropy (nats) of the doc's unigram token distribution —
    a standard quality-classifier feature (low entropy = repetitive /
    keyword-stuffed text). Row-local: O(n·distinct) per doc via a fold
    over the distinct-token array; empty docs yield 0.0. Bounded work for
    quality-sized documents; for million-token sequences use the exploded
    aggregation in operators/quality.py instead.
    """
    n = F.size(toks).cast("double")
    return F.when(F.size(toks) > 0, -F.aggregate(
        F.array_distinct(toks), F.lit(0.0),
        lambda acc, u: acc + (
            F.size(F.filter(toks, lambda x: x == u)).cast("double") / n
        ) * F.log(
            F.size(F.filter(toks, lambda x: x == u)).cast("double") / n),
    )).otherwise(F.lit(0.0))


def doc_fingerprint(text: Column, k: int = 5) -> Column:
    """Rolling-hash document fingerprint: min 32-bit hash over k-shingles.

    A 1-permutation MinHash — stable under small edits anywhere except at
    the minimizing shingle, the classic cheap near-dup prefilter. Docs
    shorter than k tokens fall back to the hash of the whole token stream.
    """
    toks = tokens(text)
    sh = shingles(toks, k)
    whole = md5int(F.array_join(toks, " "))
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: md5int(s)))
    ).otherwise(whole)
