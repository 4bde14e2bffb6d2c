"""Rule-based corpus quality filtering: the Gopher and C4 presets.

The two published rule sets every web-scale training-data pipeline starts
from, re-expressed as row-local Catalyst expressions (zero shuffles, whole-
stage codegen end to end — the scan IS the filter):

- **Gopher rules** (Rae et al. 2021, "Scaling Language Models", §A1.1):
  word-count bounds, mean-word-length bounds, symbol-to-word ratio,
  bullet-/ellipsis-line fractions, alphabetic-word fraction, and the
  2-of-8 stop-word requirement.
- **C4 line filter** (Raffel et al. 2020, §2.2, the "lorem ipsum" rules):
  keep only lines with ≥ ``min_line_words`` words ending in terminal
  punctuation; drop docs with fewer than ``min_kept_lines`` surviving
  lines, containing ``{`` (code), or the phrase "lorem ipsum".

Both emit one boolean per rule plus a ``keep`` conjunction and a
``reason`` column naming the FIRST failing rule (fixed rule order, so
reasons are deterministic) — the pipeline-debugging surface: a corpus
owner asks "why did my docs disappear", not just "how many".

gensor analogue: none (no text surface); this extends the engine's
LLM-pipeline family (operators/quality.py, functions/text.py) with the
keep/drop decision layer those signal computations feed.

At 100 TB: embarrassingly parallel — no aggregation, no join, no window;
predicate pushdown still applies upstream and the filter composes with the
ingest pipeline's PII/dedup stages as another ``withColumns`` stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's exact stop set (Rae et al. 2021 §A1.1): a doc must contain at
# least `stop_min` distinct members to pass.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# rule order fixes the `reason` column; (name, threshold description)
GOPHER_RULE_ORDER = (
    "words_in_range",
    "mean_word_len_in_range",
    "symbol_ratio_ok",
    "bullet_lines_ok",
    "ellipsis_lines_ok",
    "alpha_word_frac_ok",
    "has_stopwords",
)


def _nz(n: Column) -> Column:
    return F.greatest(n, F.lit(1)).cast("double")


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    stop_min: int = 2,
) -> DataFrame:
    """Append the seven Gopher rule booleans + ``keep`` + ``reason``.

    Empty docs fail ``words_in_range`` (never crash); every ratio uses a
    ``greatest(·,1)`` denominator per the repo's mask-don't-crash
    convention. Returns the input columns plus the flags.
    """
    text = F.col(text_col)
    # Gopher's rules are over whitespace WORDS (punctuation attached), not
    # the engine's alphanumeric tokens() — split faithfully to the paper
    toks = F.filter(F.split(text, r"\s+"), lambda x: x != "")
    n_words = F.size(toks)
    word_chars = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    mean_wl = word_chars.cast("double") / _nz(n_words)
    # symbols: '#' occurrences plus ellipses (three dots or U+2026)
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = F.size(F.split(text, r"\.\.\.|…")) - 1
    sym_ratio = (n_hash + n_ell).cast("double") / _nz(n_words)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[•\-\*]")))
    n_ell_end = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    # stop-word membership on edge-punctuation-stripped lowercase words
    # ("The," counts as "the"); distinct members, ≥ stop_min to pass
    norm = F.transform(
        toks,
        lambda t: F.regexp_replace(
            F.lower(t), r"^[^a-z0-9]+|[^a-z0-9]+$", ""
        ),
    )
    n_stop = F.size(
        F.array_intersect(norm, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]))
    )

    flags = {
        "words_in_range": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_in_range": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "symbol_ratio_ok": sym_ratio <= max_symbol_ratio,
        "bullet_lines_ok": n_bullet.cast("double") / _nz(n_lines)
        <= max_bullet_line_frac,
        "ellipsis_lines_ok": n_ell_end.cast("double") / _nz(n_lines)
        <= max_ellipsis_line_frac,
        "alpha_word_frac_ok": n_alpha.cast("double") / _nz(n_words)
        >= min_alpha_word_frac,
        "has_stopwords": n_stop >= stop_min,
    }
    out = docs.withColumns({k: v for k, v in flags.items()})
    keep = F.lit(True)
    for name in GOPHER_RULE_ORDER:
        keep = keep & F.col(name)
    reason = F.lit(None).cast("string")
    for name in reversed(GOPHER_RULE_ORDER):
        reason = F.when(~F.col(name), F.lit(name)).otherwise(reason)
    return out.withColumn("keep", keep).withColumn("reason", reason)


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4's line-level clean + doc-level keep decision.

    Adds ``clean_text`` (only lines with ≥ ``min_line_words`` words ending
    in terminal punctuation, newline-joined), ``n_kept_lines``, and
    ``c4_keep`` (enough surviving lines, no ``{``, no "lorem ipsum",
    case-insensitive). The text rewrite is row-local; downstream stages see
    the cleaned column without any extra pass over the corpus.
    """
    text = F.col(text_col)
    line_ok = lambda l: (  # noqa: E731
        F.size(F.split(F.trim(l), r"\s+")) >= min_line_words
    ) & F.rtrim(l).rlike(r'[.!?"”]$')
    kept = F.filter(F.split(text, "\n"), line_ok)
    return (
        docs.withColumn("clean_text", F.array_join(kept, "\n"))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn(
            "c4_keep",
            (F.size(kept) >= min_kept_lines)
            & ~text.contains("{")
            & ~F.lower(text).contains("lorem ipsum"),
        )
    )
