"""Cross-source n-gram overlap audit: DuckDB oracle + sketch-exact parity.

Exact mode is verified pair-for-pair against a DuckDB recomputation of the
distinct-shingle sets; sketch mode is pinned to equal the exact mode while
every per-source gram set is in the theta sketch's exact regime (< 2^lgk
distinct items). Semantic pins: a subset source has containment 1.0, a
disjoint source has zero intersection but still emits its pair rows.
"""

from __future__ import annotations

import duckdb
import pytest

from gensor_spark.operators.overlap import source_overlap

N = 3

_SHINGLES = (
    "list_transform(range(1, greatest(len(toks) - {k} + 1, 0) + 1), "
    "i -> array_to_string(toks[i:i + {k} - 1], ' '))"
).format(k=N)
_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
         " x -> x != '')")

_ORACLE_SQL = f"""
WITH t AS (SELECT source, {_TOKS} AS toks FROM docs),
g AS (SELECT DISTINCT source, gram
      FROM (SELECT source, unnest({_SHINGLES.replace('toks', 'toks')}) AS gram
            FROM t)),
tot AS (SELECT source, count(*)::DOUBLE AS n FROM g GROUP BY 1),
inter AS (SELECT a.source AS src_a, b.source AS src_b, count(*)::DOUBLE AS ni
          FROM g a JOIN g b USING (gram)
          WHERE a.source < b.source GROUP BY 1, 2)
SELECT ta.source AS src_a, tb.source AS src_b, ta.n AS n_a, tb.n AS n_b,
       coalesce(ni, 0) AS n_inter,
       ta.n + tb.n - coalesce(ni, 0) AS n_union
FROM tot ta JOIN tot tb ON ta.source < tb.source
LEFT JOIN inter ON inter.src_a = ta.source AND inter.src_b = tb.source
ORDER BY 1, 2
"""


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog while rivers "
            "carry sediment downstream past the old mill every spring")
    rows = (
        # wiki: the base text spread over docs
        [(f"w{i}", base + f" extra wiki tail {i} flows", "wiki")
         for i in range(6)]
        # crawl: half base (overlapping), half its own
        + [(f"c{i}", base if i % 2 else
            f"crawl only content block number {i} with unique web phrasing "
            f"and boilerplate navigation footer {i}", "crawl")
           for i in range(6)]
        # books: fully disjoint vocabulary
        + [(f"b{i}", f"chapter {i} verse alpha beta gamma delta epsilon "
            f"zeta eta theta iota kappa", "books") for i in range(4)]
    )
    return spark.createDataFrame(rows, "doc_id string, text string, source string")


def _rows(df):
    return [(r["src_a"], r["src_b"], r["n_a"], r["n_b"], r["n_inter"],
             r["n_union"]) for r in df.orderBy("src_a", "src_b").collect()]


def test_exact_matches_duckdb_oracle(spark, docs):
    got = _rows(source_overlap(docs, n=N, approx=False))
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = [tuple(r) for r in con.sql(_ORACLE_SQL).fetchall()]
    assert got == want


def test_sketch_equals_exact_in_sparse_regime(spark, docs):
    exact = _rows(source_overlap(docs, n=N, approx=False))
    approx = _rows(source_overlap(docs, n=N, approx=True, lgk=14))
    assert approx == exact


def test_containment_semantics(spark):
    # sub ⊂ sup → containment_sub = 1.0; disjoint pair still emits a row
    rows = (
        [("a1", "one two three four five six seven", "sup")]
        + [("a2", "one two three four five", "sub")]
        + [("a3", "red green blue cyan magenta yellow", "other")]
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string, source string")
    out = {(r["src_a"], r["src_b"]): r
           for r in source_overlap(docs, n=3, approx=False).collect()}
    sub_sup = out[("sub", "sup")]
    # sub's grams all occur in sup
    cont_sub = (sub_sup["containment_a"] if sub_sup["src_a"] == "sub"
                else sub_sup["containment_b"])
    assert cont_sub == 1.0
    assert out[("other", "sup")]["n_inter"] == 0.0
    assert out[("other", "sup")]["jaccard"] == 0.0
    assert len(out) == 3


def test_jaccard_bounds_and_symmetric_totals(spark, docs):
    for r in source_overlap(docs, n=N, approx=False).collect():
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["n_union"] >= max(r["n_a"], r["n_b"])
        assert r["n_inter"] <= min(r["n_a"], r["n_b"])
