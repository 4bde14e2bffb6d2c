"""Exact-substring span dedup: DuckDB full-pipeline oracle, maximal-run
exactness, within-doc repeats, boundary cases."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from gensor_spark.operators.spandedup import trim_duplicate_spans

K = 4

_ORACLE = f"""
WITH base AS (SELECT doc_id, tokens FROM docs),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(array_to_string(tokens[i:i + {K - 1}], '_')),
                         1, 15))::BIGINT AS h
  FROM base, unnest(range(1, greatest(len(tokens) - {K - 1}, 0) + 1)) AS t(i)
),
dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
starts AS (SELECT doc_id, list_sort(list(pos)) AS st
           FROM grams JOIN dup USING (h) GROUP BY doc_id),
joined AS (SELECT b.doc_id, b.tokens, coalesce(s.st, []) AS st
           FROM base b LEFT JOIN starts s USING (doc_id)),
trimmed AS (
  SELECT doc_id,
         [tokens[i + 1] FOR i IN range(len(tokens))
          IF len(list_filter(st, s -> s <= i AND i < s + {K})) = 0] AS toks,
         len(tokens) AS n0
  FROM joined)
SELECT doc_id, toks AS tokens, len(toks) AS n_tok,
       n0 - len(toks) AS n_removed
FROM trimmed ORDER BY doc_id
"""


@pytest.fixture(scope="module")
def token_docs(spark):
    boiler = [9, 8, 7, 6, 5]          # 5-token span planted in d0 and d1
    rows = [
        ("d0", [1, 2, 3] + boiler + [10, 11]),
        ("d1", [20, 21] + boiler + [22, 23, 24]),
        ("d2", [30, 31, 32, 33, 34, 35, 36]),          # unique
        ("d3", [40, 41, 42, 43] + [40, 41, 42, 43]),   # within-doc repeat
        ("d4", [50, 51]),                              # shorter than k
        ("d5", []),                                    # empty
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_trim_matches_duckdb(spark, token_docs):
    got = (trim_duplicate_spans(token_docs, k=K)
           .orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.register("docs", token_docs.toPandas())
    exp = con.execute(_ORACLE).df()
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert [list(x) for x in got["tokens"]] == [list(x) for x in exp["tokens"]]
    assert list(got["n_removed"]) == list(exp["n_removed"])


def test_planted_span_removed_from_all_copies(spark, token_docs):
    rows = {r.doc_id: r for r in
            trim_duplicate_spans(token_docs, k=K).collect()}
    # the 5-token boilerplate (covered by 2 duplicated 4-grams) vanishes
    # from BOTH docs; surrounding unique context survives
    assert rows["d0"].tokens == [1, 2, 3, 10, 11]
    assert rows["d1"].tokens == [20, 21, 22, 23, 24]
    assert rows["d0"].n_removed == 5 and rows["d1"].n_removed == 5
    # unique doc untouched
    assert rows["d2"].n_removed == 0 and len(rows["d2"].tokens) == 7
    # within-doc repeat: both copies of [40..43] are duplicated 4-grams
    assert rows["d3"].tokens == [] and rows["d3"].n_removed == 8
    # shorter-than-k and empty docs pass through
    assert rows["d4"].tokens == [50, 51] and rows["d4"].n_removed == 0
    assert rows["d5"].tokens == [] and rows["d5"].n_removed == 0


def test_maximal_run_semantics(spark):
    """A duplicated substring of length L >= k removes exactly its L tokens
    (the union of its L-k+1 duplicated k-grams), nothing more."""
    span = list(range(100, 107))  # L = 7, k = 4 -> 4 duplicated grams
    rows = [("a", [1, 2] + span + [3, 4]), ("b", [5] + span + [6])]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {r.doc_id: r for r in trim_duplicate_spans(df, k=K).collect()}
    assert out["a"].tokens == [1, 2, 3, 4]
    assert out["b"].tokens == [5, 6]


def test_plan_no_python_no_cartesian(spark, token_docs):
    plan = (trim_duplicate_spans(token_docs, k=K)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError):
        trim_duplicate_spans(token_docs, k=1)
