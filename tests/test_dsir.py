"""DSIR importance resampling: DuckDB full-pipeline oracle + semantics.

The oracle recomputes hashed unigram+bigram features (same md5int bucket
contract as the dedup family), both smoothed bag-of-buckets models, per-doc
log-weights, deterministic Gumbel keys and the top-k selection in DuckDB
SQL, then compares doc-for-doc at 1e-9. A planted-distribution test checks
the selection actually prefers target-like documents.
"""

from __future__ import annotations

import duckdb
import pytest

from gensor_spark.operators.dsir import dsir_logweights, dsir_select

NB, SM, SEED = 512, 1.0, 7

_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
         " x -> x != '')")
_BIGRAMS = ("list_transform(range(1, greatest(len(toks) - 1, 0) + 1),"
            " i -> array_to_string(toks[i:i + 1], ' '))")


def _md5int(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


_WEIGHTS_SQL = f"""
WITH rt AS (SELECT doc_id, {_TOKS} AS toks FROM raw),
tt AS (SELECT doc_id, {_TOKS} AS toks FROM target),
rf AS (SELECT doc_id, {_md5int('gram')} % {NB} AS bucket
       FROM (SELECT doc_id, unnest(list_concat(toks, {_BIGRAMS})) AS gram
             FROM rt)),
tf AS (SELECT doc_id, {_md5int('gram')} % {NB} AS bucket
       FROM (SELECT doc_id, unnest(list_concat(toks, {_BIGRAMS})) AS gram
             FROM tt)),
cp AS (SELECT bucket, count(*) AS c_p FROM tf GROUP BY 1),
cq AS (SELECT bucket, count(*) AS c_q FROM rf GROUP BY 1),
np AS (SELECT sum(c_p)::DOUBLE AS n_p FROM cp),
nq AS (SELECT sum(c_q)::DOUBLE AS n_q FROM cq),
ratio AS (
  SELECT coalesce(cp.bucket, cq.bucket) AS bucket,
         ln((coalesce(c_p, 0) + {SM}) / (n_p + {SM} * {NB}))
       - ln((coalesce(c_q, 0) + {SM}) / (n_q + {SM} * {NB})) AS logratio
  FROM cp FULL OUTER JOIN cq ON cp.bucket = cq.bucket, np, nq),
w AS (SELECT rf.doc_id, count(*) AS n_feat, sum(logratio) AS logw
      FROM rf JOIN ratio USING (bucket) GROUP BY 1)
SELECT raw.doc_id, coalesce(n_feat, 0) AS n_feat,
       coalesce(logw, 0.0) AS logw
FROM raw LEFT JOIN w ON raw.doc_id = w.doc_id
ORDER BY raw.doc_id
"""


@pytest.fixture(scope="module")
def corpora(spark):
    # target: "clean prose"-flavored vocabulary; raw: mixture of
    # target-like docs, junk-flavored docs, and an empty doc
    tgt_rows = [(f"t{i}",
                 "the model reads clean careful prose about science and data "
                 * (1 + i % 3)) for i in range(8)]
    # realistic DSIR shape: target-like docs are RARE in raw (6 of 47), so
    # q under-represents their features and p/q > 1 gives them positive
    # log-weights; the dominant junk mass gets negative weights. Long docs
    # accumulate a gap that dominates the Gumbel noise (std ~1.28), so
    # top-k at a fixed seed is the planted set — selection is ∝ weight,
    # not argmax, and a ~1-unit gap would legitimately let noise flip ranks
    raw_rows = (
        [(f"like{i}", "clean careful prose about science and data today "
          * (8 + i % 2)) for i in range(6)]
        + [(f"junk{i:02d}", "buy cheap pills winner click now spam offer "
            * (8 + i % 2)) for i in range(40)]
        + [("empty0", "")]
    )
    schema = "doc_id string, text string"
    return (spark.createDataFrame(raw_rows, schema),
            spark.createDataFrame(tgt_rows, schema))


def test_logweights_match_duckdb(spark, corpora):
    raw, target = corpora
    got = (dsir_logweights(raw, target, n_buckets=NB, smoothing=SM)
           .orderBy("doc_id").toPandas())
    con = duckdb.connect()
    con.register("raw", raw.toPandas())
    con.register("target", target.toPandas())
    exp = con.execute(_WEIGHTS_SQL).df()
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["n_feat"]) == list(exp["n_feat"])
    assert max(abs(got["logw"] - exp["logw"]), default=0.0) < 1e-9


def test_selection_prefers_target_like(spark, corpora):
    raw, target = corpora
    w = {r.doc_id: r.logw
         for r in dsir_logweights(raw, target, n_buckets=NB).collect()}
    assert min(w[d] for d in w if d.startswith("like")) > \
           max(w[d] for d in w if d.startswith("junk"))
    assert w["empty0"] == 0.0
    assert min(w[d] for d in w if d.startswith("like")) > 0.0
    # hard selection at k=6 under a weight gap this large picks the likes
    top = dsir_select(raw, target, k=6, n_buckets=NB, seed=SEED).collect()
    assert sorted(r.doc_id for r in top) == sorted(
        d for d in w if d.startswith("like"))
    assert [r.rank for r in top] == list(range(1, 7))


def test_selection_is_deterministic_and_seed_sensitive(spark, corpora):
    raw, target = corpora
    a = [tuple(r) for r in dsir_select(raw, target, k=5, seed=1).collect()]
    b = [tuple(r) for r in dsir_select(raw, target, k=5, seed=1).collect()]
    c = [tuple(r) for r in dsir_select(raw, target, k=5, seed=2).collect()]
    assert a == b
    assert [r[3] for r in a] != [r[3] for r in c]  # gumbel keys move


def test_plan_broadcasts_ratio_no_python(spark, corpora):
    raw, target = corpora
    plan = (dsir_logweights(raw, target, n_buckets=NB)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
