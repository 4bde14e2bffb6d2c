"""BM25 ranked retrieval over the document corpus.

Training-data-pipeline extension (no gensor analogue). BM25 (Robertson &
Zaragoza 2009, the Lucene/Elasticsearch default) is the standard lexical
ranking function for corpus search, retrieval-based quality filtering, and
hard-negative mining for retrieval training sets. Given a small set of
queries and a huge corpus, score every matching document and return the
top-``k`` per query.

Score of document ``d`` for query ``q``::

    score(q, d) = sum over terms t in q of
        qtf(t) * idf(t) * tf(t,d) * (k1 + 1)
                 / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))

with the Lucene-style non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``,
``tf`` the term count in the document, ``dl`` the document token length,
``avgdl`` the corpus mean, and ``qtf`` the term's multiplicity in the query.

Shape at scale (the part that matters at 100 TB):

- The corpus is tokenized row-locally and exploded to postings, then
  immediately **broadcast-semi-joined against the distinct query-term set**
  — the corpus NEVER shuffles on term or doc for non-matching tokens; only
  postings whose term appears in some query survive the scan stage.
- ``(doc, term) -> tf`` is one partial-agg shuffle over the *surviving*
  postings (tiny relative to the corpus for realistic query sets).
- ``df(t)`` needs only the query terms' document frequencies, so it is an
  aggregate of the same surviving postings — never a full-vocabulary pass —
  and the resulting per-term idf table (≤ |query terms| rows) is broadcast
  back.
- ``N`` and ``avgdl`` are one cheap full-corpus aggregate (count + mean of
  an int), crossed in as a broadcast 1-row literal — no collect.
- Per-query top-k is **two-phase**: a salted partial top-k per
  (query, salt) bucket bounds the final sort input to ``salts * k`` rows
  per query, so one query matching a billion documents cannot pin a single
  window task (the same skew treatment as the rollup partials,
  rollup.py).

Everything is pure Catalyst (whole-stage codegen); no Python rows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gensor_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    salts: int = 16,
) -> DataFrame:
    """Top-``k`` BM25-ranked documents per query.

    ``docs``: the corpus (``id_col``, ``text_col``). ``queries``: a SMALL
    relation (``query_id_col``, ``query_text_col``) — it is broadcast.
    Returns ``(query_id, rank, doc_id, score)`` with ``rank`` 1-based and
    ties broken by ascending ``doc_id`` (deterministic output).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("_toks"),
    ).select("doc_id", "_toks", F.size("_toks").alias("dl"))

    # one cheap full-corpus aggregate; stays a broadcast 1-row relation
    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    # query terms with multiplicity (qtf); distinct set drives the semi-join
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(tokens(F.col(query_text_col))).alias("term"),
    ).groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("qtf"))
    qterm_set = qterms.select("term").distinct()

    # corpus postings filtered to query terms BEFORE any wide shuffle:
    # broadcast hash join — the non-matching (overwhelming) majority of
    # corpus tokens dies in the scan stage, map-side.
    postings = (
        toks.select("doc_id", "dl", F.explode("_toks").alias("term"))
        .join(F.broadcast(qterm_set), "term")
    )
    tf = postings.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )

    # document frequency of the query terms only; (doc_id, term) is already
    # distinct after the tf aggregate, so df = row count per term
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_contrib",
            F.col("qtf")
            * F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_contrib").alias("score"))
    )

    # two-phase top-k: salted partial cut bounds the per-query final sort
    # to salts*k rows no matter how many documents a query matches
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    salted = Window.partitionBy(
        "query_id", F.crc32(F.col("doc_id").cast("string")) % salts
    ).orderBy(*order)
    final = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_pr", F.row_number().over(salted))
        .where(F.col("_pr") <= k)
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
