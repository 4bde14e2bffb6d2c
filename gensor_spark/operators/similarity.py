"""Similarity search over embedding columns: brute-force and LSH-bucketed.

Training-data-pipeline extension (no gensor analogue). Two tiers:

- **brute-force cosine top-k** — the exactness baseline: broadcast the
  (small) query set against the corpus, one narrow projection per pair,
  ``row_number`` window for the top-k cut. O(corpus × queries); right answer
  at any corpus size as long as the query set broadcasts.
- **random-hyperplane LSH** — the scale path for corpus×corpus near-dup:
  sign-pattern signatures bucket the corpus so only same-bucket pairs are
  scored. Recall is tunable via planes count; candidates are verified with
  exact cosine, so precision is 1.

Determinism contract: embeddings are quantized to integers
(``floor(x * SCALE + 0.5)``) before any arithmetic. Products and sums of
small integers are exact in IEEE double regardless of association order, so
cosine values — and therefore bucket assignments and rankings — are
bit-identical between Spark and the DuckDB oracle. Hyperplanes are ±1
Rademacher vectors derived from md5 (`_plane`), generated once in Python and
inlined as literals in both engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point quantization scale for cross-engine exactness
SCALE = 1000

#: multi-table LSH layout: L tables × m planes each. Candidate recall for a
#: pair at angle θ is 1 - (1 - p^m)^L with p = 1 - θ/π; at cosine 0.45
#: (p ≈ 0.65) this is ≈ 0.79 — one signature of L·m planes would be ≈ 0.006.
LSH_TABLES = 8
LSH_PLANES_PER_TABLE = 4
DEFAULT_DIMS = 64


def _plane(p: int, dims: int) -> list[int]:
    """Deterministic ±1 hyperplane ``p``: parity of md5("p:d")."""
    out = []
    for d in range(dims):
        h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
        out.append(1 if int(h[:8], 16) & 1 else -1)
    return out


def planes(n_planes: int, dims: int = DEFAULT_DIMS) -> list[list[int]]:
    return [_plane(p, dims) for p in range(n_planes)]


def quantize(vec) -> "F.Column":
    """Fixed-point quantization, round-half-up in every IEEE engine."""
    return F.transform(vec, lambda x: F.floor(x * SCALE + F.lit(0.5)).cast("long"))


def dot(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("double"),
        lambda acc, x: acc + x,
    )


def cosine(a, b) -> "F.Column":
    """Cosine over quantized integer vectors — exact across engines."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def hyperplane_bucket(vec, plane_lits: list[list[int]]) -> "F.Column":
    """LSH bucket id for one table: bit ``j`` set iff ``planes[j] · vec >= 0``."""
    sig = F.lit(0).cast("long")
    for j, w in enumerate(plane_lits):
        wcol = F.array(*[F.lit(x) for x in w])
        bit = F.when(dot(vec, wcol) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), j)).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def _quantized_with_norm(emb: DataFrame, id_col: str, vec_col: str,
                         id_alias: str, vec_alias: str, norm_alias: str) -> DataFrame:
    """Stage ``(id, quantized vec, norm)`` — norms computed once per vector,
    not once per pair (3× fewer HOF dot products in all-pairs scoring)."""
    staged = emb.select(
        F.col(id_col).alias(id_alias), quantize(F.col(vec_col)).alias(vec_alias)
    )
    return staged.select(
        id_alias, vec_alias,
        F.sqrt(dot(F.col(vec_alias), F.col(vec_alias))).alias(norm_alias),
    )


def brute_topk(emb: DataFrame, k: int = 5, n_queries: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of the first ``n_queries`` vectors vs the corpus.

    The query side is broadcast — at 100 TB the corpus side streams through
    one projection stage with no shuffle until the per-query top-k, which
    aggregates to ``n_queries × k`` rows (partial top-k per partition via
    the window's sort is the dominant cost; for large k switch to
    ``top_k``-style aggregation).
    """
    from pyspark.sql import Window as W

    q = _quantized_with_norm(
        emb.filter(F.col(id_col) < n_queries), id_col, vec_col,
        "query_id", "qv", "qn")
    c = _quantized_with_norm(emb, id_col, vec_col, "cand_id", "cv", "cn")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id",
                (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def neardup_pairs_brute(emb: DataFrame, threshold: float = 0.45,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine ≥ threshold — O(n²) exactness baseline."""
    a = _quantized_with_norm(emb, id_col, vec_col, "id_a", "va", "na")
    b = _quantized_with_norm(emb, id_col, vec_col, "id_b", "vb", "nb")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def ivf_topk(emb: DataFrame, k: int = 5, n_queries: int = 10,
             n_centroids: int = 16, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-style ANN: coarse quantization → probe the nearest cells only.

    The inverted-file index in its simplest deterministic form: centroids
    are the first ``n_centroids`` corpus vectors (a fixed, replicable seed
    set — production would k-means them; the index structure and query path
    are identical), every vector is assigned to its max-cosine centroid,
    and a query scans only its ``n_probe`` closest cells — ~n_probe/n_centroids
    of the corpus instead of all of it. Exact cosine re-ranks within the
    probed cells, so results differ from brute force only by cell-recall
    (vectors whose cell the query didn't probe).

    Plan shape: two broadcast joins (centroids, queries) + one shuffle for
    the per-query top-k — the corpus is never self-joined and the scan
    prunes to probed cells, which is what survives 10^9 vectors.
    """
    from pyspark.sql import Window as W

    c = _quantized_with_norm(emb, id_col, vec_col, "cand_id", "cv", "cn")
    cents = _quantized_with_norm(
        emb.filter(F.col(id_col) < n_centroids), id_col, vec_col,
        "cent_id", "ev", "en",
    )
    # assign every corpus vector to its nearest centroid (broadcast join;
    # deterministic tie-break on centroid id)
    assign_w = W.partitionBy("cand_id").orderBy(
        F.desc("csim"), F.asc("cent_id")
    )
    assigned = (
        c.crossJoin(F.broadcast(cents))
        .select("cand_id", "cv", "cn", "cent_id",
                (dot("cv", "ev") / (F.col("cn") * F.col("en"))).alias("csim"))
        .withColumn("_r", F.row_number().over(assign_w))
        .filter(F.col("_r") == 1)
        .select("cand_id", "cv", "cn", F.col("cent_id").alias("cell"))
    )
    # queries probe their n_probe nearest cells
    q = _quantized_with_norm(
        emb.filter(F.col(id_col) < n_queries), id_col, vec_col,
        "query_id", "qv", "qn",
    )
    probe_w = W.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cent_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qv", "qn", "cent_id",
                (dot("qv", "ev") / (F.col("qn") * F.col("en"))).alias("qsim"))
        .withColumn("_r", F.row_number().over(probe_w))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "qn", F.col("cent_id").alias("cell"))
    )
    rank_w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cand_id"))
    return (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id",
                (dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("sim"))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
    )


def neardup_pairs_lsh(emb: DataFrame, threshold: float = 0.45,
                      tables: int = LSH_TABLES,
                      planes_per_table: int = LSH_PLANES_PER_TABLE,
                      dims: int = DEFAULT_DIMS, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Multi-table LSH near-dup pairs: candidates agree on ≥ 1 full table.

    ``tables × planes_per_table`` hyperplanes; table ``t`` uses planes
    ``[t·m, (t+1)·m)``. Candidates are pairs sharing any table's bucket
    (OR-amplification — see LSH_TABLES for the recall curve), then verified
    with exact cosine, so precision is 1. The bucket join shuffles
    ``rows × tables`` narrow rows — linear, no quadratic blow-up outside a
    bucket. Skewed buckets (near-zero vectors) are the thing to watch at
    scale; cap them like dedup.lsh_candidates does for MinHash.
    """
    all_planes = planes(tables * planes_per_table, dims)
    sigs = _quantized_with_norm(emb, id_col, vec_col, "vid", "qv", "qn")
    bucket_arr = F.array(*[
        hyperplane_bucket(F.col("qv"),
                          all_planes[t * planes_per_table:(t + 1) * planes_per_table])
        for t in range(tables)
    ])
    banded = sigs.select(
        "vid", "qv", "qn", F.posexplode(bucket_arr).alias("tbl", "bucket")
    ).cache()  # both sides of the bucket self-join read this once
    a = banded.select("tbl", "bucket", F.col("vid").alias("id_a"),
                      F.col("qv").alias("va"), F.col("qn").alias("na"))
    b = banded.select("tbl", "bucket", F.col("vid").alias("id_b"),
                      F.col("qv").alias("vb"), F.col("qn").alias("nb"))
    return (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                (dot("va", "vb") / (F.col("na") * F.col("nb"))).alias("sim"))
        .distinct()
        .filter(F.col("sim") >= threshold)
    )
