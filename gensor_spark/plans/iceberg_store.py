"""Iceberg tier storage: the ``MERGE INTO`` maintenance path.

gensor's ``to_sql`` upsert is an SQLite ``ON CONFLICT DO NOTHING`` insert
(``/root/reference/gensor/core/base.py:355-358``) — idempotent re-writes of
the same rows. At cluster scale the same contract is an Iceberg ``MERGE
INTO`` keyed on the series/bin/batch identity: re-running a batch replaces
its own rows bit-identically (one atomic snapshot per batch), never
double-counts, and concurrent batches commit serializably.

The tier tables store the SAME associative partial states as the parquet
fallback (operators/rollup.py), partitioned by ``batch`` — the merge key is
``(keys…, bin_ts, batch)`` so each batch owns its rows and
``TierPipeline.read_tier``'s cross-batch partial merge is unchanged. This
keeps idempotency structural (the gensor semantics) instead of relying on
merge-time arithmetic that would break on re-runs.

The sandbox image has no iceberg-spark runtime jar, so this path is
exercised by ``tests/test_iceberg.py`` only when ``iceberg_available()``
(``sources/tables.py``) is true — e.g. on a real cluster via
``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...``.
The MERGE statement generation itself is unit-tested everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gensor_spark.operators.rollup import PARTIAL_COLS

#: session configs that attach a filesystem ("hadoop") Iceberg catalog named
#: ``local`` — pass to session.get_spark(extra_conf=iceberg_conf(warehouse))
def iceberg_conf(warehouse: str, catalog: str = "local") -> dict[str, str]:
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def merge_sql(table: str, source_view: str,
              keys: tuple[str, ...] = ("doc_id", "source")) -> str:
    """The tier-maintenance MERGE: full-row upsert keyed on series/bin/batch.

    Equality on every key including ``batch`` makes a re-run of the same
    batch rewrite its own rows (idempotent, gensor's ON-CONFLICT contract);
    new bins insert. Update sets only the partial-state columns — the merge
    arithmetic stays in ``read_tier``'s associative partial merge.
    """
    on = " AND ".join(
        [f"t.{k} = s.{k}" for k in keys] + ["t.bin_ts = s.bin_ts", "t.batch = s.batch"]
    )
    sets = ", ".join(f"t.{c} = s.{c}" for c in PARTIAL_COLS)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT *"
    )


class IcebergTierStore:
    """Tier tables in an Iceberg catalog, maintained with MERGE INTO."""

    def __init__(self, spark: SparkSession, namespace: str = "local.gensor",
                 keys: tuple[str, ...] = ("doc_id", "source")) -> None:
        self.spark = spark
        self.namespace = namespace
        self.keys = keys
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")

    def table(self, tier: str) -> str:
        return f"{self.namespace}.tier_{tier}"

    def ensure_table(self, tier: str, like: DataFrame) -> None:
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in like.schema.fields
        )
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.table(tier)} ({cols}, batch INT) "
            f"USING iceberg PARTITIONED BY (batch)"
        )

    def merge_batch(self, tier: str, partials: DataFrame, batch_id: int) -> None:
        """One atomic Iceberg snapshot: upsert this batch's partial states."""
        from pyspark.sql import functions as F

        self.ensure_table(tier, partials)
        src = partials.withColumn("batch", F.lit(batch_id).cast("int"))
        view = f"_merge_src_{tier}_{batch_id}"
        src.createOrReplaceTempView(view)
        try:
            self.spark.sql(merge_sql(self.table(tier), view, self.keys))
        finally:
            self.spark.catalog.dropTempView(view)

    def count_batch(self, tier: str, batch_id: int) -> int:
        """Row count of one batch partition from the ``.partitions`` METADATA
        table — manifest statistics only, never a data-file scan.

        This replaces a standalone ``table.filter(batch==b).count()`` data
        job per (tier, batch): that count was exactly the
        parallelism-independent per-job floor the parquet path eliminated
        with ``Observation`` metrics (``_write_counted``), ×3 tiers ×N
        batches. ``observe()`` on the MERGE source is NOT a safe substitute:
        Iceberg's MERGE can execute the source subquery twice (touched-file
        discovery pass + the merge pass, the second pruned by the dynamic
        file filter), so a CollectMetrics node there can report a pass-local
        row count. The manifests' ``record_count`` is authoritative after
        the commit.
        """
        rows = self.spark.sql(
            f"SELECT record_count FROM {self.table(tier)}.partitions "
            f"WHERE partition.batch = {int(batch_id)}"
        ).collect()
        return int(rows[0][0]) if rows else 0

    def drop(self, tier: str) -> None:
        """Drop one tier table (PURGE removes data files, not just catalog
        state) — used by ``TierPipeline.reset`` so an Iceberg-backed reset
        actually clears tier data, mirroring the parquet rmtree."""
        self.spark.sql(f"DROP TABLE IF EXISTS {self.table(tier)} PURGE")

    def read(self, tier: str) -> DataFrame:
        return self.spark.table(self.table(tier)).drop("batch")

    def compact(self, tier: str) -> None:
        """Iceberg's rewrite_data_files compaction (call-through procedure)."""
        cat = self.namespace.split(".", 1)[0]
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files(table => '{self.table(tier)}')"
        )
