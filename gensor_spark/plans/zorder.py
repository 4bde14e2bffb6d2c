"""Z-order clustered writes: multi-column data skipping for the tier store.

A 100 TB tier table is read two ways — "one series over a time range"
(dashboard) and "every series in a time slice" (rollup cascade, backfill).
A layout sorted on one key prunes beautifully for that key and not at all
for the other: parquet/Iceberg min-max stats on the secondary column span
the whole domain inside every file. Interleaving the bits of both keys into
one Morton (Z-order) value and range-partitioning + sorting the write on it
gives every file a small bounding BOX in (series, time) space, so row-group
and file stats prune for EITHER predicate — the same layout trick Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's ``rewrite_data_files(sort_order =
zorder(...))`` apply, built here from first principles with Catalyst
integer expressions (no Python, exact).

Pieces:

- ``rank_scale`` — maps an arbitrary orderable column onto [0, 2^bits) by
  rank (ntile over a sorted window), making the interleave distribution-
  robust: a skewed raw domain (zipf doc ids, clustered timestamps) still
  fills the grid uniformly. One window Exchange; at write time this is the
  shuffle you were paying for the layout anyway.
- ``zvalue`` — bit-interleave of N pre-scaled integer columns via
  shift/or folds; pure Catalyst, whole-stage codegen.
- ``write_zordered`` — repartitionByRange on the z-value (contiguous
  z-ranges per file == bounding boxes) + sortWithinPartitions + parquet
  write, so both file-level AND row-group-level min-max stats are tight.

Verification (tests/test_zorder.py): bit-interleave parity vs a Python
reference, and a measured pruning assertion — pyarrow row-group stats show
a point predicate on EITHER dimension overlaps only O(√G) of G row groups
in the z-ordered layout vs O(G) for the single-sort layout on its
non-sorted dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_scale(df: DataFrame, col: str, bits: int, out: str) -> DataFrame:
    """Add ``out`` = the rank of ``col`` scaled onto [0, 2^bits) — the
    distribution-robust normalization for z-ordering (equivalent to the
    range-partition-id normalization production z-order implementations
    use). NULLs map to 0 (they sort first anyway). One window Exchange on
    an empty partitioning — at web scale use a per-partition approximation
    or pre-known domain bounds instead; for the write sizes this module
    targets (one tier batch per job) the single sort is the cost of the
    layout itself."""
    from pyspark.sql import Window as W

    n = df.count()
    cells = 1 << bits
    # row_number is int32: widen BEFORE the multiply or ANSI mode overflows
    r = (F.row_number().over(W.orderBy(F.col(col).asc_nulls_first())) - 1).cast("long")
    return df.withColumn(out, ((r * F.lit(cells).cast("long")) / F.lit(n)).cast("long"))


def zvalue(cols: list[str], bits: int = 16) -> F.Column:
    """Morton code of pre-scaled integer columns (each in [0, 2^bits)):
    bit i of column j lands at interleaved position ``i*len(cols)+j``.
    Pure integer Catalyst expressions — exact in any engine."""
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError(f"zvalue interleaves 1-4 columns, got {n}")
    if bits * n > 62:
        raise ValueError(f"bits*cols must fit a long: {bits}*{n} > 62")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    n_files: int = 32,
    bits: int = 16,
    writer_options: dict | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``zcols``.

    Each output file owns a contiguous z-range (repartitionByRange), and
    rows inside are z-sorted, so row-group min-max stats form tight
    bounding boxes over every z-dimension — scans filtered on ANY of the
    ``zcols`` skip most files and row groups (verified against pyarrow
    stats in tests). Columns are rank-scaled first; the scaling columns
    and the z-value are dropped before writing — the layout is invisible
    to readers."""
    scaled = df
    tmp = []
    for i, c in enumerate(zcols):
        sc = f"__zs{i}"
        scaled = rank_scale(scaled, c, bits, sc)
        tmp.append(sc)
    z = scaled.withColumn("__z", zvalue(tmp, bits))
    w = (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *tmp)
        .write.mode("overwrite")
    )
    for k, v in (writer_options or {}).items():
        w = w.option(k, v)
    w.parquet(path)
