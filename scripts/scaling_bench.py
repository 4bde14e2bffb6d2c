"""N-vs-4N scaling-efficiency evidence (north rule, sandbox proxy).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N executors.
No real cluster exists here, so the sanctioned proxy is: the SAME job on the
SAME input at two parallelism levels — ``local[8]`` vs ``local[32]`` — each
in a fresh JVM, reporting rolled-up points/sec at both and

    efficiency = (throughput@32 / throughput@8) / 4.

The job is the production code path: ``TierPipeline.run`` (scan parquet docs
→ posexplode point view → 1m rollup → 1h/1d cascade, with checkpoint ledger
and lineage rows), against a deterministic synthetic docs table with
hot-series skew (sources zipf-distributed, 2% of docs 20× longer).

Usage:
    python scripts/scaling_bench.py            # full run, writes BENCH file
    python scripts/scaling_bench.py --docs N   # size override
    python scripts/scaling_bench.py --runner <dir> <cpus>   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_DOCS = 150_000
WORK = Path(os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale_bench"))


def prepare(n_docs: int) -> dict:
    from gensor_spark.session import get_spark
    from gensor_spark.sources.synth import synth_docs

    spark = get_spark(app_name="scale_prepare", master="local[32]",
                      shuffle_partitions=32)
    docs_dir = WORK / "docs"
    shutil.rmtree(docs_dir, ignore_errors=True)
    docs = synth_docs(spark, n_docs=n_docs, seed=42, hot_fraction=0.02,
                      hot_factor=20, num_partitions=64)
    docs.write.mode("overwrite").parquet(str(docs_dir))
    from pyspark.sql import functions as F

    row = spark.read.parquet(str(docs_dir)).agg(
        F.count("*").alias("docs"), F.sum("n_tok").alias("points")
    ).collect()[0]
    spark.stop()
    return {"docs": row.docs, "points": row.points, "dir": str(docs_dir)}


def runner(docs_dir: str, cpus: int) -> None:
    """One timed job in this JVM; prints a JSON line."""
    from gensor_spark.plans.incremental import TIERS, TierPipeline
    from gensor_spark.session import get_spark

    spark = get_spark(app_name=f"scale_run_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    store = WORK / f"store_{cpus}"
    shutil.rmtree(store, ignore_errors=True)
    docs = spark.read.parquet(docs_dir)
    # warm up: JVM JIT + parquet footers, outside the timed window
    docs.limit(1000).count()
    # tick=1s → the 1m tier aggregates 60 points per bin (a real 60:1
    # reduction; the default 60s tick would make the 1m rollup an identity)
    pipe = TierPipeline(spark, str(store), n_batches=4, tick_seconds=1)
    t0 = time.perf_counter()
    pipe.run(docs)
    wall = time.perf_counter() - t0
    rolled = {t: pipe.read_tier(t, finalize=False).count() for t in TIERS}
    print(json.dumps({"cpus": cpus, "wall_s": round(wall, 2),
                      "rolled_rows": rolled}))


def main() -> None:
    if "--runner" in sys.argv:
        i = sys.argv.index("--runner")
        runner(sys.argv[i + 1], int(sys.argv[i + 2]))
        return
    n_docs = DEFAULT_DOCS
    if "--docs" in sys.argv:
        n_docs = int(sys.argv[sys.argv.index("--docs") + 1])

    WORK.mkdir(parents=True, exist_ok=True)
    meta = prepare(n_docs)
    print(f"prepared {meta['docs']} docs / {meta['points']} points", file=sys.stderr)

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--runner", meta["dir"], str(cpus)],
            capture_output=True, text=True, check=True, cwd=str(REPO),
        )
        results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        print(f"local[{cpus}]: {results[cpus]['wall_s']}s", file=sys.stderr)

    thr = {c: meta["points"] / r["wall_s"] for c, r in results.items()}
    eff = (thr[32] / thr[8]) / 4
    summary = {
        "input_docs": meta["docs"],
        "input_points": meta["points"],
        "wall_s": {c: r["wall_s"] for c, r in results.items()},
        "points_per_sec": {c: round(t, 1) for c, t in thr.items()},
        "efficiency_8_to_32": round(eff, 3),
        "rolled_rows": results[32]["rolled_rows"],
    }
    print(json.dumps(summary))
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    (bench_dir / "BASELINE.md").write_text(_render(summary))


def _render(s: dict) -> str:
    return f"""# BENCH/BASELINE — N-vs-4N scaling evidence (sandbox proxy)

North rule: ≥ 0.8 throughput scaling efficiency from N to 4N executors.
Sandbox proxy (per driver instruction): the identical job — `TierPipeline.run`
(docs parquet scan → posexplode point view → 1m/1h/1d tier rollups with
checkpoint ledger + lineage) — on the identical input at `local[8]` vs
`local[32]`, fresh JVM each, timed after a warm-up action.

Input: {s['input_docs']:,} synthetic docs / {s['input_points']:,} points
(seed=42, zipf sources, 2% hot docs ×20 length — hot-series skew exercised;
salted two-phase aggregation in operators/rollup.py handles it).

| parallelism | wall (s) | rolled-up points/sec |
|---|---|---|
| local[8]  | {s['wall_s'][8]} | {s['points_per_sec'][8]:,.0f} |
| local[32] | {s['wall_s'][32]} | {s['points_per_sec'][32]:,.0f} |

**Scaling efficiency (8 → 32) = {s['efficiency_8_to_32']}**
(threshold ≥ 0.8 {'MET' if s['efficiency_8_to_32'] >= 0.8 else 'NOT MET'})

Tier output rows at local[32]: {s['rolled_rows']}

Reproduce: `python scripts/scaling_bench.py`
(single-machine caveat: both runs share one memory subsystem; on a real
cluster the 4N run adds memory bandwidth and I/O lanes with the cores, so
this proxy under-states, not over-states, cluster efficiency).
"""


if __name__ == "__main__":
    main()
