"""Standalone host-weather probe: the bench's Spark-shaped window yardstick.

This VM's JVM shuffle+sort+window throughput intermittently degrades 5-8x
while numpy triad reads healthy (BENCH/BASELINE.md, r3 "second degradation
mode"). bench.py stamps every full run with the same probe; this script
answers "is NOW a healthy epoch?" in ~30s without paying a full bench, so a
watcher can gate the expensive run on a healthy reading.

Prints one JSON line: {"window_probe_sec": float, "host_triad_gbps": float}.
Healthy band at local[32]: probe < 0.7s (r3 record runs: 0.55-0.65).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from gensor_spark.session import get_spark as get_session

    spark = get_session(app_name=f"winprobe[{cpus}]")
    # warm the JVM so the reading measures the host, not class loading
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    readings = []
    for _ in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
        t0 = time.perf_counter()
        (
            spark.range(8_000_000)
            .selectExpr("id % 997 AS k", "id", "cast(id % 10007 as double) AS v")
            .selectExpr(
                "k", "v",
                "sum(v) OVER (PARTITION BY k ORDER BY id "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs",
            )
            .write.format("noop").mode("overwrite").save()
        )
        readings.append(round(time.perf_counter() - t0, 3))
    try:
        from scripts.hostcheck import triad_gbps

        triad = triad_gbps(n=20_000_000, repeats=2)
    except Exception:
        triad = None
    print(json.dumps({
        "window_probe_sec": min(readings),
        "probe_readings": readings,
        "host_triad_gbps": triad,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
