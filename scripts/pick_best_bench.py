"""Rank a directory of bench.py outputs by host health, print the best.

Usage: python scripts/pick_best_bench.py /tmp/bench_r4_tries

Ranking: runs whose self-stamps say the host stayed healthy first
(last pre-probe AND post-run window probe < 0.8s), then ascending total
query seconds. Prints a one-line table per run and the winner's path.
Pure file analysis — never starts Spark.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def load(p: Path) -> dict | None:
    try:
        return json.loads(p.read_text().strip().splitlines()[-1])
    except Exception:
        return None


def main() -> None:
    d = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_r4_tries")
    rows = []
    for p in sorted(d.glob("*.json")):
        r = load(p)
        if not r or "queries" not in r:
            continue
        pre = (r.get("pre_probes_sec") or [None])[-1]
        post = r.get("window_probe_sec")
        healthy = (
            pre is not None and post is not None and pre < 0.8 and post < 0.8
        )
        rows.append((p, r, pre, post, healthy))
    if not rows:
        sys.exit("no bench JSONs found")
    rows.sort(key=lambda t: (not t[4], t[1]["value"]))
    print(f"{'file':28s} {'total':>8s} {'pre':>6s} {'post':>6s} {'triad':>6s} healthy")
    for p, r, pre, post, healthy in rows:
        print(
            f"{p.name:28s} {r['value']:8.1f} "
            f"{pre if pre is not None else -1:6.2f} "
            f"{post if post is not None else -1:6.2f} "
            f"{r.get('host_triad_gbps') or -1:6.1f} {healthy}"
        )
    print("best:", rows[0][0])


if __name__ == "__main__":
    main()
