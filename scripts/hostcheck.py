"""Host sanity probe: memory bandwidth + CPU steal + spin throughput.

This sandbox VM's effective memory bandwidth intermittently collapses from
tens of GB/s to under 1 GB/s (host-level ballooning/swap — verified
2026-08-17: numpy triad measured 0.1-0.4 GB/s while a register-only spin
loop stayed at full speed, and identical Spark jobs swung 8-40× between
runs). Any wall-clock benchmark taken during such a window measures the
host, not the engine.

Run this BEFORE and AFTER every timing run; a result is only meaningful if
both probes report healthy bandwidth. ``scripts/scaling_bench.py`` embeds
these numbers in its report.

Usage: python scripts/hostcheck.py [--quick]
Prints one JSON line: {"triad_gbps": ..., "spin_mops": ..., "steal_pct": ...}
"""

from __future__ import annotations

import json
import sys
import time


def triad_gbps(n: int = 50_000_000, repeats: int = 3) -> float:
    """STREAM-triad-style bandwidth: best of `repeats` (GB/s, read+write)."""
    import numpy as np

    a = np.ones(n, dtype=np.float64)
    best = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        b = a * 1.000001
        dt = time.perf_counter() - t0
        best = max(best, 3 * a.nbytes / dt / 1e9)
        del b
    return round(best, 1)


def spin_mops(dur: float = 1.0) -> float:
    """Register-bound spin throughput (M iterations/s) — the CPU control."""
    t0 = time.perf_counter()
    c = 0
    while time.perf_counter() - t0 < dur:
        c += 1
    return round(c / dur / 1e6, 1)


def steal_pct(window: float = 3.0) -> float:
    def snap():
        return list(map(int, open("/proc/stat").readline().split()[1:]))

    a = snap()
    time.sleep(window)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    return round(100.0 * d[7] / max(sum(d), 1), 1)


def main() -> None:
    quick = "--quick" in sys.argv
    out = {
        "triad_gbps": triad_gbps(n=20_000_000 if quick else 50_000_000),
        "spin_mops": spin_mops(0.5 if quick else 1.0),
        "steal_pct": steal_pct(1.0 if quick else 3.0),
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    # healthy: triad >= 5 GB/s on any modern host; degraded hosts measure <1
    out["healthy"] = out["triad_gbps"] >= 5.0
    print(json.dumps(out))


if __name__ == "__main__":
    main()
