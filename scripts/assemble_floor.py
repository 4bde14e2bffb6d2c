"""Assemble a transparent converged-floor estimate for the 4->16 tier pair.

Reads every wall ever measured for the prepared /tmp/scale_bench/docs input:
- full scaling_bench records (BENCH/scaling_*.json with a pair_4_16 block and
  the same input_points), each contributing its per-level wall lists, and
- opportunistic runner walls from the floor collector
  (/tmp/floor_walls.jsonl: {"probe": p, "level": 4|16, "run": {... walls}}).

Prints ALL walls per level with their gating probe where known (nothing is
discarded silently), the per-level floor (min), the floor ratio and
efficiency, and a convergence indicator (gap between best and second-best
wall). The floor protocol is the r3-sanctioned one: stop-the-world GC and
host contention only ever ADD time, so the minimum over repeated identical
runs estimates the achievable wall; the RATIO of two converged floors is the
scaling evidence. Mixing walls from different wall-clock windows is
explicitly visible in the output (each wall keeps its source tag).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
FLOORLOG = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/floor_walls.jsonl")
INPUT_POINTS = 873_382_145  # the prepared 2.4M-doc input; guards like-for-like


def main() -> None:
    walls: dict[int, list[tuple[float, str]]] = {4: [], 16: []}
    for f in sorted(glob.glob(str(REPO / "BENCH" / "scaling_*.json"))):
        try:
            d = json.loads(Path(f).read_text())
        except Exception:
            continue
        if d.get("input_points") != INPUT_POINTS:
            continue
        for lvl in (4, 16):
            for w in d.get("walls_all", {}).get(str(lvl), []):
                walls[lvl].append((float(w), Path(f).name))
    if FLOORLOG.exists():
        for line in FLOORLOG.read_text().splitlines():
            try:
                rec = json.loads(line)
                run = rec["run"]
                if isinstance(run, str):
                    run = json.loads(run)
                lvl = int(rec["level"])
                for w in run.get("walls", []):
                    walls[lvl].append(
                        (float(w), f"collector(probe={rec.get('probe')})")
                    )
            except Exception:
                continue

    out: dict = {"input_points": INPUT_POINTS, "levels": {}}
    for lvl in (4, 16):
        ws = sorted(walls[lvl])
        if not ws:
            print(f"no walls at level {lvl}", file=sys.stderr)
            return
        out["levels"][lvl] = {
            "n_walls": len(ws),
            "floor": ws[0][0],
            "second_best": ws[1][0] if len(ws) > 1 else None,
            "convergence_gap_pct": (
                round(100 * (ws[1][0] - ws[0][0]) / ws[0][0], 1)
                if len(ws) > 1 else None
            ),
            "all_walls": [{"wall_s": w, "source": s} for w, s in ws],
        }
    f4, f16 = out["levels"][4]["floor"], out["levels"][16]["floor"]
    out["floor_ratio"] = round(f4 / f16, 3)
    out["floor_efficiency"] = round(f4 / f16 / 4, 3)
    out["points_per_sec"] = {
        "4": round(INPUT_POINTS / f4, 1), "16": round(INPUT_POINTS / f16, 1)
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
