#!/bin/bash
# Opportunistic converged-floor collector for the 4->16 tier scaling pair,
# plus the full-bench healthy-epoch watcher, in ONE sequential loop (so a
# bench run and a runner repeat never collide).
#
# Every cycle: probe the JVM window (~40s). Then:
#   probe < $BENCH_THRESH and bench not yet captured -> full sf0.1 bench once
#   probe < $RUN_THRESH  -> scaling runner repeats at local[16] (and every
#                           3rd such window at local[4]) on the prepared
#                           /tmp/scale_bench/docs input, walls appended to
#                           $FLOORLOG with the probe that gated them
#
# The per-level walls land in $FLOORLOG as JSON lines; the final scaling
# record is assembled (transparently, all walls + probes shown) by
# scripts/assemble_floor.py.
set -u
cd /root/repo
FLOORLOG="${FLOORLOG:-/tmp/floor_walls.jsonl}"
BENCH_OUT="${BENCH_OUT:-/tmp/bench_r4_healthy.json}"
BENCH_THRESH="${BENCH_THRESH:-0.72}"
RUN_THRESH="${RUN_THRESH:-1.0}"
MAX_CYCLES="${MAX_CYCLES:-40}"
SLEEP="${SLEEP:-180}"
DOCS=/tmp/scale_bench/docs
n16=0
for i in $(seq 1 "$MAX_CYCLES"); do
  probe_json=$(python scripts/winprobe.py 2>/dev/null | tail -1)
  probe=$(echo "$probe_json" | python -c 'import json,sys; print(json.load(sys.stdin)["window_probe_sec"])' 2>/dev/null)
  echo "$(date +%H:%M:%S) cycle $i probe=$probe" >> /tmp/floor_watch.log
  [ -z "$probe" ] && { sleep "$SLEEP"; continue; }
  if [ ! -s "$BENCH_OUT" ] && python -c "import sys; sys.exit(0 if float('$probe') < float('$BENCH_THRESH') else 1)"; then
    echo "$(date +%H:%M:%S) healthy epoch: full bench" >> /tmp/floor_watch.log
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench.py > "$BENCH_OUT" 2>/tmp/bench_healthy.log
    continue
  fi
  if python -c "import sys; sys.exit(0 if float('$probe') < float('$RUN_THRESH') else 1)"; then
    if [ $((n16 % 3)) -eq 2 ]; then lvl=4; reps=1; else lvl=16; reps=2; fi
    n16=$((n16 + 1))
    out=$(python scripts/scaling_bench.py --runner "$DOCS" "$lvl" "$reps" 2>/dev/null | tail -1)
    echo "{\"probe\": $probe, \"level\": $lvl, \"run\": $out}" >> "$FLOORLOG"
    echo "$(date +%H:%M:%S) level=$lvl walls=$out" >> /tmp/floor_watch.log
  else
    sleep "$SLEEP"
  fi
done
echo "$(date +%H:%M:%S) collector done" >> /tmp/floor_watch.log
