#!/bin/bash
# Quiet-window hunter for the north-rule scaling number.
#
# The shared sandbox's neighbor tenants flood the box within minutes of any
# quiet window (BENCH.md runs D-K: hardware-control ceiling 0.41-0.70 under
# load).  This loop waits for a REAL quiet window (1-min loadavg below the
# gate), fires one SHORT scaling protocol (2M rows, levels 2,8,32, 2
# interleaved reps -- matching the --levels/--reps flags below; ~5 min on
# cached data), archives the raw output under
# /tmp/scaling_runs/, and goes back to waiting.  A session-end pass picks the
# run whose per-rep loadavgs stayed lowest and merges it into BENCH.md.
#
# Touch /tmp/HOLD_SCALING to pause the loop (e.g. while pytest or bench.py
# owns the machine); remove it to resume.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/scaling_runs
GATE="${GATE:-1.0}"
while true; do
    if [ -e /tmp/HOLD_SCALING ]; then sleep 60; continue; fi
    LA=$(cut -d' ' -f1 /proc/loadavg)
    if awk "BEGIN{exit !($LA < $GATE)}"; then
        TS=$(date +%s)
        python scripts/scaling_bench.py --rows 2000000 --levels 2,8,32 --reps 2 \
            > "/tmp/scaling_runs/run_${TS}.log" 2>&1
        cp BENCH_scaling.md "/tmp/scaling_runs/run_${TS}.md" 2>/dev/null
        sleep 120
    else
        sleep 45
    fi
done
