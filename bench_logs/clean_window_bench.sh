#!/bin/bash
# Fire bench.py (sf0.1) + bench_extra (5M) in windows where the host's
# memory bandwidth is healthy (cumsum probe), archiving JSON lines.
cd /root/repo
probe() {
python - <<'PY'
import numpy as np, time
a = np.random.randint(0, 1<<30, size=50_000_000, dtype=np.int64)
np.cumsum(a)  # warm
t0=time.time(); np.cumsum(a); t=time.time()-t0
print(f"{t:.3f}")
PY
}
for i in 1 2 3 4 5 6 7 8; do
    T=$(probe | tail -1)
    echo "window probe $i: cumsum=$T s  loadavg=$(cut -d' ' -f1-3 /proc/loadavg)" >> bench_logs/clean_runs.log
    if awk "BEGIN{exit !($T < 0.40)}"; then
        echo "window $i CLEAN — running bench.py sf0.1" >> bench_logs/clean_runs.log
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py 2>/dev/null | grep -o '{"metric.*' >> bench_logs/clean_runs.log
        T2=$(probe | tail -1)
        echo "post-bench probe: $T2" >> bench_logs/clean_runs.log
        if awk "BEGIN{exit !($T2 < 0.40)}"; then
            echo "running bench_extra 5M" >> bench_logs/clean_runs.log
            python bench_extra.py --rows 5000000 --reps 2 --cpus 32 2>/dev/null | tail -1 >> bench_logs/clean_runs.log
        fi
    else
        sleep 120
    fi
done
echo DONE >> bench_logs/clean_runs.log
