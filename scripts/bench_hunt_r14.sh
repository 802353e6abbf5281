#!/bin/bash
# Probe-gated bench hunt (r14): only run the full bench when the host
# window is healthy — single-thread canary (3-sample min) <= 0.84s AND
# a fresh-JVM parallel probe <= 1.48 — and keep only canary_ok &&
# plausible_ok artifacts.  Same discipline as the r13 hunts
# (docs/HUNT_R13_*_PROBES.log).
# Usage: bench_hunt_r14.sh <clone_dir> <out_json> <probes_log> [cpus]
set -u
CLONE=$1; OUT=$2; LOG=$3; CPUS=${4:-32}

probe_single() {
  python - <<'EOF'
import time
best = 9e9
for _ in range(3):
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    best = min(best, time.perf_counter() - t0)
print(f"{best:.4f}")
EOF
}

probe_par() {
  cd "$CLONE" && SPARK_GRAFT_CPUS=$CPUS python - <<'EOF' 2>/dev/null
import sys, time
sys.path.insert(0, '.')
from simple_rust_query_engine_spark.session import get_spark
spark = get_spark('par-probe')
tasks = max(1, spark.sparkContext.defaultParallelism)
def run(n):
    t0 = time.perf_counter()
    spark.range(0, 30_000_000 * n, 1, n).selectExpr("sum(pmod(xxhash64(id), 1000000007)) AS s").collect()
    return time.perf_counter() - t0
run(1); run(tasks)
t1 = min(run(1) for _ in range(2))
tn = min(run(tasks) for _ in range(2))
print(f"{tn/t1:.4f}")
EOF
}

for attempt in 1 2 3 4 5 6; do
  S=$(probe_single)
  echo "attempt $attempt single=$S" >> "$LOG"
  if python -c "exit(0 if float('$S') <= 0.84 else 1)"; then
    P=$(probe_par | tail -1)
    echo "attempt $attempt par=$P" >> "$LOG"
    if python -c "exit(0 if float('$P') <= 1.48 else 1)"; then
      ( cd "$CLONE" && SPARK_GRAFT_CPUS=$CPUS python bench.py 2>"$OUT.stderr" | tail -1 > "$OUT.line" )
      python - "$OUT" "$LOG" <<'EOF'
import json, sys
out, log = sys.argv[1], sys.argv[2]
line = open(out + ".line").read().strip()
d = json.loads(line)
json.dump(d, open(out, "w"), indent=1)
ok = d.get("canary_ok") and d.get("plausible_ok") is not False
with open(log, "a") as f:
    f.write(f"bench: value={d['value']} steady={d.get('steady_total')} canary_ok={d.get('canary_ok')} plausible_ok={d.get('plausible_ok')} -> {'KEEP' if ok else 'REFUSED'}\n")
sys.exit(0 if ok else 1)
EOF
      if [ $? -eq 0 ]; then echo "KEPT on attempt $attempt" >> "$LOG"; exit 0; fi
    fi
  fi
  sleep 45
done
echo "no gates-green window in 6 attempts" >> "$LOG"
exit 1
