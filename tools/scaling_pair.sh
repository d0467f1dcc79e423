#!/bin/bash
# One interleaved scaling pair (BENCH/BASELINE.md protocol): memcpy probe,
# local[8] build, local[32] build, memcpy probe. Appends one JSON line per
# pair to $OUT. Builder tooling only.
set -u
JAR=${JAR:-target/scala-2.13/e2ebridgespark_2.13-0.1.0.jar}
OUT=${OUT:-/tmp/scaling_r3.jsonl}
TAG=${1:-pair}

memgbs() {
  python3 - <<'EOF'
import time
b = bytearray(512*1024*1024)
t0=time.time(); c = bytes(b); dt=time.time()-t0
print(f"{0.5/dt:.2f}")
EOF
}

run_w() {
  local N=$1 CPUS=$2
  taskset -c $CPUS /opt/spark/bin/spark-submit --master local[$N] --driver-memory 16g \
    --driver-java-options "-XX:+UseParallelGC -Xms16g" \
    --conf spark.ui.enabled=false --conf spark.local.dir=/dev/shm/spark-local \
    --conf spark.sql.shuffle.partitions=$N \
    --conf spark.io.compression.codec=${IO_CODEC:-zstd} \
    --conf spark.sql.parquet.compression.codec=${PQ_CODEC:-zstd} \
    --conf spark.io.compression.zstd.level=${ZSTD_LEVEL:-1} \
    --conf spark.hadoop.parquet.compression.codec.zstd.level=${PQ_ZSTD_LEVEL:-3} \
    --class graft.bench.ScalingBench "$JAR" run $N 64000 250 1 2>/dev/null \
    | grep -E 'rep1' | sed -E 's/.*turns\/sec=([0-9.]+) \| (.*)/\1|\2/'
}

# Probe gate (VERDICT r4 #1): when GATE_MIN_BW is set, wait for a window
# whose memcpy probe clears it (up to GATE_TRIES probes, GATE_SLEEP s apart)
# before burning ~10 min on a pair. A healthy >=2 GB/s window is the one
# condition under which raw efficiency can reach the criterion's 0.8 on this
# host (round 2 measured 2.57x at 2+ GB/s); degraded windows still produce
# valid SAME-WINDOW ratios, so after the tries run out we proceed anyway and
# the recorded bw tells the reader which regime the pair saw.
BW0=$(memgbs)
if [ -n "${GATE_MIN_BW:-}" ]; then
  tries=${GATE_TRIES:-5}
  while python3 -c "exit(0 if $BW0 < $GATE_MIN_BW else 1)" && [ "$tries" -gt 0 ]; do
    echo "[gate] bw=$BW0 < $GATE_MIN_BW GB/s, waiting (${tries} tries left)"
    sleep "${GATE_SLEEP:-60}"
    BW0=$(memgbs)
    tries=$((tries - 1))
  done
fi
# ORDER=32first runs the wide leg first. Alternate across pairs: with the
# narrow leg always first, a window whose bandwidth decays DURING the pair
# (this host does that) systematically hands the wide leg the worse half —
# an anti-32 bias the per-pair before/after probes can see but not remove.
if [ "${ORDER:-8first}" = "32first" ]; then
  R32=$(run_w 32 0-31)
  R8=$(run_w 8 0-7)
else
  R8=$(run_w 8 0-7)
  R32=$(run_w 32 0-31)
fi
BW1=$(memgbs)
T8=${R8%%|*}; W8=${R8#*|}
T32=${R32%%|*}; W32=${R32#*|}
EFF=$(python3 -c "print(f'{($T32/$T8)/4:.3f}')" 2>/dev/null || echo null)
echo "{\"tag\":\"$TAG\",\"order\":\"${ORDER:-8first}\",\"bw_before_gbs\":$BW0,\"bw_after_gbs\":$BW1,\"t8\":$T8,\"t32\":$T32,\"raw_eff\":$EFF,\"w8\":\"$W8\",\"w32\":\"$W32\"}" >> "$OUT"
tail -1 "$OUT"
