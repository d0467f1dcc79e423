#!/bin/bash
# Shuffle-zstd-level experiment on the 16M fixture (VERDICT r6 scaling item):
# interleaved 32-core byte audits alternating spark.io.compression.zstd.level
# 1 (default) and 3, parquet zstd level constant. Appends one JSON line per
# audit to $OUT. Builder tooling only.
set -u
JAR=${JAR:-target/scala-2.13/e2ebridgespark_2.13-0.1.0.jar}
OUT=${OUT:-/tmp/zstd_level_r6.jsonl}
REPS=${REPS:-2}

memgbs() {
  python3 - <<'PYEOF'
import time
b = bytearray(512*1024*1024)
t0=time.time(); c = bytes(b); dt=time.time()-t0
print(f"{0.5/dt:.2f}")
PYEOF
}

audit() {
  local LVL=$1
  taskset -c 0-31 /opt/spark/bin/spark-submit --master local[32] --driver-memory 16g \
    --driver-java-options "-XX:+UseParallelGC -Xms16g" \
    --conf spark.ui.enabled=false --conf spark.local.dir=/dev/shm/spark-local \
    --conf spark.sql.shuffle.partitions=32 \
    --conf spark.io.compression.codec=zstd \
    --conf spark.io.compression.zstd.level=$LVL \
    --conf spark.sql.parquet.compression.codec=zstd \
    --class graft.bench.ScalingBench "$JAR" audit 32 64000 250 2>/dev/null \
    | grep '"mode":"audit"'
}

for r in $(seq 1 $REPS); do
  for LVL in 1 3; do
    BW=$(memgbs)
    LINE=$(audit $LVL)
    echo "{\"rep\":$r,\"zstd_level\":$LVL,\"bw_gbs\":$BW,\"audit\":$LINE}" >> "$OUT"
    tail -1 "$OUT"
  done
done
