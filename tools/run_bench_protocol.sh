#!/bin/bash
# 6-run bench protocol: 3 forward + 3 reverse, fresh JVM each, sf0.1.
# Output: bench_r12/{fwd,rev}_{1,2,3}.json (JSONL: per-query rows + summary).
set -u
OUT=${1:-bench_r12}
CP="${CLASSES:-/root/repo/target/scala-2.13/classes}:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
mkdir -p "$OUT"
for i in 1 2 3; do
  for ord in fwd rev; do
    [ "$ord" = rev ] && export SPARK_GRAFT_BENCH_ORDER=reverse || unset SPARK_GRAFT_BENCH_ORDER
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    java -Xmx96g --add-exports java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens java.base/java.lang=ALL-UNNAMED \
      --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
      --add-opens java.base/java.util=ALL-UNNAMED \
      --add-opens java.base/java.nio=ALL-UNNAMED \
      --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
      -cp "$CP" graft.Bench > "$OUT/${ord}_${i}.json" 2>"$OUT/${ord}_${i}.log"
    echo "done $OUT/${ord}_${i}.json rc=$?"
  done
done
