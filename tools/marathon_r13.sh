#!/bin/bash
# Round-13 graded bench campaign: four sequential marathons from one
# classes snapshot, no concurrent load. Run via tools/bench.sh's JVM
# flags; artifacts land in the repo root exactly as the driver's runs
# would name them.
set -uo pipefail
cd /root/repo
SNAP=/tmp/graft_cls_marathon
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"
export GRAFT_CLS="$SNAP"
export SPARK_GRAFT_CPUS=32

echo "=== sf0.1 full (runs=2) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  tools/bench.sh graft.Bench > /tmp/bench_r13_sf01.log 2>&1
echo "sf0.1 exit=$?"

echo "=== sf1 full (runs=2) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1 \
  SPARK_GRAFT_BENCH_BASELINE=BENCH_sf1.json \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
  tools/bench.sh graft.Bench > /tmp/bench_r13_sf1.log 2>&1
echo "sf1 exit=$?"

echo "=== sf10 subset (runs=1, warm base = fresh sf1) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_BASELINE=BENCH_sf10.json \
  SPARK_GRAFT_WARM_BASE=BENCH_sf1.json \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10.json \
  tools/bench.sh graft.Bench $(cat tools/sf10_queries.txt) \
  > /tmp/bench_r13_sf10.log 2>&1
echo "sf10 exit=$?"

echo "=== sf10 pair family (runs=1, warm base = fresh sf1) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf10 \
  SPARK_GRAFT_BENCH_RUNS=1 \
  SPARK_GRAFT_BENCH_BASELINE=BENCH_sf10_pairs.json \
  SPARK_GRAFT_WARM_BASE=BENCH_sf1.json \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf10_pairs.json \
  tools/bench.sh graft.Bench $(cat /tmp/pair_queries.txt) \
  > /tmp/bench_r13_sf10_pairs.log 2>&1
echo "pairs exit=$?"
echo "=== campaign done ==="
