#!/usr/bin/env bash
# Regenerate every round proof artifact at HEAD, in dependency order.
# All outputs carry {commit, testdata_mtime} provenance stamps.
# usage: tools/round_artifacts.sh <round-tag>   (e.g. r5)
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?usage: tools/round_artifacts.sh <round-tag>}"
SF01=/root/testdata/sf0.01
SF1=/root/testdata/sf0.1
REP=/tmp/graft_${TAG}_sf1x
VOUT=/tmp/graft_${TAG}_verify
COUT=/tmp/graft_${TAG}_cluster

echo "=== [1/6] 10x replica (ScaleUp) -> $REP"
[ -d "$REP/lineitem.parquet" ] || \
  sbt -batch "runMain graft.ScaleUp $SF1 $REP 10" > /tmp/${TAG}_scaleup.log 2>&1
echo "=== [2/6] BenchFull @ sf0.1"
sbt -batch "runMain graft.BenchFull $SF1 bench_results/${TAG}_sf0.1.json 3" \
  > /tmp/${TAG}_bench01.log 2>&1
echo "=== [3/6] BenchFull @ 10x replica"
sbt -batch "runMain graft.BenchFull $REP bench_results/${TAG}_sf1x.json 3" \
  > /tmp/${TAG}_bench1x.log 2>&1
echo "=== [4/6] ClusterCheck (full registry, 2 executor JVMs) @ sf0.01"
SPARK_SCALA_VERSION=2.13 sbt -batch "runMain graft.ClusterCheck $SF01 $COUT" \
  > /tmp/${TAG}_cluster.log 2>&1
python3 tools/clustercheck_artifact.py "$COUT" "$SF01" \
  bench_results/${TAG}_clustercheck.json
echo "=== [5/6] oracle_sql.json dump for anchors"
SPARK_GRAFT_CPUS=16 sbt -batch "runMain graft.Verify $SF01 $VOUT" \
  > /tmp/${TAG}_verify.log 2>&1
echo "=== [6/6] DuckDB anchors"
python3 tools/duckdb_anchor.py "$VOUT/oracle_sql.json" "$SF1" \
  bench_results/${TAG}_sf0.1.json 3 > bench_results/${TAG}_duckdb_anchor_sf0.1.md
python3 tools/duckdb_anchor.py "$VOUT/oracle_sql.json" "$REP" \
  bench_results/${TAG}_sf1x.json 3 > bench_results/${TAG}_duckdb_anchor_sf1x.md
# extension-layer anchor: every non-TPC-H oracle query at sf0.1
python3 tools/duckdb_anchor.py "$VOUT/oracle_sql.json" "$SF1" \
  bench_results/${TAG}_sf0.1.json 3 '^(?!q\d\d)' \
  > bench_results/${TAG}_duckdb_anchor_ext_sf0.1.md
echo "=== done"
