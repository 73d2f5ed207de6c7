#!/usr/bin/env bash
# Differential fuzz drive: generate N random common-dialect queries,
# run them on Spark (FuzzRunner) and DuckDB (check_oracles.py, the
# driver's pandas-canonicalized comparator), and demand 100% agreement.
# Both engines evaluate the identical SQL text, so any mismatch is a
# real cross-engine semantic divergence.
#
# usage: tools/fuzz.sh [seed] [n] [sfDir]
set -euo pipefail
cd "$(dirname "$0")/.."
SEED="${1:-6}"
N="${2:-60}"
SF="${3:-/root/testdata/sf0.01}"
OUT=/tmp/graft_fuzz_${SEED}
LOG=/tmp/graft_fuzz_${SEED}.log
# A stale dump from a previous run must never be comparable: remove it
# BEFORE sbt runs, so an sbt failure leaves nothing for the comparator.
rm -rf "$OUT"
python3 tools/gen_fuzz.py "$SF" "$SEED" "$N" /tmp/fuzz_${SEED}.tsv
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.FuzzRunner $SF /tmp/fuzz_${SEED}.tsv $OUT" > "$LOG" 2>&1 \
  || { echo "[fuzz] sbt/FuzzRunner FAILED (seed=$SEED); tail of $LOG:"; tail -n 40 "$LOG"; exit 1; }
grep -E "\[fuzz\]|^\[success" "$LOG" || true
echo "[fuzz] DuckDB differential compare"
st=0
RES="$(python3 tools/check_oracles.py "$OUT" "$SF")" || st=$?
echo "$RES" | grep -E "^FAIL|pass / " || true
if [ "$st" -ne 0 ] || ! echo "$RES" | grep -q " 0 fail"; then
  echo "[fuzz] RED (seed=$SEED, comparator exit=$st)"; exit 1
fi
echo "[fuzz] GREEN seed=$SEED n=$N $(git rev-parse --short HEAD 2>/dev/null || true)"
# optional provenance-stamped artifact (round_artifacts.sh sets FUZZ_JSON)
if [ -n "${FUZZ_JSON:-}" ]; then
  PASS=$(echo "$RES" | grep -oE "[0-9]+ pass" | grep -oE "[0-9]+")
  printf '{"context":{"engine":"graft-spark","commit":"%s","testdata_mtime":%s,"sf_dir":"%s"},"seed":%s,"generated":%s,"pass":%s,"fail":0}\n' \
    "$(git rev-parse HEAD 2>/dev/null || echo unknown)" \
    "$(stat -c %Y "$SF"/lineitem.parquet)" "$SF" "$SEED" "$N" "$PASS" \
    > "$FUZZ_JSON"
  echo "[fuzz] artifact -> $FUZZ_JSON"
fi
