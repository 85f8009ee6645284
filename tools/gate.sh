#!/usr/bin/env bash
# Full local gate: compile, unit tests, tri-scale DuckDB-oracle verify,
# and the sf0.1 bench. Mirrors what the round driver checks.
#
# Usage: tools/gate.sh [--quick]
#   --quick: sf0.01 verify only (skip sf0.001/sf0.1 and the bench)
set -euo pipefail
cd "$(dirname "$0")/.."

quick=${1:-}

echo "== compile + test =="
sbt -batch compile test

verify_at() {
  local sf="$1" out="/tmp/graft_gate_$1"
  echo "== verify sf$sf =="
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
    sbt -batch "runMain graft.Verify /root/testdata/sf$sf $out"
  python3 tools/check.py "$out" "/root/testdata/sf$sf"
}

verify_at 0.01
if [[ "$quick" != "--quick" ]]; then
  verify_at 0.001
  verify_at 0.1
  echo "== bench sf0.1 =="
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" | grep '"metric"'
fi
echo "== gate green =="
