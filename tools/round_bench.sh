#!/bin/bash
# Round bench ritual (VERDICT r12 #8): the sf0.1 headline bench AND the
# scale regression gate run from ONE command path, so a scale regression
# (like r12's q68 raw-shingle exchange) is caught the round it lands, not
# at the next ad-hoc 100x run.
#
#   tools/round_bench.sh 13            # -> bench JSON on stdout, SCALE_r13.json
#   SCALE_POINTS=1,10,100 tools/round_bench.sh 13   # deep curve instead
#
# The standing gate is 1,10 (fast, ~2 min); a full 1,10,100 curve is run
# when scale-relevant code changed.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: round_bench.sh <round-number>}"
POINTS="${SCALE_POINTS:-1,10}"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '{"metric"'

# no failure masking (a swallowed nonzero exit once echoed success over a
# dead run): remove any stale sidecar FIRST (a leftover from a prior run
# would satisfy the existence check below — ADVICE r13 #1), keep the full
# log, surface the [scale] lines, and PROVE the sidecar exists before
# claiming it — with `|| exit`, not `test && echo` (which under set -e
# silently continues when the test fails)
rm -f "SCALE_r${ROUND}.json"
# 12g driver heap: the lake_files_1e6_* families (r20) hold a 10⁶-entry
# manifest driver-side; the 8g default leaves too little headroom on top
# of the rest of the curve's state
SPARK_GRAFT_SCALE_POINTS="$POINTS" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SCALE_OUT="SCALE_r${ROUND}.json" \
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-12g}" \
  sbt -batch "runMain graft.ScaleBench" > /tmp/scalebench_r${ROUND}.log 2>&1 \
  || { echo "ScaleBench FAILED; tail of /tmp/scalebench_r${ROUND}.log:"; \
       tail -30 "/tmp/scalebench_r${ROUND}.log"; exit 1; }
grep -E '^\[scale\]' "/tmp/scalebench_r${ROUND}.log"
test -s "SCALE_r${ROUND}.json" \
  || { echo "SCALE_r${ROUND}.json missing/empty — run produced no artifact"; exit 1; }
echo "wrote SCALE_r${ROUND}.json"
# the gate must GATE: a DNF point (fatal or not, measured or recall —
# both print ': DNF'), a measurement flagged suspect after a fatal error,
# a broken rows law, a drifted plan or a missing 1x base all exit nonzero
# here, not just print a line
GATE_RE='ok=false|plan_same=false|NO_BASE|(: |x )DNF|SUSPECT'
if grep -qE "$GATE_RE" "/tmp/scalebench_r${ROUND}.log"; then
  echo "SCALE GATE FAILED — offending points:"
  grep -E "$GATE_RE" "/tmp/scalebench_r${ROUND}.log"
  exit 1
fi
