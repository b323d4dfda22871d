#!/bin/bash
# Round-5 hardware queue — every chip-bound deliverable still open, run
# SERIALLY (the relay grants the chip to one process; concurrency wedges
# it).  Each step logs to benchmarks/logs/ and the expensive step (suite)
# checkpoints per row, so a timeout resumes instead of re-paying the
# remote compiles (the container reset wiped ~/.cache/ldpcgputegra_tpu).
#
# Order rationale:
#   bench    first — a non-stale headline lands even if the window closes
#   air      VERDICT r4 #3 — AIR.md is currently EMPTY (harness reworked,
#            never ran on silicon)
#   suite    VERDICT r4 #1b/#4/#6 — RESULTS.md refresh: padded-Z 1944x972,
#            mosaic-audited chunked rows, the 16-row registry tail
#   suite(2) resume pass in case the first attempt hit the timeout
#   validate VERDICT r4 #1c/#4 — HWVALIDATE rows incl. tail + 20000
#            stream + 9972 sub=8 + synthqc-z1024 streamed pair; runs
#            AFTER suite so the tail executables hit the compile cache
#   profile  VERDICT r4 #7 — 16200x7560 weak-row investigation
#   bench    again with the suite's warm cache
cd "$(dirname "$0")/.." || exit 1
mkdir -p benchmarks/logs

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$tmo" "$@" 2>&1 | tee -a "benchmarks/logs/$name.log"
  local rc=${PIPESTATUS[0]}
  echo "== $name done rc=$rc ($(date +%H:%M:%S)) =="
  return "$rc"
}

run probe 120 python -c "import jax; print(jax.devices())" || exit 1
run bench 3600 python bench.py
run air 10800 python tools/run_air_bench.py
run suite 18000 python -m ldpcgputegra_tpu.bench.suite
run suite 10800 python -m ldpcgputegra_tpu.bench.suite
run validate 10800 python tools/hw_validate.py --which compile,qc,streamed,gather,tail
run profile16200 7200 python tools/profile_16200.py
run bench 1800 python bench.py
echo "== r5 runbook complete ($(date +%H:%M:%S)) =="
