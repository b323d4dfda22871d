#!/bin/bash
# Round-5 post-queue follow-ups (serial, one TPU process at a time):
#   airscan — scan-folded dispatch rows appended to AIR.md (lifts the
#             dispatch-bound 576x288 row toward decode-bound)
#   etk1    — tail-tuned k1=6/7 two-phase points (the k1=5 fat-tail
#             losses were a k1 choice, not a mechanism limit)
#   etdiag  — does per-tile iteration predication actually skip?
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
# FIRST: the BER spot check.  Round 4 claimed it DONE without running
# it; the round-5 first session ran it but its BER.md append was never
# committed (lost with the container reset) — the records must land in
# the committed BER.md this time, before anything else can preempt the
# window.
run spotcheck 5400 python tools/ber_spotcheck.py
# the gather pairs the 3-hour validate timeout cut off (VERDICT r4 #1c:
# the 20000x10000 stream-mode pair and the 9972x4986 sub=8 pair)
run validate_gather 5400 python tools/hw_validate.py --which gather
# re-time every suite row min-of-3 against the warm compile cache: the
# first pass's single-shot rows carry ~2x relay wall jitter (2304x1152
# 10it measured 7.07 ms vs round-4's 5.39 under host contention)
run remeasure 7200 python -m ldpcgputegra_tpu.bench.suite --remeasure --repeats 3
# rerun of the crashed profile (per-variant failure now caught; adds
# the production-relevant full_tb128 A/B) — compiles all cached
run profile16200 3600 python tools/profile_16200.py
run airscan 7200 python tools/run_air_bench.py --scan-only
run etk1 5400 python tools/run_et_pipelined.py --only k6
run etk1 3600 python tools/run_et_pipelined.py --only k7
run etdiag 3600 python tools/et_skip_diag.py
# CPU-only: regenerate the roofline audit (now incl. streamed rows)
run audit 3600 python tools/audit_ops.py
echo "== r5 post-runbook complete ($(date +%H:%M:%S)) =="
