#!/bin/bash
# Hardware runbook: every chip-bound job of this round, run SERIALLY
# (the relay grants the chip to one process; concurrency wedges it).
# Each step is independently resumable; logs land in benchmarks/logs/.
#
#   bash tools/hw_runbook.sh [step ...]   # default: all steps in order
#
# Steps:
#   probe     - 90s device probe (abort the runbook if the relay is down)
#   suite     - full throughput suite -> RESULTS.md   (VERDICT item 1)
#   validate  - streamed+gather hw validation         (VERDICT items 2,7)
#   et        - early-termination study -> ET.md      (VERDICT item 5)
#   profile   - 1944x972 outlier investigation        (VERDICT item 8)
#   bench     - the driver's one-line bench.py JSON
#
# BER curves are NOT here: they are backend-independent by construction
# (bit-exact decoders, counter-based threefry channel) and run on CPU via
# tools/cpu_ber_queue.sh — the chip is reserved for throughput work.
cd "$(dirname "$0")/.." || exit 1
mkdir -p benchmarks/logs
STEPS=("$@")
# bench runs FIRST after the probe (secures a non-stale headline figure
# even if the relay window closes mid-runbook) and again LAST (so the
# recorded number benefits from the suite's warm compile cache).
# compile (gather-kernel compile pricing) runs BEFORE the suite so a
# compile-service blowup on the big unrolled kernels is measured, not
# hit blind inside the timed suite (VERDICT r2 next-step 2).
[ ${#STEPS[@]} -eq 0 ] && STEPS=(probe bench compile suite validate et profile bench)

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$tmo" "$@" 2>&1 | tee "benchmarks/logs/$name.log"
  local rc=${PIPESTATUS[0]}
  echo "== $name done rc=$rc =="
  return "$rc"
}

for s in "${STEPS[@]}"; do
  case $s in
    probe)
      run probe 120 python -c "import jax; print(jax.devices())" || exit 1 ;;
    compile)
      run compile 7200 python tools/hw_validate.py --which compile ;;
    suite)
      run suite 14400 python -m ldpcgputegra_tpu.bench.suite ;;
    validate)
      run validate 7200 python tools/hw_validate.py --which qc,streamed,gather ;;
    et)
      run et 7200 python tools/run_et_study.py ;;
    profile)
      run profile 3600 python tools/profile_1944.py ;;
    bench)
      run bench 3600 python bench.py ;;
    *) echo "unknown step $s"; exit 2 ;;
  esac
done
