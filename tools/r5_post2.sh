#!/bin/bash
# Round-5 retries (run AFTER r5_post.sh):
#   spot64800 — the 64800x32400 ET spot that crashed on the ET-VMEM
#               tile bug (now fixed: ET-aware tile pick routes it to
#               pallas-streamed); exercises the fix end-to-end on chip
#   gather    — the 9972x4986 chunked-vs-xla pair that hit a transient
#               remote-compile read error (other three pairs cached)
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
run spot64800 5400 python tools/ber_spotcheck.py --only 64800
run validate_gather2 5400 python tools/hw_validate.py --which gather
echo "== r5 post2 complete ($(date +%H:%M:%S)) =="
