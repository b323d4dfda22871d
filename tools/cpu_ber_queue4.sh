#!/bin/bash
# Fourth-wave CPU BER queue (run AFTER queue3): the two new coverage
# curves added in round 2 — the deg-32 2048x384 code and the Rayleigh
# fading channel demonstration (both probed on CPU; ranges in
# run_ber_curves.py CURVES).
. "$(dirname "$0")/queue_lib.sh"

run ber2048 14400 python tools/run_ber_curves.py \
  --only 2048x384_OMS_10 --max-frames 10000000
run ber_rayleigh 14400 python tools/run_ber_curves.py \
  --only 576x288_OMS_10_rayleigh --max-frames 10000000
echo "== queue4 complete =="
