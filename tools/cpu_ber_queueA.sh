#!/bin/bash
# Round-3 queue A (xla, staircase codes — native backend not applicable):
# the 16200x10800 blind-spot twin overlay (VERDICT r2 #4).
. "$(dirname "$0")/queue_lib.sh"
run ber16200zero 14400 python tools/run_ber_curves.py \
  --only 16200x10800_OMS_10_zero-info --max-frames 1500000
run ber16200coded 18000 python tools/run_ber_curves.py \
  --only 16200x10800_OMS_10_coded-info --max-frames 1500000
echo "== queueA complete =="
