#!/bin/bash
# Seventh-wave CPU BER queue (run AFTER queue6): the last two registry
# families without waterfalls — 9972x4986 (largest non-QC code) and the
# DVB-T2 short 16200x7560 (staircase QC view, 1/4 the 64800 block).
. "$(dirname "$0")/queue_lib.sh"

run ber9972 14400 python tools/run_ber_curves.py \
  --only 9972x4986_OMS_10 --max-frames 5000000
run ber16200 14400 python tools/run_ber_curves.py \
  --only 16200x7560_OMS_10 --max-frames 3000000
echo "== queue7 complete =="
