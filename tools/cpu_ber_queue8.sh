#!/bin/bash
# Eighth-wave CPU BER queue (run AFTER queue7): the all-zero-codeword
# blind-spot closure (VERDICT r2 #4) — the 16200x10800 zero/coded twin
# overlay with info-bit counting, and the QPSK random-coded curve —
# then resume the 4000x2000 2.5 dB deep-tail top-up with whatever wall
# clock remains.
. "$(dirname "$0")/queue_lib.sh"

run ber16200zero 14400 python tools/run_ber_curves.py \
  --only 16200x10800_OMS_10_zero-info --max-frames 1500000
run ber16200coded 18000 python tools/run_ber_curves.py \
  --only 16200x10800_OMS_10_coded-info --max-frames 1500000
run berqpsk 14400 python tools/run_ber_curves.py \
  --only 576x288_OMS_10_qpsk-coded --max-frames 3000000
run topup_4000_r3 18000 python tools/topup_points.py \
  --curve 4000x2000_OMS_10 --snr 2.5 \
  --max-fe 100 --max-frames 60000000 --batch 4096
echo "== queue8 complete =="
