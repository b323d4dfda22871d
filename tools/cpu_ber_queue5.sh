#!/bin/bash
# Fifth-wave CPU BER queue (run AFTER queue4): the 5-iteration operating
# point (the paper's second benchmark config) and the 8000x4000 non-QC
# gather-path code.
. "$(dirname "$0")/queue_lib.sh"

run ber576_5it 14400 python tools/run_ber_curves.py \
  --only 576x288_OMS_5 --max-frames 10000000
run ber8000 14400 python tools/run_ber_curves.py \
  --only 8000x4000_OMS_10 --max-frames 3000000
echo "== queue5 complete =="
