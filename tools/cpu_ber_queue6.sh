#!/bin/bash
# Sixth-wave CPU BER queue: convert the remaining adaptive-shrink tails
# into hard-100-FE measurements now every curve exists (cheapest first so
# partial progress is maximal).  The 8000x4000 2.25 dB zero-FE point is
# left as a frame-budget upper bound (even ~10 FE needs >20M frames).
. "$(dirname "$0")/queue_lib.sh"

run topup_21600 14400 python tools/topup_points.py \
  --curve 64800x21600_OMS_10 --snr 2.5 --snr 2.625 \
  --max-fe 100 --max-frames 500000 --batch 512
run topup_576_5it 7200 python tools/topup_points.py \
  --curve 576x288_OMS_5 --snr 4.0 \
  --max-fe 100 --max-frames 10000000 --batch 16384
run topup_2048 14400 python tools/topup_points.py \
  --curve 2048x384_OMS_10 --snr 4.5 \
  --max-fe 100 --max-frames 12000000 --batch 2048
run topup_4000 21600 python tools/topup_points.py \
  --curve 4000x2000_OMS_10 --snr 2.5 \
  --max-fe 100 --max-frames 60000000 --batch 4096
echo "== queue6 complete =="
