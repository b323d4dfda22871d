#!/bin/bash
# Round-3 queue B (native AVX-512 decoder + philox channel): the QPSK
# blind-spot curve, the two remaining suite families, then hard-100-FE
# deep-tail top-ups (budgets sized from current tail FERs; every job
# checkpoints and is resumable).
. "$(dirname "$0")/queue_lib.sh"
run berqpsk 7200 python tools/run_ber_curves.py \
  --only 576x288_OMS_10_qpsk-coded --max-frames 3000000
run ber4896 7200 python tools/run_ber_curves.py \
  --only 4896x2448_OMS_10 --max-frames 2000000
run ber20000 10800 python tools/run_ber_curves.py \
  --only 20000x10000_OMS_10 --max-frames 1000000
run topup_4000_r3 16200 python tools/topup_points.py \
  --curve 4000x2000_OMS_10 --snr 2.25 --snr 2.5 \
  --max-fe 100 --max-frames 300000000 --batch 16384 \
  --backend native --channel-rng philox
run topup_8000_20 7200 python tools/topup_points.py \
  --curve 8000x4000_OMS_10 --snr 2.0 \
  --max-fe 100 --max-frames 10000000 --batch 8192 \
  --backend native --channel-rng philox
run topup_9972 10800 python tools/topup_points.py \
  --curve 9972x4986_OMS_10 --snr 2.0 \
  --max-fe 100 --max-frames 100000000 --batch 8192 \
  --backend native --channel-rng philox
run tail_1944_30 10800 python tools/topup_points.py \
  --curve 1944x972_OMS_10 --snr 3.0 \
  --max-fe 100 --max-frames 400000000 --batch 16384 \
  --backend native --channel-rng philox
# stretch: tighten the 8000x4000 2.25 dB zero-FE upper bound
run topup_8000_225 7200 python tools/topup_points.py \
  --curve 8000x4000_OMS_10 --snr 2.25 \
  --max-fe 100 --max-frames 120000000 --batch 8192 \
  --backend native --channel-rng philox
echo "== queueB complete =="
