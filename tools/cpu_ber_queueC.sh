#!/bin/bash
# Round-3 queue C: everything the container reset killed, re-ordered by
# value.  Run AFTER tools/hw_runbook.sh finishes — the native engine
# saturates all 4 host cores and would contaminate the relay's dispatch
# timing (slope harness) if run concurrently with chip measurements.
#
#  1. deep-tail 100-FE top-ups on the paper's non-QC headline codes
#     (native AVX-512 engine + philox channel — VERDICT r2 weak #5);
#  2. the 16200x10800 staircase zero/coded twin overlay (xla CPU —
#     native refuses staircase QC-view check order; VERDICT r2 #4);
#  3. stretch tails (9972, 1944 @3.0 dB, 8000 @2.25 dB).
# Every job checkpoints and is resumable; rerunning this script skips
# or resumes completed work.
. "$(dirname "$0")/queue_lib.sh"

run topup_4000_r3 16200 python tools/topup_points.py \
  --curve 4000x2000_OMS_10 --snr 2.25 --snr 2.5 \
  --max-fe 100 --max-frames 300000000 --batch 16384 \
  --backend native --channel-rng philox
run topup_8000_20 7200 python tools/topup_points.py \
  --curve 8000x4000_OMS_10 --snr 2.0 \
  --max-fe 100 --max-frames 10000000 --batch 8192 \
  --backend native --channel-rng philox
run ber16200zero 14400 python tools/run_ber_curves.py \
  --only 16200x10800_OMS_10_zero-info --max-frames 1500000
run ber16200coded 18000 python tools/run_ber_curves.py \
  --only 16200x10800_OMS_10_coded-info --max-frames 1500000
run topup_9972 10800 python tools/topup_points.py \
  --curve 9972x4986_OMS_10 --snr 2.0 \
  --max-fe 100 --max-frames 100000000 --batch 8192 \
  --backend native --channel-rng philox
run tail_1944_30 10800 python tools/topup_points.py \
  --curve 1944x972_OMS_10 --snr 3.0 \
  --max-fe 100 --max-frames 400000000 --batch 16384 \
  --backend native --channel-rng philox
run topup_8000_225 7200 python tools/topup_points.py \
  --curve 8000x4000_OMS_10 --snr 2.25 \
  --max-fe 100 --max-frames 120000000 --batch 8192 \
  --backend native --channel-rng philox
echo "== queueC complete =="
