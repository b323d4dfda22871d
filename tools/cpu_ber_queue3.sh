#!/bin/bash
# Third-wave CPU BER queue: the remainder of queue2, which was cut mid-
# ber4000 when the previous session ended.  run_ber_curves.py now passes
# a per-curve sweep checkpoint (benchmarks/ber_data/ckpt_<id>.json), so
# a kill/timeout resumes mid-point; the 4000x2000 checkpoint was seeded
# from the interrupted run's log (points 1.0-2.25 dB complete, the 2.50
# tail resumes at 2.55M frames / 2 FE).
cd "$(dirname "$0")/.." || exit 1
mkdir -p benchmarks/logs
export JAX_PLATFORMS=cpu
export PYTHONPATH=/root/repo:/root/.axon_site

run() { # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$tmo" "$@" >"benchmarks/logs/$name.log" 2>&1
  local rc=$?
  echo "== $name done rc=$rc ($(date +%H:%M:%S)) =="
}

run ber4000 14400 python tools/run_ber_curves.py \
  --only 4000x2000_OMS_10 --max-frames 10000000
run ber21600 21600 python tools/run_ber_curves.py \
  --only 64800x21600_OMS_10 --max-frames 2000000 --timer-s 7200
run topup_2304 7200 python tools/topup_points.py \
  --curve 2304x1152_NMS_10 --snr 2.75 \
  --max-fe 100 --max-frames 20000000 --batch 8192
run topup_64800 14400 python tools/topup_points.py \
  --curve 64800x32400_OMS_10 --snr 1.875 --snr 2.0 \
  --max-fe 100 --max-frames 1000000 --batch 512
echo "== queue3 complete =="
