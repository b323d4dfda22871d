#!/bin/bash
# Ninth-wave CPU BER queue (run AFTER queue8): waterfalls for the two
# remaining suite-benched families (4896x2448, 20000x10000) so every
# family in bench/suite.py CONFIGS has a statistical anchor in BER.md.
# Ranges are set by the probes in the curve declarations (run_ber_curves).
. "$(dirname "$0")/queue_lib.sh"

run ber4896 14400 python tools/run_ber_curves.py \
  --only 4896x2448_OMS_10 --max-frames 2000000
run ber20000 18000 python tools/run_ber_curves.py \
  --only 20000x10000_OMS_10 --max-frames 1000000
echo "== queue9 complete =="
