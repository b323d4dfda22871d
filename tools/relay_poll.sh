#!/bin/bash
# Poll the axon TPU relay until it answers, then exit 0 (used as a
# background watcher: its exit signals "relay is back — start
# tools/hw_runbook.sh").  Probes are short (60s timeout) and serialized;
# exits 1 after the deadline (default 11h) so it cannot outlive the round.
DEADLINE=$(( $(date +%s) + ${1:-39600} ))
n=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  n=$((n+1))
  if timeout 90 python -c "import jax; print(jax.devices())" \
      >/tmp/relay_probe.log 2>&1; then
    echo "relay UP after $n probes: $(cat /tmp/relay_probe.log)"
    exit 0
  fi
  sleep 240
done
echo "relay never answered ($n probes)"
exit 1
