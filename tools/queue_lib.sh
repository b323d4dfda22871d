# Shared preamble + run() helper for the CPU BER queue scripts.
# Source from a queue script (after `cd` guards are unnecessary — this
# handles cwd, logs dir, and the CPU platform env):
#   . "$(dirname "$0")/queue_lib.sh"
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
