#!/usr/bin/env bash
# On-chip validation queue for the dev TPU relay.
#
# Runs every pending round-4 hardware check in one shot, each step
# bounded and logged separately, so a single relay window covers the
# whole backlog even if the session isn't watching.  Steps (in order of
# value):
#   0. generate a synthetic capture for steps 2-4
#   1. compiled-kernel selftest (13 checks, NON-interpret)
#   2. cli verify (golden parity on chip)
#   3. bench --compare (the enabled reference verification loop)
#   4. detect --cluster smoke (objects path on hardware)
#   5. OS hits-vs-rank A/B (scripts/os_hits_ab.py)
#   6. fresh bench.py headline (full JSON line)
#   7. scoped-VMEM limit x rows sweep (scripts/vmem_sweep.py; 6 combos,
#      each its own 1200 s-bounded subprocess)
#
# Usage: bash scripts/onchip_queue.sh [logdir]   (default /tmp/onchip_r4)
# Each step writes <logdir>/NN_name.log and a PASS/FAIL line to
# <logdir>/summary.txt.  Safe to re-run; steps are independent.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/onchip_r4}
mkdir -p "$LOG"
: > "$LOG/summary.txt"

step() {
  local name=$1 tmo=$2; shift 2
  local f="$LOG/${name}.log"
  echo "=== $name (timeout ${tmo}s) $(date -u +%H:%M:%S) ==="
  if timeout "$tmo" "$@" >"$f" 2>&1; then
    echo "PASS $name" | tee -a "$LOG/summary.txt"
  else
    echo "FAIL $name (rc=$?)" | tee -a "$LOG/summary.txt"
    tail -5 "$f"
  fi
}

# 0. quick device probe so a dead relay fails fast instead of eating
#    the per-step timeouts one by one.
if ! timeout 120 python -c 'import jax; assert jax.devices()[0].platform == "tpu"' 2>/dev/null; then
  echo "FAIL device-probe (relay down)" | tee -a "$LOG/summary.txt"
  exit 1
fi
echo "PASS device-probe" | tee -a "$LOG/summary.txt"

CAP="$LOG/queue_capture.bin"
step 00_generate    600  python -m radar_tpu.cli generate --frames 32 \
  --target 12.5,3.0,10 --target 40.0,-6.0,-25 "$CAP"

step 01_selftest    1800 python -m radar_tpu.cli selftest --require-tpu
step 02_verify      1200 python -m radar_tpu.cli verify "$CAP"
step 03_compare     1800 python -m radar_tpu.cli bench --compare "$CAP"
step 04_cluster     1200 python -m radar_tpu.cli detect --full --cluster \
  --out "$LOG/cluster.jsonl" "$CAP"
step 05_os_hits_ab  2400 python scripts/os_hits_ab.py --frames 512
step 06_bench       3000 python bench.py
step 07_vmem_sweep  7500 python scripts/vmem_sweep.py --frames 512

echo "=== queue done $(date -u +%H:%M:%S) ==="
cat "$LOG/summary.txt"
