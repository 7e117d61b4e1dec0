#!/bin/bash
# Round-5 queue, part E: the 12x12 sampling-bias diagnostic.
#
# Part D's measure_sq stage 2 (10x10) prints the energy of the SAME
# chains that produce S(pi,pi); this part runs the L=12 leg on the
# anneal artifact — the lattice where the committed staggered run's
# C(1) = -0.0995 contradicts the state's measured energy (see
# examples/measure_sq.py docstring).  Generous equilibration (2000
# sweeps) with E/S/C1/acceptance trend prints every ~200.
#
# Starts when part D prints its COMPLETE marker, or after a 4.5 h
# deadline (whichever first — the deadline guards against part D dying
# without the marker; flock still serializes against any live stage).
#
#   nohup bash examples/run_r5e_queue.sh > logs/r5e_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOCK=/tmp/cgs_tpu.lock
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

DEADLINE=$(( $(date +%s) + 16200 ))
while ! grep -q "R5D QUEUE COMPLETE" logs/r5d_queue.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    stamp "deadline reached without R5D marker; proceeding under flock"
    break
  fi
  sleep 120
done
stamp "starting part E"

record() {
  local name=$1 log=$2 n=${3:-5}
  {
    echo ""
    echo "* \`$name\` ($(date -u +%Y-%m-%dT%H:%MZ), $log):"
    tail -n "$n" "$log" | sed 's/^/  > /'
  } >> RESULTS.md
  git add -A logs artifacts RESULTS.md examples configs 2>/dev/null
  git commit -q -m "r5 queue: $name measured (auto-recorded)" || true
  stamp "recorded + committed: $name"
}

wait_relay() {
  local n=0
  while ! timeout 120 python -c \
      "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))" \
      >/dev/null 2>&1; do
    n=$((n + 1))
    stamp "relay down (probe $n); waiting 120s"
    sleep 120
  done
  [ "$n" -gt 0 ] && stamp "relay recovered after $n probes"
}

STALL_S=900

run_stage() {
  local name=$1 tmo=$2 log=$3; shift 3
  local attempt rc
  for attempt in 1 2; do
    wait_relay
    stamp "stage: $name (attempt $attempt)"
    setsid flock "$LOCK" timeout "$tmo" "$@" > "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
      if [ "$age" -gt "$STALL_S" ]; then
        stamp "$name stalled ${age}s (relay hang?); killing group $pid"
        kill -TERM -- "-$pid" 2>/dev/null
        sleep 5
        kill -KILL -- "-$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; rc=$?
    if { [ "$rc" = 143 ] || [ "$rc" = 137 ]; } && [ "$attempt" = 1 ]; then
      continue
    fi
    break
  done
  stamp "$name rc=$rc"
  record "$name (rc=$rc)" "$log"
  return $rc
}

run_stage "S(pi,pi)+E sampling diagnostic, 12x12 anneal artifact" 5400 \
  logs/sq_12x12_diag.log python examples/measure_sq.py \
  artifacts/heisenberg_12x12_deep32_anneal.msgpack 12 7 32 200 1024 2000 91

stamp "R5E QUEUE COMPLETE"
