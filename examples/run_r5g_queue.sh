#!/bin/bash
# Round-5 queue, part G: retry of the part-F transformer eval after the
# 00:59Z TPU-worker crash (logs/transformer_6x6_eval.log ends in
# UNAVAILABLE mid-eval — the eval-path compile had already finished, so
# this retry rides the persistent compilation cache and goes straight
# to sweeps + sampling).  Fewer eval samples (48) so the FINAL line
# lands inside the session; stage 2 re-queues the 12x12 sampling
# diagnostic opportunistically.
#
#   nohup bash examples/run_r5g_queue.sh > logs/r5g_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOCK=/tmp/cgs_tpu.lock
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

record() {
  local name=$1 log=$2 n=${3:-5}
  {
    echo ""
    echo "* \`$name\` ($(date -u +%Y-%m-%dT%H:%MZ), $log):"
    tail -n "$n" "$log" | sed 's/\x1b\[[0-9;]*[a-zA-Z]//g; s/\r//g' \
      | sed 's/^/  > /'
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
    if [ "$rc" != 0 ] && [ "$attempt" = 1 ]; then
      continue  # retry ANY failure once: worker crashes come back rc=1
    fi
    break
  done
  stamp "$name rc=$rc"
  record "$name (rc=$rc)" "$log"
  return $rc
}

# ---- 1. transformer flagship datum retry (cached compile) -------------
run_stage "6x6 transformer 4xd64h8 final eval (retry, 48 samples)" 2400 \
  logs/transformer_6x6_eval2.log env \
  TF66_EPOCHS=100 TF66_RESUME=1 TF66_EVAL_SAMPLES=48 \
  python examples/heisenberg_6x6_transformer.py

# ---- 2. 12x12 sampling-bias diagnostic (opportunistic) ----------------
run_stage "S(pi,pi)+E sampling diagnostic, 12x12 anneal artifact" 3000 \
  logs/sq_12x12_diag.log python examples/measure_sq.py \
  artifacts/heisenberg_12x12_deep32_anneal.msgpack 12 7 32 150 1024 1000 91

stamp "R5G QUEUE COMPLETE"
