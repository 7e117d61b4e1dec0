#!/bin/bash
# Round-5 TPU measurement queue, part D (after R5C COMPLETE).
#
# Closes the two measurements part C could not deliver and adds the
# staggered-order diagnostic that explains WHY the m_s extrapolation
# from variational states failed:
#
#   1. 4x4 order-parameter check (exact): energy error vs S(pi,pi)
#      deficit of the flagship ansatz family at several training
#      depths, full-basis contractions, zero MC noise          ~20 min
#   2. S(pi,pi) on the 10x10 5x32 artifact (rel 6.7e-4) next to the
#      deep 7x32 one (2.55e-4): does the order deficit shrink as the
#      energy error drops, at flagship size?                   ~25 min
#   3. 12x12 anneal eval, EMA average (retry; two part-C attempts
#      produced zero output before the watchdog fired)         ~20 min
#   4. 6x6 transformer flagship datum: small env-configured model
#      (2 x d48 h4, equil/mc 4/1) that CAN converge in budget, hard
#      TF66_BUDGET_S so a watchdog kill never loses the final eval;
#      resume-capable, logs every 5 epochs                     ~2.5 h
#
# Same machinery as parts B/C: health gate, stall watchdog with
# process-group kill, per-stage self-recording commits.
#
#   nohup bash examples/run_r5d_queue.sh > logs/r5d_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOCK=/tmp/cgs_tpu.lock
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

record() {  # record <name> <log> [tail_n]
  local name=$1 log=$2 n=${3:-4}
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

STALL_S=900   # no log growth for 15 min => relay hang, kill + retry

run_stage() {  # run_stage <name> <timeout_s> <log> <cmd...>
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

# ---- 1. 4x4 order-parameter check (exact) ------------------------------
run_stage "4x4 order-parameter check (exact-basis)" 3600 \
  logs/order_param_4x4.log python examples/order_param_4x4_check.py

# ---- 2. S(pi,pi) on the 10x10 5x32 artifact ----------------------------
run_stage "S(pi,pi) 10x10 5x32 artifact (order vs energy error)" 3600 \
  logs/sq_10x10_v3.log python examples/measure_sq.py \
  artifacts/heisenberg_10x10_symconv_v3.msgpack 10 5 32 400 1024

# ---- 3. 12x12 anneal eval, EMA average (retry) -------------------------
run_stage "12x12 anneal eval EMA (retry)" 5400 \
  logs/eval_12x12_ema.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_ema.msgpack 12 12 7 32 400 512

# ---- 4. transformer flagship datum (small model, budgeted) -------------
run_stage "6x6 transformer datum (2xd48h4, budgeted)" 10800 \
  logs/transformer_6x6_small.log env \
  TF66_LAYERS=2 TF66_DIM=48 TF66_HEADS=4 TF66_EQUIL=4 TF66_MC=1 \
  TF66_EPOCHS=600 TF66_BUDGET_S=7000 TF66_RESUME=1 TF66_EVAL_SAMPLES=120 \
  python examples/heisenberg_6x6_transformer.py

stamp "R5D QUEUE COMPLETE"
