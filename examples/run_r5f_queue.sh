#!/bin/bash
# Round-5 queue, part F: final-session drain of the remaining part-D/E
# stages, re-ordered so the open VERDICT item (transformer flagship
# datum, item 5) lands first and every stage self-records + commits.
#
# Part D died after its first stage (logs/r5d_queue.log ends at the
# 4x4 order-parameter check); part E never started (0-byte log).  This
# part runs under the same flock/watchdog/health-gate discipline:
#
#   1. transformer 4xd64h8 final unbiased eval of the committed
#      epoch-100 artifact (TF66_EPOCHS=100 == start_epoch -> the train
#      loop is empty and the script goes straight to the eval), giving
#      the RESULTS datum for the ansatz family without re-paying the
#      82 s/epoch training cost;
#   2. the 12x12 sampling-bias diagnostic (part E's stage) with a
#      session-sized equilibration budget (1000 two-sided sweeps);
#   3. the 10x10 v3 S(pi,pi) map (part D stage 2);
#   4. the 12x12 anneal EMA eval retry (part D stage 3).
#
#   nohup bash examples/run_r5f_queue.sh > logs/r5f_queue.log 2>&1 &
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
    if { [ "$rc" = 143 ] || [ "$rc" = 137 ]; } && [ "$attempt" = 1 ]; then
      continue
    fi
    break
  done
  stamp "$name rc=$rc"
  record "$name (rc=$rc)" "$log"
  return $rc
}

# ---- 1. transformer flagship datum: unbiased eval of epoch-100 --------
run_stage "6x6 transformer 4xd64h8 final eval (epoch-100 artifact)" 2700 \
  logs/transformer_6x6_eval.log env \
  TF66_EPOCHS=100 TF66_RESUME=1 TF66_EVAL_SAMPLES=60 \
  python examples/heisenberg_6x6_transformer.py

# ---- 2. 12x12 sampling-bias diagnostic (part E, session-sized) --------
run_stage "S(pi,pi)+E sampling diagnostic, 12x12 anneal artifact" 3000 \
  logs/sq_12x12_diag.log python examples/measure_sq.py \
  artifacts/heisenberg_12x12_deep32_anneal.msgpack 12 7 32 150 1024 1000 91

# ---- 3. S(pi,pi) on the 10x10 5x32 artifact (part D stage 2) ----------
run_stage "S(pi,pi) 10x10 5x32 artifact (order vs energy error)" 2400 \
  logs/sq_10x10_v3.log python examples/measure_sq.py \
  artifacts/heisenberg_10x10_symconv_v3.msgpack 10 5 32 200 1024

# ---- 4. 12x12 anneal eval, EMA average (part D stage 3 retry) ---------
run_stage "12x12 anneal eval EMA (retry)" 3600 \
  logs/eval_12x12_ema.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_ema.msgpack 12 12 7 32 400 512

stamp "R5F QUEUE COMPLETE"
