#!/bin/bash
# Round-5 TPU measurement queue, part C (takeover of run_r5b_queue.sh).
#
# The part-B queue was mid "12x12 anneal" when two of its later stages
# became obsolete-as-ordered: the transformer flagship had OOM'd in its
# part-B slot (fix 04b58cb landed after; AOT fit-check now passes at
# 9.3 GiB peak vs 16 GiB HBM) and the staggered L=12 leg crashed the
# TPU worker because jax.block_until_ready is a no-op on the axon relay
# (fixed: true device_get barrier per sweep chunk).  Part B's parent is
# killed (the running anneal stage keeps its own setsid group and
# finishes untouched); this queue records the anneal when it exits,
# then runs the remaining stages in value-per-minute order:
#
#   0. wait for the in-flight anneal, record + commit it
#   1. staggered L=12 RE-RUN (true-barrier chunks; L=6/10 cached)  ~1 h
#   2. 6x6 transformer flagship, 450 compressed-schedule epochs   ~2 h
#   3. 12x12 anneal eval (EMA average)
#   4. 12x12 anneal eval (final iterate)
#   5. 6x6 MADE decision run
#   6. bench.py sanity
#
# Same machinery as part B: health gate, stall watchdog, per-stage
# self-recording commits.
#
#   nohup bash examples/run_r5c_queue.sh <anneal_pid> > logs/r5c_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOCK=/tmp/cgs_tpu.lock
ANNEAL_PID=${1:-0}
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

# ---- 0. the in-flight part-B anneal: wait, then record ---------------
if [ "$ANNEAL_PID" != 0 ] && kill -0 "$ANNEAL_PID" 2>/dev/null; then
  stamp "waiting on in-flight 12x12 anneal (pid $ANNEAL_PID)"
  while kill -0 "$ANNEAL_PID" 2>/dev/null; do sleep 30; done
fi
record "12x12 anneal (300 epochs, takeover record)" logs/h12x12_anneal.log 6

# ---- 1. staggered L=12, true-barrier chunks ---------------------------
run_stage "staggered S(q) L=12 (true device barrier per chunk)" 7200 \
  logs/staggered_flagship_v4.log python examples/staggered_flagship.py

# ---- 2. transformer flagship, compressed schedule ---------------------
run_stage "6x6 transformer flagship (450 ep, post-OOM-fix)" 8400 \
  logs/transformer_6x6_v2.log env TF66_EPOCHS=450 \
  python examples/heisenberg_6x6_transformer.py

# ---- 3/4. 12x12 anneal close-out evals --------------------------------
run_stage "12x12 anneal eval (EMA average)" 5400 \
  logs/eval_12x12_ema.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_ema.msgpack 12 12 7 32 400 512
run_stage "12x12 anneal eval (final iterate)" 5400 \
  logs/eval_12x12_anneal.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_anneal.msgpack 12 12 7 32 400 512

# ---- 5. MADE decision run ---------------------------------------------
run_stage "6x6 MADE decision run" 7200 \
  logs/made_6x6.log python examples/heisenberg_6x6_made.py

# ---- 6. bench sanity ----------------------------------------------------
stamp "bench.py (acquires lock itself)"
timeout 3600 python bench.py > logs/bench_r5_queue.json 2> logs/bench_r5_queue.err
stamp "bench rc=$?"
record "bench.py r5" logs/bench_r5_queue.json 1

stamp "R5C QUEUE COMPLETE"
