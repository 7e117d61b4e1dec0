#!/bin/bash
# Round-5 TPU measurement queue, part B: the stages run_r5_queue.sh had
# not reached when the relay outage + session restarts cut it off, in
# value-per-minute order:
#
#   1. staggered S(q) RE-RUN — the recorded rc=0 result predates the
#      L^2-scaled-equilibration fix (8fe5782): its L=10/12 points are
#      under-equilibrated and the extrapolated m_s=0.0 is junk.
#   2. 6x6 observable suite — the 21:54Z attempt died mid-Renyi scan
#      (width 1 of 3 recorded).
#   3. bench_samplers throughput table (short).
#   4. 12x12 eval-grade Lanczos on the EXISTING epoch-1400 artifact —
#      the cheapest route to the <5e-4 target (VERDICT item 2): the
#      round-4 correlated gain of -1.25e-4/site applied to the careful
#      eval baseline implies ~3.3e-4.
#   5. 6x6 transformer flagship (VERDICT item 5).
#   6. 6x6 Sz=2 sector train+eval (tower-of-states check).
#   7. 12x12 anneal + evals (training-time close-out).
#   8. 6x6 MADE decision run.
#   9. bench.py.
#
# Same machinery as run_r5_queue.sh: health gate, stall watchdog,
# per-stage self-recording commits.
#
#   nohup bash examples/run_r5b_queue.sh > logs/r5b_queue.log 2>&1 &
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

grep -q '^## Round-5 measurement queue' RESULTS.md || {
  printf '\n## Round-5 measurement queue (auto-appended raw rows)\n\nRaw tail lines captured at stage completion; curated rows above are\nwritten from these.\n' >> RESULTS.md
}

# ---- 1. staggered m_s, equilibrated this time -----------------------
run_stage "staggered S(q) map RE-RUN (L^2-scaled equilibration)" 7200 \
  logs/staggered_flagship_v2.log python examples/staggered_flagship.py

# ---- 2. finish the observable suite ---------------------------------
run_stage "6x6 observable suite (deep48, full Renyi-2 strip scan)" 3600 \
  logs/observables_6x6_deep_v2.log python examples/measure_6x6_observables.py \
  artifacts/heisenberg_6x6_deep48.msgpack 7 48

# ---- 3. sampler throughput table ------------------------------------
run_stage "sampler-path throughput table" 3600 \
  logs/bench_samplers_r5.log python examples/bench_samplers.py

# ---- 4. 12x12 eval-grade Lanczos (VERDICT item 2, measurement-time) --
run_stage "12x12 eval-grade Lanczos (epoch-1400 artifact)" 12600 \
  logs/lanczos_12x12_evalgrade.log python examples/lanczos_splitprog.py \
  artifacts/heisenberg_12x12_deep32.msgpack 12 12 7 32 100 128 8 16

# ---- 5. transformer flagship datum (VERDICT item 5) ------------------
run_stage "6x6 transformer flagship run" 9000 \
  logs/transformer_6x6.log python examples/heisenberg_6x6_transformer.py

# ---- 6. Sz=2 sector: tower-of-states check ---------------------------
run_stage "6x6 Sz=2 sector train (tower check)" 5400 \
  logs/spin_gap_6x6_sz2.log env GAP66_SZ2=4 python examples/spin_gap_6x6.py
run_stage "6x6 Sz=2 sector eval" 3600 \
  logs/eval_sz2_6x6.log env GAP66_SZ2=4 python examples/eval_triplet_6x6.py 400

# ---- 7. 12x12 training-time close-out --------------------------------
run_stage "12x12 anneal (300 epochs, lr 6e-4->2.5e-4)" 10800 \
  logs/h12x12_anneal.log python examples/heisenberg_12x12_anneal.py 300
run_stage "12x12 anneal eval (final iterate)" 5400 \
  logs/eval_12x12_anneal.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_anneal.msgpack 12 12 7 32 400 512
run_stage "12x12 anneal eval (EMA average)" 5400 \
  logs/eval_12x12_ema.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_ema.msgpack 12 12 7 32 400 512

# ---- 8. MADE decision run --------------------------------------------
run_stage "6x6 MADE decision run" 7200 \
  logs/made_6x6.log python examples/heisenberg_6x6_made.py

# ---- 9. bench sanity --------------------------------------------------
stamp "bench.py (acquires lock itself)"
timeout 3600 python bench.py > logs/bench_r5_queue.json 2> logs/bench_r5_queue.err
stamp "bench rc=$?"
record "bench.py r5" logs/bench_r5_queue.json 1

stamp "R5B QUEUE COMPLETE"
