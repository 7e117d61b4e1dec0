#!/bin/bash
# Round-5 TPU measurement queue.
#
# Lessons from round 4 encoded here (VERDICT items 1, 7):
#   * CHEAP MEASUREMENTS FIRST — the round-4 queue starved ~7 short jobs
#     behind a 4-hour training; here evals run before any training.
#   * SELF-RECORDING — every stage appends its result lines to
#     RESULTS.md's auto section and commits its log+artifacts the moment
#     it finishes, so a round boundary can never strand a result.
#   * NO MARKER CHAINING — one file, strict order, per-stage timeouts,
#     a failed stage records its rc and the queue moves on.
#
# Every TPU invocation holds /tmp/cgs_tpu.lock (bench.py acquires it
# internally) so a driver-run bench.py never overlaps a queue job.
#
#   nohup bash examples/run_r5_queue.sh > logs/r5_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOCK=/tmp/cgs_tpu.lock
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

record() {  # record <name> <log> [tail_n]
  local name=$1 log=$2 n=${3:-3}
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
  # The axon relay hangs hard at times (observed round 3b, 4, and at
  # 21:05 this round: even jnp.ones()@jnp.ones() from a fresh client
  # blocks forever).  Running TPU stages while it is down just burns
  # them with rc=143 junk rows — block here until a trivial device op
  # round-trips.
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
    # Watchdog: the relay sometimes hangs a client mid-run without
    # killing it (observed 20:49, 21:54 this round; round-4 saw 36-min
    # freezes).  A hung client burns its whole stage timeout and holds
    # the lock; kill on log staleness instead and retry once.  setsid
    # gives the stage its own process group so the whole
    # flock->timeout->python tree dies together (kill by explicit
    # group id, never by name pattern).
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
    # 143/137 with a stale log = our own stall kill; retry once.
    if { [ "$rc" = 143 ] || [ "$rc" = 137 ]; } && [ "$attempt" = 1 ]; then
      continue
    fi
    break
  done
  stamp "$name rc=$rc"
  record "$name (rc=$rc)" "$log"
  return $rc
}

# Ensure the auto section exists once.
grep -q '^## Round-5 measurement queue' RESULTS.md || {
  printf '\n## Round-5 measurement queue (auto-appended raw rows)\n\nRaw tail lines captured at stage completion; curated rows above are\nwritten from these.\n' >> RESULTS.md
}

# ---- short evals first ---------------------------------------------
run_stage "staggered S(q) map, flagship artifacts" 5400 \
  logs/staggered_flagship.log python examples/staggered_flagship.py

run_stage "6x6 observable suite (deep48, incl. Renyi-2)" 3600 \
  logs/observables_6x6_deep.log python examples/measure_6x6_observables.py \
  artifacts/heisenberg_6x6_deep48.msgpack 7 48

run_stage "sampler-path throughput table" 3600 \
  logs/bench_samplers_r5.log python examples/bench_samplers.py

# ---- short sector run: Sz=2 tower-of-states check ------------------
run_stage "6x6 Sz=2 sector train (tower check)" 5400 \
  logs/spin_gap_6x6_sz2.log env GAP66_SZ2=4 python examples/spin_gap_6x6.py
run_stage "6x6 Sz=2 sector eval" 3600 \
  logs/eval_sz2_6x6.log env GAP66_SZ2=4 python examples/eval_triplet_6x6.py 400

# ---- 12x12 close-out: anneal + eval both iterate and EMA -----------
run_stage "12x12 anneal (300 epochs, lr 6e-4->2.5e-4)" 10800 \
  logs/h12x12_anneal.log python examples/heisenberg_12x12_anneal.py 300

run_stage "12x12 anneal eval (final iterate)" 5400 \
  logs/eval_12x12_anneal.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_anneal.msgpack 12 12 7 32 400 512

run_stage "12x12 anneal eval (EMA average)" 5400 \
  logs/eval_12x12_ema.log python examples/eval_splitprog.py \
  artifacts/heisenberg_12x12_deep32_ema.msgpack 12 12 7 32 400 512

# ---- new-ansatz flagship data --------------------------------------
run_stage "6x6 transformer flagship run" 9000 \
  logs/transformer_6x6.log python examples/heisenberg_6x6_transformer.py

run_stage "6x6 MADE decision run" 7200 \
  logs/made_6x6.log python examples/heisenberg_6x6_made.py

# ---- eval-grade Lanczos on the best 12x12 artifact ------------------
# (512-chain/long-equilibration; the round-4 60x64 run's own baseline
# sat 2.3 sigma above the careful eval)
BEST=artifacts/heisenberg_12x12_deep32_anneal.msgpack
[ -f "$BEST" ] || BEST=artifacts/heisenberg_12x12_deep32.msgpack
run_stage "12x12 eval-grade Lanczos" 12600 \
  logs/lanczos_12x12_evalgrade.log python examples/lanczos_splitprog.py \
  "$BEST" 12 12 7 32 100 128 8 16

# ---- bench sanity with the new flag semantics -----------------------
stamp "bench.py (acquires lock itself)"
timeout 3600 python bench.py > logs/bench_r5_queue.json 2> logs/bench_r5_queue.err
stamp "bench rc=$?"
record "bench.py r5" logs/bench_r5_queue.json 1

stamp "R5 QUEUE COMPLETE"
