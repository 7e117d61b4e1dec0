#!/bin/bash
# Round-4 TPU measurement queue (session-crash-safe).
#
# Babysits the in-flight 12x12 deep run (resuming it from its last
# checkpoint if the process or the relay dies before epoch 1400), then
# runs the remaining round-4 measurements strictly sequentially —
# never two TPU jobs at once (DEVELOPMENT.md).  Every TPU invocation
# holds /tmp/cgs_tpu.lock, which bench.py also takes, so a driver-run
# bench.py cannot overlap a queue job (the round-3 graded-number
# pollution mode).  bench.py itself is NOT flock-wrapped here — it
# acquires the lock internally; a parent-held lock would starve it.
#
#   nohup bash examples/run_r4_queue.sh > logs/r4_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
H12LOG=logs/h12x12_deep.log
LOCK=/tmp/cgs_tpu.lock
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

# ---- stage 0: babysit the 12x12 deep run to epoch 1400 -------------
# Restarts on process death AND on stall (relay hangs can block a client
# indefinitely without killing it: log silent >30 min while the process
# sleeps — observed 18:24 this round, 36 min frozen at epoch 1150).
STALL_S=1800
while true; do
  pid=$(cat /tmp/h12.pid 2>/dev/null || echo 0)
  # pid 0 would signal our own process group and always "succeed"
  while [ "$pid" -gt 0 ] && kill -0 "$pid" 2>/dev/null; do
    age=$(( $(date +%s) - $(stat -c %Y "$H12LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      stamp "12x12 deep stalled ${age}s (relay hang?); killing $pid"
      kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
      break
    fi
    sleep 60
  done
  grep -q 'DONE @ epoch' "$H12LOG" && { stamp "12x12 deep: DONE"; break; }
  last=$(grep -oP 'saved .* @ epoch \K[0-9]+' "$H12LOG" | tail -1)
  [ -z "$last" ] && last=0
  if [ "$last" -ge 1400 ]; then stamp "12x12 deep: at end"; break; fi
  stamp "12x12 deep died/stalled at epoch ~$last; resuming"
  nohup flock "$LOCK" python examples/heisenberg_12x12_deep.py \
      --resume "$last" >> "$H12LOG" 2>&1 &
  echo $! > /tmp/h12.pid
  sleep 120
done

# ---- stage 1: split-program MC eval of the 12x12 deep artifact -----
stamp "eval_splitprog 12x12 deep"
flock "$LOCK" timeout 5400 python examples/eval_splitprog.py \
    artifacts/heisenberg_12x12_deep32.msgpack 12 12 7 32 400 512 \
    > logs/eval_12x12_deep.log 2>&1
stamp "eval done rc=$?"

# ---- stage 2: Lanczos step on the two deep flagship artifacts ------
stamp "lanczos 10x10 deep"
flock "$LOCK" timeout 7200 python examples/lanczos_splitprog.py \
    artifacts/heisenberg_10x10_deep32_cont.msgpack 10 10 7 32 60 64 8 16 \
    > logs/lanczos_10x10_deep.log 2>&1
stamp "lanczos 10x10 rc=$?"
stamp "lanczos 12x12 deep"
flock "$LOCK" timeout 9000 python examples/lanczos_splitprog.py \
    artifacts/heisenberg_12x12_deep32.msgpack 12 12 7 32 60 64 8 16 \
    > logs/lanczos_12x12_deep.log 2>&1
stamp "lanczos 12x12 rc=$?"

# ---- stage 3: dynamics demo (S(q,w), N=20 chain) -------------------
stamp "dynamics chain20"
flock "$LOCK" timeout 7200 python examples/dynamics_chain20.py \
    > logs/dynamics_chain20.log 2>&1
stamp "dynamics rc=$?"

# ---- stage 4: MCMC-free 6x6 MADE decision run ----------------------
stamp "6x6 MADE"
flock "$LOCK" timeout 7200 python examples/heisenberg_6x6_made.py \
    > logs/made_6x6.log 2>&1
stamp "made rc=$?"

# ---- stage 5: bench sanity (same artifact the driver grades) -------
# No flock wrapper: bench.py acquires /tmp/cgs_tpu.lock itself.
stamp "bench.py"
timeout 3600 python bench.py > logs/bench_r4_queue.json 2> logs/bench_r4_queue.err
stamp "bench rc=$?"
stamp "QUEUE COMPLETE"
