#!/bin/bash
# Round-3c master TPU pipeline: wait for relay health, run queued
# measurements, then the 12x12 deep training (resumable across relay
# outages and timeouts), its split-program eval, and sampler benches.
# Status: /tmp/r3c_status.log ; per-step logs /tmp/r3c_*.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

S=/tmp/r3c_status.log
echo "pipeline v2 start @ $(date '+%F %T')" > $S

wait_health () {
  for i in $(seq 1 400); do
    if timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))" >/dev/null 2>&1; then
      echo "RELAY UP after probe $i @ $(date '+%F %T')" >> $S
      return 0
    fi
    echo "probe $i down @ $(date +%T)" >> $S
    sleep 60
  done
  return 1
}

wait_health

echo "=== entry @ $(date +%T)" >> $S
timeout 1800 python -c "import __graft_entry__ as g; fn, args = g.entry(); import jax; print(jax.jit(fn)(*args)[0].shape)" > /tmp/r3c_entry.log 2>&1
echo "entry EXIT=$? @ $(date +%T)" >> $S

echo "=== jac2 @ $(date +%T)" >> $S
timeout 2400 python examples/jac_experiment2.py > /tmp/r3c_jac.log 2>&1
echo "jac2 EXIT=$? @ $(date +%T)" >> $S

echo "=== prof5 @ $(date +%T)" >> $S
(cd examples && timeout 3600 python profile_sr_epoch5.py) > /tmp/r3c_prof5.log 2>&1
echo "prof5 EXIT=$? @ $(date +%T)" >> $S

echo "=== bench @ $(date +%T)" >> $S
timeout 3600 python bench.py > /tmp/r3c_bench.log 2>&1
echo "bench EXIT=$? @ $(date +%T)" >> $S

echo "=== samplers @ $(date +%T)" >> $S
timeout 3600 python examples/bench_samplers.py > /tmp/r3c_samplers.log 2>&1
echo "samplers EXIT=$? @ $(date +%T)" >> $S

# 12x12 deep training: resume across timeouts/outages by parsing the
# last periodic save from the attempt log; fall back to the generic
# vmap(grad) Jacobian rows if the im2col fast path exhausts HBM.
START=0
export CGS_FASTJAC=1
for attempt in 1 2 3 4 5; do
  echo "=== deep12 attempt $attempt (start epoch $START, fastjac $CGS_FASTJAC) @ $(date +%T)" >> $S
  L=/tmp/r3c_deep12_$attempt.log
  if [ "$START" -eq 0 ]; then
    timeout 21600 python examples/heisenberg_12x12_deep.py > $L 2>&1
  else
    timeout 21600 python examples/heisenberg_12x12_deep.py --resume "$START" > $L 2>&1
  fi
  echo "deep12 attempt $attempt EXIT=$? @ $(date +%T)" >> $S
  if grep -q "^DONE" $L; then
    echo "deep12 COMPLETE" >> $S
    break
  fi
  if grep -qiE "RESOURCE_EXHAUSTED|out of memory" $L; then
    export CGS_FASTJAC=0
    echo "deep12 OOM -> CGS_FASTJAC=0 for retries" >> $S
  fi
  LAST=$(grep -o 'saved .* @ epoch [0-9]*' $L | grep -o '[0-9]*$' | tail -1)
  if [ -n "$LAST" ]; then START=$LAST; fi
  wait_health
done

echo "=== deep12 eval @ $(date +%T)" >> $S
timeout 7200 python examples/eval_splitprog.py artifacts/heisenberg_12x12_deep32.msgpack 12 12 7 32 > /tmp/r3c_deep12_eval.log 2>&1
echo "deep12 eval EXIT=$? @ $(date +%T)" >> $S

echo "ALL DONE @ $(date '+%F %T')" >> $S
