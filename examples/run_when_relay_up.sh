#!/bin/bash
# Waits for the axon relay to recover, then runs the queued TPU
# measurements SEQUENTIALLY (never concurrently - timing integrity):
#   1. __graft_entry__.entry() single-chip compile check
#   2. examples/jac_experiment2.py   (fast vs generic Jacobian rows)
#   3. examples/profile_sr_epoch5.py (epoch-level fast-Jacobian effect)
#   4. bench.py                      (graded artifact preview)
# Logs: /tmp/relay_chain_*.log
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp

echo "waiting for relay..." > /tmp/relay_chain_status.log
for i in $(seq 1 120); do
  if timeout 120 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))" >/dev/null 2>&1; then
    echo "relay up after probe $i @ $(date +%T)" >> /tmp/relay_chain_status.log
    break
  fi
  echo "probe $i down @ $(date +%T)" >> /tmp/relay_chain_status.log
  sleep 60
done

echo "=== entry probe $(date +%T)" >> /tmp/relay_chain_status.log
timeout 1800 python -c "import __graft_entry__ as g; fn, args = g.entry(); import jax; print(jax.jit(fn)(*args)[0].shape)" > /tmp/relay_chain_entry.log 2>&1
echo "entry EXIT=$? @ $(date +%T)" >> /tmp/relay_chain_status.log

echo "=== jac_experiment2 $(date +%T)" >> /tmp/relay_chain_status.log
timeout 2400 python examples/jac_experiment2.py > /tmp/relay_chain_jac.log 2>&1
echo "jac EXIT=$? @ $(date +%T)" >> /tmp/relay_chain_status.log

echo "=== profile_sr_epoch5 $(date +%T)" >> /tmp/relay_chain_status.log
(cd examples && timeout 3600 python profile_sr_epoch5.py) > /tmp/relay_chain_prof5.log 2>&1
echo "prof5 EXIT=$? @ $(date +%T)" >> /tmp/relay_chain_status.log

echo "=== bench $(date +%T)" >> /tmp/relay_chain_status.log
timeout 3600 python bench.py > /tmp/relay_chain_bench.log 2>&1
echo "bench EXIT=$? @ $(date +%T)" >> /tmp/relay_chain_status.log
echo "ALL DONE @ $(date +%T)" >> /tmp/relay_chain_status.log
