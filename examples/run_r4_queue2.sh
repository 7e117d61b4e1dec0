#!/bin/bash
# Round-4 TPU queue, stage 2: fires after run_r4_queue.sh completes.
#   nohup bash examples/run_r4_queue2.sh > logs/r4_queue2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

until grep -q 'QUEUE COMPLETE' logs/r4_queue.log 2>/dev/null; do
  sleep 60
done

stamp "staggered magnetization, three flagship artifacts"
flock /tmp/cgs_tpu.lock timeout 5400 python examples/staggered_flagship.py \
    > logs/staggered_flagship.log 2>&1
stamp "staggered rc=$?"
stamp "QUEUE2 COMPLETE"
