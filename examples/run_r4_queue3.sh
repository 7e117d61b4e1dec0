#!/bin/bash
# Round-4 TPU queue, stage 3: fires after run_r4_queue2.sh completes.
#   nohup bash examples/run_r4_queue3.sh > logs/r4_queue3.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

until grep -q 'QUEUE2 COMPLETE' logs/r4_queue2.log 2>/dev/null; do
  sleep 60
done

stamp "6x6 transformer flagship-lattice run"
flock /tmp/cgs_tpu.lock timeout 7200 python examples/heisenberg_6x6_transformer.py \
    > logs/transformer_6x6.log 2>&1
stamp "transformer rc=$?"

stamp "sampler-path throughput table (bench_samplers)"
flock /tmp/cgs_tpu.lock timeout 3600 python examples/bench_samplers.py \
    > logs/bench_samplers_r4.log 2>&1
stamp "bench_samplers rc=$?"
stamp "QUEUE3 COMPLETE"
