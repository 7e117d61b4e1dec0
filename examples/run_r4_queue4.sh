#!/bin/bash
# Round-4 TPU queue, stage 4: fires after run_r4_queue3.sh completes.
#   nohup bash examples/run_r4_queue4.sh > logs/r4_queue4.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }

until grep -q 'QUEUE3 COMPLETE' logs/r4_queue3.log 2>/dev/null; do
  sleep 60
done

stamp "observable suite on the deep 6x6 artifact (incl. Renyi-2)"
flock /tmp/cgs_tpu.lock timeout 3600 python examples/measure_6x6_observables.py \
    artifacts/heisenberg_6x6_deep48.msgpack 7 48 \
    > logs/observables_6x6_deep.log 2>&1
stamp "observables rc=$?"
stamp "QUEUE4 COMPLETE"
