#!/bin/bash
# Side job: staggered m_s re-run (equilibrated), serialized against the
# r5b queue by /tmp/cgs_tpu.lock.  Retries on ANY failure (the 02:38Z
# attempt died to a TPU worker crash, rc=1, which the queue's
# stall-only retry did not cover); the per-L resume cache in
# staggered_flagship.py makes each retry cheap.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
stamp() { echo "[$(date -u +%H:%M:%S)] $*"; }
for attempt in 1 2 3; do
  stamp "staggered side job attempt $attempt (waiting on lock)"
  flock /tmp/cgs_tpu.lock timeout 5400 \
    python examples/staggered_flagship.py >> logs/staggered_flagship_v3.log 2>&1
  rc=$?
  stamp "attempt $attempt rc=$rc"
  [ "$rc" = 0 ] && break
  sleep 120
done
if [ "$rc" = 0 ]; then
  {
    echo ""
    echo "* \`staggered S(q) map, equilibrated re-run (rc=0)\` ($(date -u +%Y-%m-%dT%H:%MZ), logs/staggered_flagship_v3.log):"
    tail -n 5 logs/staggered_flagship_v3.log | sed 's/^/  > /'
  } >> RESULTS.md
  git add -A logs artifacts RESULTS.md examples 2>/dev/null
  git commit -q -m "r5: staggered m_s measured on equilibrated flagship artifacts (auto-recorded)" || true
  stamp "recorded + committed"
fi
