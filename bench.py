"""Benchmark: Metropolis sweep throughput on the 6x6 Heisenberg benchmark.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measured quantity: full Metropolis exchange sweeps/second/chip with 2048
parallel chains on the 6x6 lattice — one sweep = n_sites proposals per
chain — using the fused Pallas RBM sweep kernel (sampler/kernels.py):
VMEM-resident chain state, O(hidden) incremental amplitude-ratio updates
per move, H=64 hidden units.  Work is verified via acceptance counters;
timing uses large many-sweep calls with full blocking so per-dispatch
overhead is amortized.

vs_baseline compares against the reference's structural throughput
ceiling: one session.run round-trip per single-pair move
(cgs_vmc/graph_builders.py:38-89, SURVEY.md §3.1), generously assumed at
1 ms/dispatch => ~27.8 sweeps/sec at 36 sites regardless of chain count.
"""

import json
import os
import time

import jax

# Persistent compilation cache: repeated bench invocations skip the
# (potentially remote) TPU compile entirely.
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

from cgs_vmc_tpu import basis
from cgs_vmc_tpu.sampler import kernels


def main():
    n_sites = 36
    hidden = 64
    n_chains = 2048
    sweeps_per_call = 400

    key = jax.random.key(0)
    w = 0.05 * jax.random.normal(key, (n_sites, hidden), jnp.float32)
    b = jnp.zeros((hidden,), jnp.float32)
    a = jnp.zeros((n_sites,), jnp.float32)
    configs = basis.random_configurations(jax.random.key(1), n_sites,
                                          n_chains)
    picks = kernels.sample_picks(jax.random.key(2),
                                 sweeps_per_call * n_sites, n_sites,
                                 n_chains)

    # Warmup / compile.
    out = kernels.rbm_sweeps(w, b, a, configs, picks, jax.random.key(3))
    jax.block_until_ready(out)

    best = float('inf')
    total_accepted = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        out = kernels.rbm_sweeps(w, b, a, out.configs, picks,
                                 jax.random.key(4 + rep))
        # Device->host transfer inside the timed region: unlike
        # block_until_ready (which some transports ack early), reading a
        # value cannot complete before the computation has.
        accepted = float(out.num_accepted.sum())
        best = min(best, time.perf_counter() - t0)
        total_accepted += accepted

    # Work sanity: a healthy equilibrium acceptance rate on this model.
    proposals = 3 * sweeps_per_call * n_sites * n_chains
    acceptance = total_accepted / proposals
    assert 0.05 < acceptance < 0.95, f'implausible acceptance {acceptance}'

    sweeps_per_sec = sweeps_per_call / best

    # Reference ceiling: 1 session.run per move, ~1 ms/dispatch =>
    # 1000/36 sweeps/sec independent of chain count (SURVEY.md §3.1).
    reference_sweeps_per_sec = 1000.0 / n_sites

    print(json.dumps({
        'metric': 'metropolis_sweeps_per_sec_per_chip_6x6_rbm_2048chains',
        'value': round(sweeps_per_sec, 3),
        'unit': 'sweeps/s',
        'vs_baseline': round(sweeps_per_sec / reference_sweeps_per_sec, 2),
    }))


if __name__ == '__main__':
    main()
