"""Benchmark: Metropolis sweep throughput on the 6x6 Heisenberg benchmark.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Measured quantity: full Metropolis exchange sweeps/second/chip — one sweep
= n_sites sequential proposals per chain, each proposal a full conv-CGS
amplitude evaluation over all chains — with 2048 parallel chains on the
6x6 lattice (flagship benchmark config #4), bf16 conv compute / f32
accumulate.  Work is verified via the sampler's proposal counters; timing
is the best of several fully-blocked repetitions.

vs_baseline compares against the reference's structural throughput
ceiling: one session.run round-trip per single-pair move
(cgs_vmc/graph_builders.py:38-89, SURVEY.md §3.1), generously assumed at
1 ms/dispatch => ~27.8 sweeps/sec at 36 sites regardless of chain count.
"""

import json
import time

import jax

from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.sampler import metropolis


def main():
    n_sites, size = 36, 6
    n_chains = 2048
    config = Config(
        num_sites=n_sites, size_x=size, size_y=size,
        wavefunction_type='conv_2d',
        num_conv_layers=5, num_conv_filters=16, kernel_size=3,
        heisenberg_jx=-1.0,
    )
    wf = build_wavefunction(config)
    params = wf.init(jax.random.key(0))
    state = metropolis.init_sampler(
        jax.random.key(1), wf, params, n_sites, n_chains)

    sweeps_per_call = 20
    run = jax.jit(lambda s: metropolis.run_sweeps(
        wf, params, s, sweeps_per_call))

    # Warmup / compile.
    state = run(state)
    jax.block_until_ready(state)
    proposals_before = float(state.num_proposed.sum())

    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state)
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)

    proposals_after = float(state.num_proposed.sum())
    expected = 3 * sweeps_per_call * n_sites * n_chains
    assert proposals_after - proposals_before == expected, (
        proposals_after, proposals_before, expected)

    sweeps_per_sec = sweeps_per_call / best

    # Reference ceiling: 1 session.run per move, ~1 ms/dispatch =>
    # 1000/36 sweeps/sec independent of chain count (SURVEY.md §3.1).
    reference_sweeps_per_sec = 1000.0 / n_sites

    print(json.dumps({
        'metric': 'metropolis_sweeps_per_sec_per_chip_6x6_conv2d_2048chains',
        'value': round(sweeps_per_sec, 3),
        'unit': 'sweeps/s',
        'vs_baseline': round(sweeps_per_sec / reference_sweeps_per_sec, 2),
    }))


if __name__ == '__main__':
    main()
