"""Observable operators vs exact-diagonalization expectation values."""

import numpy as np
import jax
import jax.numpy as jnp

from cgs_vmc_tpu import basis, lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.evaluate import evaluate_operator
from cgs_vmc_tpu.models import FullVector
from cgs_vmc_tpu.ops.observables import (
    SzSzCorrelation,
    StaggeredMagnetizationSquared,
)
from cgs_vmc_tpu.utils import ed

N = 8
BONDS = lattice.chain_bonds(N)


def test_szsz_correlation_matches_ed():
    e0, v0 = ed.ground_state(N, BONDS)
    wf = FullVector.for_sector(N, v0.astype(np.float32))
    params = wf.init(jax.random.key(0))
    states = basis.enumerate_sz_basis(N)

    pairs = [(i, (i + 2) % N) for i in range(N)]  # distance-2 correlator
    obs = SzSzCorrelation(pairs)
    local = np.asarray(obs.local_value(wf, params, jnp.asarray(states)))
    weights = v0 ** 2 / np.sum(v0 ** 2)
    exact = float(np.sum(weights * local))

    config = Config(num_sites=N, batch_size=256,
                    num_equilibration_sweeps=20, num_monte_carlo_sweeps=2,
                    num_evaluation_samples=60)
    result = evaluate_operator(wf, params, obs, config,
                               key=jax.random.key(4))
    assert abs(result.mean - exact) < 5 * max(result.error, 1e-4)


def test_staggered_magnetization():
    e0, v0 = ed.ground_state(N, BONDS)
    wf = FullVector.for_sector(N, v0.astype(np.float32))
    params = wf.init(jax.random.key(0))
    states = basis.enumerate_sz_basis(N)
    sub = lattice.marshall_sublattice(N)
    obs = StaggeredMagnetizationSquared(sub)
    local = np.asarray(obs.local_value(wf, params, jnp.asarray(states)))
    weights = v0 ** 2 / np.sum(v0 ** 2)
    exact = float(np.sum(weights * local))
    assert 0.0 < exact < 0.25  # AFM order parameter in a sane range

    config = Config(num_sites=N, batch_size=256,
                    num_equilibration_sweeps=20, num_monte_carlo_sweeps=2,
                    num_evaluation_samples=60)
    result = evaluate_operator(wf, params, obs, config,
                               key=jax.random.key(5))
    assert abs(result.mean - exact) < 5 * max(result.error, 1e-4)
