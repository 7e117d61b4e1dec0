"""SR oracle: natural gradient against the explicitly constructed S-matrix
(SURVEY.md §4.2d) and solver cross-checks."""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp

from cgs_vmc_tpu import basis, lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim.sr import StochasticReconfiguration

N = 8
BONDS = lattice.chain_bonds(N)
SHIFT = 1e-2


def _setup(solver):
    config = Config(num_sites=N, wavefunction_type='rbm', num_fc_layers=0,
                    fc_layer_size=8, batch_size=64, num_batches_per_epoch=2,
                    num_equilibration_sweeps=2, heisenberg_jx=-1.0,
                    sr_diag_shift=SHIFT, sr_solver=solver,
                    sr_cg_maxiter=400, sr_cg_tol=1e-10,
                    use_fast_sampler=False, seed=4)
    wf = build_wavefunction(config)
    ham = HeisenbergHamiltonian(BONDS, -1.0, 1.0)
    return config, wf, StochasticReconfiguration(wf, ham, config)


def _explicit_natural_gradient(wf, params, configs, e_loc):
    """Reference computation: build S and g explicitly, dense-solve in f64.
    Uses the same scale-invariant shift as the dense solver:
    eps_eff = SHIFT * mean(diag(O O^T / M))."""
    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def log_flat(p):
        return wf.apply(unravel(p), configs).log

    jac = np.asarray(jax.jacrev(log_flat)(flat), np.float64)
    jac = jac - jac.mean(axis=0, keepdims=True)
    m = jac.shape[0]
    e_centered = np.asarray(e_loc, np.float64) - np.mean(e_loc)
    s_matrix = jac.T @ jac / m
    g = jac.T @ e_centered / m
    eps_eff = SHIFT * np.mean(np.sum(jac * jac, axis=1) / m)
    delta = np.linalg.solve(s_matrix + eps_eff * np.eye(len(flat)), g)
    return delta, eps_eff


def test_dense_solver_matches_explicit_s_matrix():
    config, wf, opt = _setup('dense')
    params = wf.init(jax.random.key(0))
    configs = basis.random_configurations(jax.random.key(1), N, 64)
    e_loc = opt.hamiltonian.local_value(wf, params, configs)
    e_mean = jnp.mean(e_loc)

    def log_fn(p):
        return wf.apply(p, configs).log

    delta, _, _ = opt._dense_solve(configs, params, e_loc, e_mean, None)
    flat_delta, _ = jax.flatten_util.ravel_pytree(delta)
    expected, _ = _explicit_natural_gradient(wf, params, configs, e_loc)
    np.testing.assert_allclose(np.asarray(flat_delta), expected,
                               rtol=2e-3, atol=2e-4)


def test_cg_solver_matches_dense():
    """CG (absolute shift) equals dense (relative shift) when the CG config
    is given the dense solver's effective epsilon."""
    config, wf, opt_dense = _setup('dense')
    params = wf.init(jax.random.key(2))
    configs = basis.random_configurations(jax.random.key(3), N, 64)
    e_loc = opt_dense.hamiltonian.local_value(wf, params, configs)
    e_mean = jnp.mean(e_loc)

    _, eps_eff = _explicit_natural_gradient(wf, params, configs, e_loc)
    config_cg, wf_cg, opt_cg = _setup('cg')
    opt_cg.config = config_cg.replace(sr_diag_shift=float(eps_eff))

    def log_fn(p):
        return wf.apply(p, configs).log

    delta_cg, _, _ = opt_cg._cg_solve(log_fn, params, e_loc, e_mean, 64,
                                      None)
    delta_dense, _, _ = opt_dense._dense_solve(configs, params, e_loc,
                                               e_mean, None)
    for a, b in zip(jax.tree.leaves(delta_cg), jax.tree.leaves(delta_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
