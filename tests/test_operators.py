"""Physics-oracle tests for the Heisenberg operators.

The strongest checks VMC affords (SURVEY.md §4.2): local energies against a
dense ED Hamiltonian, the zero-variance property of the exact ground state,
and the energy-gradient estimator against the exact Rayleigh-quotient
derivative.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cgs_vmc_tpu import basis, lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import FullVector, build_wavefunction
from cgs_vmc_tpu.ops import logamp
from cgs_vmc_tpu.ops.heisenberg import HeisenbergBond, HeisenbergHamiltonian, ite_target
from cgs_vmc_tpu.utils import ed

N = 8
BONDS = lattice.chain_bonds(N)


def _random_sector_vector(seed=0):
    dim = basis.enumerate_sz_basis(N).shape[0]
    rng = np.random.RandomState(seed)
    vec = rng.randn(dim).astype(np.float32)
    return vec


def test_local_energy_matches_dense_matrix():
    """E_loc(R) == (H psi)(R) / psi(R) computed from the dense H."""
    vec = _random_sector_vector()
    wf = FullVector.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = basis.enumerate_sz_basis(N)
    ham = HeisenbergHamiltonian(BONDS, j_x=0.7, j_z=1.3)
    e_loc = np.asarray(ham.local_value(wf, params, jnp.asarray(states)))

    dense = ed.heisenberg_matrix(N, BONDS, j_x=0.7, j_z=1.3, sparse=False)
    expected = (dense @ vec.astype(np.float64)) / vec
    np.testing.assert_allclose(e_loc, expected, rtol=2e-4)


def test_exact_ground_state_zero_variance():
    e0, v0 = ed.ground_state(N, BONDS)
    wf = FullVector.for_sector(N, v0.astype(np.float32))
    params = wf.init(jax.random.key(0))
    states = jnp.asarray(basis.enumerate_sz_basis(N))
    e_loc = np.asarray(HeisenbergHamiltonian(BONDS).local_value(
        wf, params, states))
    np.testing.assert_allclose(e_loc, e0, rtol=1e-3)
    assert e_loc.std() < 1e-3


def test_single_bond_operator():
    vec = _random_sector_vector(3)
    wf = FullVector.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = basis.enumerate_sz_basis(N)
    bond = HeisenbergBond((2, 5), j_x=1.0, j_z=1.0)
    e_loc = np.asarray(bond.local_value(wf, params, jnp.asarray(states)))

    dense = ed.heisenberg_matrix(N, np.asarray([[2, 5]]), sparse=False)
    expected = (dense @ vec.astype(np.float64)) / vec
    np.testing.assert_allclose(e_loc, expected, rtol=2e-4)


def test_apply_in_place_and_transformed_wavefunction():
    vec = _random_sector_vector(4)
    wf = FullVector.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = jnp.asarray(basis.enumerate_sz_basis(N))
    ham = HeisenbergHamiltonian(BONDS)

    h_psi = logamp.to_value(ham.apply_in_place(wf, params, states))
    dense = ed.heisenberg_matrix(N, BONDS, sparse=False)
    np.testing.assert_allclose(
        np.asarray(h_psi), dense @ vec.astype(np.float64), rtol=2e-4,
        atol=1e-5)

    applied = ham.apply(wf)
    h_psi2 = logamp.to_value(applied.apply(params, states))
    np.testing.assert_allclose(np.asarray(h_psi2), np.asarray(h_psi),
                               rtol=1e-5)


def test_ite_target():
    """(1 - beta H)|psi> matches the dense computation."""
    beta = 0.12
    vec = _random_sector_vector(5)
    wf = FullVector.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = jnp.asarray(basis.enumerate_sz_basis(N))
    ham = HeisenbergHamiltonian(BONDS)
    target = ite_target(ham, wf, beta)
    values = np.asarray(logamp.to_value(target.apply(params, states)))
    dense = ed.heisenberg_matrix(N, BONDS, sparse=False)
    expected = vec - beta * (dense @ vec.astype(np.float64))
    np.testing.assert_allclose(values, expected, rtol=3e-4, atol=1e-5)


@pytest.mark.slow
def test_energy_gradient_matches_rayleigh_derivative():
    """<E O> - <E><O> == d/dtheta <H>/2 exactly on the full basis
    (factor 2 for real wavefunctions; reference uses the same estimator,
    cgs_vmc/training.py:545-564)."""
    config = Config(num_sites=N, wavefunction_type='rbm',
                    num_fc_layers=1, fc_layer_size=6)
    wf = build_wavefunction(config)
    params = wf.init(jax.random.key(5))
    states = jnp.asarray(basis.enumerate_sz_basis(N))
    ham = HeisenbergHamiltonian(BONDS)

    def rayleigh(p):
        amp = wf.apply(p, states)
        w = jnp.exp(2 * (amp.log
                         - jnp.max(jax.lax.stop_gradient(amp.log))))
        w = w / jnp.sum(w)
        return jnp.sum(w * ham.local_value(wf, p, states))

    g_exact = jax.jit(jax.grad(rayleigh))(params)

    amp = wf.apply(params, states)
    w = jnp.exp(2 * (amp.log - jnp.max(amp.log)))
    w = w / jnp.sum(w)
    e_loc = ham.local_value(wf, params, states)
    _, pullback = jax.vjp(lambda p: wf.apply(p, states).log, params)
    g_o = pullback(w)[0]
    g_eo = pullback(w * e_loc)[0]
    e_mean = jnp.sum(w * e_loc)
    g_est = jax.tree.map(lambda a, b: a - e_mean * b, g_eo, g_o)

    for exact, est in zip(jax.tree.leaves(g_exact), jax.tree.leaves(g_est)):
        np.testing.assert_allclose(
            np.asarray(exact), 2.0 * np.asarray(est), rtol=5e-3, atol=1e-5)


def test_chunked_local_value_matches_unchunked():
    """sample_chunk slicing must not change local energies."""
    from cgs_vmc_tpu.models import FullVector
    vec = _random_sector_vector(7)
    wf = FullVector.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = jnp.asarray(basis.enumerate_sz_basis(N))[:64]
    full = HeisenbergHamiltonian(BONDS).local_value(wf, params, states)
    chunked = HeisenbergHamiltonian(BONDS, sample_chunk=16).local_value(
        wf, params, states)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6)


@pytest.mark.slow
def test_chunked_local_value_threads_provided_amp():
    """With a precomputed denominator amp, the chunked path must slice it
    per chunk (not recompute) and still match the unchunked value — on a
    non-divisible batch so amp padding is exercised too."""
    vec = _random_sector_vector(3)
    from cgs_vmc_tpu.models import FullVector as FV
    wf = FV.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = jnp.asarray(basis.enumerate_sz_basis(N))[:50]  # 50 % 16 != 0
    amp = wf.apply(params, states)
    full = HeisenbergHamiltonian(BONDS).local_value(wf, params, states, amp)
    chunked = HeisenbergHamiltonian(BONDS, sample_chunk=16).local_value(
        wf, params, states, amp)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6)


@pytest.mark.slow
def test_chunked_local_value_non_divisible_batch():
    """batch % sample_chunk != 0 must pad-and-chunk, not silently fall back
    to the full fan-out (round-1 ADVICE: silent chunking skip)."""
    vec = _random_sector_vector(11)
    from cgs_vmc_tpu.models import FullVector as FV
    wf = FV.for_sector(N, vec)
    params = wf.init(jax.random.key(0))
    states = jnp.asarray(basis.enumerate_sz_basis(N))[:50]  # 50 % 16 != 0
    full = HeisenbergHamiltonian(BONDS).local_value(wf, params, states)
    chunked = HeisenbergHamiltonian(BONDS, sample_chunk=16).local_value(
        wf, params, states)
    assert chunked.shape == full.shape
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-6)
