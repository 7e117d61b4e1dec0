"""Tests for the fused Pallas RBM sweep kernel (TPU interpreter on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgs_vmc_tpu import basis
from cgs_vmc_tpu.sampler import kernels

N = 8
H = 16
CHAINS = 32


def _rbm_params(key, scale=0.3):
    k1, k2, k3 = jax.random.split(key, 3)
    w = scale * jax.random.normal(k1, (N, H), jnp.float32)
    b = scale * jax.random.normal(k2, (H,), jnp.float32)
    a = scale * jax.random.normal(k3, (N,), jnp.float32)
    return w, b, a


def _log_psi(w, b, a, configs):
    theta = configs @ w + b
    ax = jnp.abs(theta)
    log_cosh = ax + jnp.log1p(jnp.exp(-2 * ax)) - jnp.log(2.0)
    return configs @ a + jnp.sum(log_cosh, axis=-1)


def _run(w, b, a, configs, picks, key):
    return kernels.rbm_sweeps(w, b, a, configs, picks, key,
                              block_chains=CHAINS, interpret=True)


def test_kernel_matches_reference_exactly():
    """Same picks + same uniforms => identical trajectories (the kernel's
    incremental updates vs the oracle's full recomputation)."""
    w, b, a = _rbm_params(jax.random.key(0))
    configs = basis.random_configurations(jax.random.key(1), N, CHAINS)
    picks = kernels.sample_picks(jax.random.key(2), 64, N, CHAINS)
    key = jax.random.key(3)

    out = _run(w, b, a, configs, picks, key)
    ref = kernels.rbm_sweeps_reference(w, b, a, configs, picks, key)

    np.testing.assert_array_equal(np.asarray(out.configs),
                                  np.asarray(ref.configs))
    np.testing.assert_array_equal(np.asarray(out.num_accepted),
                                  np.asarray(ref.num_accepted))
    np.testing.assert_allclose(np.asarray(out.log_amp),
                               np.asarray(ref.log_amp), rtol=1e-4,
                               atol=1e-4)


def test_theta_and_logamp_caches_consistent():
    """Incremental θ/logψ updates must equal full recomputation."""
    w, b, a = _rbm_params(jax.random.key(4))
    configs = basis.random_configurations(jax.random.key(5), N, CHAINS)
    picks = kernels.sample_picks(jax.random.key(6), 64, N, CHAINS)
    out = _run(w, b, a, configs, picks, jax.random.key(7))

    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(out.configs @ w + b),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.log_amp),
        np.asarray(_log_psi(w, b, a, out.configs)),
        rtol=1e-4, atol=1e-4)


def test_moves_conserve_sz():
    w, b, a = _rbm_params(jax.random.key(8))
    configs = basis.random_configurations(jax.random.key(9), N, CHAINS)
    picks = kernels.sample_picks(jax.random.key(10), 100, N, CHAINS)
    out = _run(w, b, a, configs, picks, jax.random.key(11))
    arr = np.asarray(out.configs)
    assert set(np.unique(arr)) <= {-1.0, 1.0}
    np.testing.assert_array_equal(arr.sum(axis=1), np.zeros(CHAINS))


def test_always_reject():
    """A deeply peaked wavefunction rejects every move away from the
    current configs: state must be unchanged."""
    w = jnp.zeros((N, H))
    b = jnp.zeros((H,))
    configs = basis.random_configurations(jax.random.key(12), N, CHAINS)
    a = 50.0 * configs[0]
    same = jnp.tile(configs[0][None, :], (CHAINS, 1))
    picks = kernels.sample_picks(jax.random.key(13), 50, N, CHAINS)
    out = _run(w, b, a, same, picks, jax.random.key(14))
    np.testing.assert_array_equal(np.asarray(out.configs), np.asarray(same))
    assert float(out.num_accepted.sum()) == 0.0


def test_picks_are_per_chain_independent():
    """Round-1 review: shared pairs coupled chains through common random
    numbers.  The rank picks must differ ACROSS chains within a step, and
    two chains started from the same config with the same wavefunction
    must follow different trajectories."""
    picks = np.asarray(kernels.sample_picks(jax.random.key(20), 40, N, 64))
    # At least one step where not all chains share the same pick.
    per_step_unique = [len(np.unique(picks[t, :, 0])) for t in range(40)]
    assert max(per_step_unique) > 1

    w, b, a = _rbm_params(jax.random.key(21), scale=0.1)
    start = basis.random_configurations(jax.random.key(22), N, 1)
    same = jnp.tile(start, (CHAINS, 1))
    picks = kernels.sample_picks(jax.random.key(23), 4 * N, N, CHAINS)
    out = _run(w, b, a, same, picks, jax.random.key(24))
    arr = np.asarray(out.configs)
    assert np.unique(arr, axis=0).shape[0] > 1


@pytest.mark.slow
def test_cross_chain_batch_mean_variance():
    """Independence oracle: the variance of the cross-chain batch mean of
    an observable must match the independent-chain prediction
    var(mean) ≈ var(single chain) / n_chains (within MC error).  Under the
    old shared-pair schedule chains were positively correlated and this
    ratio inflated."""
    w, b, a = _rbm_params(jax.random.key(30), scale=0.15)
    chains = 512
    configs = basis.random_configurations(jax.random.key(31), N, chains)
    # Equilibrate.
    picks = kernels.sample_picks(jax.random.key(32), 20 * N, N, chains)
    configs = kernels.rbm_sweeps(w, b, a, configs, picks, jax.random.key(33),
                                 block_chains=chains, interpret=True).configs
    # Collect batch means of a spin-pair observable over repeated blocks.
    batch_means = []
    values = []
    for it in range(30):
        picks = kernels.sample_picks(jax.random.key(40 + 2 * it), 2 * N, N,
                                     chains)
        out = kernels.rbm_sweeps(w, b, a, configs, picks,
                                 jax.random.key(41 + 2 * it),
                                 block_chains=chains, interpret=True)
        configs = out.configs
        obs = np.asarray(configs[:, 0] * configs[:, 1])   # per-chain ±1
        batch_means.append(obs.mean())
        values.append(obs)
    values = np.concatenate(values)
    var_single = values.var()
    var_mean = np.var(batch_means, ddof=1)
    # Independent chains: var_mean ≈ var_single / chains (decorrelated
    # blocks).  Allow generous slack for autocorrelation noise, but a
    # shared-schedule coupling inflates this by O(chains), not O(1).
    assert var_mean < 6.0 * var_single / chains, (
        f'batch-mean variance {var_mean:.3e} vs independent prediction '
        f'{var_single / chains:.3e} — chains look correlated')


@pytest.mark.slow
def test_kernel_samples_born_distribution():
    """Kernel chains sample |ψ|² of the RBM (TV distance vs exact)."""
    w, b, a = _rbm_params(jax.random.key(15), scale=0.15)
    states = jnp.asarray(basis.enumerate_sz_basis(N))
    log_psi = _log_psi(w, b, a, states)
    exact = np.exp(2 * np.asarray(log_psi - log_psi.max(), np.float64))
    exact /= exact.sum()

    chains = 256
    configs = basis.random_configurations(jax.random.key(16), N, chains)
    top, bot = basis.make_lin_tables(N)
    top, bot = jnp.asarray(top), jnp.asarray(bot)
    lin_of_enum = np.asarray(basis.lin_index(states, top, bot))
    enum_of_lin = np.empty_like(lin_of_enum)
    enum_of_lin[lin_of_enum] = np.arange(len(lin_of_enum))

    counts = np.zeros(states.shape[0])
    for it in range(50):
        picks = kernels.sample_picks(jax.random.key(2 * it), 2 * N, N,
                                     chains)
        out = kernels.rbm_sweeps(w, b, a, configs, picks,
                                 jax.random.key(2 * it + 1),
                                 block_chains=chains, interpret=True)
        configs = out.configs
        if it >= 10:  # discard equilibration
            idx = np.asarray(basis.lin_index(configs, top, bot))
            np.add.at(counts, enum_of_lin[idx], 1)
    empirical = counts / counts.sum()
    tv = 0.5 * np.abs(empirical - exact).sum()
    assert tv < 0.08, f'TV distance {tv} too large'


@pytest.mark.slow
def test_groups_interleaving_is_trajectory_invariant():
    """groups=2/4 (the ILP latency knob) must produce bitwise the same
    trajectories as groups=1 — the groups share no data."""
    w, b, a = _rbm_params(jax.random.key(50))
    configs = basis.random_configurations(jax.random.key(51), N, CHAINS)
    picks = kernels.sample_picks(jax.random.key(52), 48, N, CHAINS)
    key = jax.random.key(53)
    base = kernels.rbm_sweeps(w, b, a, configs, picks, key,
                              block_chains=CHAINS, interpret=True)
    for groups in (2, 4):
        out = kernels.rbm_sweeps(w, b, a, configs, picks, key,
                                 block_chains=CHAINS, interpret=True,
                                 groups=groups)
        np.testing.assert_array_equal(np.asarray(out.configs),
                                      np.asarray(base.configs))
        np.testing.assert_array_equal(np.asarray(out.num_accepted),
                                      np.asarray(base.num_accepted))


def test_prng_kernel_smoke_invariants():
    """In-kernel-PRNG variant: CPU smoke only — the TPU interpreter stubs
    prng_random_bits to zeros (memory: jax 0.9.0), so trajectories are
    degenerate here (rank-0/rank-0 picks, always-accept); shapes, spin
    values, Sz conservation and cache consistency still must hold.  Real
    statistical validation runs on TPU (examples/bench_prng_kernel.py)."""
    n_sites, n_chains, hidden = 8, 16, 8
    key = jax.random.key(0)
    w = 0.1 * jax.random.normal(key, (n_sites, hidden), jnp.float32)
    b = jnp.zeros((hidden,), jnp.float32)
    a = jnp.zeros((n_sites,), jnp.float32)
    configs = basis.random_configurations(jax.random.key(1), n_sites,
                                          n_chains)
    out = kernels.rbm_sweeps_prng(w, b, a, configs, 5, 7,
                                  block_chains=n_chains, interpret=True)
    arr = np.asarray(out.configs)
    assert set(np.unique(arr)) <= {-1.0, 1.0}
    np.testing.assert_array_equal(arr.sum(axis=1),
                                  np.asarray(configs).sum(axis=1))
    # Caches recomputed from final configs must match a fresh forward.
    theta = arr @ np.asarray(w) + np.asarray(b)
    log_amp = arr @ np.asarray(a) + np.log(np.cosh(theta)).sum(-1)
    np.testing.assert_allclose(np.asarray(out.log_amp), log_amp, rtol=1e-5)
    assert np.all(np.asarray(out.num_accepted) >= 0)
