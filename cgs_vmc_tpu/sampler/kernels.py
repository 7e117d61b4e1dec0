"""Pallas TPU kernel: fused RBM Metropolis exchange sweeps.

The hot-path sampler of SURVEY.md §7 stage 12.  For the classic RBM ansatz
(logψ(s) = a·s + Σ_h log cosh(s·W + b)_h — our RestrictedBoltzmannNetwork
with num_layers = 0) an exchange move admits an O(H) incremental update:

    Δθ = (s_j − s_i) · (W[i,:] − W[j,:]),
    Δlogψ = (s_j − s_i)(a_i − a_j) + Σ_h [logcosh(θ+Δθ) − logcosh(θ)]_h,

instead of the O(N·H) full forward pass the generic sampler pays per
proposal.  The kernel keeps configs, θ-caches and acceptance statistics
VMEM-resident for the whole multi-sweep call and fuses proposal, ratio and
accept/reject on the VPU — HBM traffic per invocation is one load + one
store of the chain state plus the streamed randomness.

Proposal schedule: a *shared pair scan* — every step exchanges one random
site pair (i_t, j_t), the same pair for all chains (pairs are sampled on
host, unbiased).  Exchanging equal spins is a no-op and is masked
inactive.  Each step is a valid symmetric-proposal Metropolis kernel for
|ψ|², so the scan composition preserves the Born distribution; chains
share the pair SEQUENCE (common random numbers) but accept/reject with
independent per-chain uniforms, keeping the reference's acceptance rule
(|ψ'/ψ|² > u, cgs_vmc/graph_builders.py:75-79) and Sz conservation.

Randomness enters as explicit inputs (pairs + acceptance uniforms from
`jax.random`), making the kernel a deterministic pure function — bitwise
comparable against the pure-JAX oracle on any backend.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _log_cosh(x):
    ax = jnp.abs(x)
    return ax + jnp.log1p(jnp.exp(-2.0 * ax)) - jnp.log(2.0)


class RbmSweepResult(NamedTuple):
    configs: jax.Array       # [chains, n_sites] updated spins
    theta: jax.Array         # [chains, hidden] updated θ-cache
    log_amp: jax.Array       # [chains] updated logψ
    num_accepted: jax.Array  # [chains] accepted-move counts this call


def _sweep_kernel(pairs_ref,                          # scalar prefetch
                  configs_ref, theta_ref, logamp_ref,
                  w_ref, a_ref, log_u_ref,
                  out_configs, out_theta, out_logamp, out_accepted):
    """One grid step = one chain block; full multi-sweep loop inside.

    Layout: configs are [n_sites, chains] (sites on sublanes, chains on
    lanes) so the per-step dynamic site indexing is a sublane-dimension
    ref slice — the fast, supported Mosaic path.  theta/logψ are carried
    as loop values; the config ref is updated in place.
    """
    n_steps = log_u_ref.shape[0]
    n_chains = theta_ref.shape[0]

    out_configs[:] = configs_ref[:]

    def step(t, carry):
        # lc = logcosh(theta) is carried across steps: only the PROPOSED
        # theta needs a fresh transcendental evaluation each step.
        theta, lc, log_amp, accepted = carry
        i = pairs_ref[t, 0]
        j = pairs_ref[t, 1]

        s_i = out_configs[pl.ds(i, 1), :]         # [1, chains]
        s_j = out_configs[pl.ds(j, 1), :]
        flip = (s_j - s_i)[0]                     # [chains]; ±2 if active
        active = flip != 0.0

        w_i = w_ref[pl.ds(i, 1), :]               # [1, hidden]
        w_j = w_ref[pl.ds(j, 1), :]
        d_w = (w_i - w_j)[0]                      # [hidden]
        theta_new = theta + flip[:, None] * d_w[None, :]
        lc_new = _log_cosh(theta_new)

        a_i = a_ref[0, i]
        a_j = a_ref[0, j]
        d_onsite = flip * (a_i - a_j)
        d_log = d_onsite + jnp.sum(lc_new - lc, axis=-1)

        log_u = log_u_ref[pl.ds(t, 1), :][0]      # [chains]
        # f32 mask arithmetic: Mosaic cannot reshape/broadcast i1 vectors
        # along the minor dim, and select == lerp-by-mask here anyway.
        acc = (jnp.logical_and(active, 2.0 * d_log > log_u)
               ).astype(jnp.float32)              # [chains]

        acc_row = acc[None, :]
        out_configs[pl.ds(i, 1), :] = s_i + acc_row * (s_j - s_i)
        out_configs[pl.ds(j, 1), :] = s_j + acc_row * (s_i - s_j)
        acc_col = acc[:, None]
        theta = theta + acc_col * (theta_new - theta)
        lc = lc + acc_col * (lc_new - lc)
        log_amp = log_amp + acc * d_log
        accepted = accepted + acc
        return theta, lc, log_amp, accepted

    theta0 = theta_ref[:]
    init = (theta0, _log_cosh(theta0), logamp_ref[:],
            jnp.zeros((n_chains,), jnp.float32))
    theta, _, log_amp, accepted = lax.fori_loop(0, n_steps, step, init)
    out_theta[:] = theta
    out_logamp[:] = log_amp
    out_accepted[:] = accepted


@functools.partial(jax.jit, static_argnames=('block_chains', 'interpret'))
def rbm_sweeps(w: jax.Array, b: jax.Array, a: jax.Array,
               configs: jax.Array, pairs: jax.Array, key: jax.Array,
               block_chains: int = 2048, interpret: bool = False
               ) -> RbmSweepResult:
    """Runs len(pairs) fused exchange steps on all chains.

    Args:
      w: [n_sites, hidden] RBM kernel.
      b: [hidden] hidden bias.
      a: [n_sites] visible (on-site) bias.
      configs: [chains, n_sites] ±1 float32.
      pairs: [n_steps, 2] int32 site pairs (host-sampled, shared by chains).
      key: PRNG key for per-chain acceptance uniforms.
      block_chains: chains per kernel instance (VMEM budget knob).
      interpret: run under the TPU-semantics interpreter (CPU tests).

    Returns RbmSweepResult with updated state and per-chain accept counts.
    """
    n_chains, n_sites = configs.shape
    hidden = w.shape[1]
    if n_chains % block_chains:
        raise ValueError(f'chains {n_chains} % block {block_chains} != 0')
    n_steps = pairs.shape[0]
    # One kernel invocation handles one sweep's worth of steps; longer runs
    # scan over invocations (keeps Mosaic compile time flat and the
    # uniforms block within VMEM budget).  Pad to a whole number of chunks
    # with no-op steps (i == j exchanges are masked inactive).
    chunk = min(n_steps, max(n_sites, 8))
    n_chunks = -(-n_steps // chunk)
    pad = n_chunks * chunk - n_steps
    if pad:
        pairs = jnp.concatenate(
            [pairs, jnp.zeros((pad, 2), jnp.int32)], axis=0)

    theta = configs @ w + b                    # [chains, hidden]
    onsite = configs @ a                       # [chains]
    log_amp = onsite + jnp.sum(_log_cosh(theta), axis=-1)
    log_u = jnp.log(jax.random.uniform(key, (n_chunks * chunk, n_chains),
                                       jnp.float32))
    configs_t = configs.T                      # [n_sites, chains]

    grid = (n_chains // block_chains,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_sites, block_chains), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, hidden), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains,), lambda g, *_: (g,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sites, hidden), lambda g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_sites), lambda g, *_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, block_chains), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_sites, block_chains), lambda g, *_: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, hidden), lambda g, *_: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains,), lambda g, *_: (g,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains,), lambda g, *_: (g,),
                         memory_space=pltpu.VMEM),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((n_sites, n_chains), jnp.float32),
        jax.ShapeDtypeStruct((n_chains, hidden), jnp.float32),
        jax.ShapeDtypeStruct((n_chains,), jnp.float32),
        jax.ShapeDtypeStruct((n_chains,), jnp.float32),
    ]
    # bool interpret=True selects the TPU-semantics interpreter.
    interpret_mode = pltpu.InterpretParams() if interpret else False
    kernel_call = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret_mode,
    )
    a_row = a.reshape(1, n_sites)

    def chunk_step(carry, inputs):
        configs_t, theta, log_amp, accepted = carry
        pairs_chunk, log_u_chunk = inputs
        configs_t, theta, log_amp, acc = kernel_call(
            pairs_chunk, configs_t, theta, log_amp, w, a_row, log_u_chunk)
        return (configs_t, theta, log_amp, accepted + acc), None

    xs = (pairs.reshape(n_chunks, chunk, 2),
          log_u.reshape(n_chunks, chunk, n_chains))
    init = (configs_t, theta, log_amp, jnp.zeros((n_chains,), jnp.float32))
    (new_configs_t, new_theta, new_logamp, accepted), _ = lax.scan(
        chunk_step, init, xs)
    new_configs = new_configs_t.T
    # Recompute the caches from the final configs: one matmul removes all
    # accumulated f32 drift from thousands of incremental updates.
    new_theta = new_configs @ w + b
    new_logamp = new_configs @ a + jnp.sum(_log_cosh(new_theta), axis=-1)

    return RbmSweepResult(new_configs, new_theta, new_logamp, accepted)


def rbm_sweeps_reference(w, b, a, configs, pairs, key) -> RbmSweepResult:
    """Pure-JAX implementation of the same shared-pair-scan semantics
    (full recompute per step) — the correctness oracle for the kernel.
    Consumes the SAME uniforms as the kernel, so results are bitwise
    comparable up to float associativity."""
    n_steps = pairs.shape[0]
    n_chains = configs.shape[0]
    log_u = jnp.log(jax.random.uniform(key, (n_steps, n_chains),
                                       jnp.float32))

    def log_psi(c):
        theta = c @ w + b
        return c @ a + jnp.sum(_log_cosh(theta), axis=-1)

    def step(carry, inputs):
        configs, accepted = carry
        pair, log_u_t = inputs
        i, j = pair[0], pair[1]
        s_i, s_j = configs[:, i], configs[:, j]
        active = s_i != s_j
        proposed = configs.at[:, i].set(s_j).at[:, j].set(s_i)
        d_log = log_psi(proposed) - log_psi(configs)
        accept = jnp.logical_and(active, 2.0 * d_log > log_u_t)
        configs = jnp.where(accept[:, None], proposed, configs)
        accepted = accepted + accept.astype(jnp.float32)
        return (configs, accepted), None

    init = (configs, jnp.zeros((n_chains,), jnp.float32))
    (configs, accepted), _ = lax.scan(step, init, (pairs, log_u))
    theta = configs @ w + b
    log_amp = configs @ a + jnp.sum(_log_cosh(theta), axis=-1)
    return RbmSweepResult(configs, theta, log_amp, accepted)


def sample_pairs(key: jax.Array, num_steps: int, n_sites: int) -> jax.Array:
    """Host-side unbiased random site pairs (i != j), [num_steps, 2] i32."""
    key_i, key_j = jax.random.split(key)
    i = jax.random.randint(key_i, (num_steps,), 0, n_sites)
    # j uniform over the remaining n_sites - 1 sites.
    j = jax.random.randint(key_j, (num_steps,), 0, n_sites - 1)
    j = jnp.where(j >= i, j + 1, j)
    return jnp.stack([i, j], axis=1).astype(jnp.int32)
