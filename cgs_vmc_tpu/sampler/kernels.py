"""Pallas TPU kernel: fused RBM Metropolis exchange sweeps.

The hot-path sampler of SURVEY.md §7 stage 12.  For the classic RBM ansatz
(logψ(s) = a·s + Σ_h log cosh(s·W + b)_h — our RestrictedBoltzmannNetwork
with num_layers = 0) an exchange move admits an O(H) incremental update:

    Δθ = (s_j − s_i) · (W[i,:] − W[j,:]),
    Δlogψ = (s_j − s_i)(a_i − a_j) + Σ_h [logcosh(θ+Δθ) − logcosh(θ)]_h,

instead of the O(N·H) full forward pass the generic sampler pays per
proposal.  The kernel keeps configs, θ-caches and acceptance statistics
VMEM-resident for the whole multi-sweep call and fuses proposal, ratio and
accept/reject on the VPU/MXU — HBM traffic per invocation is one load +
one store of the chain state plus the streamed randomness.

Proposal schedule: INDEPENDENT PER-CHAIN exchange moves with the
reference's pick semantics (cgs_vmc/graph_builders.py:59-65): each chain
independently exchanges one uniformly random −1 spin with one uniformly
random +1 spin each step (always Sz-conserving, always an active
proposal), accepted with |ψ'/ψ|² > u.  The picks are streamed as per-chain
RANKS (k-th down spin, k-th up spin) — which are configuration-independent
because exchange moves conserve the spin counts — and resolved to site
one-hots in-kernel with a Hillis–Steele cumulative count along the site
(sublane) axis.  Chains share nothing: no common random numbers, so batch
means over the 2048 chains carry no cross-chain covariance (round-1 review
flagged the previous shared-pair schedule for exactly that).

Per-chain site selection is one-hot based: Δθ for all chains is ONE
[chains, n_sites] × [n_sites, hidden] matmul on the MXU rather than a
per-chain gather (scalar gathers are the slow path on TPU; a small dense
contraction is the fast one).

Randomness enters as explicit inputs (rank picks + acceptance uniforms
from `jax.random`), making the kernel a deterministic pure function —
bitwise comparable against the pure-JAX oracle on any backend.
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


def _inclusive_cumsum_rows(x, n_rows):
    """Hillis–Steele inclusive scan along the sublane (row) axis.

    Mosaic has no native cumsum; log2(n_rows) circular rolls with the
    wrapped rows masked out implement it in ~3·log2(n) cheap vector ops.
    """
    row = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < n_rows:
        rolled = pltpu.roll(x, shift=shift, axis=0)
        x = x + jnp.where(row >= shift, rolled, 0.0)
        shift *= 2
    return x


def _sweep_kernel(configs_ref, theta_ref, logamp_ref,
                  w_ref, a_ref, kd_ref, ku_ref, log_u_ref,
                  out_configs, out_theta, out_logamp, out_accepted,
                  groups: int = 1):
    """One grid step = one chain block; a chunk of steps looped inside.

    Layout: configs are [n_sites, chains] (sites on sublanes, chains on
    lanes — 36 sites use lanes 3.2× better than the transpose).  theta,
    logcosh(theta) and logψ are carried as loop values; the config ref is
    updated in place.

    `groups` > 1 splits the chains into independent column groups whose
    per-step updates are emitted side by side in the loop body: the
    groups share no data, so the scheduler can overlap their serial
    dependency chains (the per-step latency, not op count, bounds this
    kernel — ROADMAP 'Pallas kernel latency').
    """
    n_steps = log_u_ref.shape[0]
    n_sites = configs_ref.shape[0]
    n_chains = theta_ref.shape[0]
    width = n_chains // groups

    out_configs[:] = configs_ref[:]
    # Mosaic supports integer iota only; convert for the f32 rank compare.
    row = lax.broadcasted_iota(
        jnp.int32, (n_sites, width), 0).astype(jnp.float32)

    def group_step(t, g, carry):
        # lc = logcosh(theta) and the inclusive down-count are carried
        # across steps: only the PROPOSED theta needs a fresh
        # transcendental evaluation, and an accepted exchange changes the
        # cumulative count only at sites ≥ the two flipped positions —
        # a two-compare update instead of a log₂(n)-roll rescan.
        #
        # Measured negative result (round 4, v5e, bench.py shapes): carrying
        # only the hidden-axis SUM of logcosh (a [width] vector) instead of
        # the full [width, hidden] table is ~25% SLOWER (4.8k vs 6.4k
        # sweeps/s) despite fewer carried bytes — the [width]-shaped
        # reduce + scalar-ish updates on the serial critical path lower
        # worse under Mosaic than full-vreg lerps. Keep the table.
        theta, lc, log_amp, accepted, count, total_down = carry
        cols = slice(g * width, (g + 1) * width)
        cfg = out_configs[:, cols]                # [n_sites, width]
        k_down = kd_ref[pl.ds(t, 1), cols]        # [1, width] f32 ranks
        k_up = ku_ref[pl.ds(t, 1), cols]

        down = 0.5 * (1.0 - cfg)                  # 1.0 on −1 spins
        rank_down = count - down                  # exclusive count of downs
        rank_up = row - count                     # exclusive count of ups
        onehot_down = down * (rank_down == k_down).astype(jnp.float32)
        onehot_up = (1.0 - down) * (rank_up == k_up).astype(jnp.float32)
        delta = 2.0 * (onehot_down - onehot_up)   # [n_sites, width]

        # Δθ for every chain in one MXU contraction over the site axis.
        d_theta = lax.dot_general(
            delta, w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [width, hidden]
        theta_new = theta + d_theta
        lc_new = _log_cosh(theta_new)

        d_onsite = jnp.sum(delta * a_ref[:], axis=0)          # [width]
        d_log = d_onsite + jnp.sum(lc_new - lc, axis=-1)

        log_u = log_u_ref[pl.ds(t, 1), cols][0]   # [width]
        # f32 mask arithmetic: Mosaic cannot reshape/broadcast i1 vectors
        # along the minor dim, and select == lerp-by-mask here anyway.
        # Acceptance: |ψ'/ψ|² > u (cgs_vmc/graph_builders.py:75-79).  In
        # the half-filled sector every rank pick selects one −1 and one
        # +1 site (always-active moves); the `active` guard makes a pick
        # beyond the actual spin counts a NO-OP instead of a silent
        # single-spin flip if a caller ever feeds configs from another Sz
        # sector.  The total down count is INVARIANT under exchange moves
        # (+1−1 on the cumulative total), so it is computed once at init
        # and carried — the guard is two compares, not a reduction.
        active = (jnp.logical_and(k_down[0] < total_down,
                                  k_up[0] < n_sites - total_down)
                  ).astype(jnp.float32)
        acc = active * (2.0 * d_log > log_u).astype(jnp.float32)

        out_configs[:, cols] = cfg + acc[None, :] * delta
        # Down removed at the onehot_down site, added at the onehot_up
        # site: inclusive counts shift by ∓1 for all rows ≥ each position.
        pos_removed = jnp.sum(row * onehot_down, axis=0)      # [width]
        pos_added = jnp.sum(row * onehot_up, axis=0)
        acc_row = acc[None, :]
        count = count + acc_row * (
            (row >= pos_added[None, :]).astype(jnp.float32)
            - (row >= pos_removed[None, :]).astype(jnp.float32))
        acc_col = acc[:, None]
        theta = theta + acc_col * d_theta
        lc = lc + acc_col * (lc_new - lc)
        log_amp = log_amp + acc * d_log
        accepted = accepted + acc
        return theta, lc, log_amp, accepted, count, total_down

    def step(t, carries):
        return tuple(group_step(t, g, carry)
                     for g, carry in enumerate(carries))

    def group_init(g):
        cols = slice(g * width, (g + 1) * width)
        theta0 = theta_ref[cols, :]
        down0 = 0.5 * (1.0 - configs_ref[:, cols])
        count0 = _inclusive_cumsum_rows(down0, n_sites)
        return (theta0, _log_cosh(theta0), logamp_ref[cols],
                jnp.zeros((width,), jnp.float32),
                count0, jnp.sum(down0, axis=0))

    init = tuple(group_init(g) for g in range(groups))
    finals = lax.fori_loop(0, n_steps, step, init)
    for g, (theta, _, log_amp, accepted, _, _) in enumerate(finals):
        cols = slice(g * width, (g + 1) * width)
        out_theta[cols, :] = theta
        out_logamp[cols] = log_amp
        out_accepted[cols] = accepted


@functools.partial(jax.jit,
                   static_argnames=('block_chains', 'interpret', 'groups'))
def rbm_sweeps(w: jax.Array, b: jax.Array, a: jax.Array,
               configs: jax.Array, picks: jax.Array, key: jax.Array,
               block_chains: int = 2048, interpret: bool = False,
               groups: int = 1) -> RbmSweepResult:
    """Runs len(picks) fused per-chain exchange steps on all chains.

    Args:
      w: [n_sites, hidden] RBM kernel.
      b: [hidden] hidden bias.
      a: [n_sites] visible (on-site) bias.
      configs: [chains, n_sites] ±1 float32 (Sz = 0 sector).
      picks: [n_steps, chains, 2] int32 per-chain (k_down, k_up) rank
        picks from `sample_picks` — chain c exchanges its k_down-th −1
        spin with its k_up-th +1 spin at each step.
      key: PRNG key for per-chain acceptance uniforms.
      block_chains: chains per kernel instance (VMEM budget knob).
      interpret: run under the TPU-semantics interpreter (CPU tests).
      groups: independent chain groups interleaved inside the loop body
        (ILP knob; identical trajectories for any value).

    Returns RbmSweepResult with updated state and per-chain accept counts.
    """
    n_chains, n_sites = configs.shape
    hidden = w.shape[1]
    if n_chains % block_chains:
        raise ValueError(f'chains {n_chains} % block {block_chains} != 0')
    n_steps = picks.shape[0]
    # One kernel invocation handles several sweeps' worth of steps; longer
    # runs scan over invocations (keeps Mosaic compile time flat and the
    # randomness blocks within VMEM budget — 8 sweeps x 3 streamed f32
    # arrays ≈ 4.5 MB at 36 sites x 2048 chains, amortizing the per-launch
    # overhead over ~300 steps).  Pad to a whole number of chunks with
    # rejected no-op steps (log_u = +inf never accepts and the padded rank
    # picks leave the state untouched on rejection).
    chunk = min(n_steps, 8 * max(n_sites, 8))
    n_chunks = -(-n_steps // chunk)
    pad = n_chunks * chunk - n_steps
    log_u = jnp.log(jax.random.uniform(key, (n_steps, n_chains),
                                       jnp.float32))
    if pad:
        picks = jnp.concatenate(
            [picks, jnp.zeros((pad, n_chains, 2), jnp.int32)], axis=0)
        log_u = jnp.concatenate(
            [log_u, jnp.full((pad, n_chains), jnp.inf, jnp.float32)], axis=0)

    theta = configs @ w + b                    # [chains, hidden]
    onsite = configs @ a                       # [chains]
    log_amp = onsite + jnp.sum(_log_cosh(theta), axis=-1)
    configs_t = configs.T                      # [n_sites, chains]
    # Rank picks as f32 rows: the kernel compares them against f32
    # cumulative counts (integer-valued floats are exact far beyond n_sites).
    kd = picks[:, :, 0].astype(jnp.float32)
    ku = picks[:, :, 1].astype(jnp.float32)

    grid = (n_chains // block_chains,)
    grid_spec = pl.GridSpec(
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_sites, block_chains), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, hidden), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains,), lambda g: (g,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sites, hidden), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sites, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, block_chains), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, block_chains), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, block_chains), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_sites, block_chains), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains, hidden), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains,), lambda g: (g,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_chains,), lambda g: (g,),
                         memory_space=pltpu.VMEM),
        ],
    )

    out_shapes = [
        jax.ShapeDtypeStruct((n_sites, n_chains), jnp.float32),
        jax.ShapeDtypeStruct((n_chains, hidden), jnp.float32),
        jax.ShapeDtypeStruct((n_chains,), jnp.float32),
        jax.ShapeDtypeStruct((n_chains,), jnp.float32),
    ]
    interpret_mode = pltpu.InterpretParams() if interpret else False
    if block_chains % groups:
        raise ValueError(f'block_chains {block_chains} % groups {groups}')
    kernel_call = pl.pallas_call(
        functools.partial(_sweep_kernel, groups=groups),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret_mode,
    )
    a_col = a.reshape(n_sites, 1)

    def chunk_step(carry, inputs):
        configs_t, theta, log_amp, accepted = carry
        kd_chunk, ku_chunk, log_u_chunk = inputs
        configs_t, theta, log_amp, acc = kernel_call(
            configs_t, theta, log_amp, w, a_col,
            kd_chunk, ku_chunk, log_u_chunk)
        return (configs_t, theta, log_amp, accepted + acc), None

    xs = (kd.reshape(n_chunks, chunk, n_chains),
          ku.reshape(n_chunks, chunk, n_chains),
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


def _sweep_kernel_prng(seed_ref, configs_ref, theta_ref, logamp_ref,
                       w_ref, a_ref,
                       out_configs, out_theta, out_logamp, out_accepted,
                       n_steps: int, n_down: int, n_up: int):
    """In-kernel-PRNG variant of `_sweep_kernel` (groups == 1 only).

    Rank picks and acceptance uniforms come from `pltpu.prng_random_bits`
    seeded per (kernel call, grid block), so NOTHING is streamed from HBM:
    the ~12 bytes/step/chain of picks + log-uniforms (≈350 MB per
    400-sweep call at 2048 chains) disappear (round-2 review item).  The
    PRNG state advances on its own serial chain, independent of the
    θ-dependency chain, so the draws can overlap the physics ops.

    Rank uniformity: ranks are floor(u24 · n) with u24 a 24-bit uniform;
    the modulo-free mapping has relative bias ≤ n/2²⁴ (≈1e-6 at n = 18) —
    orders of magnitude below MC statistics.  Untestable under the CPU
    interpreter (prng_random_bits is a zero stub there); validated on
    real TPU against the streamed kernel's equilibrium statistics
    (tests/test_pallas_kernel.py keeps the streamed path as the bitwise
    oracle).
    """
    n_sites = configs_ref.shape[0]
    n_chains = theta_ref.shape[0]
    width = n_chains

    # Mosaic supports at most TWO seed values: fold the per-call chunk
    # counter and the grid block index into one (blocks ≪ 2¹⁶).
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] * 65536 + pl.program_id(0))

    out_configs[:] = configs_ref[:]
    row = lax.broadcasted_iota(
        jnp.int32, (n_sites, width), 0).astype(jnp.float32)
    inv24 = 1.0 / float(1 << 24)

    def u01(bits):
        # LOW 24 bits -> uniform [0, 1) exactly representable in f32.
        # Masking (not shifting): prng_random_bits yields SIGNED int32 on
        # TPU, and an arithmetic >> smears the sign bit into negative
        # "uniforms" (NaN log, never-matching ranks) for half the draws —
        # the first hardware run caught exactly that (acceptance 0.49 vs
        # the streamed kernel's 0.75).
        return jnp.bitwise_and(bits, 0xFFFFFF).astype(jnp.float32) * inv24

    def step(t, carry):
        theta, lc, log_amp, accepted, count, total_down = carry
        cfg = out_configs[:]                      # [n_sites, width]
        bits = pltpu.prng_random_bits((3, width))
        k_down = jnp.floor(u01(bits[0:1]) * float(n_down))  # [1, width]
        k_up = jnp.floor(u01(bits[1:2]) * float(n_up))
        log_u = jnp.log(u01(bits[2:3]))[0]        # [width]

        down = 0.5 * (1.0 - cfg)
        rank_down = count - down
        rank_up = row - count
        onehot_down = down * (rank_down == k_down).astype(jnp.float32)
        onehot_up = (1.0 - down) * (rank_up == k_up).astype(jnp.float32)
        delta = 2.0 * (onehot_down - onehot_up)

        d_theta = lax.dot_general(
            delta, w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        theta_new = theta + d_theta
        lc_new = _log_cosh(theta_new)

        d_onsite = jnp.sum(delta * a_ref[:], axis=0)
        d_log = d_onsite + jnp.sum(lc_new - lc, axis=-1)

        # Ranks are drawn in [0, n_down)/[0, n_up) by construction, so in
        # the half-filled sector every move is active (fast_rbm enforces
        # the sector).
        acc = (2.0 * d_log > log_u).astype(jnp.float32)

        out_configs[:] = cfg + acc[None, :] * delta
        pos_removed = jnp.sum(row * onehot_down, axis=0)
        pos_added = jnp.sum(row * onehot_up, axis=0)
        acc_row = acc[None, :]
        count = count + acc_row * (
            (row >= pos_added[None, :]).astype(jnp.float32)
            - (row >= pos_removed[None, :]).astype(jnp.float32))
        acc_col = acc[:, None]
        theta = theta + acc_col * d_theta
        lc = lc + acc_col * (lc_new - lc)
        log_amp = log_amp + acc * d_log
        accepted = accepted + acc
        return theta, lc, log_amp, accepted, count, total_down

    theta0 = theta_ref[:]
    down0 = 0.5 * (1.0 - configs_ref[:])
    count0 = _inclusive_cumsum_rows(down0, n_sites)
    init = (theta0, _log_cosh(theta0), logamp_ref[:],
            jnp.zeros((width,), jnp.float32),
            count0, jnp.sum(down0, axis=0))
    theta, _, log_amp, accepted, _, _ = lax.fori_loop(0, n_steps, step, init)
    out_theta[:] = theta
    out_logamp[:] = log_amp
    out_accepted[:] = accepted


@functools.partial(jax.jit,
                   static_argnames=('n_steps', 'block_chains', 'interpret'))
def rbm_sweeps_prng(w: jax.Array, b: jax.Array, a: jax.Array,
                    configs: jax.Array, n_steps: int, seed: jax.Array,
                    block_chains: int = 2048,
                    interpret: bool = False) -> RbmSweepResult:
    """`rbm_sweeps` with ALL randomness generated in-kernel.

    Args match `rbm_sweeps` except picks/key are replaced by:
      n_steps: number of per-chain exchange steps to run.
      seed: int32 scalar (or python int); vary per call — the kernel
        folds in a per-chunk counter and the grid block index, so equal
        seeds give equal trajectories (pure function of inputs).

    HBM randomness traffic: zero (vs 12 B/step/chain streamed).
    """
    n_chains, n_sites = configs.shape
    hidden = w.shape[1]
    if n_chains % block_chains:
        raise ValueError(f'chains {n_chains} % block {block_chains} != 0')
    if n_sites % 2:
        raise ValueError('rbm_sweeps_prng requires the half-filled sector')
    n_down = n_sites // 2
    n_up = n_sites - n_down

    # Same chunking policy as the streamed kernel (Mosaic compile time),
    # though VMEM no longer bounds it — the randomness occupies nothing.
    chunk = min(n_steps, 8 * max(n_sites, 8))
    n_chunks = -(-n_steps // chunk)
    steps_per_chunk = [chunk] * (n_chunks - 1) + [n_steps
                                                  - chunk * (n_chunks - 1)]

    theta = configs @ w + b
    onsite = configs @ a
    log_amp = onsite + jnp.sum(_log_cosh(theta), axis=-1)
    configs_t = configs.T
    a_col = a.reshape(n_sites, 1)

    grid = (n_chains // block_chains,)
    state_in_specs = [
        pl.BlockSpec((n_sites, block_chains), lambda g: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains, hidden), lambda g: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains,), lambda g: (g,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_sites, hidden), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_sites, 1), lambda g: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((n_sites, block_chains), lambda g: (0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains, hidden), lambda g: (g, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains,), lambda g: (g,),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_chains,), lambda g: (g,),
                     memory_space=pltpu.VMEM),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((n_sites, n_chains), jnp.float32),
        jax.ShapeDtypeStruct((n_chains, hidden), jnp.float32),
        jax.ShapeDtypeStruct((n_chains,), jnp.float32),
        jax.ShapeDtypeStruct((n_chains,), jnp.float32),
    ]
    interpret_mode = pltpu.InterpretParams() if interpret else False

    seed = jnp.asarray(seed, jnp.int32)
    state = (configs_t, theta, log_amp, jnp.zeros((n_chains,), jnp.float32))
    for c, steps in enumerate(steps_per_chunk):
        kernel_call = pl.pallas_call(
            functools.partial(_sweep_kernel_prng, n_steps=steps,
                              n_down=n_down, n_up=n_up),
            grid_spec=pl.GridSpec(
                grid=grid,
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                + state_in_specs,
                out_specs=out_specs),
            out_shape=out_shapes,
            interpret=interpret_mode,
        )
        configs_t, theta, log_amp, acc = kernel_call(
            jnp.stack([seed, jnp.asarray(c, jnp.int32)]),
            state[0], state[1], state[2], w, a_col)
        state = (configs_t, theta, log_amp, state[3] + acc)

    new_configs = state[0].T
    # Recompute the caches from the final configs (drift removal, as in
    # the streamed kernel).
    new_theta = new_configs @ w + b
    new_logamp = new_configs @ a + jnp.sum(_log_cosh(new_theta), axis=-1)
    return RbmSweepResult(new_configs, new_theta, new_logamp, state[3])


def rbm_sweeps_reference(w, b, a, configs, picks, key) -> RbmSweepResult:
    """Pure-JAX implementation of the same per-chain rank-pick semantics
    (full recompute per step) — the correctness oracle for the kernel.
    Consumes the SAME picks and uniforms as the kernel, so results are
    bitwise comparable up to float associativity."""
    n_steps = picks.shape[0]
    n_chains, n_sites = configs.shape
    log_u = jnp.log(jax.random.uniform(key, (n_steps, n_chains),
                                       jnp.float32))

    def log_psi(c):
        theta = c @ w + b
        return c @ a + jnp.sum(_log_cosh(theta), axis=-1)

    def step(carry, inputs):
        configs, accepted = carry
        pick, log_u_t = inputs
        down = (configs < 0)
        rank_down = jnp.cumsum(down, axis=1) - down
        rank_up = jnp.cumsum(~down, axis=1) - ~down
        onehot_down = down & (rank_down == pick[:, 0][:, None])
        onehot_up = ~down & (rank_up == pick[:, 1][:, None])
        delta = 2.0 * (onehot_down.astype(jnp.float32)
                       - onehot_up.astype(jnp.float32))
        proposed = configs + delta
        d_log = log_psi(proposed) - log_psi(configs)
        active = onehot_down.any(axis=1) & onehot_up.any(axis=1)
        accept = active & (2.0 * d_log > log_u_t)
        configs = jnp.where(accept[:, None], proposed, configs)
        accepted = accepted + accept.astype(jnp.float32)
        return (configs, accepted), None

    init = (configs, jnp.zeros((n_chains,), jnp.float32))
    (configs, accepted), _ = lax.scan(step, init, (picks, log_u))
    theta = configs @ w + b
    log_amp = configs @ a + jnp.sum(_log_cosh(theta), axis=-1)
    return RbmSweepResult(configs, theta, log_amp, accepted)


def sample_picks(key: jax.Array, num_steps: int, n_sites: int,
                 n_chains: int) -> jax.Array:
    """Per-chain (k_down, k_up) rank picks, [num_steps, n_chains, 2] i32.

    In the Sz = 0 sector every configuration has exactly n_sites//2 down
    and n_sites − n_sites//2 up spins (exchange moves conserve both), so
    a uniform rank is a uniform pick of a down/up SITE regardless of the
    configuration — the reference's noise-weighted argmin/argmax pick
    (cgs_vmc/graph_builders.py:59-65) in streamable form.
    """
    key_d, key_u = jax.random.split(key)
    n_down = n_sites // 2
    n_up = n_sites - n_down
    kd = jax.random.randint(key_d, (num_steps, n_chains), 0, n_down)
    ku = jax.random.randint(key_u, (num_steps, n_chains), 0, n_up)
    return jnp.stack([kd, ku], axis=-1).astype(jnp.int32)
