"""Multiple-try Metropolis (MTM) exchange sampler.

Performance variant of the generic sampler (sampler/metropolis.py) for
expensive ansatzes: each step proposes K candidate exchange moves per
chain and evaluates ALL of them in one batched forward pass, then selects
among them with Born weights.  The generic sampler pays one full forward
per single proposal — latency-bound on TPU for small models; MTM batches
(2K−1) amplitude evaluations into two fused calls per step, converting
the cost into MXU-friendly throughput and raising per-step mixing.

Algorithm (Liu, Liang & Wong 2000; symmetric proposal T, weights
w(y) = |ψ(y)|² = π(y)):

  1. draw candidates y_1..y_K ~ T(x → ·); pick y = y_j with probability
     π(y_j) / Σ_k π(y_k);
  2. draw reference points x*_1..x*_{K−1} ~ T(y → ·), set x*_K = x;
  3. accept y with probability min(1, Σ_k π(y_k) / Σ_k π(x*_k)).

This preserves detailed balance for |ψ|² exactly (verified against the
Born distribution in tests/test_mtm.py).  Moves are the same
Sz-conserving exchanges as the reference sampler
(cgs_vmc/graph_builders.py:59-79).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cgs_vmc_tpu.models.base import Params, Wavefunction
from cgs_vmc_tpu.sampler.metropolis import SamplerState


def _propose_k(keys: jax.Array, configs: jax.Array, k: int
               ) -> tuple[jax.Array, jax.Array]:
    """K independent exchange proposals per chain.

    Returns (candidates [chains, k, n_sites], new_keys [chains]).
    Uses the same noise-weighted argmin/argmax pick as the reference
    sampler, vectorized over the candidate axis.
    """
    n_chains, n_sites = configs.shape

    def per_chain(key, config):
        key_next, key_u = jax.random.split(key)
        u = jax.random.uniform(key_u, (k, n_sites))
        swap_choice = config[None, :] * u
        down = jnp.argmin(swap_choice, axis=-1)      # [k] random -1 sites
        up = jnp.argmax(swap_choice, axis=-1)        # [k] random +1 sites
        cand = jnp.tile(config[None, :], (k, 1))
        rows = jnp.arange(k)
        cand = cand.at[rows, down].set(1.0)
        cand = cand.at[rows, up].set(-1.0)
        return cand, key_next

    candidates, new_keys = jax.vmap(per_chain)(keys, configs)
    return candidates, new_keys


def mtm_step(wf: Wavefunction, params: Params, state: SamplerState,
             k: int) -> SamplerState:
    """One MTM step on every chain (2 batched forward passes)."""
    configs = state.configs
    n_chains, n_sites = configs.shape
    rows = jnp.arange(n_chains)

    # --- forward candidates ------------------------------------------------
    candidates, keys = _propose_k(state.keys, configs, k)
    amp_y = wf.apply(params, candidates.reshape(n_chains * k, n_sites))
    # Re log: |ψ|² weights; phases of complex-log ansatzes never enter.
    log_pi_y = 2.0 * jnp.real(amp_y.log).reshape(n_chains, k)

    def per_chain_keys(key):
        k_sel, k_acc, k_next = jax.random.split(key, 3)
        return k_sel, k_acc, k_next

    k_sel, k_acc, keys = jax.vmap(per_chain_keys)(keys)
    select = jax.vmap(
        lambda key, logits: jax.random.categorical(key, logits))(
            k_sel, log_pi_y)                              # [chains]
    chosen = candidates[rows, select]                     # [chains, n_sites]
    chosen_log = amp_y.log.reshape(n_chains, k)[rows, select]
    chosen_sign = amp_y.sign.reshape(n_chains, k)[rows, select]

    # --- reference set from the chosen candidate ---------------------------
    if k > 1:
        refs, keys = _propose_k(keys, chosen, k - 1)
        amp_x = wf.apply(params, refs.reshape(n_chains * (k - 1), n_sites))
        log_pi_refs = 2.0 * jnp.real(amp_x.log).reshape(n_chains, k - 1)
        log_pi_x = jnp.concatenate(
            [log_pi_refs, 2.0 * jnp.real(state.log_amp)[:, None]],
            axis=1)                                          # [chains, k]
    else:
        log_pi_x = 2.0 * jnp.real(state.log_amp)[:, None]

    # --- acceptance: min(1, Σπ(y) / Σπ(x*)) --------------------------------
    log_w_y = jax.nn.logsumexp(log_pi_y, axis=1)
    log_w_x = jax.nn.logsumexp(log_pi_x, axis=1)
    u = jax.vmap(lambda key: jax.random.uniform(key, ()))(k_acc)
    accept = (log_w_y - log_w_x) > jnp.log(u)

    return SamplerState(
        configs=jnp.where(accept[:, None], chosen, configs),
        log_amp=jnp.where(accept, chosen_log, state.log_amp),
        sign=jnp.where(accept, chosen_sign, state.sign),
        keys=keys,
        num_accepted=state.num_accepted + accept.astype(jnp.float32),
        num_proposed=state.num_proposed + 1.0,
    )


def run_sweeps(wf: Wavefunction, params: Params, state: SamplerState,
               num_sweeps: int, k: int, steps_per_sweep: int | None = None
               ) -> SamplerState:
    """MTM sweeps.  A 'sweep' is n_sites/k MTM steps by default: each step
    examines k candidate moves, so per-sweep proposal work matches the
    single-try sampler's n_sites proposals."""
    n_sites = state.configs.shape[-1]
    if steps_per_sweep is None:
        steps_per_sweep = max(n_sites // max(k, 1), 1)
    total = num_sweeps * steps_per_sweep
    if total <= 0:
        return state
    return lax.fori_loop(
        0, total, lambda _, s: mtm_step(wf, params, s, k), state)
