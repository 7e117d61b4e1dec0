"""Stochastic reconfiguration (natural-gradient VMC) optimizer.

NEW capability — the reference has no SR (its ground-state registry is
{EnergyGradient, LogOverlapITSWO, ITSWO}, cgs_vmc/training.py:913-917);
required by the rebuild spec (SURVEY.md §7 design stance #6).

Solves  (S + eps·I) · delta = g  where
  S_kj = <O_k O_j> − <O_k><O_j>,     O_k = d logψ / d θ_k,
  g_k  = <E_loc O_k> − <E_loc><O_k>,
with S applied matrix-free through paired jvp/vjp over the batch of sampled
configurations and the solve done by conjugate gradients on parameter
pytrees.  Every matrix-vector product reduces over the chain axis with
``pmean``, so CG runs identically (and synchronously) on all chips of the
mesh — the matvec is the only cross-device communication.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from cgs_vmc_tpu.models.base import Wavefunction
from cgs_vmc_tpu.ops.heisenberg import Operator
from cgs_vmc_tpu.optim import common
from cgs_vmc_tpu.optim.common import TrainState
from cgs_vmc_tpu.sampler import metropolis


class StochasticReconfiguration:
    """Ground-state optimizer 'SR'."""

    name = 'SR'

    def __init__(self, wf: Wavefunction, hamiltonian: Operator, config):
        self.wf = wf
        self.hamiltonian = hamiltonian
        self.config = config
        self.optax_opt = common.make_optax_optimizer(config)
        self.sweeps = common.make_sweeps_fn(wf, config)

    def init_state(self, key: jax.Array, n_local_chains: Optional[int] = None
                   ) -> TrainState:
        params_key, sampler_key = jax.random.split(key)
        params = self.wf.init(params_key)
        sampler = metropolis.init_sampler(
            sampler_key, self.wf, params, self.config.num_sites,
            n_local_chains or self.config.batch_size)
        return TrainState(
            params=params,
            opt_state=self.optax_opt.init(params),
            sampler=sampler,
            epoch=jnp.zeros((), jnp.int32),
            extra={},
        )

    def epoch(self, state: TrainState, axis_name: Optional[str] = None
              ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.config
        wf, ham = self.wf, self.hamiltonian
        params = state.params

        sampler = metropolis.reset_stats(state.sampler)
        # Params changed since last epoch's sweeps wrote the amplitude cache.
        sampler = metropolis.refresh_amplitudes(wf, params, sampler)
        sampler = self.sweeps(params, sampler,
                              cfg.num_equilibration_sweeps)

        # Collect num_batches_per_epoch decorrelated sample batches.
        def collect(smp, _):
            configs = smp.configs
            smp = self.sweeps(params, smp, cfg.num_monte_carlo_sweeps)
            return smp, configs

        sampler, batches = lax.scan(
            collect, sampler, None, length=cfg.num_batches_per_epoch)
        all_configs = batches.reshape(-1, cfg.num_sites)  # [M_local, n]
        m_local = all_configs.shape[0]

        amp = wf.apply(params, all_configs)
        e_loc = lax.stop_gradient(
            ham.local_value(wf, params, all_configs, amp))
        e_mean = common.pmean(jnp.mean(e_loc), axis_name)
        e2_mean = common.pmean(jnp.mean(e_loc ** 2), axis_name)

        def log_fn(p):
            return wf.apply(p, all_configs).log

        # Linearize once: every CG iteration reuses the stored tangent
        # residuals instead of re-running the forward pass (jax.jvp would
        # re-trace the primal each matvec).
        _, jvp_fn = jax.linearize(log_fn, params)
        _, pullback = jax.vjp(log_fn, params)

        def jt(weights):
            """J^T w (pullback through logψ), pmean'd over devices."""
            return common.pmean(pullback(weights)[0], axis_name)

        o_mean = jt(jnp.full((m_local,), 1.0 / m_local))          # <O>
        grad_e = common.tree_weighted_diff(
            jt(e_loc / m_local), o_mean, e_mean)                  # g

        def matvec(v):
            """(S + eps I) v via jvp/vjp with algebraic centering:
            S v = <O·(jv − <jv>)> exactly (the <O><jv> cross-term cancels),
            which avoids the large-value cancellation that amplifies TPU
            matmul rounding into CG divergence."""
            jv = jvp_fn(v)                                        # [M_local]
            jv_mean = common.pmean(jnp.mean(jv), axis_name)       # <O·v>
            sv = jt((jv - jv_mean) / m_local)   # <O (O·v)> − <O><O·v>
            return jax.tree.map(
                lambda a, c: a + cfg.sr_diag_shift * c, sv, v)

        delta, _ = jax.scipy.sparse.linalg.cg(
            matvec, grad_e,
            tol=cfg.sr_cg_tol, maxiter=cfg.sr_cg_maxiter)

        # Robustness: if CG diverged (non-finite) fall back to the raw
        # gradient; trust-region clip the natural-gradient norm.
        finite = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(delta)]))
        delta = jax.tree.map(
            lambda d, g: jnp.where(finite, d, g), delta, grad_e)
        delta_norm = common.grad_global_norm(delta)
        clip = jnp.minimum(1.0, cfg.sr_delta_clip / (delta_norm + 1e-12))
        delta = jax.tree.map(lambda d: d * clip, delta)

        params, opt_state = self.optax_opt.update(
            delta, state.opt_state, params, state.epoch)

        residual = jax.tree.map(jnp.subtract, matvec(delta), grad_e)
        metrics = {
            'energy': e_mean,
            'energy_variance': e2_mean - e_mean ** 2,
            'acceptance_rate': common.pmean(
                metropolis.acceptance_rate(sampler), axis_name),
            'grad_norm': common.grad_global_norm(grad_e),
            'sr_residual_norm': common.grad_global_norm(residual),
        }
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            sampler=sampler,
            epoch=state.epoch + 1,
            extra=state.extra,
        )
        return new_state, metrics
