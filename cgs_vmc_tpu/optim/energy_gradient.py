"""Variance-reduced VMC energy-gradient optimizer.

Re-design of the reference EnergyGradientOptimizer
(cgs_vmc/training.py:506-623): gradient
  ∇E = <E_loc ∇logψ> − <E_loc><∇logψ>
with moments accumulated over ``num_batches_per_epoch`` decorrelated batches.
The reference's tf.metrics accumulators + ~6,000 session.run calls per epoch
become one ``lax.scan`` over batches inside a single jitted epoch; across a
device mesh every moment is a ``pmean`` over the 'chains' axis so all chips
hold identical gradients.
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


class EnergyGradientOptimizer:
    """Ground-state optimizer 'EnergyGradient'."""

    name = 'EnergyGradient'

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
        """One optimization epoch (reference training.py:589-623 semantics:
        equilibrate; per batch accumulate moments then decorrelate; one
        parameter update from epoch-mean moments)."""
        cfg = self.config
        wf, ham = self.wf, self.hamiltonian
        params = state.params

        sampler = metropolis.reset_stats(state.sampler)
        # Params changed since last epoch's sweeps wrote the amplitude cache.
        sampler = metropolis.refresh_amplitudes(wf, params, sampler)
        sampler = self.sweeps(params, sampler,
                              cfg.num_equilibration_sweeps)

        n_batches = cfg.num_batches_per_epoch
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def batch_step(carry, _):
            smp, g_plain, g_scaled, e_sum, e2_sum = carry
            configs = smp.configs
            local_batch = configs.shape[0]

            logs, pullback = common.log_derivative_pullback(wf, params,
                                                            configs)
            amp = wf.apply(params, configs)  # recomputed under the same jit;
            # XLA CSEs this with the vjp forward pass.
            e_loc = lax.stop_gradient(
                ham.local_value(wf, params, configs, amp))

            inv = 1.0 / (local_batch * n_batches)
            g_plain = jax.tree.map(
                jnp.add, g_plain, pullback(jnp.full_like(logs, inv)))
            g_scaled = jax.tree.map(
                jnp.add, g_scaled, pullback(e_loc * inv))
            e_sum = e_sum + jnp.sum(e_loc) * inv
            e2_sum = e2_sum + jnp.sum(e_loc ** 2) * inv

            smp = self.sweeps(params, smp, cfg.num_monte_carlo_sweeps)
            return (smp, g_plain, g_scaled, e_sum, e2_sum), None

        init = (sampler, zero_grads, zero_grads,
                jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
        (sampler, g_plain, g_scaled, e_mean, e2_mean), _ = lax.scan(
            batch_step, init, None, length=n_batches)

        # Cross-device moment aggregation (replicates gradients everywhere).
        g_plain = common.pmean(g_plain, axis_name)
        g_scaled = common.pmean(g_scaled, axis_name)
        e_mean = common.pmean(e_mean, axis_name)
        e2_mean = common.pmean(e2_mean, axis_name)

        grads = common.tree_weighted_diff(g_scaled, g_plain, e_mean)
        params, opt_state = self.optax_opt.update(
            grads, state.opt_state, params, state.epoch)

        metrics = {
            'energy': e_mean,
            'energy_variance': e2_mean - e_mean ** 2,
            'acceptance_rate': common.pmean(
                metropolis.acceptance_rate(sampler), axis_name),
            'grad_norm': common.grad_global_norm(grads),
        }
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            sampler=sampler,
            epoch=state.epoch + 1,
            extra=state.extra,
        )
        return new_state, metrics
