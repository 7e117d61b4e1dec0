"""Phase-split profiling of the flagship SR epoch + perf variants.

Times sampling / local energy / Jacobian+solve separately (split
programs so each is one small compile), for the round-2 flagship
(fp32, M=4096) and the round-3 candidate variants:
  - compute_dtype='bfloat16' (conv forwards on the MXU at full rate)
  - M=8192 (amortize the [M,M] assembly + solve over more samples)
Prints one line per variant with the phase split and samples/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_sr_epoch.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time, functools
import numpy as np, jax, jax.numpy as jnp
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS, common
from cgs_vmc_tpu.sampler import metropolis


def variant(name, dtype, batch, n_batches, jac_chunk=512, echunk=128,
            reps=5, mat_prec='highest', use_cg=False, cg_tol=1e-5,
            **cfg_kw):
    cfg = Config(num_sites=36, size_x=6, size_y=6,
                 wavefunction_type='conv_2d', num_conv_layers=5,
                 num_conv_filters=32, kernel_size=3,
                 wavefunction_optimizer_type='SR',
                 batch_size=batch, num_batches_per_epoch=n_batches,
                 num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
                 learning_rates=[0.02], learning_rate_stops=[],
                 optimizer='gradient', heisenberg_jx=-1.0,
                 sr_diag_shift=1e-2, sr_delta_clip=1.0,
                 sr_solver='dense_cg' if use_cg else 'dense',
                 sr_cg_tol=cg_tol, sr_cg_maxiter=200,
                 symmetrize=True, compute_dtype=dtype,
                 energy_chunk_samples=echunk, sr_jacobian_chunk=jac_chunk,
                 sr_matmul_precision=mat_prec, seed=11, **cfg_kw)
    wf = build_wavefunction(cfg)
    ham = HeisenbergHamiltonian(lattice.square_lattice_bonds(6, 6),
                                -1.0, 1.0, sample_chunk=echunk)
    opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)
    state = opt.init_state(jax.random.key(cfg.seed))
    params, opt_state, smp = state.params, state.opt_state, state.sampler
    M = batch * n_batches

    @functools.partial(jax.jit, static_argnums=2)
    def sweeps(p, s, k):
        s = metropolis.refresh_amplitudes(wf, p, s)
        return metropolis.run_sweeps(wf, p, s, k)

    @jax.jit
    def sample_epoch(p, s):
        s = sweeps(p, s, cfg.num_equilibration_sweeps)
        def collect(smp, _):
            c = smp.configs
            smp = metropolis.run_sweeps(wf, p, smp,
                                        cfg.num_monte_carlo_sweeps)
            return smp, c
        s, batches = jax.lax.scan(collect, s, None, length=n_batches)
        return s, batches.reshape(-1, 36)

    @jax.jit
    def local_energy(p, configs):
        return ham.local_value(wf, p, configs)

    @jax.jit
    def solve(p, o, epoch, configs, e_loc):
        e_mean = jnp.mean(e_loc)
        delta, grad_e, res = opt._dense_solve(configs, p, e_loc, e_mean,
                                              None, use_cg=use_cg)
        new_p, new_o = opt.optax_opt.update(delta, o, p, epoch)
        return new_p, new_o, res

    # warmup/compile
    smp, configs = sample_epoch(params, smp)
    e_loc = local_energy(params, configs)
    p2, o2, res = solve(params, opt_state, state.epoch, configs, e_loc)
    jax.block_until_ready((p2, res))

    def med(fn, read):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            read(out)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts)//2]

    t_sample = med(lambda: sample_epoch(params, smp),
                   lambda o: float(o[1][0, 0]))
    t_energy = med(lambda: local_energy(params, configs),
                   lambda o: float(o[0]))
    t_solve = med(lambda: solve(params, opt_state, state.epoch, configs,
                                e_loc),
                  lambda o: float(o[2]))
    total = t_sample + t_energy + t_solve
    print(f'{name}: sample={t_sample:.3f}s energy={t_energy:.3f}s '
          f'solve={t_solve:.3f}s total={total:.3f}s '
          f'-> {M/total:.0f} samples/s', flush=True)
    return total


if __name__ == '__main__':
    variant('fp32 M=4096 (round-2 flagship)', 'float32', 1024, 4)
    variant('bf16 M=4096', 'bfloat16', 1024, 4)
    variant('fp32 M=8192', 'float32', 2048, 4)
    variant('bf16 M=8192', 'bfloat16', 2048, 4)
    variant('bf16 M=8192 jac_chunk=1024 echunk=256', 'bfloat16', 2048, 4,
            jac_chunk=1024, echunk=256)
    variant('fp32 M=4096 solveprec=high', 'float32', 1024, 4, mat_prec='high')
    variant('bf16 M=8192 solveprec=high', 'bfloat16', 2048, 4, mat_prec='high')
