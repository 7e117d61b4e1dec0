"""Sub-phase breakdown of the flagship SR solve + energy-chunk sweep.

Round-3 roofline accounting (bench.py `_flagship_epoch_flops`) puts the
flagship phases at: sampling 1.09x the A100-roofline rate (at ceiling),
local energy 0.73x, Jacobian+solve 0.13x.  To know WHICH part of the
solve is slow, this times each stage as its own small program:

  jac     — per-sample gradient rows (chunked vmap(grad))
  gemm    — the [M, M] JJ^T assembly at sr_matmul_precision
  chol    — Cholesky solve of the [M, M] system
  back    — J^T y, J^T b, residual matvecs + optax update

and sweeps energy_chunk_samples in {128, 256, 512} for the local-energy
phase.  Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_solve_breakdown.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time
import functools
import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp

from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS
from cgs_vmc_tpu.optim.sr import _jacobian_rows
from cgs_vmc_tpu.sampler import metropolis

M_BATCH, N_BATCHES = 1024, 4
MAT_PREC = 'high'

cfg = Config(num_sites=36, size_x=6, size_y=6,
             wavefunction_type='conv_2d', num_conv_layers=5,
             num_conv_filters=32, kernel_size=3,
             wavefunction_optimizer_type='SR',
             batch_size=M_BATCH, num_batches_per_epoch=N_BATCHES,
             num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
             learning_rates=[0.02], learning_rate_stops=[],
             optimizer='gradient', heisenberg_jx=-1.0,
             sr_diag_shift=1e-2, sr_solver='dense', sr_delta_clip=1.0,
             symmetrize=True, energy_chunk_samples=128,
             sr_jacobian_chunk=512, sr_matmul_precision=MAT_PREC, seed=11)
wf = build_wavefunction(cfg)
opt = GROUND_STATE_OPTIMIZERS['SR'](wf, HeisenbergHamiltonian(
    lattice.square_lattice_bonds(6, 6), -1.0, 1.0, sample_chunk=128), cfg)
state = opt.init_state(jax.random.key(cfg.seed))
params = state.params
flat_params, unravel = jax.flatten_util.ravel_pytree(params)
M = M_BATCH * N_BATCHES


@functools.partial(jax.jit, static_argnums=2)
def sweeps(p, s, k):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, k)


smp = sweeps(params, state.sampler, 20)
configs = smp.configs
all_configs = jnp.concatenate(
    [configs] * (M // configs.shape[0]), axis=0)[:M]


def single_log(p_flat, config):
    return wf.apply(unravel(p_flat), config[None, :]).log[0]


@functools.partial(jax.jit, static_argnums=1)
def jac_stage(p_flat, chunk):
    rows = _jacobian_rows(single_log, p_flat, all_configs, chunk)
    return rows - jnp.mean(rows, axis=0, keepdims=True)


@jax.jit
def gemm_stage(jac):
    with jax.default_matmul_precision(MAT_PREC):
        t = (jac @ jac.T) / M
    diag = jnp.mean(jnp.diagonal(t))
    return t + (cfg.sr_diag_shift * diag) * jnp.eye(M, dtype=t.dtype)


@jax.jit
def chol_stage(t_matrix, eps):
    return jax.scipy.linalg.solve(t_matrix, eps / M, assume_a='pos')


@jax.jit
def back_stage(jac, y, eps):
    with jax.default_matmul_precision(MAT_PREC):
        delta = jac.T @ y
        grad = jac.T @ (eps / M)
        s_delta = jac.T @ (jac @ delta) / M
    return delta, grad, jnp.linalg.norm(s_delta - grad)


def med(fn, read, reps=5):
    out = fn()
    read(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        read(out)
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2], out


eps = jax.random.normal(jax.random.key(2), (M,))
for chunk in (512, 1024, 2048):
    t, jac = med(lambda c=chunk: jac_stage(flat_params, c),
                 lambda o: float(o[0, 0]))
    print(f'jac  (chunk={chunk}): {t:.4f}s', flush=True)
t_gemm, tmat = med(lambda: gemm_stage(jac), lambda o: float(o[0, 0]))
t_chol, y = med(lambda: chol_stage(tmat, eps), lambda o: float(o[0]))
t_back, out = med(lambda: back_stage(jac, y, eps), lambda o: float(o[2]))
print(f'gemm: {t_gemm:.4f}s  chol: {t_chol:.4f}s  back: {t_back:.4f}s',
      flush=True)

ham_base = HeisenbergHamiltonian(lattice.square_lattice_bonds(6, 6),
                                 -1.0, 1.0)
for echunk in (128, 256, 512):
    ham = HeisenbergHamiltonian(lattice.square_lattice_bonds(6, 6),
                                -1.0, 1.0, sample_chunk=echunk)
    e_fn = jax.jit(lambda p, c, h=ham: h.local_value(wf, p, c))
    t, _ = med(lambda: e_fn(params, all_configs), lambda o: float(o[0]))
    print(f'energy (echunk={echunk}): {t:.4f}s', flush=True)

# Sampling phase reference number for the same session.
t, _ = med(lambda: sweeps(params, smp, 18),
           lambda o: float(o.configs[0, 0]), reps=3)
print(f'sample (18 sweeps): {t:.4f}s', flush=True)
