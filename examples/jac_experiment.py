"""Localize the per-sample Jacobian inefficiency (flagship SR).

profile_solve_breakdown.py: jac rows (vmap(grad), chunk 512) cost
0.165 s for M=4096 at ~3 TF/s — 25% of the epoch for 1.2% of its
FLOPs.  Variants:
  control     — symmetrized 5x32 conv, chunk 512 (the shipped path)
  base        — UNSYMMETRIZED net, same chunk: if this is ~16x faster
                the orbit scaling is fine and convs are the problem;
                if only a little faster, the wrapper is pathological
  chunk sweep — 128/256/1024 (smaller was better for the energy phase)
  fc control  — an fc net with ~the same param count: per-sample grads
                of DENSE layers are batched outer products; if this is
                fast, vmapped CONV weight-grads are the culprit

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/jac_experiment.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time
import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp

from cgs_vmc_tpu import basis, lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.optim.sr import _jacobian_rows

M = 4096


def run(name, cfg, chunk, reps=5):
    wf = build_wavefunction(cfg)
    params = wf.init(jax.random.key(0))
    flat, unravel = jax.flatten_util.ravel_pytree(params)
    configs = basis.random_configurations(jax.random.key(1),
                                          cfg.num_sites, M)

    def single_log(p_flat, config):
        return wf.apply(unravel(p_flat), config[None, :]).log[0]

    @jax.jit
    def jac(p_flat, c):
        return _jacobian_rows(single_log, p_flat, c, chunk)

    rows = jac(flat, configs)
    jax.block_until_ready(rows)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = jac(flat, configs)
        _ = float(rows[0, 0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f'{name}: {med:.4f}s  P={flat.size}  chunk={chunk}', flush=True)
    return med


conv = dict(num_sites=36, size_x=6, size_y=6, wavefunction_type='conv_2d',
            num_conv_layers=5, num_conv_filters=32, kernel_size=3, seed=11)

run('sym conv chunk512 (control)', Config(symmetrize=True, **conv), 512)
run('base conv chunk512 (no symmetrize)', Config(symmetrize=False, **conv),
    512)
run('sym conv chunk128', Config(symmetrize=True, **conv), 128)
run('sym conv chunk256', Config(symmetrize=True, **conv), 256)
run('sym conv chunk1024', Config(symmetrize=True, **conv), 1024)
run('fc 3x112 chunk512 (outer-product grads)',
    Config(num_sites=36, wavefunction_type='fully_connected',
           num_fc_layers=3, fc_layer_size=112, seed=11), 512)


def run_fast(name, cfg, chunk, reps=5):
    from cgs_vmc_tpu.optim import fast_jacobian
    wf = build_wavefunction(cfg)
    params = wf.init(jax.random.key(0))
    configs = basis.random_configurations(jax.random.key(1),
                                          cfg.num_sites, M)
    fast = fast_jacobian.rows_fn_for(wf)
    jac = jax.jit(lambda p, c: fast(p, c, chunk))
    rows = jac(params, configs)
    jax.block_until_ready(rows)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = jac(params, configs)
        _ = float(rows[0, 0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f'{name}: {med:.4f}s  chunk={chunk}', flush=True)
    return med


for ch in (256, 512, 1024):
    run_fast(f'FAST sym conv chunk{ch} (batched-GEMM rows)',
             Config(symmetrize=True, **conv), ch)
