"""Direct timing: fast_jacobian batched-GEMM rows vs generic vmap(grad)
rows on the flagship (6x6 symmetrized conv_2d 5x32/k3), M=4096, across
chunk sizes.  Settles whether the MXU reformulation is a win on real
hardware (its CPU oracle tests pin numerics only).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/jac_experiment2.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from cgs_vmc_tpu import basis
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.optim import fast_jacobian
from cgs_vmc_tpu.optim.sr import _jacobian_rows

cfg = Config(num_sites=36, size_x=6, size_y=6,
             wavefunction_type='conv_2d', num_conv_layers=5,
             num_conv_filters=32, kernel_size=3, symmetrize=True, seed=11)
wf = build_wavefunction(cfg)
params = wf.init(jax.random.key(0))
flat, unravel = ravel_pytree(params)
configs = basis.random_configurations(jax.random.key(1), 36, 4096)
M = configs.shape[0]


def timed(fn, label):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        _ = float(out[0, 0])
        ts.append(time.perf_counter() - t0)
    print(f'{label}: {sorted(ts)[1]:.4f}s', flush=True)


def single_log(fp, c):
    return wf.apply(unravel(fp), c[None, :]).log[0]

for chunk in (256, 512, 1024, 2048):
    fast = fast_jacobian.rows_fn_for(wf)
    timed(lambda: fast(params, configs, chunk), f'fast  chunk={chunk}')

for chunk in (512, 1024):
    timed(lambda: _jacobian_rows(single_log, flat, configs, chunk),
          f'vmapg chunk={chunk}')
