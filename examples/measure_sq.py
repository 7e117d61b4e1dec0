"""Measure S(pi,pi) (and 3S/N) on one trained conv artifact.

Companion to examples/staggered_flagship.py for single-artifact
comparisons — round 5 uses it to measure the 10x10 5x32 artifact
(rel_err 6.7e-4) next to the deep 7x32 one (2.55e-4, 3S/N = 0.1359):
if the staggered-order deficit shrinks as the energy error drops, the
order-parameter story quantified exactly at 4x4
(examples/order_param_4x4_check.py) holds at flagship size.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site python \
    examples/measure_sq.py <artifact> <L> <layers> <filters> \
    [samples=400] [batch=1024]
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import serialization

from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.evaluate import binned_error
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.observables import SpinStructureFactor, square_positions
from cgs_vmc_tpu.sampler import metropolis

path, L, layers, filters = (sys.argv[1], int(sys.argv[2]),
                            int(sys.argv[3]), int(sys.argv[4]))
SAMPLES = int(sys.argv[5]) if len(sys.argv) > 5 else 400
BATCH = int(sys.argv[6]) if len(sys.argv) > 6 else 1024
n = L * L

cfg = Config(num_sites=n, size_x=L, size_y=L,
             wavefunction_type='conv_2d', num_conv_layers=layers,
             num_conv_filters=filters, kernel_size=3, symmetrize=True,
             heisenberg_jx=-1.0, batch_size=BATCH, seed=91)
wf = build_wavefunction(cfg)
params = serialization.from_bytes(
    wf.init(jax.random.key(0)), open(path, 'rb').read())
obs = SpinStructureFactor([np.pi, np.pi], square_positions(L, L))
sq_mean = jax.jit(lambda c: jnp.mean(obs.local_value(None, None, c)))


def sweeps(p, s, k):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, k)


sweeps = jax.jit(sweeps, static_argnums=2)
t0 = time.time()
smp = metropolis.init_sampler(jax.random.key(cfg.seed), wf, params, n, BATCH)
equil = max(100, 8 * L * L)
decorr = max(2, L // 3)
done, step_sz = 0, max(8, 2500 // (L * L))
while done < equil:
    step = min(step_sz, equil - done)
    smp = sweeps(params, smp, step)
    _ = jax.device_get(smp.configs[0, 0])  # true barrier on the relay
    done += step
    if done % 200 < step_sz or done == equil:
        print(f'  equilibrated {done}/{equil} sweeps t={time.time()-t0:.0f}s',
              flush=True)
vals = []
for i in range(SAMPLES):
    vals.append(float(sq_mean(smp.configs)))
    smp = sweeps(params, smp, decorr)
    if (i + 1) % 100 == 0:
        print(f'  {i + 1}/{SAMPLES} samples t={time.time()-t0:.0f}s',
              flush=True)
s_mean, s_err = binned_error(np.asarray(vals))
print(f'{path} (L={L}, {layers}x{filters}): S(pi,pi) = {s_mean:.4f} +/- '
      f'{s_err:.4f}   3S/N = {3*s_mean/n:.5f} +/- {3*s_err/n:.5f}   '
      f't={time.time()-t0:.0f}s', flush=True)
