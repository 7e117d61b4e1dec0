"""Evaluate the 5x48 6x6 artifact with the SAME split compiled programs
the training run used (sweeps + chunked local energy) — known-stable on
the relay TPU where the monolithic evaluate_operator program crashed the
worker.  Energy = mean of decorrelated batch means with binned errors.
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import functools, numpy as np, jax, jax.numpy as jnp
from flax import serialization
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.sampler import metropolis
from cgs_vmc_tpu.evaluate import binned_error

cfg = Config(num_sites=36, size_x=6, size_y=6,
             wavefunction_type='conv_2d', num_conv_layers=5,
             num_conv_filters=48, kernel_size=3, symmetrize=True,
             heisenberg_jx=-1.0, batch_size=2048, seed=83)
bonds = lattice.square_lattice_bonds(6, 6)
wf = build_wavefunction(cfg)
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0)
params = serialization.from_bytes(
    wf.init(jax.random.key(0)),
    open('artifacts/heisenberg_6x6_symconv48.msgpack', 'rb').read())

@functools.partial(jax.jit, static_argnums=2)
def sweeps(p, s, n):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, n)

@jax.jit
def local_energy(p, configs):
    chunks = configs.reshape(64, -1, cfg.num_sites)
    return jax.lax.map(lambda c: ham.local_value(wf, p, c),
                       chunks).reshape(-1)

smp = metropolis.init_sampler(jax.random.key(cfg.seed), wf, params, 36,
                              cfg.batch_size)
smp = sweeps(params, smp, 50)  # equilibrate
values = []
for i in range(200):
    e = float(jnp.mean(local_energy(params, smp.configs)))
    values.append(e)
    smp = sweeps(params, smp, 2)
    if i % 25 == 24:
        m, err = binned_error(np.asarray(values))
        print(f'{i+1} samples: E/N={m/36:.6f} +/- {err/36:.6f}', flush=True)

E_REF = -0.678872 * 36
m, err = binned_error(np.asarray(values))
print(f'FINAL: E={m:.4f} +/- {err:.4f}  E/N={m/36:.6f}  '
      f'rel_err={(m-E_REF)/abs(E_REF):.2e}', flush=True)
