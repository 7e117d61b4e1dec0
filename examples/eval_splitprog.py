"""Split-program MC evaluation of a symmetrized-conv artifact (relay-safe).

Separate compiled programs for sweeps and the chunked local energy — the
monolithic evaluate_operator program crashes the relay TPU worker on big
symmetrized fan-outs (DEVELOPMENT.md).  Generalizes the size-hardcoded
eval_6x6_48_splitprog.py / eval_10x10_splitprog.py.

Usage:
  python examples/eval_splitprog.py PATH NX NY LAYERS FILTERS \
      [SAMPLES=300] [BATCH=512] [E_REF_PER_SITE]
e.g. the deep 10x10 artifact:
  python examples/eval_splitprog.py \
      artifacts/heisenberg_10x10_deep32_cont.msgpack 10 10 7 32 400 512
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import sys
import functools, numpy as np, jax, jax.numpy as jnp
from flax import serialization
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.sampler import metropolis
from cgs_vmc_tpu.evaluate import binned_error

QMC = {36: -0.678872, 100: -0.671549, 144: -0.670685}

path = sys.argv[1]
nx, ny, layers, filters = (int(v) for v in sys.argv[2:6])
samples = int(sys.argv[6]) if len(sys.argv) > 6 else 300
batch = int(sys.argv[7]) if len(sys.argv) > 7 else 512
n = nx * ny
e_ref = (float(sys.argv[8]) if len(sys.argv) > 8 else QMC.get(n, 0.0)) * n

cfg = Config(num_sites=n, size_x=nx, size_y=ny,
             wavefunction_type='conv_2d', num_conv_layers=layers,
             num_conv_filters=filters, kernel_size=3, symmetrize=True,
             heisenberg_jx=-1.0, batch_size=batch, seed=83)
bonds = lattice.square_lattice_bonds(nx, ny)
wf = build_wavefunction(cfg)
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0)
params = serialization.from_bytes(
    wf.init(jax.random.key(0)), open(path, 'rb').read())

@functools.partial(jax.jit, static_argnums=2)
def sweeps(p, s, k):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, k)

@jax.jit
def local_energy(p, configs):
    chunks = configs.reshape(128, -1, cfg.num_sites)
    return jax.lax.map(lambda c: ham.local_value(wf, p, c),
                       chunks).reshape(-1)

smp = metropolis.init_sampler(jax.random.key(cfg.seed), wf, params, n, batch)
smp = sweeps(params, smp, 50)  # equilibrate
values = []
for i in range(samples):
    e = float(jnp.mean(local_energy(params, smp.configs)))
    values.append(e)
    smp = sweeps(params, smp, 2)
    if i % 25 == 24:
        m, err = binned_error(np.asarray(values))
        print(f'{i+1} samples: E/N={m/n:.6f} +/- {err/n:.6f}', flush=True)

m, err = binned_error(np.asarray(values))
line = f'FINAL: E={m:.4f} +/- {err:.4f}  E/N={m/n:.6f}'
if e_ref:
    line += f'  rel_err={(m-e_ref)/abs(e_ref):.2e}'
print(line, flush=True)
