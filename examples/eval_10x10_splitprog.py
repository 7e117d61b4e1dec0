"""Split-program MC evaluation of a 10x10 artifact (relay-crash-safe).

Separate compiled programs for sweeps and the chunked local energy — the
monolithic evaluate_operator program crashes the relay TPU worker on the
symmetrized 10x10 fan-out.  Usage: python examples/eval_10x10_splitprog.py [path]"""
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

cfg = Config(num_sites=100, size_x=10, size_y=10,
             wavefunction_type='conv_2d', num_conv_layers=5,
             num_conv_filters=32, kernel_size=3, symmetrize=True,
             heisenberg_jx=-1.0, batch_size=512, seed=83)
bonds = lattice.square_lattice_bonds(10, 10)
wf = build_wavefunction(cfg)
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0)
params = serialization.from_bytes(
    wf.init(jax.random.key(0)),
    open(sys.argv[1] if len(sys.argv) > 1 else 'artifacts/heisenberg_10x10_symconv_v3.msgpack', 'rb').read())

@functools.partial(jax.jit, static_argnums=2)
def sweeps(p, s, n):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, n)

@jax.jit
def local_energy(p, configs):
    chunks = configs.reshape(128, -1, cfg.num_sites)
    return jax.lax.map(lambda c: ham.local_value(wf, p, c),
                       chunks).reshape(-1)

smp = metropolis.init_sampler(jax.random.key(cfg.seed), wf, params, 100,
                              cfg.batch_size)
smp = sweeps(params, smp, 50)  # equilibrate
values = []
for i in range(300):
    e = float(jnp.mean(local_energy(params, smp.configs)))
    values.append(e)
    smp = sweeps(params, smp, 2)
    if i % 25 == 24:
        m, err = binned_error(np.asarray(values))
        print(f'{i+1} samples: E/N={m/100:.6f} +/- {err/100:.6f}', flush=True)

E_REF = -0.671549 * 100
m, err = binned_error(np.asarray(values))
print(f'FINAL: E={m:.4f} +/- {err:.4f}  E/N={m/100:.6f}  '
      f'rel_err={(m-E_REF)/abs(E_REF):.2e}', flush=True)
