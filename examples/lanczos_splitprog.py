"""Split-program Lanczos-step measurement of a symmetrized-conv artifact.

Measures the moments of H - s (s = known <H>) on a trained artifact and
reports the one-step Lanczos energy E(alpha*) + zero-variance
extrapolation (ops/lanczos.py) — a measurement-time variational
improvement on the committed headline numbers, no retraining.

The estimator's fan-out is batch * K^2 amplitude evaluations per
recorded sample (K = n_bonds), so the moment program runs CHUNKED and
split-program style (sweeps separate), and the per-sample batch is kept
small; jackknife errors over recorded samples are exact for the full
nonlinear pipeline.

Usage:
  python examples/lanczos_splitprog.py PATH NX NY LAYERS FILTERS \
      [SAMPLES=60] [BATCH=64] [CHUNK=8] [INNER=16] [E_REF_PER_SITE]

INNER is the Hamiltonian's own sample_chunk for the E_loc evaluation at
connected configurations — its fan-out is INNER*K configs times the
symmetry orbit, the peak-activation knob (INNER=16 at 12x12 keeps each
conv layer's activations ~1.3 GB).
e.g. the 12x12 artifact (gap to QMC 8.25e-4):
  python examples/lanczos_splitprog.py \
      artifacts/heisenberg_12x12_symconv.msgpack 12 12 5 32 60 64 8
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import sys
import time
import functools, numpy as np, jax, jax.numpy as jnp
from flax import serialization
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.ops import lanczos
from cgs_vmc_tpu.sampler import metropolis

QMC = {36: -0.678872, 100: -0.671549, 144: -0.670685}

path = sys.argv[1]
nx, ny, layers, filters = (int(v) for v in sys.argv[2:6])
samples = int(sys.argv[6]) if len(sys.argv) > 6 else 60
batch = int(sys.argv[7]) if len(sys.argv) > 7 else 64
chunk = int(sys.argv[8]) if len(sys.argv) > 8 else 8
inner = int(sys.argv[9]) if len(sys.argv) > 9 else 16
n = nx * ny
e_ref = (float(sys.argv[10]) if len(sys.argv) > 10 else QMC.get(n, 0.0)) * n

cfg = Config(num_sites=n, size_x=nx, size_y=ny,
             wavefunction_type='conv_2d', num_conv_layers=layers,
             num_conv_filters=filters, kernel_size=3, symmetrize=True,
             heisenberg_jx=-1.0, batch_size=batch, seed=97)
bonds = lattice.square_lattice_bonds(nx, ny)
wf = build_wavefunction(cfg)
# Inner E_loc at connected configs: chunk ITS fan-out too.
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0, sample_chunk=inner)
params = serialization.from_bytes(
    wf.init(jax.random.key(0)), open(path, 'rb').read())

@functools.partial(jax.jit, static_argnums=2)
def sweeps(p, s, k):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, k)

@jax.jit
def plain_energy(p, configs):
    chunks = configs.reshape(-1, chunk, n)
    return jnp.mean(jax.lax.map(
        lambda c: ham.local_value(wf, p, c), chunks))

def per_sample(p, configs, shift):
    e1, m2, m3, m4 = lanczos.moment_local_values(ham, wf, p, configs,
                                                 shift=shift)
    return jnp.stack([jnp.real(e1), jnp.real(m2),
                      jnp.real(m3), jnp.real(m4)], axis=1)

assert batch % chunk == 0, 'BATCH must be a multiple of CHUNK'

@functools.partial(jax.jit, static_argnums=2)
def moment_prog(p, configs, shift):
    slices = configs.reshape(-1, chunk, n)
    rows = jax.lax.map(lambda c: per_sample(p, c, shift), slices)
    return jnp.mean(rows.reshape(-1, 4), axis=0)

smp = metropolis.init_sampler(jax.random.key(cfg.seed), wf, params, n, batch)
t0 = time.time()
print(f'{path}: equilibrating {batch} chains...', flush=True)
smp = sweeps(params, smp, 50)
shift = float(plain_energy(params, smp.configs))
print(f'auto shift (1-batch <H>): {shift:.4f}  t={time.time()-t0:.0f}s',
      flush=True)

values = []
for i in range(samples):
    values.append(np.asarray(moment_prog(params, smp.configs, shift)))
    smp = sweeps(params, smp, 2)
    if i % 10 == 9 and len(values) > 4:
        r = lanczos.result_from_values(np.stack(values), shift=shift)
        print(f'{i+1} samples: E0/N={r.e0/n:.6f}+/-{r.e0_err/n:.6f} '
              f'E(a*)/N={r.energy/n:.6f}+/-{r.energy_err/n:.6f} '
              f'var {r.variance0:.3f}->{r.variance_alpha:.3f} '
              f't={time.time()-t0:.0f}s', flush=True)

r = lanczos.result_from_values(np.stack(values), shift=shift)
print(f'FINAL: E0={r.e0:.4f} +/- {r.e0_err:.4f}  '
      f'E(a*)={r.energy:.4f} +/- {r.energy_err:.4f}  '
      f'alpha*(1+aH)={r.alpha_physical:.6f}', flush=True)
print(f'  E0/N={r.e0/n:.6f}  E(a*)/N={r.energy/n:.6f}  '
      f'extrap/N={r.extrapolated/n:.6f}', flush=True)
if e_ref:
    print(f'  rel_err: E0 {(r.e0-e_ref)/abs(e_ref):.2e} -> '
          f'Lanczos {(r.energy-e_ref)/abs(e_ref):.2e} -> '
          f'extrap {(r.extrapolated-e_ref)/abs(e_ref):.2e}', flush=True)
