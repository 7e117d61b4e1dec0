"""Deep 12x12 run: symmetrized conv 7x32 with sharded-Jacobian minSR.

The 5x32 12x12 result (examples/heisenberg_12x12_sr.py) floors at
8.25e-4 — the same 5-layer architecture floor seen at 6x6 (1e-3) and
10x10 (6.7e-4).  Depth broke that floor at both smaller lattices
(7x48 -> 7.05e-5 at 6x6; 7x32 -> 2.55e-4 at 10x10), so this trains the
7-layer 12x12 from scratch with the sample_cg solver and the MXU-native
fast-Jacobian rows.  Periodic saves; resumable:

  python examples/heisenberg_12x12_deep.py [--resume START_EPOCH]

QMC reference E/N = -0.670685 (Sandvik 1997 finite-size).  Final MC
eval runs separately: python examples/eval_splitprog.py \
    artifacts/heisenberg_12x12_deep32.msgpack 12 12 7 32
"""

import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import sys, time, functools, numpy as np, jax, jax.numpy as jnp
from flax import serialization
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS
from cgs_vmc_tpu.sampler import metropolis

OUT = 'artifacts/heisenberg_12x12_deep32.msgpack'
RESUME = len(sys.argv) > 1 and sys.argv[1] == '--resume'
START = int(sys.argv[2]) if RESUME and len(sys.argv) > 2 else 0
N = 144
cfg = Config(num_sites=N, size_x=12, size_y=12,
             wavefunction_type='conv_2d', num_conv_layers=7,
             num_conv_filters=32, kernel_size=3,
             wavefunction_optimizer_type='SR',
             batch_size=1024, num_batches_per_epoch=4,
             num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
             learning_rates=[0.02, 0.01, 0.004, 0.0015],
             learning_rate_stops=[300, 700, 1100],
             optimizer='gradient', heisenberg_jx=-1.0,
             # chunk 256 bounds the vmap(grad) backward activation memory
             # (x16 symmetry orbit) to a comfortable HBM slice at N=144.
             sr_diag_shift=1e-2, sr_solver='sample_cg', sr_delta_clip=1.0,
             sr_reject_residual=0.5, sr_jacobian_chunk=256,
             sr_cg_tol=1e-5, sr_cg_maxiter=200,
             # Round-4 hardware verdict: vmap(grad) rows beat the im2col
             # fast path ~4x inside the epoch (profile_sr_epoch5) — default
             # off; CGS_FASTJAC=1 re-enables for experiments.
             sr_fast_jacobian=bool(int(os.environ.get('CGS_FASTJAC', '0'))),
             symmetrize=True, seed=41)
END = 1400
bonds = lattice.square_lattice_bonds(12, 12)
wf = build_wavefunction(cfg)
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0)
opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)
state = opt.init_state(jax.random.key(cfg.seed))
params, opt_state, smp = state.params, state.opt_state, state.sampler
if RESUME:
    params = serialization.from_bytes(params, open(OUT, 'rb').read())
epoch_ct = jnp.asarray(START, dtype=state.epoch.dtype)

@functools.partial(jax.jit, static_argnums=2)
def sweeps(p, s, k):
    s = metropolis.refresh_amplitudes(wf, p, s)
    return metropolis.run_sweeps(wf, p, s, k)

@jax.jit
def local_energy(p, configs):
    chunks = configs.reshape(128, -1, cfg.num_sites)
    return jax.lax.map(lambda c: ham.local_value(wf, p, c),
                       chunks).reshape(-1)

@jax.jit
def sr_update(p, o, epoch, all_configs, e_loc):
    new_p, new_o, res, _ = opt.update_from_samples(
        p, o, epoch, all_configs, e_loc)
    return new_p, new_o, res

E_REF = -0.670685 * N
t0 = time.time()
print(f'12x12 deep 7x32 run: epochs {START}..{END}; compiling...', flush=True)
smp = sweeps(params, smp, 50)
for i in range(START, END):
    smp = sweeps(params, smp, cfg.num_equilibration_sweeps)
    batches = []
    for b in range(cfg.num_batches_per_epoch):
        batches.append(smp.configs)
        smp = sweeps(params, smp, cfg.num_monte_carlo_sweeps)
    all_configs = jnp.concatenate(batches, axis=0)
    e_loc = local_energy(params, all_configs)
    params, opt_state, res = sr_update(params, opt_state, epoch_ct,
                                       all_configs, e_loc)
    epoch_ct = epoch_ct + 1
    if i % 20 == 19:
        e = float(jnp.mean(e_loc))
        print(f'epoch {i+1}: E/N={e/N:.6f} err={(e-E_REF)/abs(E_REF):.2e} '
              f'res={float(res):.3f} t={time.time()-t0:.0f}s', flush=True)
    if i % 50 == 49:
        with open(OUT, 'wb') as f:
            f.write(serialization.to_bytes(jax.device_get(params)))
        print(f'  saved {OUT} @ epoch {i+1}', flush=True)

with open(OUT, 'wb') as f:
    f.write(serialization.to_bytes(jax.device_get(params)))
print(f'DONE @ epoch {END}; eval: python examples/eval_splitprog.py '
      f'{OUT} 12 12 7 32', flush=True)
