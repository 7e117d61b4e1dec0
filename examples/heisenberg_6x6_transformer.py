"""6x6 AFM Heisenberg with the self-attention ansatz (round 4).

First flagship-lattice run of the transformer family
(models/attention.py): symmetrized (C4v x spin-flip) 4-layer pre-LN
encoder, d=64, 8 heads, dense sample-space minSR.  The goal is a clean
measured row for the new ansatz family next to the conv flagship
(RESULTS.md row 4: 5x32 conv reaches 2.3e-4), not to beat it — the
conv's translation weight sharing is exactly the right inductive bias
here, while attention has to learn the geometry through the positional
embeddings.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python examples/heisenberg_6x6_transformer.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time, functools, numpy as np, jax, jax.numpy as jnp
from flax import serialization
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS
from cgs_vmc_tpu.sampler import metropolis

OUT = 'artifacts/heisenberg_6x6_transformer.msgpack'
N = 36
# TF66_EPOCHS compresses the whole run (LR anneal stops scale with it)
# so the flagship datum fits whatever wall-clock window remains.
EPOCHS = int(os.environ.get('TF66_EPOCHS', '800'))
_stops = [max(1, round(s * EPOCHS / 800)) for s in (200, 450, 650)]
cfg = Config(num_sites=N, size_x=6, size_y=6,
             wavefunction_type='transformer',
             num_attention_layers=4, attention_dim=64,
             num_attention_heads=8,
             wavefunction_optimizer_type='SR',
             batch_size=1024, num_batches_per_epoch=4,
             num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
             learning_rates=[0.02, 0.01, 0.004, 0.0015],
             learning_rate_stops=_stops,
             optimizer='gradient', heisenberg_jx=-1.0,
             sr_diag_shift=1e-2, sr_solver='dense', sr_delta_clip=1.0,
             sr_jacobian_chunk=64,
             sr_reject_residual=0.5, symmetrize=True, seed=17)
bonds = lattice.square_lattice_bonds(6, 6)
wf = build_wavefunction(cfg)
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0)
opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)
state = opt.init_state(jax.random.key(cfg.seed))

@functools.partial(jax.jit, static_argnums=2)
def sweeps(params, smp, n):
    smp = metropolis.refresh_amplitudes(wf, params, smp)
    return metropolis.run_sweeps(wf, params, smp, n)

@jax.jit
def local_energy(params, configs):
    # 8 configs/chunk: each chunk's connected-config forward is
    # 8*72 bonds * 16 symmetry copies = 9216 rows, so the per-layer
    # attention score buffer is [9216, 8, 36, 36] f32 ~ 0.95 GB.  The
    # first run used 32 chunks -> a 24 GB buffer that OOM'd 16 GB HBM
    # (logs/transformer_6x6.log, round 5).
    chunks = configs.reshape(512, -1, cfg.num_sites)
    return jax.lax.map(lambda c: ham.local_value(wf, params, c),
                       chunks).reshape(-1)

@jax.jit
def sr_update(params, opt_state, epoch, all_configs, e_loc):
    new_params, new_opt_state, res, _ = opt.update_from_samples(
        params, opt_state, epoch, all_configs, e_loc)
    return new_params, new_opt_state, res

params, opt_state, epoch_ct = state.params, state.opt_state, state.epoch
smp = state.sampler
E_REF = -0.678872 * N
t0 = time.time()
n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
print(f'transformer 4xd64h8 ({n_params} params), compiling...', flush=True)
for i in range(EPOCHS):
    smp = sweeps(params, smp, cfg.num_equilibration_sweeps)
    config_batches = []
    for b in range(cfg.num_batches_per_epoch):
        config_batches.append(smp.configs)
        smp = sweeps(params, smp, cfg.num_monte_carlo_sweeps)
    all_configs = jnp.concatenate(config_batches, axis=0)
    e_loc = local_energy(params, all_configs)
    params, opt_state, res = sr_update(params, opt_state, epoch_ct,
                                       all_configs, e_loc)
    epoch_ct = epoch_ct + 1
    if i % 25 == 24:
        e = float(jnp.mean(e_loc))
        print(f'epoch {i+1}: E/N={e/N:.6f} err={(e-E_REF)/abs(E_REF):.2e} '
              f'res={float(res):.3f} t={time.time()-t0:.0f}s', flush=True)
    if i % 50 == 49:
        with open(OUT, 'wb') as f:
            f.write(serialization.to_bytes(jax.device_get(params)))

with open(OUT, 'wb') as f:
    f.write(serialization.to_bytes(jax.device_get(params)))

# Final unbiased MC eval, split-program style (fresh decorrelated reads).
from cgs_vmc_tpu.evaluate import binned_error
smp = sweeps(params, smp, 50)
vals = []
for i in range(300):
    vals.append(float(jnp.mean(local_energy(params, smp.configs))))
    smp = sweeps(params, smp, 2)
m, err = binned_error(np.asarray(vals))
print(f'FINAL MC eval: E={m:.4f} +/- {err:.4f}  E/N={m/N:.6f}  '
      f'rel_err={(m-E_REF)/abs(E_REF):.2e}', flush=True)
