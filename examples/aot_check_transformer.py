"""AOT HBM-fit check for the 6x6 transformer flagship programs.

The first flagship attempt OOM'd at COMPILE time (AOT allocation check:
a [147456, 8, 36, 36] f32 attention buffer = 24 GB vs 16 GB HBM,
logs/transformer_6x6.log).  The relay performs that allocation check
without touching the chip, so this script lowers + compiles every
jitted program of examples/heisenberg_6x6_transformer.py from abstract
ShapeDtypeStructs — validating the chunking fix while another job owns
the device lock.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
    python examples/aot_check_transformer.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import functools
import jax
import jax.numpy as jnp

from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS
from cgs_vmc_tpu.sampler import metropolis

N = 36
cfg = Config(num_sites=N, size_x=6, size_y=6,
             wavefunction_type='transformer',
             num_attention_layers=4, attention_dim=64,
             num_attention_heads=8,
             wavefunction_optimizer_type='SR',
             batch_size=1024, num_batches_per_epoch=4,
             num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
             learning_rates=[0.02, 0.01, 0.004, 0.0015],
             learning_rate_stops=[200, 450, 650],
             optimizer='gradient', heisenberg_jx=-1.0,
             sr_diag_shift=1e-2, sr_solver='dense', sr_delta_clip=1.0,
             sr_jacobian_chunk=64,
             sr_reject_residual=0.5, symmetrize=True, seed=17)
bonds = lattice.square_lattice_bonds(6, 6)
wf = build_wavefunction(cfg)
ham = HeisenbergHamiltonian(bonds, -1.0, 1.0)
opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)

# Abstract state: no device memory, no chip contention.
state_s = jax.eval_shape(lambda: opt.init_state(jax.random.key(cfg.seed)))
params_s, opt_state_s = state_s.params, state_s.opt_state
smp_s, epoch_s = state_s.sampler, state_s.epoch
total = cfg.batch_size * cfg.num_batches_per_epoch
configs_s = jax.ShapeDtypeStruct((total, N), smp_s.configs.dtype)
e_loc_s = jax.ShapeDtypeStruct((total,), jnp.float32)


@functools.partial(jax.jit, static_argnums=2)
def sweeps(params, smp, n):
    smp = metropolis.refresh_amplitudes(wf, params, smp)
    return metropolis.run_sweeps(wf, params, smp, n)


@jax.jit
def local_energy(params, configs):
    chunks = configs.reshape(512, -1, cfg.num_sites)
    return jax.lax.map(lambda c: ham.local_value(wf, params, c),
                       chunks).reshape(-1)


@jax.jit
def sr_update(params, opt_state, epoch, all_configs, e_loc):
    new_params, new_opt_state, res, _ = opt.update_from_samples(
        params, opt_state, epoch, all_configs, e_loc)
    return new_params, new_opt_state, res


def check(name, jitted, *args):
    compiled = jitted.lower(*args).compile()
    mem = compiled.memory_analysis()
    peak = getattr(mem, 'temp_size_in_bytes', None)
    arg_b = getattr(mem, 'argument_size_in_bytes', 0)
    out_b = getattr(mem, 'output_size_in_bytes', 0)
    if peak is not None:
        print(f'{name}: OK  temp={peak/2**30:.2f} GiB '
              f'args={arg_b/2**30:.2f} GiB out={out_b/2**30:.2f} GiB',
              flush=True)
    else:
        print(f'{name}: OK (no memory stats exposed)', flush=True)


check('sweeps(eq=10)', sweeps, params_s, smp_s, 10)
check('local_energy', local_energy, params_s, configs_s)
check('sr_update', sr_update, params_s, opt_state_s, epoch_s,
      configs_s, e_loc_s)
print('ALL PROGRAMS FIT', flush=True)
