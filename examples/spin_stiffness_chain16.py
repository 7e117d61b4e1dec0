"""Spin stiffness of the N=16 Heisenberg chain by twisted-boundary VMC.

rho_s = L * d^2 E0(phi) / dphi^2 at phi=0, measured the standard QMC
way: train the ground state at phi in {0, +d, -d} (complex modulus x
phase ansatz — twisted local energies are complex) and take the central
difference, then compare against the exact twisted-ED curvature.
Runs on CPU in a few minutes (the twisted operator adds no cost beyond
the complex weights).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python examples/spin_stiffness_chain16.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS
from cgs_vmc_tpu.utils import ed

N = 16
D = 0.3                       # twist step: O(E'''' d^2) bias ~1e-4 here
BONDS = lattice.chain_bonds(N)
EPOCHS = 350


def train_at(phi: float, seed: int):
    phases = lattice.twist_phases(N, BONDS, phi, size_x=N)
    cfg = Config(num_sites=N, wavefunction_type='complex',
                 composite_wavefunction_types=['fully_connected',
                                               'fully_connected'],
                 num_fc_layers=2, fc_layer_size=32,
                 batch_size=512, num_batches_per_epoch=2,
                 num_equilibration_sweeps=4, num_monte_carlo_sweeps=1,
                 learning_rates=[0.05, 0.02, 0.008],
                 learning_rate_stops=[150, 260],
                 optimizer='gradient', heisenberg_jx=-1.0,
                 sr_diag_shift=1e-3, sr_solver='dense', sr_delta_clip=1.0,
                 seed=seed)
    wf = build_wavefunction(cfg)
    ham = HeisenbergHamiltonian(BONDS, -1.0, 1.0,
                                twist_phases=phases if phi else None)
    opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)
    state = opt.init_state(jax.random.key(seed))
    epoch_fn = jax.jit(opt.epoch)
    energies = []
    for i in range(EPOCHS):
        state, metrics = epoch_fn(state)
        energies.append(float(metrics['energy']))
    tail = np.asarray(energies[-60:])
    e, err = tail.mean(), tail.std() / np.sqrt(len(tail) / 4)  # ~acf 4
    e_ed, _ = ed.ground_state(N, BONDS, j_x=-1.0, j_z=1.0,
                              twist_phases=(phases if phi else None))
    print(f'phi={phi:+.2f}: VMC E = {e:.5f} +/- {err:.5f}   '
          f'ED {e_ed:.5f}   rel {abs(e - e_ed) / abs(e_ed):.1e}',
          flush=True)
    return e, err, e_ed


e0, s0, ed0 = train_at(0.0, seed=21)
ep, sp, edp = train_at(+D, seed=22)
em, sm, edm = train_at(-D, seed=23)

rho_vmc = N * (ep - 2 * e0 + em) / D**2
rho_err = N * np.sqrt(sp**2 + 4 * s0**2 + sm**2) / D**2
rho_ed = N * (edp - 2 * ed0 + edm) / D**2
print(f'\nrho_s (VMC, d={D}) = {rho_vmc:.4f} +/- {rho_err:.4f}')
print(f'rho_s (ED,  d={D}) = {rho_ed:.4f}')
print(f'(thermodynamic-limit Bethe value: v_s/(2pi)*2 = 1/4... finite-N '
      f'and finite-d both shift this; the ED number at the SAME N and d '
      f'is the oracle)')
