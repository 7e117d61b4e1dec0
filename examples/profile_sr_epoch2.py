"""Round-3b flagship SR-epoch tuning: full-epoch timings per variant.

Times ONE jitted epoch program (the bench.py measurement path) for each
candidate config, after the back-substitution/residual GEMM fold landed
(optim/sr.py::_dense_solve).  Variants:
  - post-fold baseline (fp32, M=4096, solveprec=high, dense Cholesky)
  - dense_cg: CG on the assembled [M,M] system (no serial Cholesky /
    triangular solves)
  - bigger energy / Jacobian chunks (fewer lax.map iterations)
  - unchunked Jacobian (one vmap(grad) backward over the full batch)
  - best combo + k-epoch lax.scan per dispatch (amortizes the ~25-30 ms
    relay dispatch latency; per-epoch metrics still produced)

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_sr_epoch2.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time
import jax
import jax.numpy as jnp
from jax import lax
from cgs_vmc_tpu import lattice
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction
from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS


def build(solver='dense', echunk=128, jac_chunk=512, mat_prec='high',
          batch=1024, n_batches=4, filters=32, layers=5):
    cfg = Config(num_sites=36, size_x=6, size_y=6,
                 wavefunction_type='conv_2d', num_conv_layers=layers,
                 num_conv_filters=filters, kernel_size=3,
                 wavefunction_optimizer_type='SR',
                 batch_size=batch, num_batches_per_epoch=n_batches,
                 num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
                 learning_rates=[0.02], learning_rate_stops=[],
                 optimizer='gradient', heisenberg_jx=-1.0,
                 sr_diag_shift=1e-2, sr_solver=solver, sr_delta_clip=1.0,
                 symmetrize=True, energy_chunk_samples=echunk,
                 sr_jacobian_chunk=jac_chunk,
                 sr_matmul_precision=mat_prec, seed=11)
    wf = build_wavefunction(cfg)
    ham = HeisenbergHamiltonian(lattice.square_lattice_bonds(6, 6),
                                -1.0, 1.0, sample_chunk=echunk)
    opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)
    state = opt.init_state(jax.random.key(cfg.seed))
    return cfg, opt, state


def run(name, reps=7, scan_k=0, **kw):
    cfg, opt, state = build(**kw)
    if scan_k:
        def k_epochs(s):
            def body(s, _):
                s, m = opt.epoch(s)
                return s, m
            return lax.scan(body, s, None, length=scan_k)
        epoch_fn = jax.jit(k_epochs)
        divisor = scan_k
    else:
        epoch_fn = jax.jit(opt.epoch)
        divisor = 1
    t0 = time.perf_counter()
    state, metrics = epoch_fn(state)
    e = metrics['energy']
    _ = float(e[-1] if scan_k else e)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = epoch_fn(state)
        e = metrics['energy']
        energy = float(e[-1] if scan_k else e)
        times.append((time.perf_counter() - t0) / divisor)
    med = sorted(times)[len(times) // 2]
    m = cfg.batch_size * cfg.num_batches_per_epoch
    # A100 roofline ratio for the SAME epoch (bench.py accounting).
    import bench
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    roof_s = bench._flagship_epoch_flops(cfg, n_params) \
        / bench.A100_EFFECTIVE_FLOPS
    print(f'{name}: epoch={med:.4f}s ({m/med:.0f} samples/s) '
          f'vs_roofline={roof_s/med:.3f} '
          f'spread={(max(times)-min(times))/med:.2f} '
          f'E={energy:.4f} compile={compile_s:.0f}s', flush=True)
    return med


run('A post-fold dense solveprec=high (bench path)')
run('B dense_cg tol=1e-6', solver='dense_cg')
run('C echunk=256 jac=1024', echunk=256, jac_chunk=1024)
run('D echunk=512 jac=2048', echunk=512, jac_chunk=2048)
run('E jac unchunked echunk=512', echunk=512, jac_chunk=0)
run('F dense_cg echunk=512 jac=2048', solver='dense_cg', echunk=512,
    jac_chunk=2048)
run('G best-combo scan k=4', scan_k=4, solver='dense_cg', echunk=512,
    jac_chunk=2048)
# MXU-shape hypothesis: 32 output channels fill only a quarter of the
# 128-wide MXU; if utilization grows with channel count, a wider
# flagship clears the roofline honestly (same-epoch FLOP accounting).
run('H filters=64', solver='dense_cg', echunk=256, jac_chunk=1024,
    filters=64)
run('I filters=128', solver='dense_cg', echunk=128, jac_chunk=512,
    filters=128)
