"""TPU validation + throughput for the in-kernel-PRNG Pallas sweep kernel.

Compares rbm_sweeps_prng against the streamed-randomness kernel on real
hardware (the CPU interpreter stubs prng_random_bits):
 1. statistical equivalence: equilibrium acceptance rate and the mean/std
    of logpsi over chains after many sweeps must agree within MC error;
 2. throughput: sweeps/s of both kernels at the bench shape (36 sites,
    2048 chains, H=64) — the PRNG kernel removes ~12 B/step/chain of
    streamed HBM randomness (~350 MB per 800-sweep call).

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_prng_kernel.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time
import numpy as np, jax, jax.numpy as jnp
from cgs_vmc_tpu import basis
from cgs_vmc_tpu.sampler import kernels

N_SITES, N_CHAINS, HIDDEN = 36, 2048, 64
SWEEPS = 800
STEPS = SWEEPS * N_SITES

key = jax.random.key(0)
w = 0.05 * jax.random.normal(key, (N_SITES, HIDDEN), jnp.float32)
b = jnp.zeros((HIDDEN,), jnp.float32)
a = jnp.zeros((N_SITES,), jnp.float32)
configs = basis.random_configurations(jax.random.key(1), N_SITES, N_CHAINS)

picks = kernels.sample_picks(jax.random.key(2), STEPS, N_SITES, N_CHAINS)
out_s = kernels.rbm_sweeps(w, b, a, configs, picks, jax.random.key(3))
out_p = kernels.rbm_sweeps_prng(w, b, a, configs, STEPS, 12345)
jax.block_until_ready((out_s, out_p))

acc_s = float(out_s.num_accepted.sum()) / (STEPS * N_CHAINS)
acc_p = float(out_p.num_accepted.sum()) / (STEPS * N_CHAINS)
ls, lp = np.asarray(out_s.log_amp), np.asarray(out_p.log_amp)
print(f'acceptance: streamed={acc_s:.4f} prng={acc_p:.4f} '
      f'(diff {abs(acc_s-acc_p):.4f})')
print(f'logpsi mean: streamed={ls.mean():.4f}+/-{ls.std()/np.sqrt(len(ls)):.4f} '
      f'prng={lp.mean():.4f}+/-{lp.std()/np.sqrt(len(lp)):.4f}')
print(f'logpsi std:  streamed={ls.std():.4f} prng={lp.std():.4f}')
z = abs(ls.mean() - lp.mean()) / np.sqrt(ls.var()/len(ls) + lp.var()/len(lp))
print(f'mean z-score: {z:.2f}  (expect O(1))')

def timeit(fn, reps=5):
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(out.num_accepted.sum())  # forced device->host read
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times)//2]

t_s = timeit(lambda: kernels.rbm_sweeps(w, b, a, out_s.configs, picks,
                                        jax.random.key(9)))
t_p = timeit(lambda: kernels.rbm_sweeps_prng(w, b, a, out_p.configs,
                                             STEPS, 777))
print(f'streamed: {SWEEPS/t_s:.0f} sweeps/s   prng: {SWEEPS/t_p:.0f} sweeps/s '
      f'({t_s/t_p:.2f}x)')
