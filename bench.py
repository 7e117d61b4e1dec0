"""Benchmark: sampling + end-to-end training throughput on the 6x6
Heisenberg benchmark.  Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "extra": {...}}

Primary metric: full Metropolis exchange sweeps/second/chip with 2048
parallel chains on the 6x6 lattice — one sweep = n_sites independent
per-chain exchange moves — using the fused Pallas RBM sweep kernel
(sampler/kernels.py): VMEM-resident chain state, O(hidden) incremental
amplitude-ratio updates per move, H=64 hidden units.  Work is verified via
acceptance counters; timing uses large many-sweep calls with a device->host
value read inside the timed region (block_until_ready can ack early
through the axon relay).

vs_baseline: ratio to the derived A100-class basis in BASELINE.md §"The
A100-class basis" — a memory-bound incremental CUDA RBM sampler
(600 B/move over 2.0 TB/s HBM => ~45,000 sweeps/s at 2048 chains).  This
replaces round 1's 1 ms/session.run reference-dispatch ceiling, which is
kept only as extra.vs_reference_architecture.

extra: end-to-end training throughput — wall-clock per full SR epoch and
samples/s on the FLAGSHIP model (6x6 symmetrized conv_2d 5x32/k3, dense
sample-space minSR, 4096 samples/epoch — the exact configuration of
RESULTS.md row 4) with an A100 FLOP-roofline estimate for the same epoch
(epoch FLOPs at 50%-utilized 156 TF/s TF32) for context.

Transport-variance defense (round-4, after two graded-vs-documented
discrepancies on relay-attached transports): sweep-kernel and SR-epoch
reps are INTERLEAVED in one measurement pass (ambient load shows up in
both or neither), any measurement whose rep spread exceeds
SPREAD_THRESHOLD triggers a full re-pass (up to MAX_PASSES), the
lowest-spread pass per measurement wins, and the `transport_health`
extra records spreads + a trivial-dispatch latency probe taken before
and after, so a reader can attribute any residual gap.
"""

import fcntl
import json
import os
import time

import jax

# Persistent compilation cache: repeated bench invocations skip the
# (potentially remote) TPU compile entirely.
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

from cgs_vmc_tpu import basis
from cgs_vmc_tpu.sampler import kernels

# --- A100-class bases (derivation in BASELINE.md). -----------------------
N_SITES = 36
N_CHAINS = 2048
# Memory-bound incremental CUDA RBM kernel: 600 B/move over 2.0 TB/s.
A100_MOVES_PER_SEC = 2.0e12 / 600.0
A100_SWEEPS_PER_SEC = A100_MOVES_PER_SEC / (N_CHAINS * N_SITES)  # ~45.2k
# Reference architecture: one session.run per move at ~1 ms dispatch.
REFERENCE_SWEEPS_PER_SEC = 1000.0 / N_SITES
# A100 end-to-end epoch roofline: 50%-utilized TF32 tensor peak.
A100_EFFECTIVE_FLOPS = 0.5 * 156e12

SWEEPS_PER_CALL = 800
SWEEP_REPS = 5
EPOCH_REPS = 5
FUSED_REPS = 3
K_FUSED = 5
SPREAD_THRESHOLD = 0.10
MAX_PASSES = 3


def _dispatch_latency_ms(reps: int = 9) -> float:
    """Median host->device->host round-trip of a trivial jitted op — the
    floor any per-call timing pays on this transport."""
    tiny = jax.jit(lambda x: x + 1.0)
    x = tiny(jnp.zeros(()))
    _ = float(x)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(tiny(x))
        times.append(time.perf_counter() - t0)
    return round(sorted(times)[len(times) // 2] * 1000, 2)


def _spread(times):
    med = sorted(times)[len(times) // 2]
    return (max(times) - min(times)) / med


def prepare_rbm_kernel():
    """Compile the sweep kernels; return (timed_rep_fn, finalize_fn)."""
    hidden = 64
    key = jax.random.key(0)
    w = 0.05 * jax.random.normal(key, (N_SITES, hidden), jnp.float32)
    b = jnp.zeros((hidden,), jnp.float32)
    a = jnp.zeros((N_SITES,), jnp.float32)
    configs = basis.random_configurations(jax.random.key(1), N_SITES,
                                          N_CHAINS)
    n_steps = SWEEPS_PER_CALL * N_SITES

    # Primary: the in-kernel-PRNG kernel (round-3: ~1.2x the streamed
    # kernel on v5e, zero streamed-randomness HBM traffic; equilibrium
    # statistics validated against the streamed bitwise-oracle kernel —
    # examples/bench_prng_kernel.py).
    out = kernels.rbm_sweeps_prng(w, b, a, configs, n_steps, 7)
    jax.block_until_ready(out)
    state = {'out': out, 'accepted': 0.0, 'proposals': 0, 'seed': 100}

    def timed_rep():
        t0 = time.perf_counter()
        out = kernels.rbm_sweeps_prng(w, b, a, state['out'].configs,
                                      n_steps, state['seed'])
        # Device->host transfer inside the timed region: unlike
        # block_until_ready (which some transports ack early), reading a
        # value cannot complete before the computation has.
        accepted = float(out.num_accepted.sum())
        elapsed = time.perf_counter() - t0
        state['out'] = out
        state['seed'] += 1
        state['accepted'] += accepted
        state['proposals'] += SWEEPS_PER_CALL * N_SITES * N_CHAINS
        return elapsed

    def finalize():
        # Work sanity: a healthy equilibrium acceptance rate on this model
        # (every per-chain down/up exchange proposal is active).
        acceptance = state['accepted'] / state['proposals']
        assert 0.05 < acceptance < 0.98, \
            f'implausible acceptance {acceptance}'
        # Secondary: the streamed-randomness oracle kernel, one timed call.
        picks = kernels.sample_picks(jax.random.key(2), n_steps, N_SITES,
                                     N_CHAINS)
        s_out = kernels.rbm_sweeps(w, b, a, configs, picks,
                                   jax.random.key(3))
        jax.block_until_ready(s_out)
        t0 = time.perf_counter()
        s_out = kernels.rbm_sweeps(w, b, a, s_out.configs, picks,
                                   jax.random.key(4))
        _ = float(s_out.num_accepted.sum())
        t_streamed = time.perf_counter() - t0
        return {
            'kernel': 'in-kernel prng (rbm_sweeps_prng)',
            'streamed_kernel_sweeps_per_sec': round(
                SWEEPS_PER_CALL / t_streamed, 1),
        }

    return timed_rep, finalize


def _flagship_config():
    from cgs_vmc_tpu.config import Config
    # RESULTS.md row 4: the headline 6x6 run (2.3e-4 rel. err).
    return Config(num_sites=36, size_x=6, size_y=6,
                  wavefunction_type='conv_2d', num_conv_layers=5,
                  num_conv_filters=32, kernel_size=3,
                  wavefunction_optimizer_type='SR',
                  batch_size=1024, num_batches_per_epoch=4,
                  num_equilibration_sweeps=10, num_monte_carlo_sweeps=2,
                  learning_rates=[0.02], learning_rate_stops=[],
                  optimizer='gradient', heisenberg_jx=-1.0,
                  sr_diag_shift=1e-2, sr_solver='dense',
                  sr_delta_clip=1.0, symmetrize=True,
                  # Round-4 hardware sweep (profile_sr_epoch5/6): generic
                  # vmap(grad) Jacobian rows (sr_fast_jacobian=False, now
                  # the config default — the im2col path is ~4x slower in
                  # the whole-epoch program) + 'high' (3-pass bf16) solve
                  # GEMMs: solve 0.17 s vs 0.20 s at 'highest'; physics
                  # validated to the same 3e-4 flagship floor
                  # (RESULTS.md round-3 notes).
                  sr_matmul_precision='high',
                  energy_chunk_samples=128, sr_jacobian_chunk=512, seed=11)


def _flagship_epoch_flops(cfg, n_params):
    """Analytic FLOP count of one SR epoch (for the A100 roofline only)."""
    spatial = cfg.size_x * cfg.size_y
    k2 = cfg.kernel_size ** 2
    f = cfg.num_conv_filters
    fwd = 2 * spatial * k2 * (1 * f + (cfg.num_conv_layers - 1) * f * f)
    orbit = 16 if cfg.symmetrize else 1          # C4v x spin flip
    fwd_orbit = fwd * orbit
    m = cfg.batch_size * cfg.num_batches_per_epoch
    sweeps = (cfg.num_equilibration_sweeps
              + cfg.num_batches_per_epoch * cfg.num_monte_carlo_sweeps)
    sampling = sweeps * cfg.num_sites * cfg.batch_size * fwd_orbit
    n_bonds = 2 * cfg.num_sites                  # periodic square lattice
    local_energy = m * (n_bonds + 1) * fwd_orbit
    jacobian = m * 3 * fwd_orbit                 # fwd + ~2x fwd backward
    minsr = 2 * m * m * n_params + 2 * m * n_params  # JJ^T + J^T y
    return sampling + local_energy + jacobian + minsr


def prepare_flagship_sr_epoch():
    """Compile per-call and fused SR epochs; return (percall_rep,
    fused_rep, finalize)."""
    from cgs_vmc_tpu import lattice
    from cgs_vmc_tpu.models import build_wavefunction
    from cgs_vmc_tpu.ops.heisenberg import HeisenbergHamiltonian
    from cgs_vmc_tpu.optim import GROUND_STATE_OPTIMIZERS
    from cgs_vmc_tpu.train import _scan_epochs

    cfg = _flagship_config()
    wf = build_wavefunction(cfg)
    ham = HeisenbergHamiltonian(lattice.square_lattice_bonds(6, 6),
                                cfg.heisenberg_jx, 1.0,
                                sample_chunk=cfg.energy_chunk_samples)
    opt = GROUND_STATE_OPTIMIZERS['SR'](wf, ham, cfg)
    state = opt.init_state(jax.random.key(cfg.seed))
    epoch_fn = jax.jit(opt.epoch)
    fused_fn = jax.jit(_scan_epochs(opt.epoch, K_FUSED))

    state, metrics = epoch_fn(state)            # compile + warmup
    assert jnp.isfinite(float(metrics['energy']))
    fstate, fmetrics = fused_fn(state)          # compile + warmup
    assert jnp.isfinite(float(fmetrics['energy'][-1]))
    box = {'state': fstate}

    def percall_rep():
        t0 = time.perf_counter()
        new_state, metrics = epoch_fn(box['state'])
        energy = float(metrics['energy'])       # forced device->host read
        elapsed = time.perf_counter() - t0
        assert jnp.isfinite(energy)
        box['state'] = new_state
        return elapsed

    def fused_rep():
        # Steady-state epoch time: K_FUSED epochs in ONE dispatch via
        # lax.scan (train.py `epochs_per_call`, the production path for
        # short epochs), removing per-call host->device launch latency
        # (~25-30 ms through the relay transport — a measurable slice of
        # a sub-second epoch that an on-host A100 loop would not pay).
        t0 = time.perf_counter()
        new_state, fmetrics = fused_fn(box['state'])
        f_energy = float(fmetrics['energy'][-1])
        elapsed = (time.perf_counter() - t0) / K_FUSED
        assert jnp.isfinite(f_energy)
        box['state'] = new_state
        return elapsed

    def finalize(best_percall, fused):
        samples = cfg.batch_size * cfg.num_batches_per_epoch
        n_params = sum(p.size for p in jax.tree.leaves(
            box['state'].params))
        flops = _flagship_epoch_flops(cfg, n_params)
        a100_epoch_s = flops / A100_EFFECTIVE_FLOPS
        # Key consistency: every derived number names its timing basis.
        # *_percall uses the single-dispatch median (includes ~25-30 ms
        # of relay launch latency per call); the unsuffixed samples/ratio
        # keys use the fused steady-state epoch and say so in
        # sr_epoch_timing_basis, so a consumer can re-derive each one.
        return {
            'sr_epoch_timing_basis': (
                f'fused: {K_FUSED} epochs per dispatch (lax.scan), median '
                f'of {FUSED_REPS}; percall: single dispatch, median of '
                f'{EPOCH_REPS}; reps interleaved with the sweep kernel'),
            'sr_epoch_wall_s_percall': round(best_percall, 4),
            'sr_epoch_wall_s': round(fused, 4),
            'sr_epoch_samples_per_sec': round(samples / fused, 1),
            'sr_epoch_samples_per_sec_percall': round(
                samples / best_percall, 1),
            'sr_epoch_flops_est': float(f'{flops:.3e}'),
            'sr_epoch_a100_roofline_s': round(a100_epoch_s, 4),
            'sr_epoch_vs_a100_roofline': round(a100_epoch_s / fused, 3),
            'sr_epoch_vs_a100_roofline_percall': round(
                a100_epoch_s / best_percall, 3),
        }

    return percall_rep, fused_rep, finalize


def bench_made_exact_sampling():
    """i.i.d. ancestral draws/s from the 36-site MADE ansatz (H=64,
    incremental path) — the MCMC-free sampling capability; each draw is
    an INDEPENDENT sample, so these are not comparable to Metropolis
    sweeps (which need many sweeps per decorrelated sample)."""
    from cgs_vmc_tpu.models.autoregressive import AutoregressiveSpinModel
    wf = AutoregressiveSpinModel(N_SITES, hidden=64, num_hidden_layers=1)
    params = wf.init(jax.random.key(11))
    batch = 2048

    @jax.jit
    def draw(key):
        return wf.sample(params, jax.random.split(key, batch))

    out = draw(jax.random.key(0))
    jax.block_until_ready(out)
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = draw(jax.random.key(rep + 1))
        _ = float(out[0, 0])                    # device->host read
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    return {'made_exact_samples_per_sec': round(batch / med, 1)}


def _measure_interleaved(sweep_rep, percall_rep, fused_rep):
    """One measurement pass: sweep / per-call epoch / fused epoch calls
    round-robin, so ambient transport load hits all three the same way."""
    sweep_t, percall_t, fused_t = [], [], []
    for i in range(max(SWEEP_REPS, EPOCH_REPS, FUSED_REPS)):
        if percall_rep is not None and i < EPOCH_REPS:
            percall_t.append(percall_rep())
            _beat()
        if i < SWEEP_REPS:
            sweep_t.append(sweep_rep())
            _beat(best_sweep_t=min(sweep_t))
        if percall_rep is not None and i < FUSED_REPS:
            fused_t.append(fused_rep())
            _beat()
    return sweep_t, percall_t, fused_t


# --- Relay-hang watchdog (round 5). ----------------------------------
# The axon relay can hang a client mid-run indefinitely (futex-parked on
# the PJRT thread, no error).  A hung bench gives the driver NOTHING; a
# watchdog that prints the best-measured-so-far primary metric (or an
# explicit error JSON) is strictly more informative.
WATCHDOG_S = 900.0
_HB = {'t': time.time(), 'best_sweep_t': None, 'done': False}


def _beat(best_sweep_t=None):
    _HB['t'] = time.time()
    if best_sweep_t is not None:
        prev = _HB['best_sweep_t']
        _HB['best_sweep_t'] = (best_sweep_t if prev is None
                               else min(prev, best_sweep_t))


def _start_watchdog():
    import threading

    def watch():
        while not _HB['done']:
            time.sleep(20)
            if _HB['done']:
                return
            if time.time() - _HB['t'] > WATCHDOG_S:
                best = _HB['best_sweep_t']
                if best:
                    sps = SWEEPS_PER_CALL / best
                    payload = {
                        'metric': ('metropolis_sweeps_per_sec_per_chip_'
                                   '6x6_rbm_2048chains'),
                        'value': round(sps, 3),
                        'unit': 'sweeps/s',
                        'vs_baseline': round(sps / A100_SWEEPS_PER_SEC, 4),
                        'extra': {'watchdog_abort':
                                  f'relay hang: no progress for '
                                  f'{WATCHDOG_S:.0f}s; value is the best '
                                  'completed sweep rep'},
                    }
                else:
                    payload = {
                        'metric': ('metropolis_sweeps_per_sec_per_chip_'
                                   '6x6_rbm_2048chains'),
                        'value': 0.0, 'unit': 'sweeps/s',
                        'vs_baseline': 0.0,
                        'extra': {'watchdog_abort':
                                  'relay hang before any sweep rep '
                                  'completed'},
                    }
                print(json.dumps(payload), flush=True)
                os._exit(3)

    threading.Thread(target=watch, daemon=True).start()


def _acquire_tpu_lock(max_wait_s=1200):
    """Serialize against queued measurement jobs (examples/run_r4_queue*.sh
    hold /tmp/cgs_tpu.lock around every TPU invocation).  Two TPU jobs on
    one chip corrupt each other's timings — the round-3 graded-vs-docs
    failure mode.  Waits up to max_wait_s, then proceeds anyway (the
    primary metric must still print) with the contention recorded."""
    f = open('/tmp/cgs_tpu.lock', 'w')
    t0 = time.time()
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return f, round(time.time() - t0, 1), True
        except OSError:
            if time.time() - t0 > max_wait_s:
                return f, round(time.time() - t0, 1), False
            time.sleep(10)


def main():
    lock_file, lock_wait_s, lock_held = _acquire_tpu_lock()
    _beat()
    _start_watchdog()
    dispatch_before = _dispatch_latency_ms()
    _beat()
    sweep_rep, sweep_finalize = prepare_rbm_kernel()
    _beat()
    epoch_error = None
    try:
        percall_rep, fused_rep, epoch_finalize = prepare_flagship_sr_epoch()
    except Exception as err:  # the primary metric must still print
        percall_rep = fused_rep = epoch_finalize = None
        epoch_error = f'{type(err).__name__}: {err}'[:200]
    _beat()

    # Measurement passes: re-run when any rep spread exceeds the
    # threshold (ambient relay load), keep the lowest-max-spread pass.
    passes = []
    attempts = 0
    while len(passes) < MAX_PASSES and attempts < MAX_PASSES + 2:
        attempts += 1
        try:
            sweep_t, percall_t, fused_t = _measure_interleaved(
                sweep_rep, percall_rep, fused_rep)
        except Exception as err:
            if percall_rep is None:
                raise  # the primary sweep kernel itself is broken
            # A measured-epoch rep failed (transient transport error or a
            # non-finite energy): demote the epoch metrics so the primary
            # sweep metric still prints, as the prepare-phase guard does.
            percall_rep = fused_rep = None
            epoch_error = f'{type(err).__name__}: {err}'[:200]
            continue
        spreads = [_spread(sweep_t)]
        if percall_t:
            spreads += [_spread(percall_t), _spread(fused_t)]
        passes.append((max(spreads), sweep_t, percall_t, fused_t))
        if max(spreads) <= SPREAD_THRESHOLD:
            break
    # Prefer passes that carry epoch data: after a mid-run epoch-rep
    # failure later passes are sweep-only, and a sweep-only pass must not
    # displace a complete earlier one however low its spread.
    complete = [p for p in passes if p[2]] or passes
    _, sweep_t, percall_t, fused_t = min(complete, key=lambda p: p[0])
    dispatch_after = _dispatch_latency_ms()

    sweep_median = sorted(sweep_t)[len(sweep_t) // 2]
    sweeps_per_sec = SWEEPS_PER_CALL / sweep_median

    extra = {
        'moves_per_sec': round(sweeps_per_sec * N_CHAINS * N_SITES),
        'vs_reference_architecture': round(
            sweeps_per_sec / REFERENCE_SWEEPS_PER_SEC, 1),
        'baseline_basis': ('A100 memory-bound incremental CUDA RBM '
                           'sampler, 600 B/move @ 2.0 TB/s '
                           '(BASELINE.md "The A100-class basis")'),
        # Relative (max-min)/median rep spread — the round-1..3 semantics
        # (round 4 briefly reported an absolute sweeps/s difference under
        # this key; the absolute number moved to its own key below).
        'sweep_rep_spread': round(_spread(sweep_t), 3),
        'sweep_rep_spread_sweeps_per_sec': round(
            SWEEPS_PER_CALL / min(sweep_t)
            - SWEEPS_PER_CALL / max(sweep_t), 1),
    }
    transport_health = {
        'dispatch_latency_ms_before': dispatch_before,
        'dispatch_latency_ms_after': dispatch_after,
        'sweep_spread': round(_spread(sweep_t), 3),
        'measurement_passes': len(passes),
        'tpu_lock_wait_s': lock_wait_s,
        'tpu_lock_held': lock_held,
    }
    extra.update(sweep_finalize())
    if percall_t:
        transport_health['epoch_percall_spread'] = round(
            _spread(percall_t), 3)
        transport_health['epoch_fused_spread'] = round(_spread(fused_t), 3)
        best_percall = sorted(percall_t)[len(percall_t) // 2]
        fused = sorted(fused_t)[len(fused_t) // 2]
        extra.update(epoch_finalize(best_percall, fused))
    if epoch_error:  # recorded even when an earlier pass kept epoch data
        extra['sr_epoch_error'] = epoch_error
    # Two separate flags (round-4 lesson: a long lock wait is chip
    # CONTENTION, not transport degradation — folding both into one bit
    # made a clean measurement look bad):
    # * lock_contended: another TPU job held /tmp/cgs_tpu.lock past the
    #   patience threshold (or we never got it and measured anyway).
    # * transport_degraded: the measurement ITSELF shows anomalous
    #   rep-to-rep spread after all re-passes.
    transport_health['lock_contended'] = bool(
        lock_wait_s > 60.0 or not lock_held)
    transport_health['transport_degraded'] = bool(
        max(s for s in [transport_health['sweep_spread'],
                        transport_health.get('epoch_percall_spread', 0.0),
                        transport_health.get('epoch_fused_spread', 0.0)])
        > SPREAD_THRESHOLD)
    extra['transport_health'] = transport_health
    try:
        extra.update(bench_made_exact_sampling())
    except Exception as err:
        extra['made_error'] = f'{type(err).__name__}: {err}'[:200]

    _HB['done'] = True
    print(json.dumps({
        'metric': 'metropolis_sweeps_per_sec_per_chip_6x6_rbm_2048chains',
        'value': round(sweeps_per_sec, 3),
        'unit': 'sweeps/s',
        'vs_baseline': round(sweeps_per_sec / A100_SWEEPS_PER_SEC, 4),
        'extra': extra,
    }))


if __name__ == '__main__':
    main()
