"""Is XLA's small-spatial conv the sampling bottleneck?  GEMM reformulation.

The SR-epoch profile shows sampling/energy phases insensitive to
compute_dtype — the 3x3 convs on a 6x6 torus are too small-spatial for
the MXU conv path to be FLOP-bound.  This times the SAME periodic conv
stack three ways on the flagship forward shape ([16384, 6, 6, C] — 1024
chains x 16 symmetry orbit):

  conv:    lax.conv_general_dilated on the wrap-padded input (current)
  im2col:  shift-and-concat (9 rolled copies along channels) + ONE
           [batch*36, 9*Cin] x [9*Cin, Cout] GEMM per layer — an
           MXU-native matmul shape with no gather
  dot9:    9 separate [batch*36, Cin] x [Cin, Cout] GEMMs on rolled
           inputs summed (no concat materialization)

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/conv_impl_experiment.py
"""
import os
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.cache/jax_comp')
import time, functools
import numpy as np, jax, jax.numpy as jnp

H = W = 6
ROWS = 16384
LAYERS = 5
CIN0, C = 1, 32
K = 3


def make_params(key, dtype=jnp.float32):
    ps = []
    cin = CIN0
    for i in range(LAYERS):
        key, k1 = jax.random.split(key)
        w = 0.1 * jax.random.normal(k1, (K, K, cin, C), jnp.float32)
        ps.append({'w': w.astype(dtype), 'b': jnp.zeros((C,), dtype)})
        cin = C
    return ps


def pad2d(x):
    lo = hi = 1
    x = jnp.concatenate([x[:, :, -lo:, :], x, x[:, :, :hi, :]], axis=2)
    x = jnp.concatenate([x[:, -lo:, :, :], x, x[:, :hi, :, :]], axis=1)
    return x


def forward_conv(params, x):
    h = x
    for i, p in enumerate(params):
        h = jax.lax.conv_general_dilated(
            pad2d(h), p['w'], (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=h.dtype) + p['b']
        if i + 1 != LAYERS:
            h = jax.nn.relu(h)
    return jnp.sum(h.astype(jnp.float32), axis=(1, 2, 3))


def _shifted_stack(h):
    """[B, H, W, Cin] -> [B, H, W, 9*Cin]: the 3x3 periodic neighborhood
    concatenated along channels via rolls (no gather)."""
    parts = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            parts.append(jnp.roll(h, (-di, -dj), axis=(1, 2)))
    return jnp.concatenate(parts, axis=-1)


def forward_im2col(params, x):
    h = x
    for i, p in enumerate(params):
        cin = p['w'].shape[2]
        stacked = _shifted_stack(h).reshape(-1, 9 * cin)
        wmat = p['w'].reshape(9 * cin, C)     # (di,dj,cin) fastest=cin
        out = jnp.dot(stacked, wmat,
                      preferred_element_type=h.dtype) + p['b']
        h = out.reshape(-1, H, W, C)
        if i + 1 != LAYERS:
            h = jax.nn.relu(h)
    return jnp.sum(h.astype(jnp.float32), axis=(1, 2, 3))


def forward_dot9(params, x):
    h = x
    for i, p in enumerate(params):
        cin = p['w'].shape[2]
        acc = None
        t = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                rolled = jnp.roll(h, (-di, -dj), axis=(1, 2)).reshape(-1, cin)
                term = jnp.dot(rolled, p['w'][di + 1, dj + 1],
                               preferred_element_type=h.dtype)
                acc = term if acc is None else acc + term
                t += 1
        h = (acc + p['b']).reshape(-1, H, W, C)
        if i + 1 != LAYERS:
            h = jax.nn.relu(h)
    return jnp.sum(h.astype(jnp.float32), axis=(1, 2, 3))


def bench(name, fn, params, x, reps=7):
    f = jax.jit(fn)
    out = f(params, x)
    _ = float(out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(params, x)
        _ = float(out[0])
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f'{name}: {med*1e3:.2f} ms/fwd ({ROWS/med/1e6:.1f} M rows/s)',
          flush=True)
    return out, med


key = jax.random.key(0)
x32 = jax.random.rademacher(
    jax.random.key(1), (ROWS, H, W, 1)).astype(jnp.float32)

for dtype, tag in ((jnp.float32, 'fp32'), (jnp.bfloat16, 'bf16')):
    params = make_params(key, jnp.float32)
    cast = [{'w': p['w'].astype(dtype), 'b': p['b'].astype(dtype)}
            for p in params]
    x = x32.astype(dtype)
    o1, _ = bench(f'conv   {tag}', forward_conv, cast, x)
    o2, _ = bench(f'im2col {tag}', forward_im2col, cast, x)
    o3, _ = bench(f'dot9   {tag}', forward_dot9, cast, x)
    err12 = float(jnp.max(jnp.abs(o1 - o2)) / (jnp.max(jnp.abs(o1)) + 1e-9))
    err13 = float(jnp.max(jnp.abs(o1 - o3)) / (jnp.max(jnp.abs(o1)) + 1e-9))
    print(f'  agreement: im2col {err12:.2e}  dot9 {err13:.2e}', flush=True)
