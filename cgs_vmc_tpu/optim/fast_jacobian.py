"""MXU-native per-sample Jacobian rows for (symmetrized) conv ansatzes.

The generic `_jacobian_rows` path (optim/sr.py) computes per-sample
gradients with vmap(grad) of a batch-1 forward.  XLA lowers a vmapped
conv WEIGHT gradient as a feature-grouped convolution with one group
per sample — thousands of tiny groups the TPU executes at ~3 TF/s
(examples/jac_experiment.py: 0.165 s for M=4096 flagship rows, 25% of
the SR epoch for ~1% of its FLOPs; an unsymmetrized net with 16x fewer
FLOPs is only 2.5x faster, i.e. the cost is per-sample overhead, not
math).

This module reformulates the SAME network as periodic-pad + im2col
patches + matmuls, with each weight tensor broadcast to a per-sample
copy: the forward becomes batched GEMMs ('cok,ckf->cof'), so one
ordinary vjp with a ones cotangent yields every sample's weight
gradient as the batched-GEMM transpose — exactly the MXU-shaped
computation the grouped-conv lowering fails to produce.  Numerics are
the generic path's: same periodic padding helper, same activation
registry, same signed-logsumexp symmetrization, same dtype casts; rows
come back in `ravel_pytree(params)` order (asserted in
tests/test_fast_jacobian.py against vmap(grad) to f32 tolerance).

Supported: Conv2DNetwork, optionally wrapped in SymmetrizedWavefunction
(site-permutation orbit x global spin flip), stride 1 — the flagship
family.  `rows_fn_for` returns None for anything else and callers fall
back to the generic path, mirroring the sampler fast-path registry
(sampler/fast_paths.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cgs_vmc_tpu.models import nn
from cgs_vmc_tpu.models.autoregressive import AutoregressiveSpinModel
from cgs_vmc_tpu.models.conv import Conv2DNetwork
from cgs_vmc_tpu.models.pixelcnn import MaskedConv2DAutoregressive
from cgs_vmc_tpu.models.symmetry import SymmetrizedWavefunction
from cgs_vmc_tpu.ops import logamp


def _patches_2d(x: jax.Array, kernel: int) -> jax.Array:
    """Periodic-pad + im2col.  x: [N, H, W, C] -> [N, H, W, k*k*C] with
    the channel-minor (kh, kw, ci) order that matches reshaping an HWIO
    kernel to [k*k*ci, co]."""
    padded = nn._periodic_pad_2d(x, kernel)
    h, w = x.shape[1], x.shape[2]
    slabs = [padded[:, dh:dh + h, dw:dw + w, :]
             for dh in range(kernel) for dw in range(kernel)]
    return jnp.concatenate(slabs, axis=-1)


def _patches_2d_zero(x: jax.Array, kernel: int) -> jax.Array:
    """Zero-pad ('SAME', odd kernel) + im2col, same (kh, kw, ci) order —
    the causal-conv analog of `_patches_2d` (models/pixelcnn.py pads
    with zeros: periodic wrap would leak raster-future sites)."""
    half = kernel // 2
    padded = jnp.pad(x, ((0, 0), (half, half), (half, half), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    slabs = [padded[:, dh:dh + h, dw:dw + w, :]
             for dh in range(kernel) for dw in range(kernel)]
    return jnp.concatenate(slabs, axis=-1)


def _forward_per_sample_weights(base: Conv2DNetwork, n_ops: int,
                                wlist, blist, orbit: jax.Array
                                ) -> jax.Array:
    """log|psi| [c] from per-sample weight copies.

    wlist[i]: [c, k*k*c_in, f], blist[i]: [c, f]; orbit: [c, n_ops, n].
    Mirrors Conv2DNetwork.apply + SymmetrizedWavefunction.apply term for
    term (padding, activation, f32 head sum, signed-logsumexp average).
    """
    c = orbit.shape[0]
    act = logamp.ACTIVATIONS[base.nonlinearity]
    dtype = base.compute_dtype
    h = orbit.reshape(c * n_ops, base.size_x, base.size_y, 1).astype(dtype)
    for i, (w, b) in enumerate(zip(wlist, blist)):
        patches = _patches_2d(h, base.kernel_size)
        patches = patches.reshape(c, n_ops * base.size_x * base.size_y,
                                  patches.shape[-1])
        out = jnp.einsum('cok,ckf->cof', patches, w.astype(dtype),
                         preferred_element_type=dtype)
        out = out + b.astype(dtype)[:, None, :]
        if i + 1 != len(wlist):
            out = act(out).astype(dtype)
        h = out.reshape(c * n_ops, base.size_x, base.size_y, out.shape[-1])
    pre = jnp.sum(h.astype(jnp.float32), axis=(1, 2, 3)).reshape(c, n_ops)
    amp = logamp.apply_activation(pre, base.output_activation)
    if n_ops == 1:
        return amp.log[:, 0]
    avg = logamp.sum_terms(amp.sign, amp.log, axis=-1)
    return avg.log - jnp.log(float(n_ops))


def _pixelcnn_forward_per_sample(model: MaskedConv2DAutoregressive,
                                 wlist, blist, configs: jax.Array
                                 ) -> jax.Array:
    """log|psi| [c] for the masked-conv AR model with per-sample weight
    copies.  wlist[i]: [c, k*k*cin, cout] (already mask-multiplied),
    blist[i]: [c, cout].  Mirrors MaskedConv2DAutoregressive._logits +
    the sector-projected chain rule term for term."""
    c = configs.shape[0]
    act = logamp.ACTIVATIONS[model.nonlinearity]
    h = configs.astype(jnp.float32).reshape(c, model.size_x, model.size_y, 1)
    last = len(wlist) - 1
    for i, (w, b) in enumerate(zip(wlist, blist)):
        kernel = model.masks[i].shape[0]
        patches = (_patches_2d_zero(h, kernel) if kernel > 1 else h)
        patches = patches.reshape(c, model.size_x * model.size_y,
                                  patches.shape[-1])
        out = jnp.einsum('cok,ckf->cof', patches, w,
                         preferred_element_type=jnp.float32)
        out = out + b[:, None, :]
        if i != last:
            out = act(out)
        h = out.reshape(c, model.size_x, model.size_y, out.shape[-1])
    logits = h.reshape(c, model.num_sites)
    log_p = AutoregressiveSpinModel.conditional_log_p_from_logits(
        logits, configs)
    return 0.5 * jnp.sum(log_p, axis=-1)


def _pixelcnn_rows(model: MaskedConv2DAutoregressive) -> Callable:
    # Host numpy (DEVELOPMENT.md constant rule) — pure GEMM operands.
    masks = [np.asarray(m).reshape(-1, m.shape[-1]) for m in model.masks]

    def one_chunk(params, c_configs):
        c = c_configs.shape[0]

        def f(wb):
            wlist = [w.reshape(c, -1, w.shape[-1]) * m[None]
                     for (w, _), m in zip(wb, masks)]
            blist = [b for _, b in wb]
            return _pixelcnn_forward_per_sample(model, wlist, blist,
                                                c_configs)

        layers = [params[f'conv_{i}'] for i in range(len(model.masks))]
        wb = [(jnp.broadcast_to(l['w'], (c,) + l['w'].shape),
               jnp.broadcast_to(l['b'], (c,) + l['b'].shape))
              for l in layers]
        _, vjp = jax.vjp(f, wb)
        (grads,) = vjp(jnp.ones((c,), jnp.float32))
        tree = {f'conv_{i}': {'w': gw, 'b': gb}
                for i, (gw, gb) in enumerate(grads)}
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate(
            [leaf.reshape(c, -1).astype(jnp.float32) for leaf in leaves],
            axis=1)

    return one_chunk


def _chunked(one_chunk: Callable) -> Callable:
    """Wraps a per-chunk rows fn with the pad-and-lax.map chunking."""
    def rows(params, configs, chunk: int) -> jax.Array:
        batch = configs.shape[0]
        if chunk and batch > chunk:
            n_chunks = -(-batch // chunk)
            pad = n_chunks * chunk - batch
            if pad:
                filler = jnp.broadcast_to(configs[:1],
                                          (pad, configs.shape[-1]))
                configs_p = jnp.concatenate([configs, filler], axis=0)
            else:
                configs_p = configs
            slices = configs_p.reshape(n_chunks, chunk, configs.shape[-1])
            out = jax.lax.map(lambda s: one_chunk(params, s), slices)
            return out.reshape(-1, out.shape[-1])[:batch]
        return one_chunk(params, configs)
    return rows


def rows_fn_for(wf) -> Optional[Callable]:
    """Fast per-sample Jacobian for `wf`, or None if unsupported.

    Returns fn(params, configs, chunk) -> [batch, P] f32 rows in
    ravel_pytree(params) order.

    Supported families: (symmetrized) Conv2DNetwork, and the masked-conv
    autoregressive model (same im2col-GEMM trick with zero padding and
    the sector-projected chain-rule head).
    """
    if isinstance(wf, MaskedConv2DAutoregressive):
        return _chunked(_pixelcnn_rows(wf))
    perms = None
    spin_flip = False
    base = wf
    if isinstance(wf, SymmetrizedWavefunction):
        perms, spin_flip, base = wf.perms, wf.spin_flip, wf._wf
    if not isinstance(base, Conv2DNetwork):
        return None
    if base.output_activation not in logamp.ACTIVATIONS and \
            base.output_activation != 'exp':
        return None

    def rows(params, configs, chunk: int) -> jax.Array:
        layers = [params[f'conv_{i}'] for i in range(base.num_layers)]
        # Per-sample grad blocks arranged as a pytree with the SAME
        # structure as params, so flattening it visits leaves in
        # ravel_pytree order whatever the naming scheme.
        def one_chunk(c_configs):
            c = c_configs.shape[0]
            if perms is not None:
                orbit = c_configs[:, perms]
                if spin_flip:
                    orbit = jnp.concatenate([orbit, -orbit], axis=1)
            else:
                orbit = c_configs[:, None, :]
            n_ops = orbit.shape[1]

            def f(wb):
                wlist = [w.reshape(c, -1, w.shape[-1]) for w, _ in wb]
                blist = [b for _, b in wb]
                return _forward_per_sample_weights(base, n_ops, wlist,
                                                   blist, orbit)

            wb = [(jnp.broadcast_to(l['w'], (c,) + l['w'].shape),
                   jnp.broadcast_to(l['b'], (c,) + l['b'].shape))
                  for l in layers]
            _, vjp = jax.vjp(f, wb)
            (grads,) = vjp(jnp.ones((c,), jnp.float32))
            tree = {f'conv_{i}': {'w': gw, 'b': gb}
                    for i, (gw, gb) in enumerate(grads)}
            leaves = jax.tree_util.tree_leaves(tree)
            return jnp.concatenate(
                [leaf.reshape(c, -1).astype(jnp.float32)
                 for leaf in leaves], axis=1)

        batch = configs.shape[0]
        if chunk and batch > chunk:
            n_chunks = -(-batch // chunk)
            pad = n_chunks * chunk - batch
            if pad:
                filler = jnp.broadcast_to(configs[:1],
                                          (pad, configs.shape[-1]))
                configs_p = jnp.concatenate([configs, filler], axis=0)
            else:
                configs_p = configs
            slices = configs_p.reshape(n_chunks, chunk, configs.shape[-1])
            out = jax.lax.map(one_chunk, slices)
            return out.reshape(-1, out.shape[-1])[:batch]
        return one_chunk(configs)

    return rows
