"""Signed log-amplitude arithmetic: the numerical core of the framework.

Every wavefunction in this framework returns amplitudes as ``(sign, logpsi)``
pairs — psi = sign * exp(logpsi) — instead of the reference's raw psi with a
runtime-adjusted normalization shift (cgs_vmc/wavefunctions.py:206-288,
cgs_vmc/normalizer.py).  The reference itself flags raw amplitudes as its
main deficiency (cgs_vmc/wavefunctions.py:224 TODO, README.md:29-32); the
log-sign representation removes the entire normalizer subsystem and its
non-checkpointed-state bug, and makes Metropolis ratios, local-energy
off-diagonal terms and SWO targets overflow-free by construction.

All functions here are shape-polymorphic, jit-safe pure functions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LogAmp(NamedTuple):
    """A batch of signed log-amplitudes: psi = sign * exp(log).

    sign: float array in {-1.0, 0.0, +1.0} (0 encodes an exact zero).
    log:  float array; for sign == 0, log should be -inf (or very negative).

    Complex wavefunctions (frustrated models) use a COMPLEX ``log``:
    log = log|psi| + i*phase, with ``sign`` still a real ±1 factor — so
    |psi| = exp(Re log) and every modulus-based consumer (Metropolis
    acceptance, SR centering) reads ``log.real``, a no-op for real models.
    """
    sign: jax.Array
    log: jax.Array


def from_value(value: jax.Array) -> LogAmp:
    """Converts raw amplitudes to signed-log form."""
    return LogAmp(jnp.sign(value), jnp.log(jnp.abs(value)))


def to_value(amp: LogAmp) -> jax.Array:
    """Materializes raw amplitudes (use only in tests / tiny systems)."""
    return amp.sign * jnp.exp(amp.log)


def mul(a: LogAmp, b: LogAmp) -> LogAmp:
    """psi_a * psi_b."""
    return LogAmp(a.sign * b.sign, a.log + b.log)


def scale(a: LogAmp, factor) -> LogAmp:
    """psi_a * factor for a real (possibly negative, possibly traced) scalar."""
    factor = jnp.asarray(factor, dtype=a.log.dtype)
    return LogAmp(a.sign * jnp.sign(factor),
                  a.log + jnp.log(jnp.abs(factor)))


def add(a: LogAmp, b: LogAmp) -> LogAmp:
    """psi_a + psi_b with cancellation-safe signed logsumexp."""
    if jnp.iscomplexobj(a.log) or jnp.iscomplexobj(b.log):
        m = jnp.maximum(jnp.real(a.log), jnp.real(b.log))
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        v = a.sign * jnp.exp(a.log - m) + b.sign * jnp.exp(b.log - m)
        # log of a complex value = log|v| + i*arg(v): the phase rides along.
        return LogAmp(jnp.ones_like(m), m + jnp.log(v))
    m = jnp.maximum(a.log, b.log)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # both -inf: avoid nan
    v = a.sign * jnp.exp(a.log - m) + b.sign * jnp.exp(b.log - m)
    return LogAmp(jnp.sign(v), m + jnp.log(jnp.abs(v)))


def sub(a: LogAmp, b: LogAmp) -> LogAmp:
    """psi_a - psi_b."""
    return add(a, LogAmp(-b.sign, b.log))


def sum_terms(signs: jax.Array, logs: jax.Array, axis: int = -1) -> LogAmp:
    """Signed logsumexp reduction: sum_k sign_k * exp(log_k) along `axis`."""
    if jnp.iscomplexobj(logs):
        m = jnp.max(jnp.real(logs), axis=axis, keepdims=True)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        v = jnp.sum(signs * jnp.exp(logs - m), axis=axis)
        m = jnp.squeeze(m, axis=axis)
        return LogAmp(jnp.ones_like(m), m + jnp.log(v))
    m = jnp.max(logs, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    v = jnp.sum(signs * jnp.exp(logs - m), axis=axis)
    m = jnp.squeeze(m, axis=axis)
    return LogAmp(jnp.sign(v), m + jnp.log(jnp.abs(v)))


def ratio(num: LogAmp, den: LogAmp) -> jax.Array:
    """Raw ratio psi_num / psi_den = s_n*s_d * exp(log_n - log_d).

    Safe whenever the log difference is moderate — exactly the regime the
    Metropolis sampler and local-energy estimators live in.

    The denominator sign enters as 1/s = conj(s): a no-op for real ±1
    signs, but correct if a consumer ever carries a complex unit sign
    (e.g. jnp.sign of a complex local value).
    """
    return num.sign * jnp.conj(den.sign) * jnp.exp(num.log - den.log)


def log_abs_ratio(num: LogAmp, den: LogAmp) -> jax.Array:
    """log |psi_num / psi_den| (reads .real for complex logs)."""
    return jnp.real(num.log) - jnp.real(den.log)


def apply_activation(pre: jax.Array, activation: str) -> LogAmp:
    """Turns a network's pre-activation output into a signed log-amplitude.

    The reference applied ``output_activation`` to the summed network output
    and worked with the raw value (cgs_vmc/wavefunctions.py:350-353); here
    'exp' maps to the identity in log space (sign = +1), and any other
    activation f produces (sign(f(x)), log|f(x)|).
    """
    if activation == 'exp':
        return LogAmp(jnp.ones_like(pre), pre)
    fn = ACTIVATIONS[activation]
    value = fn(pre)
    return LogAmp(jnp.sign(value), jnp.log(jnp.abs(value)))


# Name → elementwise fn map, mirroring the reference NONLINEARITIES registry
# (cgs_vmc/layers.py:13-21).
ACTIVATIONS = {
    'relu': jax.nn.relu,
    'exp': jnp.exp,
    'cos': jnp.cos,
    'tan': jnp.tan,
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'selu': jax.nn.selu,
    'identity': lambda x: x,
    'none': lambda x: x,
}
