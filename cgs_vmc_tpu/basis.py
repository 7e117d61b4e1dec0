"""Sz-sector basis utilities: random configs, full-basis enumeration, Lin tables.

Covers the reference's ``utils.random_configurations`` Sz=0 initializer
(cgs_vmc/utils.py:169-192), the basis files consumed by
``VectorWavefunctionEvaluator`` / ``BasisIterationSWO``
(cgs_vmc/evaluation.py:230-241, cgs_vmc/training.py:242-251), and the
Lin-table (Lin, H.Q. 1990) index scheme used by the ``FullVector`` ansatz
(cgs_vmc/wavefunctions.py:1001-1080) — but vectorized and device-friendly.
"""

from __future__ import annotations

import itertools
from math import comb

import jax
import jax.numpy as jnp
import numpy as np


def random_configurations(key: jax.Array, n_sites: int, batch_size: int,
                          n_down: int | None = None) -> jax.Array:
    """Random spin configurations in a fixed-Sz sector, values ±1, float32.

    Functional replacement for the reference's numpy rejection loop
    (cgs_vmc/utils.py:169-192): permute an (n_sites − n_down)-up /
    n_down-down template independently per chain.  Default sector is
    Sz=0 (n_down = n_sites // 2), the only one the reference supported;
    any other sector composes with the Sz-conserving exchange move to
    train e.g. the lowest triplet (spin-gap measurements).
    """
    if n_down is None:
        n_down = n_sites // 2
    if not 0 <= n_down <= n_sites:
        raise ValueError(f'n_down must be in [0, {n_sites}], got {n_down}')
    template = jnp.concatenate([
        jnp.ones((n_sites - n_down,), jnp.float32),
        -jnp.ones((n_down,), jnp.float32),
    ])
    keys = jax.random.split(key, batch_size)
    return jax.vmap(lambda k: jax.random.permutation(k, template))(keys)


def n_down_for(n_sites: int, total_sz2: int) -> int:
    """Number of down spins for a total-Sz sector given 2·Sz_total.

    2·Sz_total = n_up − n_down must have the parity of n_sites."""
    if (n_sites + total_sz2) % 2 != 0 or abs(total_sz2) > n_sites:
        raise ValueError(
            f'total_sz2={total_sz2} is not a valid sector for '
            f'{n_sites} sites: n_up = (n_sites + total_sz2)/2 must be an '
            'integer in [0, n_sites]')
    return (n_sites - total_sz2) // 2


def random_spin_configurations(key: jax.Array, n_sites: int,
                               batch_size: int) -> jax.Array:
    """Uniformly random ±1 configurations over the FULL 2^N space, float32.

    Initializer for non-Sz-conserving sampling (``mc_move_type='flip'``,
    e.g. the transverse-field Ising model, ops/ising.py) — the reference
    had only the Sz=0 initializer because its one Hamiltonian conserved Sz.
    """
    return jax.random.rademacher(key, (batch_size, n_sites),
                                 dtype=jnp.float32)


def enumerate_full_basis(n_sites: int) -> np.ndarray:
    """Every configuration of the full 2^N space as ±1 rows, float32.

    Row index r encodes the configuration bitwise: site k holds +1 iff bit
    k of r is set (LSB = site 0) — the same ordering `utils.ed.ising_matrix`
    uses, so amplitude vectors line up without an index map.  Practical up
    to n_sites ≈ 20 on host.
    """
    r = np.arange(2 ** n_sites, dtype=np.int64)
    bits = (r[:, None] >> np.arange(n_sites)[None, :]) & 1
    return (2.0 * bits - 1.0).astype(np.float32)


def enumerate_sz_basis(n_sites: int, n_down: int | None = None) -> np.ndarray:
    """Enumerates every configuration in a fixed-Sz sector as ±1 rows.

    Returns [C(n_sites, n_down), n_sites] float32.  Order: lexicographic in
    down-spin site positions.  Practical up to n_sites ≈ 24 on host.
    """
    if n_down is None:
        n_down = n_sites // 2
    count = comb(n_sites, n_down)
    out = np.ones((count, n_sites), dtype=np.float32)
    for row, downs in enumerate(itertools.combinations(range(n_sites), n_down)):
        out[row, list(downs)] = -1.0
    return out


def save_basis_file(path: str, basis_pm1: np.ndarray) -> None:
    """Writes a basis file in the reference's 0/1 space-separated format.

    (cgs_vmc/utils.py:21 documents the '0 1 format'; readers multiply by 2
    and subtract 1, cgs_vmc/evaluation.py:235.)
    """
    zeros_ones = ((np.asarray(basis_pm1) + 1) / 2).astype(np.int64)
    np.savetxt(path, zeros_ones, fmt='%d')


def load_basis_file(path: str) -> np.ndarray:
    """Reads a 0/1 basis file and returns ±1 float32 configurations."""
    data = np.atleast_2d(np.genfromtxt(path, dtype=np.float32))
    return (data * 2.0 - 1.0).astype(np.float32)


# ----------------------------------------------------------------------
# Lin tables: map a fixed-Sz configuration to a dense index by splitting
# the bitstring in half and summing two lookup tables, so the full state
# vector can be stored densely (Lin 1990; reference FullVector ansatz).
# ----------------------------------------------------------------------

def _popcount_table(n_bits: int) -> np.ndarray:
    return np.array([bin(i).count('1') for i in range(2 ** n_bits)],
                    dtype=np.int64)


def make_lin_tables(n_sites: int, n_up: int | None = None
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Builds (top_table, bot_table) for the fixed-Sz sector.

    Index convention matches the reference FullVector ansatz
    (cgs_vmc/wavefunctions.py:1036-1055): a configuration's "bot" half is
    sites [0, n/2), "top" half is sites [n/2, n); each half is bit-packed
    with up spins (+1) contributing ``2**position_in_half``; the dense index
    is ``top_table[top_bits] + bot_table[bot_bits]``.

    The enumeration orders states by (top_bits asc, bot_bits asc within
    compatible Sz counts): for each top-half up-count k_t, the bottom half
    must hold ``n_up - k_t`` ups.  top_table[t] = number of sector states
    whose top bits sort strictly before t's group plus offset of t within
    its group's stride; bot_table[b] = rank of b among bottom halves with
    its up-count.  Invalid (wrong-Sz) entries hold 0 and are never indexed
    by in-sector configurations.
    """
    bot_len = n_sites // 2          # sites [0, bot_len)
    top_len = n_sites - bot_len     # sites [bot_len, n_sites)
    if n_up is None:
        n_up = n_sites - n_sites // 2  # Sz=0 convention: ups = ceil(n/2)
    pop_bot = _popcount_table(bot_len)
    pop_top = _popcount_table(top_len)
    bot_size, top_size = 2 ** bot_len, 2 ** top_len

    # Rank of each bottom-half word among words with the same popcount.
    bot_table = np.zeros(bot_size, dtype=np.int64)
    counters: dict[int, int] = {}
    for w in range(bot_size):
        k = int(pop_bot[w])
        bot_table[w] = counters.get(k, 0)
        counters[k] = counters.get(k, 0) + 1

    # Number of bottom halves compatible with a top half of popcount k_t.
    def bot_count(k_t: int) -> int:
        k_b = n_up - k_t
        return comb(bot_len, k_b) if 0 <= k_b <= bot_len else 0

    top_table = np.zeros(top_size, dtype=np.int64)
    offset = 0
    for t in range(top_size):
        stride = bot_count(int(pop_top[t]))
        if stride > 0:
            top_table[t] = offset
            offset += stride
    return top_table, bot_table


def lin_index(configs: jax.Array, top_table: jax.Array, bot_table: jax.Array
              ) -> jax.Array:
    """Maps ±1 configs [batch, n_sites] to dense sector indices [batch]."""
    n_sites = configs.shape[-1]
    bot_len = n_sites // 2
    top_len = n_sites - bot_len
    bot_w = jnp.asarray(2 ** np.arange(bot_len), dtype=jnp.int32)
    top_w = jnp.asarray(2 ** np.arange(top_len), dtype=jnp.int32)
    ups = (configs > 0).astype(jnp.int32)
    bot_bits = jnp.sum(ups[..., :bot_len] * bot_w, axis=-1)
    top_bits = jnp.sum(ups[..., bot_len:] * top_w, axis=-1)
    # Tables arrive as host numpy (models/full_vector.py); jnp.asarray at
    # trace time lowers them as host constants AND allows tracer indexing.
    return (jnp.asarray(top_table)[top_bits]
            + jnp.asarray(bot_table)[bot_bits])
