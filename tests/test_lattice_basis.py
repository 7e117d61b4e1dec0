"""Unit tests for lattice geometry and basis utilities."""

import numpy as np
import jax
import jax.numpy as jnp
from math import comb

from cgs_vmc_tpu import basis, lattice


def test_chain_bonds_match_reference_default():
    # Reference default: [(i, (i+1) % n) for i in range(n)]
    # (cgs_vmc/run_training.py:109).
    bonds = lattice.chain_bonds(6)
    expected = [(i, (i + 1) % 6) for i in range(6)]
    assert bonds.tolist() == [list(b) for b in expected]


def test_square_lattice_bond_count():
    bonds = lattice.square_lattice_bonds(4, 4)
    assert bonds.shape == (32, 2)  # 2*L^2 bonds on an LxL torus
    # every site has degree 4
    degree = np.zeros(16, int)
    for i, j in bonds:
        degree[i] += 1
        degree[j] += 1
    assert (degree == 4).all()


def test_square_lattice_open_boundary():
    bonds = lattice.square_lattice_bonds(3, 3, periodic=False)
    assert bonds.shape == (12, 2)  # 2*L*(L-1)


def test_marshall_sublattice_bipartite():
    mask = lattice.marshall_sublattice(16, 4, 4)
    bonds = lattice.square_lattice_bonds(4, 4)
    for i, j in bonds:
        assert mask[i] * mask[j] == -1  # neighbours on opposite sublattices


def test_random_configurations_sz0():
    configs = basis.random_configurations(jax.random.key(0), 12, 64)
    arr = np.asarray(configs)
    assert set(np.unique(arr)) == {-1.0, 1.0}
    np.testing.assert_array_equal(arr.sum(axis=1), np.zeros(64))


def test_enumerate_sz_basis():
    states = basis.enumerate_sz_basis(6)
    assert states.shape == (comb(6, 3), 6)
    assert (states.sum(axis=1) == 0).all()
    assert len(np.unique(states, axis=0)) == states.shape[0]


def test_lin_tables_bijective():
    for n in (6, 7, 10):
        top, bot = basis.make_lin_tables(n)
        states = basis.enumerate_sz_basis(n)
        idx = np.asarray(basis.lin_index(
            jnp.asarray(states), jnp.asarray(top), jnp.asarray(bot)))
        assert sorted(idx.tolist()) == list(range(states.shape[0]))


def test_basis_file_roundtrip(tmp_path):
    states = basis.enumerate_sz_basis(6)
    path = str(tmp_path / 'basis.txt')
    basis.save_basis_file(path, states)
    loaded = basis.load_basis_file(path)
    np.testing.assert_array_equal(loaded, states)


def test_adjacency_from_bonds():
    adj = lattice.adjacency_from_bonds(lattice.chain_bonds(6), 6)
    assert adj.shape == (6, 2)
    assert set(adj[0].tolist()) == {1, 5}


def test_j1j2_chain_nnn_dedup():
    """n=4 periodic chain: each NNN bond must appear once, not twice
    (round-1 ADVICE: duplicated NNN bonds doubled the effective J2)."""
    from cgs_vmc_tpu.lattice import j1j2_chain_bonds
    bonds, mask = j1j2_chain_bonds(4)
    nnn = bonds[mask == 1.0]
    keys = {tuple(sorted(b)) for b in nnn.tolist()}
    assert len(keys) == len(nnn) == 2  # (0,2) and (1,3), once each
    # Larger chain unaffected: n NNN bonds for n > 4.
    bonds8, mask8 = j1j2_chain_bonds(8)
    assert int(mask8.sum()) == 8


def test_displacement_pairs_square_lattice():
    """True lattice pairs at displacement (dx,dy) — the y-offset pairs must
    match the hand-built construction in examples/measure_6x6_observables.py
    and never cross row boundaries the way flat (i, i+d) pairing does."""
    pairs = lattice.displacement_pairs(36, 6, 6, 0, 1)
    expected = [(x * 6 + y, x * 6 + (y + 1) % 6)
                for x in range(6) for y in range(6)]
    assert [tuple(p) for p in pairs] == expected
    # x-displacement wraps in x, keeps y.
    pairs_x = lattice.displacement_pairs(36, 6, 6, 2, 0)
    for i, j in pairs_x:
        assert i % 6 == j % 6          # same y
        assert (i // 6 + 2) % 6 == j // 6


def test_displacement_pairs_chain():
    pairs = lattice.displacement_pairs(8, 1, 1, 3)
    assert [tuple(p) for p in pairs] == [(i, (i + 3) % 8) for i in range(8)]
