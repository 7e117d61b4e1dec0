"""Additional observables beyond the Hamiltonian.

The reference's evaluator accepts any `Operator` (cgs_vmc/evaluation.py:77)
but ships only the Heisenberg operators; these fill in the standard
measurement set for spin systems.  All follow the Operator protocol so
`evaluate_operator` measures them with the same sampling machinery.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from cgs_vmc_tpu.models.base import Params, Wavefunction
from cgs_vmc_tpu.ops.heisenberg import Operator
from cgs_vmc_tpu.ops.logamp import LogAmp


class SzSzCorrelation(Operator):
    """C = (1/|pairs|) Σ_(i,j) Sᶻᵢ Sᶻⱼ — diagonal in the computational
    basis, so the local value needs no extra wavefunction evaluations."""

    def __init__(self, pairs: Sequence[Tuple[int, int]]):
        pairs = np.asarray(pairs, dtype=np.int32)
        if pairs.ndim != 2 or pairs.shape[1] != 2:
            raise ValueError(f'pairs must be [n_pairs, 2], got {pairs.shape}')
        self.pairs = jnp.asarray(pairs)

    def local_value(self, wf: Wavefunction, params: Params,
                    configs: jax.Array, amp: Optional[LogAmp] = None
                    ) -> jax.Array:
        del wf, params, amp  # diagonal observable
        s_i = configs[:, self.pairs[:, 0]]
        s_j = configs[:, self.pairs[:, 1]]
        return 0.25 * jnp.mean(s_i * s_j, axis=-1)


class StaggeredMagnetizationSquared(Operator):
    """(Σᵢ εᵢ Sᶻᵢ / N)² with εᵢ the ±1 sublattice sign — the standard AFM
    order parameter (diagonal)."""

    def __init__(self, sublattice: np.ndarray):
        self.sublattice = jnp.asarray(
            np.asarray(sublattice, np.float32))

    def local_value(self, wf: Wavefunction, params: Params,
                    configs: jax.Array, amp: Optional[LogAmp] = None
                    ) -> jax.Array:
        del wf, params, amp
        n = configs.shape[-1]
        stag = jnp.sum(configs * self.sublattice * 0.5, axis=-1) / n
        return stag ** 2
