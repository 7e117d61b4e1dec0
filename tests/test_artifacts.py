"""Shipped artifacts must load and evaluate."""

import os

import numpy as np
import jax
from flax import serialization

from cgs_vmc_tpu import basis
from cgs_vmc_tpu.config import Config
from cgs_vmc_tpu.models import build_wavefunction

ART = os.path.join(os.path.dirname(__file__), '..', 'artifacts',
                   'heisenberg_10x10_symconv_150ep.msgpack')


def test_10x10_artifact_loads_and_applies():
    config = Config(num_sites=100, size_x=10, size_y=10,
                    wavefunction_type='conv_2d', num_conv_layers=5,
                    num_conv_filters=32, kernel_size=3, symmetrize=True,
                    heisenberg_jx=-1.0)
    wf = build_wavefunction(config)
    template = wf.init(jax.random.key(0))
    with open(ART, 'rb') as f:
        params = serialization.from_bytes(template, f.read())
    configs = basis.random_configurations(jax.random.key(1), 100, 4)
    amp = wf.apply(params, configs)
    assert np.isfinite(np.asarray(amp.log)).all()


def test_6x6_artifact_loads_and_applies():
    config = Config(num_sites=36, size_x=6, size_y=6,
                    wavefunction_type='conv_2d', num_conv_layers=5,
                    num_conv_filters=32, kernel_size=3, symmetrize=True,
                    heisenberg_jx=-1.0)
    wf = build_wavefunction(config)
    template = wf.init(jax.random.key(0))
    path = os.path.join(os.path.dirname(__file__), '..', 'artifacts',
                        'heisenberg_6x6_symconv.msgpack')
    with open(path, 'rb') as f:
        params = serialization.from_bytes(template, f.read())
    configs = basis.random_configurations(jax.random.key(1), 36, 4)
    amp = wf.apply(params, configs)
    assert np.isfinite(np.asarray(amp.log)).all()
