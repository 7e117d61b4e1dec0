"""Round-3c: did the MXU-native per-sample Jacobian (optim/fast_jacobian.py)
move the flagship SR epoch?

Measures the bench flagship configuration (fp32 M=4096,
sr_matmul_precision='high') with sr_fast_jacobian on (new default) and
off (the round-3b 0.675 s/epoch baseline), phase-split.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_sr_epoch5.py
"""
from profile_sr_epoch import variant

variant('fp32 M=4096 high FASTJAC (new default)', 'float32', 1024, 4,
        mat_prec='high', sr_fast_jacobian=True)
variant('fp32 M=4096 high generic vmap(grad) jac (round-3b control)',
        'float32', 1024, 4, mat_prec='high', sr_fast_jacobian=False)
# Energy-phase chunk sweep: is the 0.224s energy phase (57 TF/s vs the
# sampler forwards' 85) limited by lax.map serialization at echunk=128?
variant('fp32 M=4096 high FASTJAC echunk=256', 'float32', 1024, 4,
        echunk=256, mat_prec='high', sr_fast_jacobian=True)
variant('fp32 M=4096 high FASTJAC echunk=512', 'float32', 1024, 4,
        echunk=512, mat_prec='high', sr_fast_jacobian=True)
# Fast-Jacobian chunk sweep (its GEMMs may prefer larger chunks than
# vmap(grad) did).
variant('fp32 M=4096 high FASTJAC jchunk=1024', 'float32', 1024, 4,
        jac_chunk=1024, mat_prec='high', sr_fast_jacobian=True)
variant('fp32 M=4096 high FASTJAC jchunk=2048', 'float32', 1024, 4,
        jac_chunk=2048, mat_prec='high', sr_fast_jacobian=True)
