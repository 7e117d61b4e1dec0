"""Round-4: settle the flagship bench knobs from hardware data.

fast_jacobian lost on hardware (profile_sr_epoch5: solve 0.702s vs
0.167s generic).  Remaining knobs: sr_matmul_precision and jac chunk
for the generic vmap(grad) path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_sr_epoch6.py
"""
from profile_sr_epoch import variant

variant('fp32 M=4096 HIGH generic', 'float32', 1024, 4,
        mat_prec='high', sr_fast_jacobian=False)
variant('fp32 M=4096 HIGHEST generic', 'float32', 1024, 4,
        mat_prec='highest', sr_fast_jacobian=False)
variant('fp32 M=4096 DEFAULT-PREC generic', 'float32', 1024, 4,
        mat_prec='default', sr_fast_jacobian=False)
variant('fp32 M=4096 high generic jchunk=1024', 'float32', 1024, 4,
        jac_chunk=1024, mat_prec='high', sr_fast_jacobian=False)
variant('fp32 M=4096 high generic jchunk=256', 'float32', 1024, 4,
        jac_chunk=256, mat_prec='high', sr_fast_jacobian=False)
