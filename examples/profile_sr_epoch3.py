"""Round-3b flagship SR-epoch tuning: energy/Jacobian chunk sizes.

The round-3 phase split (profile_sr_epoch.py) showed the local-energy
phase at ~57 TF/s vs ~85 TF/s for the sampling convs: the conservative
energy_chunk_samples=128 (sized for 10x10+) costs sequential lax.map
steps at 6x6.  This sweeps echunk x jac_chunk at the flagship config
(fp32 compute, sr_matmul_precision='high', M=4096) to pick the bench
configuration; the solve column also reflects the round-3 GEMM fold
(back-substitution + residual in one Jacobian pass), unmeasured until
now.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_sr_epoch3.py
"""
from profile_sr_epoch import variant  # noqa: F401  (same directory)

variant('fp32 M=4096 high e128 j512 (round-3 bench cfg + GEMM fold)',
        'float32', 1024, 4, jac_chunk=512, echunk=128, mat_prec='high')
variant('fp32 M=4096 high e256 j512', 'float32', 1024, 4,
        jac_chunk=512, echunk=256, mat_prec='high')
variant('fp32 M=4096 high e512 j512', 'float32', 1024, 4,
        jac_chunk=512, echunk=512, mat_prec='high')
variant('fp32 M=4096 high e1024 j512', 'float32', 1024, 4,
        jac_chunk=1024, echunk=1024, mat_prec='high')
variant('fp32 M=4096 high e512 j1024', 'float32', 1024, 4,
        jac_chunk=1024, echunk=512, mat_prec='high')
variant('fp32 M=4096 high e512 j2048', 'float32', 1024, 4,
        jac_chunk=2048, echunk=512, mat_prec='high')
