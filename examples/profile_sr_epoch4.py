"""Round-3b flagship tuning, part 2: the [M, M] solve.

profile_sr_epoch3.py localized the remaining slack: the energy chunk
sweep DISPROVED the bigger-chunks hypothesis (echunk=128 is optimal;
256/512/1024 are 14-25% slower on the energy phase), so the last lever
is the dense [4096, 4096] Cholesky (~0.18 s of the 0.77 s split total).
The relative diag shift 1e-2 bounds kappa at ~101, so plain CG on the
assembled system (sr_solver='dense_cg', one 67 MB matvec per iteration)
should converge in tens of iterations where the blocked Cholesky pays a
serial panel factorization.  Measures dense vs dense_cg at two
tolerances, plus the fully fused monolithic epoch for the winner.

Run: PYTHONPATH=/root/repo:/root/.axon_site python examples/profile_sr_epoch4.py
"""
from profile_sr_epoch import variant

variant('fp32 M=4096 high cholesky (control)', 'float32', 1024, 4,
        mat_prec='high')
variant('fp32 M=4096 high dense_cg tol=1e-5', 'float32', 1024, 4,
        mat_prec='high', use_cg=True, cg_tol=1e-5)
variant('fp32 M=4096 high dense_cg tol=1e-6', 'float32', 1024, 4,
        mat_prec='high', use_cg=True, cg_tol=1e-6)
