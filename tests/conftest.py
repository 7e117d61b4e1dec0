"""Test harness: 8-device virtual CPU mesh + persistent compile cache.

Multi-chip sharding paths are validated on fake CPU devices (SURVEY.md §4
item 5).  Environment sanitization against the ambient TPU-tunnel plugin
happens in the repo-root conftest.py (re-exec before capture starts).
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# Persistent compilation cache: the suite is compile-dominated (dozens of
# jitted epoch functions); caching makes re-runs much faster.
import jax  # noqa: E402  (must come after the env setup above)

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
