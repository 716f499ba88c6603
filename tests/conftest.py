"""Test configuration.

Tests validate numerics against the reference's float64-derived golden values,
so they run on CPU in float64 with a virtual 8-device mesh for the sharding
tests. Set MBPOL_TEST_TPU=1 to run on real TPU hardware instead.

Note: the environment may pre-import jax with a TPU platform plugin via
sitecustomize, so platform selection must go through jax.config (env vars are
read too early to override here).
"""
import os

_ON_TPU = bool(os.environ.get('MBPOL_TEST_TPU'))

if not _ON_TPU:
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# The suite's wall time is dominated by XLA CPU compiles of the big jitted
# programs (REMD ladders, RESPA scans, PME pipelines), most of which are
# identical across runs. The persistent cache keys on the optimized HLO, so
# it is safe across source changes and cuts a full re-run severalfold.
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 '/tmp/mbpol_jax_cache_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
