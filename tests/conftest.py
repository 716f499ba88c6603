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
