#!/usr/bin/env python
"""water2048 bulk scaling run (BASELINE config 4): 2x2x2 replication of the
water256 box, full PME potential, a few MD steps on the attached TPU.
Demonstrates the jit neighbor rebuild + padded triplet lists at 8192 sites.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 '/tmp/mbpol_jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_default_matmul_precision', 'highest')
import jax.numpy as jnp

import fixtures
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites

fix = fixtures.load('water256_integration_test')
b = 19.3996888399961804 / 10.0
pos_np = np.concatenate([fix['positions'] + np.array([i * b, j * b, k * b])
                         for i in range(2) for j in range(2) for k in range(2)])
sys_ = System.waters(2048, box=[2 * b] * 3)
pos = compute_virtual_sites(sys_, jnp.asarray(pos_np, jnp.float32))
pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9, target_epsilon=1e-3,
                              nlist_skin=0.02))
pot.tune_capacities(pos)
print(f'pair capacity {pot.pair_cap}, triplet capacity {pot.trip_cap}, '
      f'electrostatics mode {pot.elec_mode}')

t0 = time.time()
e, f, parts, diag = pot._energy_forces(pos)
print('compile+eval %.1f s' % (time.time() - t0))
print('E = %.2f kcal/mol  (8 x water256 = %.2f)' % (float(e) / 4.184, 8 * -2261.7))
print('per-term (kcal/mol):', {k: round(float(v) / 4.184, 2) for k, v in parts.items()})
print('SCF iterations:', int(diag['iterations']), 'converged:', bool(diag['converged']))

# warm evaluation throughput (prebuilt lists, warm dipoles)
mu = diag['induced_dipoles']
nl, _ = pot.build_neighbor_lists(pos)
full = jax.jit(lambda p, m, n: pot._energy_forces_impl(p, m, nlists=n)[:2])
out = full(pos, mu, nl)
jax.block_until_ready(out)
t0 = time.time()
for _ in range(20):
    out = full(pos, mu, nl)
jax.block_until_ready(out)
print('warm evaluation: %.1f ms (v5e reference: ~50 ms with the fused '
      'Pallas dense electrostatics; the sparse molecule-pair path is ~217 ms)'
      % ((time.time() - t0) / 20 * 1e3))
