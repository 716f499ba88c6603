#!/usr/bin/env python
"""Measure the reference-equivalent single-thread CPU denominator for bench.py.

The reference publishes no throughput numbers (SURVEY section 6); its
benchmark harness (python/utils/run_benchmark.py) just times the Reference
platform on the local machine. We cannot build OpenMM 6.3 + the plugin in
this image, so the denominator is this framework's own float64 CPU
evaluation restricted to a single thread - an *upper bound* on the
reference's speed (the reference rebuilds neighbor lists and allocates
per call, evaluates the 42k-line scalar polynomials per pair/triplet, and
runs the same O(N^2) SCF per step, all in one thread).

Writes BASELINE_LOCAL.json with water256 PME steps/second.
"""
import json
import os
import sys
import time

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                           ' --xla_cpu_multi_thread_eigen=false '
                           'intra_op_parallelism_threads=1')
os.environ['OMP_NUM_THREADS'] = '1'

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mbpol_openmm_plugin_tpu.md import integrators as I  # noqa: E402
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig  # noqa: E402
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites  # noqa: E402


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fix = np.load(os.path.join(repo, 'tests', 'fixtures',
                               'water256_integration_test.npz'))
    box = [19.3996888399961804 / 10.0] * 3
    sys_ = System.waters(256, box=box)
    pos = compute_virtual_sites(sys_, jnp.asarray(fix['positions']))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-7))

    def energy_forces(p):
        e, f, parts, diag = pot._energy_forces_impl(p)
        return e, f

    def step(state):
        return I.velocity_verlet_step(sys_, energy_forces, state, 2e-4)

    e0, f0 = jax.jit(energy_forces)(pos)
    state = I.MDState(positions=pos, velocities=jnp.zeros_like(pos), forces=f0,
                      potential_energy=e0, box=jnp.asarray(box),
                      step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0))
    sf = jax.jit(step)
    state = sf(state)
    jax.block_until_ready(state.positions)
    n = int(os.environ.get('BASELINE_STEPS', 5))
    t0 = time.time()
    for _ in range(n):
        state = sf(state)
    jax.block_until_ready(state.positions)
    el = time.time() - t0
    sps = n / el
    out = dict(water256_pme_cpu_steps_per_second=sps,
               method='this framework, float64, single-thread CPU (see docstring)',
               n_steps=n, elapsed_s=el)
    with open(os.path.join(repo, 'BASELINE_LOCAL.json'), 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
