"""Replica (bead) batching: vmapped potential must match per-replica evals."""
import numpy as np

import jax.numpy as jnp

import fixtures
from mbpol_openmm_plugin_tpu.md.replicas import replica_energy_forces
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig


def test_replica_batch_matches_individual():
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9))
    rng = np.random.default_rng(0)
    reps = jnp.asarray(np.stack([np.asarray(pos) + 0.002 * rng.standard_normal(pos.shape)
                                 for _ in range(4)]))
    fn = replica_energy_forces(pot)
    e_b, f_b, conv = fn(reps)
    assert e_b.shape == (4,) and f_b.shape == reps.shape
    assert bool(conv.all())
    for i in range(4):
        e, f, _, _ = pot.energy_forces(reps[i])
        np.testing.assert_allclose(float(e_b[i]), float(e), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(f_b[i]), np.asarray(f), rtol=1e-8, atol=1e-8)
