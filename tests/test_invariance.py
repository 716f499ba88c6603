"""Physics invariance tests: the total energy must be invariant under global
translation (always) and rigid rotation (cluster), and total force/torque
must vanish accordingly. Catches frame-convention bugs that golden-value
tests can miss."""
import numpy as np

import jax.numpy as jnp

import fixtures
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig


def _rot(axis, angle):
    axis = np.asarray(axis, float)
    axis /= np.linalg.norm(axis)
    a = np.cos(angle / 2)
    b, c, d = -axis * np.sin(angle / 2)
    return np.array([
        [a*a+b*b-c*c-d*d, 2*(b*c+a*d), 2*(b*d-a*c)],
        [2*(b*c-a*d), a*a+c*c-b*b-d*d, 2*(c*d+a*b)],
        [2*(b*d+a*c), 2*(c*d-a*b), a*a+d*d-b*b-c*c]])


def test_cluster_rotation_translation_invariance():
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9,
                                  target_epsilon=1e-9))
    e0, f0, _, _ = pot.energy_forces(pos)
    rng = np.random.default_rng(1)
    p = np.asarray(pos)
    for _ in range(3):
        R = _rot(rng.standard_normal(3), rng.uniform(0, 2 * np.pi))
        t = rng.uniform(-3, 3, 3)
        p2 = p @ R.T + t
        e2, f2, _, _ = pot.energy_forces(jnp.asarray(p2))
        np.testing.assert_allclose(float(e2), float(e0), rtol=1e-9)
        # forces rotate covariantly
        np.testing.assert_allclose(np.asarray(f2), np.asarray(f0) @ R.T,
                                   rtol=1e-5, atol=1e-6)
    # net force and torque vanish (isolated system)
    np.testing.assert_allclose(np.asarray(f0).sum(0), 0.0, atol=1e-7)
    torque = np.cross(p, np.asarray(f0)).sum(0)
    np.testing.assert_allclose(torque, 0.0, atol=1e-7)


def test_periodic_translation_invariance():
    sys_, pos = fixtures.load_system('water50', box=[1.8] * 3)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9))
    e0, f0, _, _ = pot.energy_forces(pos)
    shift = jnp.asarray([0.37, -1.21, 0.049])
    e1, f1, _, _ = pot.energy_forces(pos + shift)
    # exact invariance is broken only by the PME B-spline grid registration
    # (~ewald tolerance; the reference has the same property)
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-3, atol=1e-2)
    # net force vanishes up to PME interpolation error
    np.testing.assert_allclose(np.asarray(f0).sum(0), 0.0, atol=0.05)
