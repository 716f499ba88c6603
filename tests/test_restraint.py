"""Flat-bottom spherical restraint (models/restraint.py).

The restraint is a framework extra (the reference's cluster users reach
for OpenMM's CustomExternalForce instead); these tests pin its contract:
zero inside the sphere, hand-computable quadratic outside, exact zero
net force (instantaneous-centroid form), autodiff == finite differences,
and the PBC guard.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.models.restraint import flat_bottom_energy
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites


def _cluster_positions(sys_, spread=0.3, seed=0):
    rng = np.random.default_rng(seed)
    n_w = len(sys_.o_index)
    centers = rng.uniform(-spread, spread, (n_w, 3))
    pos = np.zeros((sys_.n_atoms, 3))
    for m, c in enumerate(centers):
        o = sys_.o_index[m]
        pos[o] = c
        pos[o + 1] = c + [0.0957, 0.0, 0.0]
        pos[o + 2] = c + [-0.024, 0.0927, 0.0]
    return jnp.asarray(compute_virtual_sites(sys_, jnp.asarray(pos)))


def test_zero_inside_sphere():
    o = jnp.asarray(np.random.default_rng(1).uniform(-0.2, 0.2, (8, 3)))
    assert float(flat_bottom_energy(o, 1.0, 500.0)) == 0.0
    g = jax.grad(flat_bottom_energy)(o, 1.0, 500.0)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


def test_quadratic_outside_matches_hand_value():
    # two molecules on the x axis, one pushed past R from the centroid
    o = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    # centroid at x=1; both sit at distance 1.0 from it
    r, k = 0.6, 250.0
    e = float(flat_bottom_energy(o, r, k))
    expect = 2 * 0.5 * k * (1.0 - r) ** 2
    np.testing.assert_allclose(e, expect, rtol=1e-10)


def test_net_force_is_zero_and_matches_fd():
    o = jnp.asarray(np.random.default_rng(2).uniform(-0.5, 0.5, (6, 3)))
    r, k = 0.3, 400.0
    g = np.asarray(jax.grad(flat_bottom_energy)(o, r, k))
    assert np.abs(g).max() > 0  # some site is outside R
    np.testing.assert_allclose(g.sum(axis=0), 0.0, atol=1e-9)
    h = 1e-6
    for idx in [(0, 0), (3, 1), (5, 2)]:
        dp = np.zeros_like(np.asarray(o))
        dp[idx] = h
        fd = (float(flat_bottom_energy(o + dp, r, k))
              - float(flat_bottom_energy(o - dp, r, k))) / (2 * h)
        np.testing.assert_allclose(g[idx], fd, rtol=1e-5, atol=1e-8)


def test_potential_integration_and_pbc_guard():
    sys_ = System.waters(4)
    pos = _cluster_positions(sys_)
    base = dict(nonbonded_method='NoCutoff', target_epsilon=1e-6,
                max_iterations=200)
    e0 = MBPol(sys_, MBPolConfig(**base)).energy_forces(pos)[0]
    tight = MBPol(sys_, MBPolConfig(restraint_radius=0.05, restraint_k=300.0,
                                    **base))
    e1, f1, parts, _ = tight.energy_forces(pos)
    assert float(parts['restraint']) > 0
    np.testing.assert_allclose(float(e1) - float(e0),
                               float(parts['restraint']), rtol=1e-8)
    # net restraint force vanishes -> total force sum unchanged
    f0 = MBPol(sys_, MBPolConfig(**base)).energy_forces(pos)[1]
    np.testing.assert_allclose(np.asarray(f1).sum(axis=0),
                               np.asarray(f0).sum(axis=0), atol=1e-6)
    # wide radius: exactly the unrestrained energy
    loose = MBPol(sys_, MBPolConfig(restraint_radius=5.0, **base))
    np.testing.assert_allclose(float(loose.energy_forces(pos)[0]), float(e0),
                               rtol=1e-12)
    with pytest.raises(ValueError, match='cluster'):
        MBPol(System.waters(8, box=[2.0, 2.0, 2.0]),
              MBPolConfig(nonbonded_method='PME', restraint_radius=1.0))
