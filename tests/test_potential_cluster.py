"""Whole-model integration golden: water3 cluster total energy.

Reference: python/tests/TestReferenceMBPolIntegrationTest.py:12
(CutoffNonPeriodic, cutoff 0.9 nm, E_total = -8.78893485 kcal/mol, tol 0.1).
"""
import jax
import numpy as np

import fixtures
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.utils import units


def test_water3_total_cluster():
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9))
    e, forces, parts, diag = pot.energy_forces(pos)
    e_kcal = float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - (-8.78893485)) < 0.1, (e_kcal, {k: float(v) / 4.184 for k, v in parts.items()})
    assert bool(diag['converged'])
    assert np.all(np.isfinite(np.asarray(forces)))


def test_water3_force_consistency_finite_difference():
    """Total forces must equal -dE/dx including through the SCF (the explicit
    electrostatic force formulas are the converged-SCF gradient)."""
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9,
                                  target_epsilon=1e-10))
    _, forces, _, _ = pot.energy_forces(pos)
    rng = np.random.default_rng(0)
    h = 2e-6
    for _ in range(4):
        i = rng.integers(0, sys_.n_atoms)
        # skip M sites: their coordinates are overwritten by vsite placement
        if i % 4 == 3:
            i -= 1
        d = rng.integers(0, 3)
        p1 = pos.at[i, d].add(h)
        p2 = pos.at[i, d].add(-h)
        fd = -(float(pot.energy(p1)) - float(pot.energy(p2))) / (2 * h)
        np.testing.assert_allclose(float(forces[i, d]), fd, rtol=5e-5, atol=1e-4)
