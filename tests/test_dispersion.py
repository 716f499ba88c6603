"""Golden tests for TT6 dispersion.

Reference goldens: python/tests/TestCustomDispersion.py:14 (water3
-6.84471477 kcal/mol), :50 (water+Cl- -1.306598 kcal/mol). Both use
CutoffNonPeriodic with the default 1.0 nm cutoff (all pairs inside).
"""
import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from mbpol_openmm_plugin_tpu.models.dispersion import dispersion_energy
from mbpol_openmm_plugin_tpu.utils import units


def test_water3_dispersion():
    sys_, pos = fixtures.load_system('water3')
    e = dispersion_energy(sys_, pos, cutoff=1.0)
    e_kcal = float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - (-6.84471477)) < 0.01, e_kcal  # reference test tolerance (PDB coords are 3-decimal)


def test_water_and_ion_dispersion():
    sys_, pos = fixtures.load_system('water_and_ion')
    assert sys_.n_ions == 1
    e = dispersion_energy(sys_, pos, cutoff=1.0)
    e_kcal = float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - (-1.306598)) < 0.01, e_kcal


def test_dispersion_forces_finite_diff():
    sys_, pos = fixtures.load_system('water3')
    f = jax.grad(lambda p: dispersion_energy(sys_, p, cutoff=1.0))(pos)
    # central finite difference on one coordinate
    h = 1e-6
    p1 = pos.at[0, 0].add(h)
    p2 = pos.at[0, 0].add(-h)
    fd = (dispersion_energy(sys_, p1, cutoff=1.0) - dispersion_energy(sys_, p2, cutoff=1.0)) / (2 * h)
    np.testing.assert_allclose(float(f[0, 0]), float(fd), rtol=1e-6)
