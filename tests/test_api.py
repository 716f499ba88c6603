"""Low-level Force API tests, mirroring the reference's C++ test drivers
(TestReferenceMBPolOneBodyForce.cpp etc.) through the mbpolplugin-style
surface."""
import numpy as np
import pytest

from mbpol_openmm_plugin_tpu import api
from test_one_body import GOLDEN_ENERGY_KCAL as E1B, WATER1_POS
from test_three_body import GOLDEN_ENERGY_KCAL as E3B, WATER3_POS
from test_two_body import GOLDEN_ENERGY_KCAL as E2B, WATER2_POS


def test_one_body_force_api():
    f = api.MBPolOneBodyForce()
    f.addOneBody([0, 1, 2])
    e, forces = f.computeForceAndEnergy(WATER1_POS)
    assert abs(e / 4.184 - E1B) < 1e-6
    assert forces.shape == (3, 3)


def test_two_body_force_api():
    f = api.MBPolTwoBodyForce()
    f.addParticle([0, 1, 2])
    f.addParticle([3, 4, 5])
    f.setCutoff(10.0)
    e, forces = f.computeForceAndEnergy(WATER2_POS)
    assert abs(e / 4.184 - E2B) < 1e-6


def test_three_body_force_api():
    f = api.MBPolThreeBodyForce()
    for j in range(3):
        f.addParticle([3 * j, 3 * j + 1, 3 * j + 2])
    e, forces = f.computeForceAndEnergy(WATER3_POS)
    assert abs(e / 4.184 - E3B) < 1e-6


def test_electrostatics_force_api_three_site():
    from test_electrostatics_cluster import WATER3_POS9
    f = api.MBPolElectrostaticsForce()
    for mol in range(3):
        f.addElectrostatics(-5.1966000e-01, mol, 0, 0.001310, 0.001310)
        f.addElectrostatics(2.5983000e-01, mol, 1, 0.000294, 0.000294)
        f.addElectrostatics(2.5983000e-01, mol, 1, 0.000294, 0.000294)
    f.setTholeParameters([0.4] * 5)
    f.setIncludeChargeRedistribution(False)
    f.setMutualInducedTargetEpsilon(1e-9)
    e, forces = f.computeForceAndEnergy(WATER3_POS9)
    assert abs(e / 4.184 - (-7.08652)) < 1e-3, e / 4.184


def test_system_moments_and_grid_potential():
    from test_electrostatics_cluster import WATER3_POS9
    f = api.MBPolElectrostaticsForce()
    for mol in range(3):
        f.addElectrostatics(-5.1966000e-01, mol, 0, 0.001310, 0.001310)
        f.addElectrostatics(2.5983000e-01, mol, 1, 0.000294, 0.000294)
        f.addElectrostatics(2.5983000e-01, mol, 1, 0.000294, 0.000294)
    f.setTholeParameters([0.4] * 5)
    f.setIncludeChargeRedistribution(False)
    masses = np.tile([15.999, 1.008, 1.008], 3)
    moments = f.getSystemElectrostaticsMoments(masses, WATER3_POS9)
    assert moments.shape == (13,)
    assert abs(moments[0]) < 1e-10          # net charge 0
    assert np.all(np.isfinite(moments))
    grid = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    pot = f.getElectrostaticPotential(grid, WATER3_POS9)
    assert pot.shape == (2,) and np.all(np.isfinite(pot))


def test_with_updated_params_midrun():
    """updateParametersInContext parity (MBPolElectrostaticsForce.h:281):
    mutate Thole parameters and charges on a live potential; shapes and
    capacities carry over, physics responds, and restoring the original
    values reproduces the original energy exactly."""
    import dataclasses

    import fixtures
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig

    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    e0, f0, parts0, _ = pot.energy_forces(pos)

    # Thole change: electrostatics shifts, smooth terms untouched
    th = np.asarray(pot.elec_params.thole, float).copy()
    th[2] *= 2.0
    pot2 = pot.with_updated_params(thole=th)
    e2, f2, parts2, _ = pot2.energy_forces(pos)
    assert abs(float(parts2['electrostatics']) - float(parts0['electrostatics'])) > 1e-3
    np.testing.assert_allclose(float(parts2['two_body']), float(parts0['two_body']),
                               rtol=1e-12)

    # charge scaling with redistribution disabled: electrostatics responds
    pot3 = pot.with_updated_params(include_charge_redistribution=False)
    e3, _, parts3, _ = pot3.energy_forces(pos)
    q = np.asarray(pot3.elec_params.charges, float) * 0.5
    pot4 = pot3.with_updated_params(charges=q)
    e4, _, parts4, _ = pot4.energy_forces(pos)
    assert abs(float(parts4['electrostatics'])) < abs(float(parts3['electrostatics']))

    # particle-count mismatch raises (MBPolReferenceKernels.cpp:117-118)
    with pytest.raises(ValueError, match='particle count'):
        pot.with_updated_params(charges=np.zeros(5))

    # round trip back to the original parameters reproduces e0
    pot5 = pot2.with_updated_params(thole=np.asarray(pot.elec_params.thole, float))
    e5, _, _, _ = pot5.energy_forces(pos)
    np.testing.assert_allclose(float(e5), float(e0), rtol=1e-12)
