"""White-box + integration goldens for cluster electrostatics.

Golden sources (platforms/reference/tests/TestReferenceMBPolElectrostaticsForce.cpp):
  - Thole damped inverse-r factors, intra and inter pairs (:80-135)
  - computeWaterCharge charges + derivative tensors (:328-418)
  - testWater3: 3-site waters, no charge redistribution, E=-7.08652 kcal/mol
    + per-atom forces (:709-895)
  - python/tests/TestReferenceMBPolElectrostaticsForce.py:14: full water3
    (4-site, charge redistribution) E=-15.818784 kcal/mol.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.models import electrostatics as E
from mbpol_openmm_plugin_tpu.utils import units

WATER3_POS9 = np.array([
    [-1.516074336e+00, -2.023167650e-01, 1.454672917e+00],
    [-6.218989773e-01, -6.009430735e-01, 1.572437625e+00],
    [-2.017613812e+00, -4.190350349e-01, 2.239642849e+00],
    [-1.763651687e+00, -3.816594649e-01, -1.300353949e+00],
    [-1.903851736e+00, -4.935677617e-01, -3.457810126e-01],
    [-2.527904158e+00, -7.613550077e-01, -1.733803676e+00],
    [-5.588472140e-01, 2.006699172e+00, -1.392786582e-01],
    [-9.411558180e-01, 1.541226676e+00, 6.163293071e-01],
    [-9.858551734e-01, 1.567124294e+00, -8.830970941e-01],
]) * 0.1


def _damped_rr(damp_i, damp_j, r, gamma, order):
    u = jnp.asarray(r) / (damp_i * damp_j) ** (1.0 / 6.0)
    s = E.thole_scales(u, gamma, orders=(order,))[order]
    powers = {1: 1.0 / r, 3: 1.0 / r**3, 5: 3.0 / r**5, 7: 15.0 / r**7}
    return float(s) * powers[order]


def test_thole_factors_intra_pair():
    # TestReferenceMBPolElectrostaticsForce.cpp:80-107
    r = 9.860634018e-02
    dO, dH = 0.001310, 0.000294
    assert abs(_damped_rr(dO, dH, r, 0.4, 1) - 9.33047) < 1e-4
    assert abs(_damped_rr(dO, dH, r, 0.4, 3) - 5.324612470e+02) / 5.3246e2 < 1e-5
    assert abs(_damped_rr(dO, dH, r, 0.4, 5) - 4.747626558e+03 * 3) / 1.42e4 < 1e-5
    assert abs(_damped_rr(dO, dH, r, 0.4, 7) - (-2.13404e+07)) / 2.134e7 < 1e-4


def test_thole_factors_inter_pair():
    # TestReferenceMBPolElectrostaticsForce.cpp:109-135
    r = 2.771936396e-01
    dO = 0.001310
    assert abs(_damped_rr(dO, dO, r, 0.4, 1) - 3.607586381e+00) / 3.6 < 1e-5
    assert abs(_damped_rr(dO, dO, r, 0.4, 3) - 4.695157736e+01) / 46.9 < 1e-5
    assert abs(_damped_rr(dO, dO, r, 0.4, 5) - 6.110587933e-03 * 1e5 * 3) / 1833 < 1e-5
    assert abs(_damped_rr(dO, dO, r, 0.4, 7) - 119289.0) / 119289 < 1e-4


def test_compute_water_charge_goldens():
    # TestReferenceMBPolElectrostaticsForce.cpp:328-418
    pos = jnp.asarray(WATER3_POS9[:3])[None]            # first water, [1,3,3]
    q, dq = E.water_charges_and_derivatives(pos)
    np.testing.assert_allclose(np.asarray(q[0]),
                               [0.573599422, 0.577197137, -1.15079656], atol=1e-7)
    expected = np.array([
        [-0.224842979, 0.157051233, -0.139425246],
        [-0.118671613, 0.106113269, -0.118471774],
        [0.343514592, -0.263164503, 0.25789702],
        [-0.00533173093, 0.0989902789, -0.187436499],
        [0.065462366, 0.123151092, -0.285810407],
        [-0.060130635, -0.222141371, 0.473246906],
        [0.23017471, -0.256041512, 0.326861745],
        [0.0532092469, -0.229264361, 0.404282181],
        [-0.283383957, 0.485305874, -0.731143926],
    ]) * 10.0   # e/nm
    got = np.asarray(dq[0])     # [atom(O,H1,H2), charge(H1,H2,M), xyz]
    np.testing.assert_allclose(got[1], expected[0:3], atol=1e-6)   # vs H1
    np.testing.assert_allclose(got[2], expected[3:6], atol=1e-6)   # vs H2
    np.testing.assert_allclose(got[0], expected[6:9], atol=1e-6)   # vs O


def _three_site_params():
    n = 9
    damping = np.tile([0.001310, 0.000294, 0.000294], 3)
    polarity = damping.copy()
    charges = np.tile([-5.1966000e-01, 2.5983000e-01, 2.5983000e-01], 3)
    return E.ElecParams(
        thole=np.full(5, 0.4), damping=damping, polarity=polarity,
        mol_index=np.repeat(np.arange(3), 3),
        atom_type=np.tile([0, 1, 1], 3), charges=charges,
        include_charge_redistribution=False, target_epsilon=1e-9)


GOLDEN_W3_FORCES_KCAL_A = np.array([
    [-3.19433, 2.43239, -10.3645],
    [2.85289, -1.05713, 1.48109],
    [0.0173808, -0.452184, 2.42326],
    [1.70128, 3.95891, -3.18597],
    [0.245021, 0.703767, 8.78742],
    [-0.131845, -0.335554, 0.790616],
    [2.88521, 4.3743, 1.63126],
    [-2.57406, -4.43219, -0.234785],
    [-1.80153, -5.1923, -1.32836],
])


def test_water3_three_site_energy_forces():
    params = _three_site_params()
    pos = jnp.asarray(WATER3_POS9)
    energy, forces, diag = E.cluster_electrostatics(params, pos)
    assert bool(diag['converged'])
    e_kcal = float(energy) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - (-7.08652)) < 1e-4 * 7.1, e_kcal
    f_kcal_a = np.asarray(forces) * units.KJ_PER_MOL_TO_KCAL_PER_MOL / units.NM_TO_ANGSTROM
    np.testing.assert_allclose(f_kcal_a, GOLDEN_W3_FORCES_KCAL_A, rtol=2e-4, atol=2e-4)


def test_water3_full_virtual_site_energy():
    # python golden: water3 electrostatics-only -15.818784 kcal/mol (tol 0.1)
    sys_, pos = fixtures.load_system('water3')
    params = E.ElecParams.for_system(sys_)
    energy, forces, diag = E.cluster_electrostatics(params, pos)
    assert bool(diag['converged'])
    e_kcal = float(energy) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - (-15.818784)) < 0.1, e_kcal


def test_diis_scf_matches_sor():
    """DIIS-accelerated SCF (the CUDA reference's approach, on-device here)
    must converge to the same fixed point as the reference SOR loop."""
    import dataclasses
    params = dataclasses.replace(_three_site_params(), scf_method='diis')
    energy, forces, diag = E.cluster_electrostatics(params, jnp.asarray(WATER3_POS9))
    assert bool(diag['converged'])
    e_kcal = float(energy) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - (-7.08652)) < 1e-4 * 7.1
    f_kcal_a = np.asarray(forces) * units.KJ_PER_MOL_TO_KCAL_PER_MOL / units.NM_TO_ANGSTROM
    np.testing.assert_allclose(f_kcal_a, GOLDEN_W3_FORCES_KCAL_A, rtol=2e-4, atol=2e-4)
    # and it should be faster-converging than SOR
    _, _, diag_sor = E.cluster_electrostatics(_three_site_params(), jnp.asarray(WATER3_POS9))
    assert int(diag['iterations']) < int(diag_sor['iterations'])
