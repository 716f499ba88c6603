"""Whole-model PME integration goldens.

Reference: python/tests/TestReferenceMBPolIntegrationTest.py and
TestReferenceMBPol14WaterTest.py:
  - water3 PME, box 1.9 nm: -8.92353 kcal/mol
  - water14 PME, box 1.8 nm: -60 +/- 1 kcal/mol
  - water50 PME, box 1.8 nm: -244.37507 +/- 1 kcal/mol
  - water256 PME, box 1.93997 nm: -2270.8889 +/- 20 kcal/mol
All with nonbondedCutoff = 0.9 nm.
"""
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.utils import units


def _total(name, box, **cfg):
    sys_, pos = fixtures.load_system(name, box=box)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9, **cfg))
    e, forces, parts, diag = pot.energy_forces(pos)
    assert bool(diag['converged'])
    assert np.all(np.isfinite(np.asarray(forces)))
    return float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL, parts


def test_water3_pme_total():
    e_kcal, parts = _total('water3', [1.9, 1.9, 1.9])
    assert abs(e_kcal - (-8.92353)) < 0.1, (e_kcal, {k: float(v) / 4.184 for k, v in parts.items()})


def test_water14_pme_total():
    e_kcal, parts = _total('water14', [1.8, 1.8, 1.8])
    assert abs(e_kcal - (-60.0)) < 1.0, (e_kcal, {k: float(v) / 4.184 for k, v in parts.items()})


def test_water50_pme_total():
    e_kcal, parts = _total('water50', [1.8, 1.8, 1.8])
    assert abs(e_kcal - (-244.37507)) < 1.0, (e_kcal, {k: float(v) / 4.184 for k, v in parts.items()})


@pytest.mark.slow
def test_water256_pme_total():
    box = 19.3996888399961804 / 10.0
    e_kcal, parts = _total('water256_integration_test', [box, box, box])
    assert abs(e_kcal - (-2270.88890)) < 20.0, (e_kcal, {k: float(v) / 4.184 for k, v in parts.items()})


def test_pme_force_consistency_finite_difference():
    """PME total forces must equal -dE/dx including the per-site-potential
    charge-derivative contributions (the reference's trickiest path,
    cpp:2767-2773)."""
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-10))
    _, forces, _, _ = pot.energy_forces(pos)
    rng = np.random.default_rng(3)
    h = 2e-6
    for _ in range(4):
        i = int(rng.integers(0, sys_.n_atoms))
        if i % 4 == 3:
            i -= 1          # M-site coordinates are overwritten by vsites
        d = int(rng.integers(0, 3))
        p1 = pos.at[i, d].add(h)
        p2 = pos.at[i, d].add(-h)
        fd = -(float(pot.energy(p1)) - float(pot.energy(p2))) / (2 * h)
        # tolerance allows for the hard 0.9 nm truncation of the direct-space
        # sum (discontinuous in the reference as well) and residual SCF noise
        np.testing.assert_allclose(float(forces[i, d]), fd, rtol=1e-3, atol=5e-3)


def test_diis_scf_matches_sor_on_bulk_pme():
    """DIIS (the advertised SCF accelerator, cf. the CUDA platform's DIIS in
    multipoleInducedField.cu:374-482) must reach the same fixed point as the
    reference-semantics SOR on a bulk PME system - previously validated only
    on water3 clusters."""
    import fixtures
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    res = {}
    for method in ('sor', 'diis'):
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                      target_epsilon=1e-8, max_iterations=200,
                                      scf_method=method))
        e, f, parts, diag = pot.energy_forces(pos)
        assert bool(diag['converged']), method
        res[method] = (float(e), np.asarray(f), int(diag['iterations']))
    e_sor, f_sor, it_sor = res['sor']
    e_diis, f_diis, it_diis = res['diis']
    # residual difference is bounded by the SCF target epsilon (both
    # methods stop at eps < 1e-8, not at the exact fixed point)
    np.testing.assert_allclose(e_diis, e_sor, rtol=1e-7)
    np.testing.assert_allclose(f_diis, f_sor, atol=1e-4)
    # the accelerator must not be slower than SOR in iteration count
    assert it_diis <= it_sor, (it_diis, it_sor)
