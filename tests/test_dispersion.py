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


def _periodic_water_box(n_side=3, spacing=0.31):
    from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites
    n = n_side ** 3
    box = [n_side * spacing] * 3
    sys_ = System.waters(n, box=box)
    pos = np.zeros((4 * n, 3))
    k = 0
    for i in range(n_side):
        for j in range(n_side):
            for l in range(n_side):
                o = np.array([i, j, l]) * spacing + 0.03 * np.array([i, -j, l])
                pos[4 * k + 0] = o
                pos[4 * k + 1] = o + [0.0757, 0.0586, 0.0]
                pos[4 * k + 2] = o + [-0.0757, 0.0586, 0.0]
                k += 1
    return sys_, compute_virtual_sites(sys_, jnp.asarray(pos))


def test_dispersion_pairs_matches_dense():
    """The O(N) molecule-pair path (dispersion_energy_pairs) must equal the
    dense pair grid exactly: the M row of the C6/d6 tables is zero and
    every sub-cutoff site pair lives in a listed molecule pair (O-O list
    radius cutoff + PAIR_MARGIN)."""
    from mbpol_openmm_plugin_tpu.models.dispersion import (
        PAIR_MARGIN, dispersion_energy_pairs)
    from mbpol_openmm_plugin_tpu.ops import neighbors

    sys_, pos = _periodic_water_box()
    cutoff = 0.45
    e_dense = dispersion_energy(sys_, pos, cutoff=cutoff, box=sys_.box)

    mp, mask, n_mp = neighbors.pair_list(pos[sys_.o_index], sys_.box,
                                         cutoff + PAIR_MARGIN, 4096)
    assert int(n_mp) <= 4096
    e_pairs = dispersion_energy_pairs(sys_, pos, mp, mask, cutoff,
                                      box=sys_.box)
    np.testing.assert_allclose(float(e_pairs), float(e_dense), rtol=1e-12)

    # forces too (autodiff through the gathered site blocks)
    f_dense = jax.grad(lambda p: dispersion_energy(
        sys_, p, cutoff=cutoff, box=sys_.box))(pos)
    f_pairs = jax.grad(lambda p: dispersion_energy_pairs(
        sys_, p, mp, mask, cutoff, box=sys_.box))(pos)
    np.testing.assert_allclose(np.asarray(f_pairs), np.asarray(f_dense),
                               atol=1e-10)


def test_dispersion_pairs_margin_matches_pme_sparse():
    """The list-sharing logic in models/potential.py assumes both modules
    use the same site-vs-O offset bound."""
    from mbpol_openmm_plugin_tpu.models import dispersion, pme_sparse
    assert dispersion.PAIR_MARGIN == pme_sparse.PAIR_MARGIN


def test_dispersion_mode_auto_resolution():
    """auto -> pairs exactly when electrostatics left the dense regime on a
    water-only periodic system; explicit 'pairs' with ions raises."""
    import pytest

    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.system import System

    sys_, pos = _periodic_water_box()
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45))
    assert pot.elec_mode == 'dense' and pot.disp_mode == 'dense'

    pot_s = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45,
                                    electrostatics_mode='sparse'))
    assert pot_s.disp_mode == 'pairs' and pot_s.disp_pair_cap is None

    e_d, f_d, parts_d, _ = pot.energy_forces(pos)
    e_s, f_s, parts_s, _ = pot_s.energy_forces(pos)
    np.testing.assert_allclose(float(parts_s['dispersion']),
                               float(parts_d['dispersion']), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_d), atol=5e-7)

    ion_sys, _ = fixtures.load_system('water_and_ion')
    with np.testing.assert_raises(Exception):
        MBPol(ion_sys, MBPolConfig(nonbonded_method='NoCutoff',
                                   dispersion_mode='pairs'))
