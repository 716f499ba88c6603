"""Sparse (pair-list) PME electrostatics must reproduce the dense path."""
import numpy as np

import jax.numpy as jnp

import fixtures
from mbpol_openmm_plugin_tpu.models import electrostatics as E
from mbpol_openmm_plugin_tpu.models import pme as P
from mbpol_openmm_plugin_tpu.models import pme_sparse as PS
from mbpol_openmm_plugin_tpu.ops import neighbors
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites, make_molecules_whole


def _setup(name, n_mol, box):
    sys_ = System.waters(n_mol, box=box)
    d = fixtures.load(name)
    pos = jnp.asarray(d['positions'])
    pos = make_molecules_whole(sys_, pos)
    pos = compute_virtual_sites(sys_, pos)
    params = E.ElecParams.for_system(sys_, target_epsilon=1e-8)
    tol = 1e-4
    alpha = float(np.sqrt(-np.log(2 * tol)) / 0.9)
    grid = tuple(int(np.ceil(2 * alpha * b / (3 * tol ** 0.2))) for b in box)
    setup = P.PmeSetup(alpha=alpha, grid=grid, cutoff=0.9, box=tuple(box))
    return sys_, pos, params, setup


def _pair_list(sys_, pos, setup):
    o = pos[sys_.o_index]
    cutoff = setup.cutoff + PS.PAIR_MARGIN
    cap = neighbors.pair_capacity(sys_.n_waters, sys_.box, cutoff, factor=2.0)
    pairs, mask, n = neighbors.pair_list(o, sys_.box, cutoff, cap)
    assert int(n) <= cap
    return pairs, mask


def test_sparse_matches_dense_water50():
    sys_, pos, params, setup = _setup('water50', 50, [1.8] * 3)
    e_d, f_d, diag_d = P.pme_electrostatics(params, setup, pos)
    pairs, mask = _pair_list(sys_, pos, setup)
    e_s, f_s, diag_s = PS.pme_electrostatics_sparse(params, setup, pos, pairs, mask)
    assert bool(diag_s['converged'])
    np.testing.assert_allclose(float(e_s), float(e_d), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_d), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(diag_s['induced_dipoles']),
                               np.asarray(diag_d['induced_dipoles']),
                               rtol=1e-6, atol=1e-12)


def test_sparse_matches_dense_water256():
    box = [19.3996888399961804 / 10.0] * 3
    sys_, pos, params, setup = _setup('water256_integration_test', 256, box)
    e_d, f_d, diag_d = P.pme_electrostatics(params, setup, pos)
    pairs, mask = _pair_list(sys_, pos, setup)
    e_s, f_s, diag_s = PS.pme_electrostatics_sparse(params, setup, pos, pairs, mask)
    np.testing.assert_allclose(float(e_s), float(e_d), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f_s), np.asarray(f_d), rtol=1e-6, atol=1e-6)


def test_potential_sparse_mode_matches_dense():
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    e_d = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  electrostatics_mode='dense')).energy_forces(pos)
    e_s = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  electrostatics_mode='sparse')).energy_forces(pos)
    np.testing.assert_allclose(float(e_s[0]), float(e_d[0]), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(e_s[1]), np.asarray(e_d[1]),
                               rtol=1e-6, atol=1e-6)
