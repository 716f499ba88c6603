"""Fused Pallas electrostatics kernels (ops/elec_pallas.py) must reproduce
the XLA dense PME path exactly (same reference formulas, same masks).

Runs the kernels in Pallas interpret mode on CPU float64 - the TPU-compiled
path is additionally exercised by bench.py and the TPU test mode
(MBPOL_TEST_TPU=1). The special-function fits (erfc branches, Q(3/4,x) via
H2) are validated against scipy at f64 here; in f32 production they sit at
the f32 noise floor (measured: max force error vs float64 truth 0.105 vs
0.096 for the XLA f32 path on water50 PME).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.models import pme as pme_mod
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.system import (compute_virtual_sites,
                                            make_molecules_whole)


@pytest.fixture
def water50_pme():
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                  target_epsilon=1e-7))
    pos_v = compute_virtual_sites(sys_, make_molecules_whole(sys_, pos))
    return pot, pos_v


def test_pallas_kernels_match_xla_path(water50_pme):
    pot, pos_v = water50_pme
    os.environ['MBPOL_ELEC_PALLAS'] = '0'
    try:
        e1, f1, d1 = pme_mod.pme_electrostatics(pot.elec_params, pot.pme, pos_v)
        os.environ['MBPOL_ELEC_PALLAS'] = 'interpret'
        e2, f2, d2 = pme_mod.pme_electrostatics(pot.elec_params, pot.pme, pos_v)
    finally:
        os.environ.pop('MBPOL_ELEC_PALLAS', None)
    # identical physics; residual differences are the special-function fits
    # (deg-16 H2 for Q(3/4,x): term error ~8e-7) and f64 summation order
    np.testing.assert_allclose(float(e2), float(e1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=2e-3)
    assert int(d2['iterations']) == int(d1['iterations'])


def test_special_function_fits():
    """erfc branches and H2-based Q(3/4,x) vs scipy."""
    from scipy.special import erfc as s_erfc
    from scipy.special import gammaincc

    from mbpol_openmm_plugin_tpu.ops import elec_pallas as EP

    x = jnp.asarray(np.linspace(1e-6, 6.4, 3001))
    np.testing.assert_allclose(np.asarray(EP._erfc(x)),
                               s_erfc(np.asarray(x)), atol=5e-11)

    u = np.linspace(1e-4, 5.0, 2001)
    g = 0.4
    y = jnp.minimum(g ** 0.25 * jnp.asarray(u), 3.6)
    q_fit = np.asarray(EP._poly(y, EP._H2_COEF)) * np.exp(-g * u ** 4)
    q_ref = gammaincc(0.75, g * u ** 4)
    # the physical Thole term is u * Gamma(3/4) * Q
    np.testing.assert_allclose(u * 1.2254167 * q_fit, u * 1.2254167 * q_ref,
                               atol=1e-6)


def test_triangular_kernels_match_full(water50_pme):
    """Symmetry-halved kernels (j >= i tiles + upper-triangle masking) must
    reproduce the full-grid kernels: s3/s5 bitwise-symmetrizable, field/
    energy/forces/potential equal up to f64 summation order."""
    from mbpol_openmm_plugin_tpu.ops import elec_pallas as EP

    pot, pos_v = water50_pme
    params, setup = pot.elec_params, pot.pme
    from mbpol_openmm_plugin_tpu.models.electrostatics import assemble_charges
    charges, _ = assemble_charges(params, pos_v)
    d16_inv = jnp.asarray(np.asarray(params.damping) ** (-1.0 / 6.0),
                          pos_v.dtype)
    srow = EP.pack_sites(pos_v, charges, d16_inv,
                         jnp.asarray(params.mol_index),
                         jnp.asarray(params.atom_type == 0))
    n = pos_v.shape[0]
    th = params.thole

    ef1, s3a, s5a = EP.fixed_field_and_scf_factors(setup, th, srow, n,
                                                   interpret=True)
    ef2, s3b, s5b = EP.fixed_field_and_scf_factors_tri(setup, th, srow, n,
                                                       interpret=True)
    # the strict-upper entries are computed identically (all pair factors
    # are bitwise i<->j symmetric), so symmetrization reproduces S exactly
    np.testing.assert_allclose(np.asarray(s3b), np.asarray(s3a), atol=1e-14)
    np.testing.assert_allclose(np.asarray(s5b), np.asarray(s5a), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ef2), np.asarray(ef1),
                               rtol=1e-12, atol=1e-10)

    mu = 0.01 * jnp.sin(jnp.arange(3 * srow.shape[0], dtype=srow.dtype)
                        ).reshape(-1, 3)[:n]
    e1, f1, p1 = EP.direct_energy_force_pot(setup, th, srow, mu, n,
                                            interpret=True)
    e2, f2, p2 = EP.direct_energy_force_pot_tri(setup, th, srow, mu, n,
                                                interpret=True)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1),
                               rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1),
                               rtol=1e-10, atol=1e-12)


def test_triangular_pipeline_matches_full(water50_pme):
    """End-to-end PME electrostatics with MBPOL_ELEC_TRI on vs off."""
    pot, pos_v = water50_pme
    os.environ['MBPOL_ELEC_PALLAS'] = 'interpret'
    try:
        os.environ['MBPOL_ELEC_TRI'] = '0'
        e1, f1, d1 = pme_mod.pme_electrostatics(pot.elec_params, pot.pme, pos_v)
        os.environ['MBPOL_ELEC_TRI'] = '1'
        e2, f2, d2 = pme_mod.pme_electrostatics(pot.elec_params, pot.pme, pos_v)
    finally:
        os.environ.pop('MBPOL_ELEC_PALLAS', None)
        os.environ.pop('MBPOL_ELEC_TRI', None)
    np.testing.assert_allclose(float(e2), float(e1), rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-8)
    assert int(d2['iterations']) == int(d1['iterations'])


def test_block_sparse_kernels_match_xla_path(water50_pme):
    """Block-sparse kernels (ops/elec_pallas_bs.py) vs the dense XLA path,
    interpret mode. water50 pads to one 256-site tile; the multi-tile and
    sorted-permutation paths are covered by the water256 variant below."""
    pot, pos_v = water50_pme
    _run_block_vs_dense(pot, pos_v)


def _run_block_vs_dense(pot, pos_v):
    from mbpol_openmm_plugin_tpu.ops import elec_pallas_bs as bs

    n_sites = pos_v.shape[0]
    o = np.asarray(pos_v)[np.asarray(pot.system.o_index)]
    mol_perm = bs.molecule_sort_permutation(o, pot.system.box)
    site_perm = (4 * mol_perm[:, None] + np.arange(4)[None, :]).reshape(-1)
    inv = np.empty_like(site_perm)
    inv[site_perm] = np.arange(n_sites)
    cap = bs.tile_pair_capacity(n_sites, pot.system.box, pot.pme.cutoff)
    block = dict(site_perm=site_perm, site_perm_inv=inv,
                 tile_pair_capacity=cap)

    os.environ['MBPOL_ELEC_PALLAS'] = '0'
    try:
        e1, f1, d1 = pme_mod.pme_electrostatics(pot.elec_params, pot.pme, pos_v)
        os.environ['MBPOL_ELEC_PALLAS'] = 'interpret'
        e2, f2, d2 = pme_mod.pme_electrostatics(pot.elec_params, pot.pme,
                                                pos_v, block=block)
    finally:
        os.environ.pop('MBPOL_ELEC_PALLAS', None)
    assert not bool(d2['elec_tile_overflow'])
    assert int(d2['elec_tile_pairs']) <= cap
    np.testing.assert_allclose(float(e2), float(e1), atol=2e-3)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=2e-3)
    assert int(d2['iterations']) == int(d1['iterations'])


@pytest.mark.slow
def test_block_sparse_kernels_multi_tile_water256():
    """Multi-tile block sparsity (1024 sites = 4 row tiles) with a real
    spatial sort; some tile pairs must actually be inactive."""
    box = [19.3996888399961804 / 10.0] * 3
    sys_, pos = fixtures.load_system('water256_integration_test', box=box)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45,
                                  target_epsilon=1e-5))
    pos_v = compute_virtual_sites(sys_, make_molecules_whole(sys_, pos))
    _run_block_vs_dense(pot, pos_v)
