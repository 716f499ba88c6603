"""Realistic-occupancy mesh tests (round-2 verdict item 3).

The round-2 multichip tests all ran an 8-molecule lattice - 32 real sites
in ONE 256-site row tile, so 7 of 8 virtual devices held pure padding and
the sharded paths were never falsifiable at real occupancy. These tests
run the sharded electrostatics/PIP/PME machinery at liquid density where
every device owns real work:

- water50 bulk fixture: 10-step sharded MD trajectory == unsharded;
- water256 bulk fixture: sharded == unsharded for the dense-Pallas
  (interpret), block-sparse and molecule-pair sparse electrostatics modes
  (1024 real sites -> 4 real 256-row tiles; devices 0-3 own real rows,
  the tile granularity documents itself);
- water512 jittered-lattice: FULL occupancy for the block path - 2048
  sites = exactly 8 real row tiles, one per device; per-device local
  active-tile-pair lists are asserted non-trivial (multiple j-tiles) via
  the same host AABB count tune_capacities plans with.

All slow-marked: interpret-mode Pallas on the CPU mesh is an emulation.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.md import integrators as I
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.ops import elec_pallas as EP
from mbpol_openmm_plugin_tpu.ops import elec_pallas_bs as BS
from mbpol_openmm_plugin_tpu.parallel import mesh as M
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites

WATER256_BOX = [19.3996888399961804 / 10.0] * 3


def _water256():
    d = fixtures.load('water256_integration_test')
    sys_ = System.waters(256, box=WATER256_BOX)
    pos = compute_virtual_sites(sys_, jnp.asarray(d['positions']))
    return sys_, pos


def _water512_jittered(seed=7, spacing=0.31, jitter=0.012):
    """512 waters on an 8^3 lattice at liquid density (33.4 /nm^3) with a
    seeded jitter to break lattice symmetry; box 2.48 nm."""
    n_side = 8
    n = n_side ** 3
    box = [n_side * spacing] * 3
    sys_ = System.waters(n, box=box)
    rng = np.random.default_rng(seed)
    pos = np.zeros((4 * n, 3))
    k = 0
    for i in range(n_side):
        for j in range(n_side):
            for l in range(n_side):
                o = np.array([i, j, l]) * spacing + 0.05 \
                    + rng.normal(scale=jitter, size=3)
                pos[4 * k + 0] = o
                pos[4 * k + 1] = o + [0.0757, 0.0586, 0.0]
                pos[4 * k + 2] = o + [-0.0757, 0.0586, 0.0]
                k += 1
    return sys_, compute_virtual_sites(sys_, jnp.asarray(pos))


@pytest.mark.slow
def test_water50_sharded_trajectory_matches_unsharded():
    """10 MD steps on the water50 bulk fixture, sharded over the 8-device
    mesh vs unsharded: positions must agree to f64 tolerance. The padded
    pair/triplet batches hold 232/233 real rows (measured), so most of
    the 8 device slabs carry real work; the strict every-device-owns-
    real-tiles claims live in the water512 block test below."""
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    cfg = MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                      target_epsilon=1e-7, nlist_skin=0.0)
    mesh = M.make_mesh(8)

    def run(pot, ctx):
        pot.tune_capacities(pos)

        def ef(p):
            e, f, parts, diag = pot._energy_forces_impl(p)
            return e, f

        with ctx:
            e0, f0 = jax.jit(ef)(pos)
            st = I.MDState(positions=pos, velocities=jnp.zeros_like(pos),
                           forces=f0, potential_energy=e0,
                           box=jnp.asarray(sys_.box),
                           step=jnp.zeros((), jnp.int32),
                           rng=jax.random.PRNGKey(0))
            step = jax.jit(
                lambda s: I.velocity_verlet_step(sys_, ef, s, 2e-4))
            for _ in range(10):
                st = step(st)
            jax.block_until_ready(st.positions)
        return st

    # real per-device pair/triplet occupancy, not one-device-owns-all
    # (water50 at this box measures 232 pairs / 233 triplets - an average
    # of ~29 real rows per device slab)
    pot_m = MBPol(sys_, cfg, mesh=mesh)
    pot_m.tune_capacities(pos)
    _, diag = pot_m.build_neighbor_lists(pos)
    assert int(diag['n_pairs']) > 8 * 16
    assert int(diag['n_triplets']) > 8 * 16

    import contextlib
    st_ref = run(MBPol(sys_, cfg), contextlib.nullcontext())
    st_m = run(pot_m, mesh)
    np.testing.assert_allclose(np.asarray(st_m.positions),
                               np.asarray(st_ref.positions), atol=1e-9)
    np.testing.assert_allclose(float(st_m.potential_energy),
                               float(st_ref.potential_energy), rtol=1e-10)


@pytest.mark.slow
def test_water256_dense_pallas_sharded_matches(monkeypatch):
    """Dense-Pallas (interpret) sharded == unsharded at water256: 1024
    real sites, each of the first 4 devices holds a full real 256-row
    tile."""
    monkeypatch.setenv('MBPOL_ELEC_PALLAS', 'interpret')
    sys_, pos = _water256()
    cfg = MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                      target_epsilon=1e-7, electrostatics_mode='dense')
    pot_ref = MBPol(sys_, cfg)
    pot_ref.tune_capacities(pos)
    e_ref, f_ref, _, _ = pot_ref.energy_forces(pos)

    mesh = M.make_mesh(8)
    # row-slab occupancy at this size: 2048 padded rows over 8 devices ->
    # 256 rows each; real rows fill devices 0..3 completely
    npad = EP.padded_for_mesh(4 * 256, 8)
    rows_per_dev = npad // 8
    real_devs = sum(1 for d in range(8) if d * rows_per_dev < 4 * 256)
    assert real_devs >= 4
    pot = MBPol(sys_, cfg, mesh=mesh)
    pot.tune_capacities(pos)
    with mesh:
        e, f, _, diag = pot.energy_forces(pos)
        jax.block_until_ready(f)
    assert bool(diag['converged'])
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-7)


@pytest.mark.slow
def test_water256_sparse_sharded_matches():
    """Molecule-pair sparse electrostatics sharded == unsharded dense at
    water256 (the large-N production path; every device owns a real slice
    of the ~28k molecule-pair list)."""
    sys_, pos = _water256()
    pot_ref = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                      target_epsilon=1e-7,
                                      electrostatics_mode='dense'))
    pot_ref.tune_capacities(pos)
    e_ref, f_ref, _, _ = pot_ref.energy_forces(pos)

    mesh = M.make_mesh(8)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-7,
                                  electrostatics_mode='sparse'), mesh=mesh)
    pot.tune_capacities(pos)
    assert pot.elec_pair_cap > 8 * 64    # real pairs on every device slab
    with mesh:
        e, f, _, diag = pot.energy_forces(pos)
        jax.block_until_ready(f)
    assert bool(diag['converged'])
    assert not bool(diag['elec_pair_overflow'])
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-6)


@pytest.mark.slow
def test_water256_block_sharded_matches(monkeypatch):
    """Block-sparse Pallas (interpret) sharded == unsharded dense at
    water256: the per-device local tile-pair lists cover 4 real tiles."""
    monkeypatch.setenv('MBPOL_ELEC_PALLAS', 'interpret')
    sys_, pos = _water256()
    pot_ref = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                      target_epsilon=1e-7,
                                      electrostatics_mode='dense'))
    pot_ref.tune_capacities(pos)
    e_ref, f_ref, _, _ = pot_ref.energy_forces(pos)

    mesh = M.make_mesh(8)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-7,
                                  electrostatics_mode='block'), mesh=mesh)
    pot.tune_capacities(pos)
    # host AABB occupancy: the 4 real tiles interact densely (box 1.94 nm,
    # cutoff 0.9 -> every tile pair is active): devices 0-3 own real pairs
    perm = pot._block_info['site_perm']
    pos4 = np.asarray(pos).reshape(-1, 3)[perm]
    npad = EP.padded_for_mesh(4 * 256, 8)
    n_act, per_dev, _ = BS.active_tile_pairs_host(
        pos4, 4 * 256, sys_.box, 0.9, npad, n_devices=8)
    assert n_act >= 16
    assert sum(1 for c in per_dev if c > 0) >= 4
    with mesh:
        e, f, _, diag = pot.energy_forces(pos)
        jax.block_until_ready(f)
    assert bool(diag['converged'])
    assert not bool(diag['elec_tile_overflow'])
    assert int(diag['elec_tile_pairs']) >= 16
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-7)


@pytest.mark.slow
def test_water512_block_full_device_occupancy(monkeypatch):
    """FULL mesh occupancy for the block path: 512 waters = 2048 sites =
    exactly 8 real 256-row tiles, one per device - no device holds pure
    padding, and every device's local active-tile-pair list spans multiple
    j-tiles. Equality vs the unsharded molecule-pair sparse path (the O(N)
    reference at this size)."""
    monkeypatch.setenv('MBPOL_ELEC_PALLAS', 'interpret')
    sys_, pos = _water512_jittered()
    pot_ref = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                      target_epsilon=1e-7,
                                      electrostatics_mode='sparse'))
    pot_ref.tune_capacities(pos)
    e_ref, f_ref, _, dref = pot_ref.energy_forces(pos)
    assert bool(dref['converged'])

    mesh = M.make_mesh(8)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-7,
                                  electrostatics_mode='block'), mesh=mesh)
    pot.tune_capacities(pos)
    perm = pot._block_info['site_perm']
    pos4 = np.asarray(pos).reshape(-1, 3)[perm]
    npad = EP.padded_for_mesh(4 * 512, 8)
    assert npad == 4 * 512               # already 8 whole tiles: no padding
    n_act, per_dev, act = BS.active_tile_pairs_host(
        pos4, 4 * 512, sys_.box, 0.9, npad, n_devices=8)
    # every device owns real tile pairs, each spanning multiple j-tiles
    assert all(c >= 2 for c in per_dev), per_dev
    T = npad // BS.TI
    for i in range(T):
        assert int(act[i].sum()) >= 2, (i, act[i])
    with mesh:
        e, f, _, diag = pot.energy_forces(pos)
        jax.block_until_ready(f)
    assert bool(diag['converged'])
    assert not bool(diag['elec_tile_overflow'])
    assert int(diag['elec_tile_pairs']) == n_act
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-8)
    # two different formulations (tile-pair Pallas kernels vs molecule-
    # pair sparse): forces at this jittered-lattice density reach ~750
    # kJ/mol/nm, so the f32-kernel rounding floor is ~1e-4 absolute
    # (measured max 1.3e-4, 4.7e-6 relative)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=5e-4)
