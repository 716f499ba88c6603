"""MD loop tests: NVE energy conservation on the water3 cluster (mirrors the
reference's water14 NVE example intent, python/water14.py) plus thermostat,
checkpoint/resume determinism, and minimization."""
import jax.numpy as jnp
import numpy as np

import fixtures
from mbpol_openmm_plugin_tpu.md.simulation import Simulation, SimulationConfig
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig


def _sim(temperature=None, thermostat='andersen', dt=0.0002):
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9))
    sim = Simulation(pot, SimulationConfig(dt=dt, temperature=temperature,
                                           thermostat=thermostat), seed=1)
    sim.set_positions(pos)
    return sim


def test_nve_energy_conservation():
    sim = _sim(dt=0.0002)   # 0.2 fs, the reference's cluster timestep
    sim.set_velocities_to_temperature(50.0)
    m0 = sim.step(5)
    e0 = m0['total_energy'][-1]
    m = sim.step(100, report_interval=20)
    drift = np.max(np.abs(m['total_energy'] - e0))
    # kJ/mol drift over 100 steps at 0.2 fs should be tiny
    assert drift < 0.02, (drift, m['total_energy'], e0)


def test_thermostat_heats_system():
    sim = _sim(temperature=300.0, thermostat='andersen')
    sim.step(200, report_interval=200)
    t = sim.step(100)['temperature'][-1]
    assert 100.0 < t < 700.0, t


def test_checkpoint_resume_determinism(tmp_path):
    sim = _sim(temperature=300.0, thermostat='langevin')
    sim.set_velocities_to_temperature(300.0)
    sim.step(20)
    path = str(tmp_path / 'ck.npz')
    sim.save_checkpoint(path)
    sim.step(20)
    ref_pos = np.asarray(sim.state.positions)

    sim2 = _sim(temperature=300.0, thermostat='langevin')
    sim2.set_positions(np.zeros_like(ref_pos))
    sim2.load_checkpoint_file(path)
    sim2.step(20)
    np.testing.assert_allclose(np.asarray(sim2.state.positions), ref_pos, atol=1e-12)


def test_minimization_lowers_energy():
    sim = _sim()
    e0 = float(sim.state.potential_energy)
    sim.minimize_energy(max_iterations=50)
    e1 = float(sim.state.potential_energy)
    assert e1 < e0, (e0, e1)


def test_npt_barostat_runs_and_changes_box():
    """NPT via the MC barostat (reference supports this through OpenMM's
    MonteCarloBarostat, bin/mbpol_builder:90). Box is a traced input of the
    potential so volume moves re-evaluate correctly."""
    import fixtures
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                  target_epsilon=1e-6))
    sim = Simulation(pot, SimulationConfig(dt=0.0002, temperature=300.0,
                                           thermostat='andersen',
                                           barostat_pressure=1.01325,
                                           barostat_interval=5), seed=3)
    sim.set_positions(pos)
    sim.set_velocities_to_temperature(300.0)
    box0 = np.asarray(sim.state.box).copy()
    m = sim.step(20, report_interval=10, check_health=False)
    assert np.all(np.isfinite(m['potential_energy']))
    box1 = np.asarray(sim.state.box)
    # 4 barostat attempts; at least the state machinery must stay consistent
    vol0, vol1 = np.prod(box0), np.prod(box1)
    assert 0.5 < vol1 / vol0 < 2.0


def test_dynamic_box_matches_static():
    """Passing the construction box as a traced input must reproduce the
    static-box energy exactly."""
    import fixtures
    import jax.numpy as jnp
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9))
    e_static, f_static, _, _ = pot.energy_forces(pos)
    e_dyn, f_dyn, _, _ = pot._energy_forces_impl(pos, box=jnp.asarray([1.8, 1.8, 1.8]))
    np.testing.assert_allclose(float(e_dyn), float(e_static), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(f_dyn), np.asarray(f_static), rtol=1e-9, atol=1e-9)


def test_health_check_raises_on_scf_nonconvergence():
    """The reference throws on induced-dipole non-convergence
    (MBPolReferenceElectrostaticsForce.cpp:888-894); here the flag comes
    back through diag and Simulation.step(check_health=True) raises."""
    import pytest

    from mbpol_openmm_plugin_tpu.md.simulation import (Simulation,
                                                       SimulationConfig)
    sys_, pos = fixtures.load_system('water14')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff',
                                  target_epsilon=1e-12, max_iterations=2))
    _, _, _, diag = pot.energy_forces(pos)
    assert not bool(diag['converged'])
    sim = Simulation(pot, SimulationConfig(dt=2e-4))
    sim.set_positions(pos)
    with pytest.raises(RuntimeError, match='health'):
        sim.step(2)


def test_water3_fails_geometry_converges():
    """The reference ships water3_fails.pdb as a known-bad configuration;
    the strained geometry (a ~1.0 A OH bond) converges under the same SOR
    semantics here (49 monotone iterations) - regression-pin that."""
    rows = []
    pdb = ("-0.235 0.180 0.190/0.179 -0.435 -0.377/0.220 0.088 1.073/-0.050 0.029 0.257|"
           "-2.899 0.453 0.445/-1.891 0.375 0.249/-3.372 0.256 -0.373/-2.785 0.395 0.228|"
           "0.843 0.487 3.156/0.221 1.159 3.577/1.088 -0.113 3.875/0.762 0.502 3.399")
    for mol in pdb.split('|'):
        for atom in mol.split('/'):
            rows.append([float(x) for x in atom.split()])
    from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites
    sys_ = System.waters(3)
    pos = compute_virtual_sites(sys_, jnp.asarray(np.array(rows) / 10.0))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff',
                                  target_epsilon=1e-7, max_iterations=100))
    e, f, parts, diag = pot.energy_forces(pos)
    assert bool(diag['converged'])
    assert np.isfinite(float(e)) and np.all(np.isfinite(np.asarray(f)))


def test_lbfgs_minimizer_beats_descent():
    """L-BFGS (OpenMM LocalEnergyMinimizer parity, md/minimize.py) must reach
    a lower energy than the backtracking steepest descent within the same
    iteration budget."""
    sim_a = _sim()
    e0 = float(sim_a.state.potential_energy)
    sim_a.minimize_energy(max_iterations=40, method='descent')
    e_descent = float(sim_a.state.potential_energy)

    sim_b = _sim()
    sim_b.minimize_energy(max_iterations=40, method='lbfgs')
    e_lbfgs = float(sim_b.state.potential_energy)

    assert e_lbfgs < e0
    assert e_lbfgs < e_descent, (e0, e_descent, e_lbfgs)
    # forces shrank substantially from the starting configuration
    f0 = np.max(np.abs(np.asarray(sim_a.state.forces)))
    fb = np.max(np.abs(np.asarray(sim_b.state.forces)))
    assert np.isfinite(fb)


def test_lbfgs_minimize_quadratic_exact():
    """Sanity on a convex quadratic: L-BFGS reaches the known minimum."""
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.md.minimize import lbfgs_minimize

    rng = np.random.default_rng(0)
    A = rng.normal(size=(12, 12))
    A = A @ A.T + 12 * np.eye(12)
    b = rng.normal(size=12)
    x_star = np.linalg.solve(A, b)
    Aj, bj = jnp.asarray(A), jnp.asarray(b)

    def eg(x):
        xf = x.reshape(-1)
        g = Aj @ xf - bj
        return 0.5 * xf @ Aj @ xf - bj @ xf, g.reshape(x.shape)

    x, e, diag = lbfgs_minimize(eg, jnp.zeros((4, 3)), max_iterations=100,
                                tolerance=1e-8)
    np.testing.assert_allclose(np.asarray(x).reshape(-1), x_star, atol=1e-5)
    assert bool(diag['converged'])


def test_barostat_scale_adaptation():
    """OpenMM MonteCarloBarostatImpl acceptance adaptation: after >= 10
    attempts, all-accepted grows the move size x1.1 (capped at 0.3 V),
    all-rejected shrinks it /1.1, the middle band leaves it and keeps
    counting. Pure-jnp unit test of integrators.barostat_scale_update."""
    import pytest

    from mbpol_openmm_plugin_tpu.md import integrators as I

    vol = jnp.asarray(8.0)
    baro = I.barostat_scale_init(jnp.asarray([2.0, 2.0, 2.0]))
    assert float(baro[0]) == pytest.approx(0.08)

    b = baro
    for _ in range(10):
        b = I.barostat_scale_update(b, jnp.asarray(True), vol)
    assert float(b[0]) == pytest.approx(0.08 * 1.1)
    assert int(b[1]) == 0 and int(b[2]) == 0      # counters reset on fire

    b = baro
    for _ in range(10):
        b = I.barostat_scale_update(b, jnp.asarray(False), vol)
    assert float(b[0]) == pytest.approx(0.08 / 1.1)

    # middle band: 5/10 accepted -> no adjustment, counters keep growing
    b = baro
    for i in range(10):
        b = I.barostat_scale_update(b, jnp.asarray(i % 2 == 0), vol)
    assert float(b[0]) == pytest.approx(0.08)
    assert int(b[1]) == 10 and int(b[2]) == 5

    # growth cap: scale never exceeds 0.3 V
    b = (jnp.asarray(2.39), jnp.asarray(9, jnp.int32),
         jnp.asarray(9, jnp.int32))
    b = I.barostat_scale_update(b, jnp.asarray(True), vol)
    assert float(b[0]) == pytest.approx(0.3 * 8.0)


def test_auto_nlist_rebuild_matches_every_step():
    """nlist_rebuild_interval='auto' (on-device displacement-triggered
    rebuild carried through the scan) must reproduce the rebuild-every-step
    trajectory: with a skin, lists built at the trigger positions are a
    superset of the physical lists at every step in between, so the physics
    is exact (f64 CPU: bitwise differences only via padded-list ordering)."""
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    pots = [MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                    target_epsilon=1e-7, nlist_skin=0.03))
            for _ in range(2)]
    sims = []
    for pot, policy in zip(pots, [1, 'auto']):
        pot.tune_capacities(jnp.asarray(pos))
        sim = Simulation(pot, SimulationConfig(
            dt=0.0002, nlist_rebuild_interval=policy), seed=3)
        sim.set_positions(pos)
        sim.set_velocities_to_temperature(200.0)
        sims.append(sim)
    m_ref = sims[0].step(30)
    m_auto = sims[1].step(30)
    np.testing.assert_allclose(np.asarray(sims[1].state.positions),
                               np.asarray(sims[0].state.positions),
                               atol=1e-9)
    np.testing.assert_allclose(m_auto['total_energy'], m_ref['total_energy'],
                               atol=1e-6)


def test_auto_nlist_rebuild_respa():
    """'auto' rebuilds compose with r-RESPA (the slow-potential evaluations
    carry the lists); trajectory matches the every-step-rebuild RESPA run."""
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    sims = []
    for policy in [1, 'auto']:
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                      target_epsilon=1e-7, nlist_skin=0.03))
        pot.tune_capacities(jnp.asarray(pos))
        sim = Simulation(pot, SimulationConfig(
            dt=0.0004, respa_inner=2, nlist_rebuild_interval=policy), seed=3)
        sim.set_positions(pos)
        sim.set_velocities_to_temperature(200.0)
        sims.append(sim)
    m_ref = sims[0].step(15)
    m_auto = sims[1].step(15)
    np.testing.assert_allclose(np.asarray(sims[1].state.positions),
                               np.asarray(sims[0].state.positions),
                               atol=1e-9)
    np.testing.assert_allclose(m_auto['total_energy'], m_ref['total_energy'],
                               atol=1e-6)


def test_auto_nlist_requires_skin():
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  nlist_skin=0.0))
    sim = Simulation(pot, SimulationConfig(nlist_rebuild_interval='auto'))
    sim.set_positions(pos)
    import pytest
    with pytest.raises(ValueError, match='auto'):
        sim.step(2)


def test_scanned_groups_match_unrolled_chunks():
    """Long report intervals run the group body under ONE lax.scan instead
    of Python-unrolling a copy of the graph per group (a 5000-step NPT
    chunk at barostat_interval=25 otherwise emits ~33 MB of MLIR and
    stalls compilation). The scanned path must be bit-identical to the
    unrolled one: same seed, same group sequence, only the chunking
    differs. Covered for both group sources - NPT barostat groups and
    neighbor-list reuse groups.

    scf_warm_start=False: the warm-start dipole seed is re-converged at
    every chunk entry, so warm-started trajectories were never bitwise
    chunking-invariant (differences within target_epsilon) - cold-start
    SCF makes every evaluation chunk-independent and the comparison
    exact."""
    import fixtures
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])

    def run_npt(report_interval):
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                      target_epsilon=1e-6))
        sim = Simulation(pot, SimulationConfig(dt=0.0002, temperature=300.0,
                                               thermostat='andersen',
                                               scf_warm_start=False,
                                               barostat_pressure=1.01325,
                                               barostat_interval=2), seed=3)
        sim.set_positions(pos)
        sim.set_velocities_to_temperature(300.0)
        m = sim.step(20, report_interval=report_interval, check_health=False)
        return m, np.asarray(sim.state.positions), np.asarray(sim.state.box)

    m_s, p_s, b_s = run_npt(20)      # 10 groups of 2 -> scanned
    m_u, p_u, b_u = run_npt(4)       # chunks of 2 groups -> unrolled
    # one-ulp tolerance: the scanned body and the unrolled copies are
    # different compiled programs and XLA may schedule an fma differently
    np.testing.assert_allclose(p_s, p_u, atol=1e-12)
    np.testing.assert_allclose(b_s, b_u, atol=1e-12)
    np.testing.assert_allclose(m_s['potential_energy'][-1],
                               m_u['potential_energy'][-1], rtol=1e-12)

    def run_reuse(report_interval):
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45,
                                      target_epsilon=1e-6, nlist_skin=0.05))
        pot.tune_capacities(pos)
        sim = Simulation(pot, SimulationConfig(dt=0.0002, temperature=None,
                                               scf_warm_start=False,
                                               nlist_rebuild_interval=3),
                         seed=5)
        sim.set_positions(pos)
        sim.set_velocities_to_temperature(200.0)
        sim.step(report_interval and 18, report_interval=report_interval)
        return np.asarray(sim.state.positions)

    p_s = run_reuse(18)              # 6 groups of 3 -> scanned
    p_u = run_reuse(6)               # chunks of 2 groups -> unrolled
    np.testing.assert_allclose(p_s, p_u, atol=1e-12)


def test_npt_barostat_volume_moves_under_aspc_default():
    """Round-3 regression: with the ASPC dynamics default, the MC
    barostat compared a closure-convention e_old (state.potential_energy)
    against a fully-converged e_new - the systematic offset rejected
    every move, the adaptive scale collapsed, and a 50 ps water256 NPT
    run froze at constant volume. Both sides now come from the same
    energy function; the volume must keep moving and the acceptance
    counters must not collapse."""
    import fixtures
    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                  target_epsilon=1e-5))
    sim = Simulation(pot, SimulationConfig(dt=0.0002, temperature=300.0,
                                           thermostat='langevin',
                                           barostat_pressure=1.01325,
                                           barostat_interval=5), seed=7)
    assert sim.potential.config.scf_method == 'aspc'   # the default swap
    sim.set_positions(pos)
    sim.set_velocities_to_temperature(300.0)
    vols = []
    for _ in range(6):
        sim.step(50, report_interval=50, check_health=False)
        b = np.asarray(sim.state.box)
        vols.append(float(b[0] * b[1] * b[2]))
    vols = np.asarray(vols)
    # 60 volume-move attempts: the trajectory must explore volume space
    assert np.std(vols) > 1e-4, vols
    # and the adaptive move size must not have collapsed toward zero
    scale = float(np.asarray(sim._baro[0]))
    assert scale > 1e-4 * vols[-1], (scale, vols)
