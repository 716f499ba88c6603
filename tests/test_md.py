"""MD loop tests: NVE energy conservation on the water3 cluster (mirrors the
reference's water14 NVE example intent, python/water14.py) plus thermostat,
checkpoint/resume determinism, and minimization."""
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
