"""Parity-corner regressions: ion fail-fast, the reference's known-bad
water3 geometry, CMMotionRemover behavior, and the 'auto' rebuild no-op.

Closes the round-2 verdict items 9/10 + the simulation.py advisor notes:
- ions must fail at the door (createSystem / MBPol.__init__), not deep in
  the first evaluation (mbpol.xml:22-27 defines no ion electrostatics);
- /root/reference/python/water3_fails.pdb marks a geometry known to break
  the model; here the defined behavior is pinned (finite energy/forces,
  SCF converges - slowly - and the monomer distortion energy is large);
- CMMotionRemover is a real behavior (OpenMM force order,
  TestReferenceMBPolTwoBodyForce.py:28-39), not just a force-list tag.
"""
import numpy as np
import pytest

import fixtures

import jax.numpy as jnp

from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig


# reference python/water3_fails.pdb coordinates (Angstrom): three waters,
# two with strongly distorted monomer geometry (stretched OH / displaced M)
WATER3_FAILS_A = np.array([
    [-0.235, 0.180, 0.190], [0.179, -0.435, -0.377],
    [0.220, 0.088, 1.073], [-0.050, 0.029, 0.257],
    [-2.899, 0.453, 0.445], [-1.891, 0.375, 0.249],
    [-3.372, 0.256, -0.373], [-2.785, 0.395, 0.228],
    [0.843, 0.487, 3.156], [0.221, 1.159, 3.577],
    [1.088, -0.113, 3.875], [0.762, 0.502, 3.399]])


def test_ion_system_fails_fast_at_potential_construction():
    sys_, _ = fixtures.load_system('water_and_ion')
    assert sys_.n_ions == 1
    with pytest.raises(ValueError, match='water-only'):
        MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))


def test_ion_system_runs_without_electrostatics():
    """Dropping the electrostatics term keeps ion systems usable (the
    dispersion tables DO carry water-Cl cross terms, mbpol.xml:56,60)."""
    sys_, pos = fixtures.load_system('water_and_ion')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff',
                                  terms=('dispersion',)))
    e, f, parts, diag = pot.energy_forces(pos)
    assert np.isfinite(float(e))


def test_ion_system_fails_fast_at_create_system(tmp_path):
    from mbpol_openmm_plugin_tpu import app
    from mbpol_openmm_plugin_tpu.app.pdbfile import (Atom, Topology,
                                                     write_pdb_frame)
    d = fixtures.load('water_and_ion')
    atoms = [Atom(i, str(n), str(rn), int(ri)) for i, (n, rn, ri) in
             enumerate(zip(d['names'], d['resnames'], d['resids']))]
    p = tmp_path / 'water_and_ion.pdb'
    with open(p, 'w') as fh:
        write_pdb_frame(fh, Topology(atoms), d['positions'])
    pdb = app.PDBFile(str(p))
    ff = app.ForceField(app.mbpol_xml_path())
    with pytest.raises(ValueError, match='ion'):
        ff.createSystem(pdb.topology)


def test_water3_fails_geometry_defined_behavior():
    """The reference ships water3_fails.pdb as a known-bad configuration
    (SURVEY section 4). Pinned behavior here: the evaluation stays finite
    and the SCF converges, but slowly (tens of iterations vs ~10 for
    equilibrium geometries) and the monomer-distortion energy is large -
    a regression to NaN or non-convergence on this input is a real change
    in framework behavior."""
    sys_ = System.waters(3)
    pos = compute_virtual_sites(sys_, jnp.asarray(WATER3_FAILS_A / 10.0))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    e, f, parts, diag = pot.energy_forces(pos)
    e_kcal = float(e) / 4.184
    assert np.isfinite(e_kcal)
    assert np.isfinite(np.asarray(f)).all()
    assert bool(diag['converged'])
    # pinned values from the first f64 evaluation (loose bands: the point
    # is finite + converged + recognizably THIS geometry)
    assert abs(e_kcal - (-4.5701)) < 0.05
    assert float(parts['one_body']) / 4.184 > 3.0     # distorted monomers
    assert int(diag['iterations']) > 20               # hard SCF


def test_cm_motion_removal_zeroes_momentum():
    from mbpol_openmm_plugin_tpu.md import integrators as I
    sys_ = System.waters(3)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(sys_.n_atoms, 3)) * 0.1)
    m = np.asarray(sys_.masses)
    v2 = I.remove_cm_motion(sys_, v)
    p = (m[:, None] * np.asarray(v2)).sum(axis=0)
    assert np.allclose(p, 0.0, atol=1e-12)
    # massless M sites untouched
    assert np.allclose(np.asarray(v2)[m == 0], np.asarray(v)[m == 0])


def test_cm_motion_interval_in_simulation():
    """A Simulation with cm_motion_interval=1 keeps total momentum ~0
    through NVE steps even when seeded with a net-drift velocity field."""
    from mbpol_openmm_plugin_tpu.md.simulation import (Simulation,
                                                       SimulationConfig)
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    sim = Simulation(pot, SimulationConfig(dt=2e-5, temperature=None,
                                           cm_motion_interval=1), seed=0)
    sim.set_positions(pos)
    sim.set_velocities_to_temperature(50.0)
    # inject a deliberate COM drift
    import dataclasses
    sim.state = dataclasses.replace(
        sim.state, velocities=sim.state.velocities + 0.05)
    sim.step(5)
    m = np.asarray(sys_.masses)
    p = (m[:, None] * np.asarray(sim.state.velocities)).sum(axis=0)
    assert np.abs(p).max() < 1e-5


def test_app_simulation_enables_cm_motion(tmp_path):
    from mbpol_openmm_plugin_tpu import app
    from mbpol_openmm_plugin_tpu.app import unit
    from mbpol_openmm_plugin_tpu.app.pdbfile import (Atom, Topology,
                                                     write_pdb_frame)
    d = fixtures.load('water3')
    atoms = [Atom(i, str(n), str(rn), int(ri)) for i, (n, rn, ri) in
             enumerate(zip(d['names'], d['resnames'], d['resids']))]
    p = tmp_path / 'water3.pdb'
    with open(p, 'w') as fh:
        write_pdb_frame(fh, Topology(atoms), d['positions'])
    pdb = app.PDBFile(str(p))
    ff = app.ForceField(app.mbpol_xml_path())
    spec = ff.createSystem(pdb.topology)
    assert spec.find_forces('cm_motion')
    sim = app.Simulation(pdb.topology, spec,
                         app.VerletIntegrator(0.02 * unit.femtoseconds))
    assert sim._core.config.cm_motion_interval == 1
    spec2 = ff.createSystem(pdb.topology, removeCMMotion=False)
    assert not spec2.find_forces('cm_motion')


def test_simulation_auto_scf_swaps_sor_to_aspc():
    """The dynamics default is the conservative ASPC closure (verdict r2
    item 5: the loosely-converged SOR loop is dissipative in NVE, -109
    kJ/mol per 1000 steps at water256 vs +10 for ASPC). scf='keep'
    preserves reference SOR semantics; single-point physics is identical
    either way (ASPC cold starts fall back to the fully converged loop)."""
    from mbpol_openmm_plugin_tpu.md.simulation import (Simulation,
                                                       SimulationConfig)
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    sim = Simulation(pot)
    assert sim.potential.config.scf_method == 'aspc'
    e_sor = float(pot.energy_forces(pos)[0])
    e_aspc = float(sim.potential.energy_forces(pos)[0])
    assert abs(e_sor - e_aspc) < 1e-6
    sim_keep = Simulation(pot, SimulationConfig(scf='keep'))
    assert sim_keep.potential is pot
    # an explicitly non-default closure is respected by 'auto'
    pot_diis = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff',
                                       scf_method='diis'))
    assert Simulation(pot_diis).potential is pot_diis


def test_auto_rebuild_interval_noop_on_dense_potential():
    """nlist_rebuild_interval='auto' on a <=24-water (dense, no-neighbor-
    list) potential must be a clean no-op, not an int('auto') crash
    (advisor round-2 finding)."""
    from mbpol_openmm_plugin_tpu.md.simulation import (Simulation,
                                                       SimulationConfig)
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    assert not pot.use_neighbor_lists
    sim = Simulation(pot, SimulationConfig(dt=2e-5, temperature=None,
                                           nlist_rebuild_interval='auto'),
                     seed=0)
    sim.set_positions(pos)
    out = sim.step(3)
    assert np.isfinite(out['potential_energy']).all()
