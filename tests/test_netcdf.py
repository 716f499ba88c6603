"""AMBER NetCDF trajectory reporter round-trip test.

The reference saves coordinates/velocities/forces via ParmEd's NetCDFReporter
(python/bin/mbpol_builder:111-128); here the same surface is provided
natively (app/netcdf.py). Assert the written file follows the AMBER
convention and the values round-trip with the right unit conversions.
"""
import numpy as np

import fixtures


def _build_sim(tmp_path):
    from mbpol_openmm_plugin_tpu import app
    from mbpol_openmm_plugin_tpu.app import unit
    from mbpol_openmm_plugin_tpu.app.pdbfile import Atom, Topology, write_pdb_frame

    d = fixtures.load('water3')
    atoms = [Atom(i, str(n), str(rn), int(ri)) for i, (n, rn, ri) in
             enumerate(zip(d['names'], d['resnames'], d['resids']))]
    pdb_path = tmp_path / 'water3.pdb'
    with open(pdb_path, 'w') as fh:
        write_pdb_frame(fh, Topology(atoms), d['positions'])
    pdb = app.PDBFile(str(pdb_path))
    ff = app.ForceField(app.mbpol_xml_path())
    system = ff.createSystem(pdb.topology, nonbondedMethod=app.CutoffNonPeriodic,
                             nonbondedCutoff=1.0 * unit.nanometer)
    sim = app.Simulation(pdb.topology, system,
                         app.VerletIntegrator(0.2 * unit.femtoseconds))
    sim.context.setPositions(pdb.positions)
    sim.context.computeVirtualSites()
    return sim


def test_netcdf_reporter_roundtrip(tmp_path):
    from scipy.io import netcdf_file

    from mbpol_openmm_plugin_tpu import app

    sim = _build_sim(tmp_path)
    nc_path = tmp_path / 'traj.nc'
    rep = app.NetCDFReporter(str(nc_path), 2, crds=True, vels=True, frcs=True)
    sim.reporters.append(rep)
    sim.step(4)
    rep.close()

    state = sim.context.getState(getPositions=True, getForces=True)
    pos_nm = np.asarray(state.getPositions().to_internal())
    frc = np.asarray(state.getForces().to_internal())

    nc = netcdf_file(str(nc_path), 'r', mmap=False)
    assert nc.Conventions == b'AMBER'
    assert nc.ConventionVersion == b'1.0'
    assert nc.dimensions['spatial'] == 3
    assert nc.dimensions['atom'] == 12
    coords = nc.variables['coordinates']
    assert coords.units == b'angstrom'
    assert coords.shape[0] == 2            # frames at steps 2 and 4
    # last frame == current state, in angstrom
    np.testing.assert_allclose(coords[-1], pos_nm * 10.0, rtol=1e-5)
    vels = nc.variables['velocities']
    assert vels.units == b'angstrom/picosecond'
    forces = nc.variables['forces']
    assert forces.units == b'kilocalorie/mole/angstrom'
    np.testing.assert_allclose(forces[-1], frc / 41.84, rtol=1e-4)
    # non-periodic system: no cell variables
    assert 'cell_lengths' not in nc.variables
    times = nc.variables['time'][:]
    np.testing.assert_allclose(times, [2 * 2e-4, 4 * 2e-4], rtol=1e-6)
    nc.close()
