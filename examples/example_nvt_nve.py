#!/usr/bin/env python
"""Bulk water256 NVT -> NVE example (port of python/example_nvt_nve.py).

Runs a short Andersen-thermostatted NVT segment, then seeds an NVE run from
the final NVT state. Reduce `production_steps` for a quick smoke run.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mbpol_openmm_plugin_tpu import app
from mbpol_openmm_plugin_tpu.app import unit

here = os.path.dirname(os.path.abspath(__file__))
if not os.path.exists(os.path.join(here, 'water256_bulk.pdb')):
    os.system(f'{sys.executable} {here}/make_inputs.py')

pdb = app.PDBFile(os.path.join(here, 'water256_bulk.pdb'))
boxDim = 19.3996888399961804 / 10.
pdb.topology.setUnitCellDimensions((boxDim, boxDim, boxDim) * unit.nanometer)
forcefield = app.ForceField(app.mbpol_xml_path())

ewaldErrorTolerance = 1e-4
# NOTE: the reference example uses 2 fs (python/example_nvt_nve.py:16), which
# is marginal for flexible MB-pol water (OH period ~9 fs) and unstable in
# float32; 0.5 fs is stable. (The reference's own cluster configs use 0.2 fs.)
timestep = 0.5 * unit.femtoseconds
production_steps = int(os.environ.get('PRODUCTION_STEPS', 100))

# ----------------------------- NVT -----------------------------
system = forcefield.createSystem(pdb.topology, nonbondedMethod=app.PME,
                                 nonbondedCutoff=0.9 * unit.nanometers,
                                 ewaldErrorTolerance=ewaldErrorTolerance)
system.addForce(app.AndersenThermostat(300 * unit.kelvin, 1. / unit.picoseconds))
integrator = app.VerletIntegrator(timestep)

simulation = app.Simulation(pdb.topology, system, integrator)
simulation.context.setPositions(pdb.positions)
simulation.context.computeVirtualSites()
simulation.context.setVelocitiesToTemperature(300 * unit.kelvin)

print('Equilibrating...')
simulation.step(10)

simulation.reporters.append(app.StateDataReporter(
    'mbpol_nvt.log', 50, step=True, time=True, potentialEnergy=True,
    kineticEnergy=True, totalEnergy=True, temperature=True, progress=True,
    remainingTime=True, speed=True, totalSteps=production_steps, separator='\t'))

print('Running NVT production...')
simulation.step(production_steps)

final_nvt_state = simulation.context.getState(getVelocities=True, getPositions=True)
positions = final_nvt_state.getPositions()
velocities = final_nvt_state.getVelocities()

# ----------------------------- NVE -----------------------------
system = forcefield.createSystem(pdb.topology, nonbondedMethod=app.PME,
                                 nonbondedCutoff=0.9 * unit.nanometers,
                                 ewaldErrorTolerance=ewaldErrorTolerance)
integrator = app.VerletIntegrator(timestep)
simulation = app.Simulation(pdb.topology, system, integrator)
simulation.context.setPositions(positions)
simulation.context.computeVirtualSites()
simulation.context.setVelocities(velocities)

simulation.reporters.append(app.StateDataReporter(
    'mbpol_nve.log', 50, step=True, time=True, potentialEnergy=True,
    kineticEnergy=True, totalEnergy=True, temperature=True, progress=True,
    remainingTime=True, speed=True, totalSteps=production_steps, separator='\t'))

print('Running NVE production...')
simulation.step(production_steps)
print('Done!')
