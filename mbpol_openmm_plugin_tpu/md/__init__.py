"""MD drivers: classical integrators + Simulation (lax.scan chunks),
L-BFGS minimization, replica batching, and ring-polymer (PIMD) dynamics.

Public surface:
  from mbpol_openmm_plugin_tpu.md import Simulation, SimulationConfig
  from mbpol_openmm_plugin_tpu.md.rpmd import PIMDSimulation
"""
from mbpol_openmm_plugin_tpu.md.integrators import MDState  # noqa: F401
from mbpol_openmm_plugin_tpu.md.simulation import (  # noqa: F401
    Simulation, SimulationConfig)
