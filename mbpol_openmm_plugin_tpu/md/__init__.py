"""MD drivers: classical integrators + Simulation (lax.scan chunks),
L-BFGS minimization, replica batching, ring-polymer (PIMD) dynamics, and
temperature replica exchange (parallel tempering).

Public surface:
  from mbpol_openmm_plugin_tpu.md import Simulation, SimulationConfig
  from mbpol_openmm_plugin_tpu.md.rpmd import PIMDSimulation
  from mbpol_openmm_plugin_tpu.md.remd import REMDSimulation
"""
from mbpol_openmm_plugin_tpu.md.integrators import MDState  # noqa: F401
from mbpol_openmm_plugin_tpu.md.simulation import (  # noqa: F401
    Simulation, SimulationConfig)
from mbpol_openmm_plugin_tpu.md.remd import (  # noqa: F401
    REMDConfig, REMDSimulation, geometric_ladder)
