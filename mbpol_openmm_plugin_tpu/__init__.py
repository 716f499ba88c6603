"""TPU-native MB-pol water potential framework.

A ground-up JAX/XLA/Pallas re-design of the MB-pol many-body water model
(capabilities of gmedders/mbpol_openmm_plugin): explicit one-body monomer
distortion (Partridge-Schwenke PES), short-range two-body and three-body
permutationally-invariant polynomial corrections, TT6-damped dispersion and
Thole-damped many-body polarization with PME for periodic electrostatics.

Internal unit system follows OpenMM: lengths in nm, energies in kJ/mol,
masses in amu, charges in units of e. Helpers for kcal/mol conversions live
in `units`.

Layout
------
- ``data``     extracted MB-pol parameter tables (see tools/extract_*.py)
- ``params``   frozen parameter pytrees + mbpol.xml loading
- ``models``   the force terms (one_body, two_body, three_body, dispersion,
               electrostatics, pme) and the full ``MBPolPotential``
- ``ops``      TPU building blocks: data-driven polynomial evaluation,
               neighbor lists, B-splines, incomplete gamma, Pallas kernels
- ``md``       integrators, simulation loop (lax.scan), reporters, checkpoints
- ``app``      OpenMM-app-compatible layer: PDB reading, ForceField,
               mbpol_builder-style script generation
- ``parallel`` jax.sharding mesh utilities + sharded force evaluation
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# MB-pol's fitted polynomial coefficients cancel by ~4 orders of magnitude;
# on TPU the default bf16 matmul passes corrupt energies by O(100 kcal/mol)
# and forces badly enough to break NVE conservation. Force true-fp32 matmul
# accumulation process-wide (opt out with MBPOL_NO_PRECISION_OVERRIDE=1; the
# hot kernels additionally pin precision explicitly).
if not _os.environ.get('MBPOL_NO_PRECISION_OVERRIDE'):
    _jax.config.update('jax_default_matmul_precision', 'highest')

from mbpol_openmm_plugin_tpu.utils import units  # noqa: F401
