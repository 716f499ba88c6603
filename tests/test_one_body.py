"""Golden tests for the one-body (Partridge-Schwenke) term.

Golden energy/forces from the reference tests:
  platforms/reference/tests/TestReferenceMBPolOneBodyForce.cpp:82-113
  python/tests/TestReferenceMBPolOneBodyForce.py:15 (E = 0.55975882 kcal/mol)
"""
import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu.models.one_body import one_body_energy
from mbpol_openmm_plugin_tpu.utils import units

# positions in nm (reference test, Angstrom * 0.1)
WATER1_POS = np.array([
    [-1.516074336e+00, -2.023167650e-01, 1.454672917e+00],
    [-6.218989773e-01, -6.009430735e-01, 1.572437625e+00],
    [-2.017613812e+00, -4.190350349e-01, 2.239642849e+00],
]) * 0.1

# "expectedForces" in the reference are gradients in kcal/mol/A (sign flipped
# to OpenMM forces in the test); here: gradient dE/dr in kcal/mol/A.
WATER1_GRAD_KCAL_A = np.array([
    [-27.48162433, 8.92495995, 2.80995323],
    [30.78909844, -11.48714187, -0.27204770],
    [-3.30747410, 2.56218193, -2.53790553],
])

GOLDEN_ENERGY_KCAL = 0.55975882


def test_one_body_energy_golden():
    pos = jnp.asarray(WATER1_POS)[None]           # [1, 3, 3]
    e = one_body_energy(pos)
    e_kcal = float(e.sum()) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - GOLDEN_ENERGY_KCAL) < 1e-6, e_kcal


def test_one_body_forces_golden():
    def total(pos):
        return one_body_energy(pos[None]).sum()

    grad = jax.grad(total)(jnp.asarray(WATER1_POS))     # kJ/mol/nm
    grad_kcal_a = np.asarray(grad) * units.KJ_PER_MOL_TO_KCAL_PER_MOL / units.NM_TO_ANGSTROM
    np.testing.assert_allclose(grad_kcal_a, WATER1_GRAD_KCAL_A, atol=2e-4)


def test_one_body_batch_and_jit():
    pos = jnp.asarray(np.stack([WATER1_POS, WATER1_POS * 1.01]))
    e = jax.jit(one_body_energy)(pos)
    assert e.shape == (2,)
    assert abs(float(e[0]) * units.KJ_PER_MOL_TO_KCAL_PER_MOL - GOLDEN_ENERGY_KCAL) < 1e-6
