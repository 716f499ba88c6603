"""Regression tests for gradient singularities that killed thermalized f32
MD trajectories (finite energy, NaN forces, death one step later).

Root cause #1: Vandermonde power tables built as ``x ** jnp.arange(n)``.
The power-rule gradient of the constant column is ``0 * x**(-1)`` = NaN
exactly at x == 0 — and x = (rOH - re)/re crosses zero every OH vibration
period. Fixed by iterated-multiplication power tables
(models/one_body._vander), used by both the Partridge-Schwenke PES
(MBPolReferenceOneBodyForce.cpp:126-160 analog) and the DMS charge
redistribution (MBPolReferenceElectrostaticsForce.cpp:2823-2877 analog).

Root cause #2 (defensive): padded/early-exited pair and triplet list entries
evaluated the PIP exponential variables at (near-)coincident monomer
geometries; the masked value is 0 either way, but an inf intermediate turns
the masked backward pass into 0*inf = NaN. Fixed by substituting a
well-separated geometry for inactive entries before the variables
(models/two_body.py, models/three_body.py; reference early exits:
MBPolReferenceTwoBodyForce.cpp:141-145, MBPolReferenceThreeBodyForce.cpp:165).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu.models import one_body as ob
from mbpol_openmm_plugin_tpu.models import electrostatics as elec
from mbpol_openmm_plugin_tpu.models.two_body import two_body_energy_pairs
from mbpol_openmm_plugin_tpu.models.three_body import three_body_energy_triplets


def _singular_monomer():
    """O-H1-H2 geometry (nm) whose OH1 length makes x1 == 0.0 exactly.

    |h1 - o| * 10 must equal the table's reoh bit-for-bit. A pure x-axis bond
    cannot always reach it (the a*10 product lattice is coarser than the
    result lattice), so give h1 a tiny y-component: with B ~ sqrt(2*A*delta)
    the rounded sqrt(A^2 + B^2) sweeps every ulp near reoh. Search with the
    module's own ops (jnp norm) so the hit is the exact singular input.
    """
    reoh = ob._tables()['reoh']          # Angstrom
    a = np.float64(reoh / 10.0)
    while float(np.float64(a * 10.0)) > reoh:
        a = np.nextafter(a, 0.0)
    A = np.float64(a * 10.0)
    delta = reoh - A
    if delta == 0.0:
        b = np.float64(0.0)
    else:
        b0 = np.sqrt(2.0 * A * delta) / 10.0
        cands = np.linspace(0.0, 2.5 * b0, 20001)
        h1 = np.zeros((len(cands), 3))
        h1[:, 0] = a
        h1[:, 1] = cands
        d1 = jnp.linalg.norm(jnp.asarray(h1) * 10.0, axis=-1)
        x1 = (d1 - reoh) / reoh
        hits = np.flatnonzero(np.asarray(x1) == 0.0)
        assert hits.size, "no candidate landed exactly on x1 == 0"
        b = cands[hits[0]]
    pos = np.array([
        [0.0, 0.0, 0.0],
        [a, b, 0.0],
        [-0.023, 0.0925, 0.0],           # ordinary second OH bond
    ])
    return pos, reoh


def test_one_body_grad_finite_at_equilibrium_bond():
    pos, reoh = _singular_monomer()
    # confirm the geometry actually sits on the singular manifold
    d1 = float(jnp.linalg.norm((jnp.asarray(pos[1]) - pos[0]) * 10.0))
    assert (d1 - reoh) / reoh == 0.0

    g = jax.grad(lambda p: ob.one_body_energy(p[None]).sum())(jnp.asarray(pos))
    assert np.isfinite(np.asarray(g)).all(), g


def test_water_charge_jacobian_finite_at_equilibrium_bond():
    pos, _ = _singular_monomer()
    q, dqdr = elec.water_charges_and_derivatives(jnp.asarray(pos)[None])
    assert np.isfinite(np.asarray(q)).all()
    assert np.isfinite(np.asarray(dqdr)).all()


def test_vander_gradient_at_zero():
    g = jax.grad(lambda x: ob._vander(x[None], x.dtype).sum())(jnp.asarray(0.0))
    assert np.isfinite(float(g))
    # and the value/derivative are still the plain power table away from 0
    x = jnp.asarray(0.37)
    v = ob._vander(x[None], x.dtype)[0]
    np.testing.assert_allclose(np.asarray(v), 0.37 ** np.arange(15), rtol=1e-12)


_WATER = np.array([
    [0.0, 0.0, 0.0],
    [0.0957, 0.0, 0.0],
    [-0.024, 0.0927, 0.0],
])


def test_two_body_masked_coincident_pair_grad_finite():
    # padding convention: inactive entries may repeat the same molecule
    pos_a = jnp.asarray(np.stack([_WATER, _WATER]))
    pos_b = jnp.asarray(np.stack([_WATER + 0.29, _WATER]))   # second coincident
    valid = jnp.asarray([True, False])

    def total(pa, pb):
        return two_body_energy_pairs(pa, pb, valid).sum()

    e = total(pos_a, pos_b)
    ga, gb = jax.grad(total, argnums=(0, 1))(pos_a, pos_b)
    assert np.isfinite(float(e))
    assert np.isfinite(np.asarray(ga)).all()
    assert np.isfinite(np.asarray(gb)).all()
    # the masked entry contributes nothing
    np.testing.assert_allclose(np.asarray(gb[1]), 0.0, atol=1e-12)


def test_three_body_masked_coincident_triplet_grad_finite():
    pos_a = jnp.asarray(_WATER)[None]
    pos_b = jnp.asarray(_WATER)[None]      # coincident with a
    pos_c = jnp.asarray(_WATER)[None]
    valid = jnp.asarray([False])

    def total(pa, pb, pc):
        return three_body_energy_triplets(pa, pb, pc, valid).sum()

    e = total(pos_a, pos_b, pos_c)
    grads = jax.grad(total, argnums=(0, 1, 2))(pos_a, pos_b, pos_c)
    assert float(e) == 0.0
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
