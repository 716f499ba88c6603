"""Flat-bottom spherical restraint (gas-phase cluster confinement).

The reference plugin has no confinement term of its own - cluster users
wrap it in an OpenMM ``CustomExternalForce`` (the standard recipe for
finite-cluster REMD, where high-temperature rungs would otherwise
evaporate monomers into unbound states). This framework provides the
same capability as a first-class smooth term so hot replica ladders stay
bounded:

    E = k/2 * sum_i max(0, |r_i - c| - R)^2      over oxygen sites,

with ``c`` the *instantaneous* oxygen centroid. Because the centroid is
part of the differentiated expression, the restraint forces sum exactly
to zero (no net thrust on the cluster) and the term is a smooth (C^1)
conservative potential - safe for NVE and for REMD exchange energies.

Enabled via ``MBPolConfig(restraint_radius=..., restraint_k=...)``;
evaluated inside ``MBPol._smooth_terms`` so forces come from the same
``jax.value_and_grad`` as every other smooth term.
"""
import jax.numpy as jnp


def flat_bottom_energy(o_pos, radius, k):
    """Flat-bottom spherical restraint energy about the oxygen centroid.

    Args:
      o_pos: [n_molecules, 3] oxygen positions (nm).
      radius: flat-bottom radius R (nm); zero energy inside.
      k: spring constant (kJ/mol/nm^2).
    Returns:
      scalar energy (kJ/mol). Differentiable; the eps-regularized norm
      keeps the gradient finite for a site exactly at the centroid
      (where the restraint is zero anyway).
    """
    c = jnp.mean(o_pos, axis=0)
    dr = o_pos - c
    d = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-12)
    over = jnp.maximum(d - radius, 0.0)
    return 0.5 * k * jnp.sum(over * over)
