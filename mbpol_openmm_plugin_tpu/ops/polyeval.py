"""Data-driven evaluation of permutationally-invariant polynomials (PIPs).

The MB-pol 2-body/3-body corrections are polynomials of degree <= 4 in 31/36
positive variables (exponentials of inter-atomic distances; reference:
MBPolReferenceTwoBodyForce.cpp:170-207, MBPolReferenceThreeBodyForce.cpp:168-206).
The reference evaluates them with ~42k lines of generated scalar C++
(poly-2b-v6x.cpp, poly-3b-v2x.cpp). Here the polynomial is *data*:

    E(x) = mono(x) @ c,   mono_m(x) = prod_i x_i^{e_mi} = exp(log(x) @ e_m)

so a batch of P pair/triplet evaluations is two MXU matmuls:

    M   = exp(log(X) @ E^T)          # [P, nvars] @ [nvars, nmono]
    E_p = M @ c                      # [P, nmono] @ [nmono]

and the gradient (for forces) is one more matmul:

    dE/dX = ((M * c) @ E) / X        # [P, nmono] @ [nmono, nvars]

All variables are strictly positive (they are exp(-k(d-d0)) or exp(..)/d), so
the log/exp transform is exact. Extraction and validation against the
reference binaries: tools/extract_poly.py (agreement ~1e-13 relative).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu import data as _data


class PIPData:
    """Container for one extracted polynomial (exponent matrix + coefficients)."""

    def __init__(self, exponents, coeffs):
        self.exponents = np.asarray(exponents)        # [nmono, nvars] int8
        self.coeffs = np.asarray(coeffs)              # [nmono] float64
        self.nmono, self.nvars = self.exponents.shape


@functools.lru_cache(maxsize=None)
def load_pip(name):
    """name in {'poly2b', 'poly3b'}"""
    d = _data.load(name)
    return PIPData(d['exponents'], d['coeffs'])


# PIP fits have large canceling coefficients (|c| up to ~1e5 summing to
# ~kcal/mol): plain bf16 matmul passes corrupt the energy by O(100 kcal/mol).
# HIGH (bf16x3) measures identical to HIGHEST here (f32-input rounding
# dominates the residual error), so HIGH is used for speed.
_PREC = jax.lax.Precision.HIGH


def pip_energy(x, exponents, coeffs):
    """Batched PIP evaluation.

    Args:
      x: [..., nvars] strictly-positive polynomial variables.
      exponents: [nmono, nvars] integer exponent matrix (cast to x.dtype).
      coeffs: [nmono] coefficients.
    Returns:
      [...] energies. Differentiable; the VJP is the natural transpose matmul.
    """
    et = exponents.astype(x.dtype)
    mono = jnp.exp(jnp.dot(jnp.log(x), et.T, precision=_PREC))
    return jnp.dot(mono, coeffs.astype(x.dtype), precision=_PREC)


def pip_energy_and_grad(x, exponents, coeffs):
    """Energy and analytic dE/dx in one pass (three matmuls)."""
    et = exponents.astype(x.dtype)
    c = coeffs.astype(x.dtype)
    mono = jnp.exp(jnp.dot(jnp.log(x), et.T, precision=_PREC))
    e = jnp.dot(mono, c, precision=_PREC)
    g = jnp.dot(mono * c, et, precision=_PREC) / x
    return e, g


def _use_pallas(dtype):
    import os
    if os.environ.get('MBPOL_NO_PALLAS'):
        return False
    return dtype == jnp.float32 and jax.default_backend() not in ('cpu',)


@functools.lru_cache(maxsize=None)
def pip_apply(name):
    """Batched PIP energy fn with a fused-kernel VJP.

    Returns f(x[P, nvars]) -> e[P], differentiable once. On TPU/float32 the
    energy and gradient come from the fused Pallas kernel
    (ops/pip_pallas.py); elsewhere from the jnp matmul formulation. The
    gradient is saved as the VJP residual so reverse-mode never
    rematerializes the monomial matrix.
    """
    pip = load_pip(name)
    exponents = pip.exponents
    coeffs = pip.coeffs

    def impl(x):
        if _use_pallas(x.dtype):
            from mbpol_openmm_plugin_tpu.ops.pip_pallas import pip_energy_grad_tpu
            return pip_energy_grad_tpu(name, x)
        return pip_energy_and_grad(x, jnp.asarray(exponents), jnp.asarray(coeffs))

    @jax.custom_vjp
    def f(x):
        return impl(x)[0]

    def fwd(x):
        e, g = impl(x)
        return e, (g,)

    def bwd(res, ct):
        (g,) = res
        return (g * ct[:, None],)

    f.defvjp(fwd, bwd)
    return f
