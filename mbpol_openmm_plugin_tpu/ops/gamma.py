"""Regularized upper incomplete gamma Q(3/4, x) with fixed iteration counts.

The MB-pol order-1 Thole factor needs Q(3/4, x) (reference: ttm::gammq,
gammq.cpp, used at MBPolReferenceElectrostaticsForce.cpp:319). XLA's
igammac primitive is a general-purpose iterate-to-convergence loop that is
expensive on [N,N] operands; for fixed a = 3/4 a short fixed-depth series
(x < 1.25) / Lentz continued fraction (x >= 1.25) reaches float64 accuracy
(~1e-15 relative, validated in tests/test_gamma.py) with fully vectorized,
branch-free code.
"""
import jax.numpy as jnp

_A = 0.75
_LGAMMA_A = 0.20328095143129538  # ln Gamma(3/4)
_SERIES_TERMS = 24
_CF_TERMS = 32


def _series_p(x):
    """P(a,x) by power series: P = x^a e^-x / Gamma(a) * sum x^n / (a)_{n+1}."""
    xs = jnp.where(x > 0, x, 1.0)
    ap = _A
    term = 1.0 / _A
    total = term
    for _ in range(_SERIES_TERMS):
        ap = ap + 1.0
        term = term * xs / ap
        total = total + term
    p = total * jnp.exp(-xs + _A * jnp.log(xs) - _LGAMMA_A)
    return jnp.where(x > 0, p, 0.0)


def _cf_q(x):
    """Q(a,x) by Lentz continued fraction (fixed depth)."""
    xs = jnp.where(x > 0, x, 1.0)
    tiny = jnp.asarray(1e-30, x.dtype)
    b = xs + 1.0 - _A
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, _CF_TERMS + 1):
        an = -i * (i - _A)
        b = b + 2.0
        d = an * d + b
        d = jnp.where(jnp.abs(d) < tiny, tiny, d)
        c = b + an / c
        c = jnp.where(jnp.abs(c) < tiny, tiny, c)
        d = 1.0 / d
        h = h * d * c
    q = jnp.exp(-xs + _A * jnp.log(xs) - _LGAMMA_A) * h
    return jnp.where(x > 0, q, 1.0)


def gammq34(x):
    """Q(3/4, x) for x >= 0."""
    small = x < (_A + 1.0)
    return jnp.where(small, 1.0 - _series_p(jnp.where(small, x, 0.5)),
                     _cf_q(jnp.where(small, 2.0, x)))
