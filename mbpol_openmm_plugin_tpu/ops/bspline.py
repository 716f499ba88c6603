"""Order-5 cardinal B-splines for PME (values + derivatives), and the
DFT moduli of the spline, matching the reference conventions
(computeBSplinePoint, MBPolReferenceElectrostaticsForce.cpp:1446-1517;
initializeBSplineModuli, cpp:1248-1340).
"""
import functools

import jax.numpy as jnp
import numpy as np

ORDER = 5


def bspline5(w):
    """B-spline coefficients at fractional offset w in [0,1).

    Args:
      w: [...] fractional offsets.
    Returns:
      theta: [..., 5, 4] - for each of the 5 spline points: value, and
      1st/2nd/3rd derivative coefficients (same layout as the reference's
      thetai RealOpenMM4).
    """
    # ARRAY(i, j): order-i spline, point j (1-based in the reference).
    A = {}
    A[2, 2] = w
    A[2, 1] = 1.0 - w
    A[3, 3] = 0.5 * w * A[2, 2]
    A[3, 2] = 0.5 * ((1.0 + w) * A[2, 1] + (2.0 - w) * A[2, 2])
    A[3, 1] = 0.5 * (1.0 - w) * A[2, 1]
    for i in range(4, ORDER + 1):
        k = i - 1
        denom = 1.0 / k
        A[i, i] = denom * w * A[k, k]
        for j in range(1, i - 1):
            A[i, i - j] = denom * ((w + j) * A[k, i - j - 1] + (i - j - w) * A[k, i - j])
        A[i, 1] = denom * (1.0 - w) * A[k, 1]

    def diff(row_order):
        """One finite-difference pass: B'_n(x) = B_{n-1}(x) - B_{n-1}(x-1)."""
        out = {}
        out[ORDER] = row_order[ORDER - 1]
        for i in range(ORDER - 1, 1, -1):
            out[i] = row_order[i - 1] - row_order[i]
        out[1] = -row_order[1]
        return out

    # first derivative from order-4 row
    d1 = diff({j: A[ORDER - 1, j] for j in range(1, ORDER)})
    # second derivative from order-3 row, differentiated twice
    r3 = {j: A[ORDER - 2, j] for j in range(1, ORDER - 1)}
    d2a = {}
    d2a[ORDER - 1] = r3[ORDER - 2]
    for i in range(ORDER - 2, 1, -1):
        d2a[i] = r3[i - 1] - r3[i]
    d2a[1] = -r3[1]
    d2 = diff(d2a)
    # third derivative from order-2 row, differentiated three times
    r2 = {j: A[ORDER - 3, j] for j in range(1, ORDER - 2)}
    d3a = {}
    d3a[ORDER - 2] = r2[ORDER - 3]
    for i in range(ORDER - 3, 1, -1):
        d3a[i] = r2[i - 1] - r2[i]
    d3a[1] = -r2[1]
    d3b = {}
    d3b[ORDER - 1] = d3a[ORDER - 2]
    for i in range(ORDER - 2, 1, -1):
        d3b[i] = d3a[i - 1] - d3a[i]
    d3b[1] = -d3a[1]
    d3 = diff(d3b)

    cols = []
    for j in range(1, ORDER + 1):
        cols.append(jnp.stack([A[ORDER, j], d1[j], d2[j], d3[j]], axis=-1))
    return jnp.stack(cols, axis=-2)


@functools.lru_cache(maxsize=None)
def bspline_moduli(dims):
    """Squared DFT moduli of the order-5 B-spline along each grid dimension,
    with the reference's epsilon fix and zeta correction
    (initializeBSplineModuli). Returns tuple of 3 float64 numpy arrays."""
    order = ORDER
    # spline values at integer points: B(1), B(2), ... for x=0
    array = np.zeros(order)
    x = 0.0
    array[0] = 1.0 - x
    array[1] = x
    for k in range(2, order):
        denom = 1.0 / k
        array[k] = x * array[k - 1] * denom
        for i in range(1, k):
            array[k - i] = ((x + i) * array[k - i - 1] + ((k - i + 1) - x) * array[k - i]) * denom
        array[0] = (1.0 - x) * array[0] * denom

    out = []
    for size in dims:
        bsarray = np.zeros(size + 1)
        for i in range(2, min(order + 2, size + 1)):
            bsarray[i] = array[i - 2]
        modulus = np.zeros(size)
        factor = 2.0 * np.pi / size
        for i in range(size):
            arg = factor * i * (np.arange(1, size + 1) - 1)
            s1 = np.sum(bsarray[1:size + 1] * np.cos(arg))
            s2 = np.sum(bsarray[1:size + 1] * np.sin(arg))
            modulus[i] = s1 * s1 + s2 * s2
        eps = 1.0e-7
        if modulus[0] < eps:
            modulus[0] = 0.5 * modulus[1]
        for i in range(1, size - 1):
            if modulus[i] < eps:
                modulus[i] = 0.5 * (modulus[i - 1] + modulus[i + 1])
        if modulus[size - 1] < eps:
            modulus[size - 1] = 0.5 * modulus[size - 2]
        # zeta correction
        jcut = 50
        for i in range(1, size + 1):
            k = i - 1
            if i > size // 2:
                k = k - size
            if k == 0:
                zeta = 1.0
            else:
                s1 = 1.0
                s2 = 1.0
                factor2 = np.pi * k / size
                for j in range(1, jcut + 1):
                    arg = factor2 / (factor2 + np.pi * j)
                    s1 += arg ** order
                    s2 += arg ** (2 * order)
                for j in range(1, jcut + 1):
                    arg = factor2 / (factor2 - np.pi * j)
                    s1 += arg ** order
                    s2 += arg ** (2 * order)
                zeta = s2 / s1
            modulus[i - 1] *= zeta * zeta
        out.append(modulus)
    return tuple(out)
