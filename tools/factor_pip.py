#!/usr/bin/env python
"""Factor the PIPs into quadratic forms over the degree-<=2 monomial basis.

Every monomial of total degree <= 4 is a product of two monomials of degree
<= 2, so the polynomial

    E(x) = sum_m c_m prod_i x_i^{e_mi}

can be rewritten as

    E(x) = m2(x)^T W m2(x),     m2_k(x) = prod_i x_i^{f_ki}, deg(f_k) <= 2

with B = 1 + V + V(V+1)/2 basis monomials (528 for the 2-body, 703 for the
3-body) and a dense symmetric W accumulating the c_m at the factor pairs.
This cuts the evaluation from ~P x 34k monomial columns to a [P,B] basis
matrix and a [B,B] matvec - ~18x fewer FLOPs, and the gradient is free:
dE/dm2 = 2 W m2 (reusing the matvec), dE/dlogx = (m2 * 2 W m2) @ F.

Validated exactly against the unfactored form (same monomials, same
coefficients - equality holds to float64 rounding).

Writes poly2b_quad.npz / poly3b_quad.npz: basis exponents F [B, V] (int8)
and symmetric W [B, B] (float64).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mbpol_openmm_plugin_tpu import data as _data


def build_basis(nvars):
    """Degree-<=2 monomial basis: index map and exponent matrix."""
    basis = [tuple()]                       # constant
    for i in range(nvars):
        basis.append(((i, 1),))
    for i in range(nvars):
        basis.append(((i, 2),))
    for i in range(nvars):
        for j in range(i + 1, nvars):
            basis.append(((i, 1), (j, 1)))
    index = {b: k for k, b in enumerate(basis)}
    F = np.zeros((len(basis), nvars), np.int8)
    for k, b in enumerate(basis):
        for var, e in b:
            F[k, var] = e
    return index, F


def split_monomial(evec):
    """Split an exponent vector (deg <= 4) into two deg <= 2 halves."""
    items = []
    for var, e in enumerate(evec):
        items.extend([var] * int(e))
    assert len(items) <= 4
    half1 = items[:2]
    half2 = items[2:]

    def key(half):
        if not half:
            return tuple()
        counts = {}
        for v in half:
            counts[v] = counts.get(v, 0) + 1
        return tuple(sorted(counts.items()))

    return key(half1), key(half2)


def factor(name, out_name):
    d = _data.load(name)
    E = d['exponents']
    c = d['coeffs']
    nm, nv = E.shape
    index, F = build_basis(nv)
    B = len(F)
    W = np.zeros((B, B), np.float64)
    for m in range(nm):
        k1, k2 = split_monomial(E[m])
        a, b = index[k1], index[k2]
        W[a, b] += 0.5 * c[m]
        W[b, a] += 0.5 * c[m]

    # exact validation against the unfactored form
    rng = np.random.default_rng(0)
    x = rng.uniform(0.05, 0.9, size=(64, nv))
    mono = np.exp(np.log(x) @ E.T.astype(np.float64))
    e_ref = mono @ c
    g_ref = ((mono * c) @ E.astype(np.float64)) / x
    m2 = np.exp(np.log(x) @ F.T.astype(np.float64))
    wm = m2 @ W
    e = np.sum(m2 * wm, axis=1)
    g = ((m2 * 2.0 * wm) @ F.astype(np.float64)) / x
    rel_e = np.max(np.abs(e - e_ref) / (np.abs(e_ref) + 1e-30))
    rel_g = np.max(np.abs(g - g_ref) / (np.abs(g_ref) + 1e-10))
    print('%s: %d monomials -> basis %d, W nnz %d, relerr e %.2e g %.2e'
          % (name, nm, B, int((W != 0).sum()), rel_e, rel_g))
    assert rel_e < 1e-11 and rel_g < 1e-9

    out = os.path.join(os.path.dirname(__file__), '..',
                       'mbpol_openmm_plugin_tpu', 'data', out_name)
    np.savez_compressed(out, basis_exponents=F, W=W)
    print('wrote', out_name)


if __name__ == '__main__':
    factor('poly2b', 'poly2b_quad.npz')
    factor('poly3b', 'poly3b_quad.npz')
