"""Fused Pallas TPU kernels for the dense PME direct-space electrostatics.

The XLA formulation (models/pme.py) materializes ~35 [N,N] coefficient
tensors per evaluation (~1 GB of HBM traffic at water256; measured via HLO
cost analysis) - the direct-space pair pipeline is bandwidth-bound, not
FLOP-bound. These kernels recompute the whole per-pair chain (minimum-image
delta, r, Ewald bn0..bn3, Thole damping incl. the fixed-depth Q(3/4,x))
inside VMEM tiles and write only O(N) outputs:

  K1 `fixed_field_kernel`: fixed charge field (direct part) + the two
     precomputed SCF factor matrices s3/s5 (the only [N,N] outputs kept -
     they make each SOR iteration a cheap matmul).
  K2 `pair_force_kernel`: given converged dipoles, the direct-space energy,
     per-site forces and per-site potential (for charge-derivative forces).

Physics is identical to models/pme.py (reference formulas from
MBPolReferenceElectrostaticsForce.cpp:2510-2716); equivalence is asserted in
tests (interpret mode on CPU, real kernels on TPU).

Layout notes: per-site scalars are packed as a [N, 8] row-side array and its
[8, N] transpose for the column side, so every tile read is lane-aligned.
Tiles are [TI, TJ] = [256, 256]; the j-reduction runs over the second grid
axis with accumulation in a VMEM scratch, emitted at the last j step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TI = 256
TJ = 256

_GAMMA_3_4 = 1.2254167024651776451290983034   # Gamma(3/4)
_SQRT_PI = float(np.sqrt(np.pi))

# packed per-site scalar columns; _IDX carries the GLOBAL site index so a
# kernel invocation over any row block (e.g. one shard's rows under
# shard_map) can form self/validity masks without a row offset (f32 holds
# integers exactly to 2^24, far above any site count here)
_X, _Y, _Z, _Q, _D16, _MOL, _ISO, _IDX = range(8)
_NS = 8

# erf(x)/x on x in [0,1] as a polynomial in x^2 (Chebyshev-fit, max abs err
# 3e-12; tools fit). Mosaic has no erf primitive.
_ERF_SMALL = (1.1283791670949317, -0.37612638893211986, 0.11283791389832429,
              -0.026866140206755394, 0.0052238126764408265,
              -0.0008543298597925159, 0.00011964804761807881,
              -1.3962680109669597e-05, 1.0729141554935686e-06)

# H2(y) = Q(3/4, y^4) * exp(y^4) on y in [0, 3.6] (deg-16 Chebyshev fit; the
# resulting Thole order-1 term u*Gamma(3/4)*Q is accurate to 8e-7 - the f32
# floor). Beyond 3.6 the exp(-y^4) prefactor underflows to 0 anyway.
_H2_COEF = (0.9999979243628037, 0.00014319660928875655,
            -0.0021470753751305915, -1.0781905328873824, 1.011730980379781,
            -0.2717512876841842, 1.1463243006664783, -3.2260426550515193,
            4.169189680278212, -3.2744765067826873, 1.7361138156847973,
            -0.6471908493346308, 0.17102275603222306, -0.03150024607180113,
            0.003856305471467913, -0.0002825023639770407,
            9.381543447292913e-06)


def _poly(x, coefs):
    acc = jnp.full_like(x, coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * x + c
    return acc


# G(t) = erfc(x) exp(x^2) with t = 1/(1+x/2), fit over x in [1, 6.5]
# (deg-13 Chebyshev, abs err 7e-15 in f64; f32 rounding dominates).
_ERFC_LARGE = (-1.9746565602107857e-07, 0.2821013116127388,
               0.2819979025268528, 0.24768363515811034, 0.17146250192884907,
               0.10206364773572815, -0.04783208765468164,
               -0.01177845373674025, 0.028482866117224753,
               -0.42762171471515287, 0.8606337888603877, -0.7631846484307717,
               0.3376929286780891, -0.06170957217154399)


def _erfc(x):
    """erfc for x >= 0: series-fit branch below 1, G(t) exp(-x^2) fit above
    (both at the f32 noise floor; Mosaic has no erf primitive)."""
    small = x * _poly(x * x, _ERF_SMALL)
    t = 1.0 / (1.0 + 0.5 * x)
    large = _poly(t, _ERFC_LARGE) * jnp.exp(-x * x)
    return jnp.where(x < 1.0, 1.0 - small, large)


def _pair_chain(srow, scol, n_sites, consts, need_cc1=False):
    """Common per-tile pair quantities.

    srow: [TI, 8] row-side site scalars; scol: [8, TJ] column side. Self and
    validity masks come from the packed _IDX column, so the tile may hold
    ANY row block (including one shard's rows under shard_map) with no
    offset bookkeeping. Returns a dict of [TI, TJ] tensors (all masked to
    valid, non-self pairs within the cutoff where appropriate). need_cc1
    adds the order-1 Thole factor (the fast Q(3/4,x) fit) - only the
    energy/potential kernel needs it.
    """
    (alpha, cutoff2, g_cc, g_cd, g_dd, g_ddoh, g_ddhh, bx, by, bz) = consts

    xi, yi, zi = srow[:, _X:_X + 1], srow[:, _Y:_Y + 1], srow[:, _Z:_Z + 1]
    xj, yj, zj = scol[_X:_X + 1, :], scol[_Y:_Y + 1, :], scol[_Z:_Z + 1, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    # minimum image (static box)
    dx = dx - jnp.floor(dx / bx + 0.5) * bx
    dy = dy - jnp.floor(dy / by + 0.5) * by
    dz = dz - jnp.floor(dz / bz + 0.5) * bz
    r2 = dx * dx + dy * dy + dz * dz

    ii = srow[:, _IDX:_IDX + 1]
    jj = scol[_IDX:_IDX + 1, :]
    notself = (ii != jj) & (ii < n_sites) & (jj < n_sites)
    within = notself & (r2 <= cutoff2)

    r2s = jnp.where(notself, r2, 1.0)
    inv_r = jax.lax.rsqrt(r2s)
    inv_r = jnp.where(notself, inv_r, 0.0)
    r = r2s * inv_r                                     # = sqrt(r2)
    inv_r2 = inv_r * inv_r

    # Ewald bn0..bn3 (ewaldScalingReal, cpp:219-259), zeroed beyond cutoff
    ralpha = alpha * r
    bn0 = _erfc(ralpha) * inv_r
    alsq2 = 2.0 * alpha * alpha
    exp2a = jnp.exp(-(ralpha * ralpha))
    f1 = alsq2 / (_SQRT_PI * alpha)
    bn1 = (bn0 + f1 * exp2a) * inv_r2
    f2 = f1 * alsq2
    bn2 = (3.0 * bn1 + f2 * exp2a) * inv_r2
    f3 = f2 * alsq2
    bn3 = (5.0 * bn2 + f3 * exp2a) * inv_r2
    w = within.astype(r.dtype)
    bn0, bn1, bn2, bn3 = bn0 * w, bn1 * w, bn2 * w, bn3 * w

    rr3 = inv_r * inv_r2
    rr5 = 3.0 * rr3 * inv_r2
    rr7 = 15.0 * rr3 * inv_r2 * inv_r2
    rr1c = inv_r * w
    rr3c = rr3 * w
    rr5c = rr5 * w
    rr7c = rr7 * w

    # Thole damping (getAndScaleInverseRs, cpp:261-334)
    u = r * (srow[:, _D16:_D16 + 1] * scol[_D16:_D16 + 1, :])   # r * inv(damp)
    u4 = u * u * u * u

    same_mol = srow[:, _MOL:_MOL + 1] == scol[_MOL:_MOL + 1, :]
    one_is_o = (srow[:, _ISO:_ISO + 1] + scol[_ISO:_ISO + 1, :]) > 0.5
    gdd = jnp.where(same_mol, jnp.where(one_is_o, g_ddoh, g_ddhh), g_dd)

    ex_cc = jnp.exp(-g_cc * u4)
    s_cc3 = 1.0 - ex_cc
    s_cc1 = None
    if need_cc1:
        y = jnp.minimum((g_cc ** 0.25) * u, 3.6)
        s_cc1 = s_cc3 + (g_cc ** 0.25) * u * _GAMMA_3_4 * _poly(y, _H2_COEF) * ex_cc
    ex_cd = jnp.exp(-g_cd * u4)
    s_cd3 = 1.0 - ex_cd
    s_cd5 = s_cd3 - (4.0 / 3.0) * g_cd * ex_cd * u4
    ex_dd = jnp.exp(-gdd * u4)
    s_dd3 = 1.0 - ex_dd
    s_dd5 = s_dd3 - (4.0 / 3.0) * gdd * ex_dd * u4
    s_dd7 = s_dd5 - (4.0 / 15.0) * gdd * (4.0 * gdd * u4 - 1.0) * ex_dd * u4

    return dict(dx=dx, dy=dy, dz=dz, within=within, w=w, same_mol=same_mol,
                bn0=bn0, bn1=bn1, bn2=bn2, bn3=bn3,
                rr1c=rr1c, rr3c=rr3c, rr5c=rr5c, rr7c=rr7c,
                s_cc1=s_cc1, s_cc3=s_cc3, s_cd3=s_cd3, s_cd5=s_cd5,
                s_dd3=s_dd3, s_dd5=s_dd5, s_dd7=s_dd7)


def _fixed_field_kernel(consts, n_sites, srow_ref, scol_ref, ef_ref,
                        s3_ref, s5_ref, acc_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    srow = srow_ref[:]
    scol = scol_ref[:]
    t = _pair_chain(srow, scol, n_sites, consts)   # no cc1

    # SCF factors (preFactor1/2, cpp:1342-1407 PME direct)
    s3_ref[:] = (1.0 - t['s_dd3']) * t['rr3c'] - t['bn1']
    s5_ref[:] = t['bn2'] - (1.0 - t['s_dd5']) * t['rr5c']

    # fixed charge field: same-water keeps only the reciprocal correction
    # (full removal bn1 - rr3; s := 0). Cross-water damping sign FIXED vs
    # the reference's (s3-1) form - see models/pme.py for the measured
    # force/energy-consistency analysis.
    s3cc_eff = jnp.where(t['same_mol'], 0.0, t['s_cc3'])
    kdir = (t['bn1'] - (1.0 - s3cc_eff) * t['rr3c']) * t['w']
    qj = scol[_Q:_Q + 1, :]
    kq = kdir * qj
    acc_ref[:, 0:1] -= jnp.sum(kq * t['dx'], axis=1, keepdims=True)
    acc_ref[:, 1:2] -= jnp.sum(kq * t['dy'], axis=1, keepdims=True)
    acc_ref[:, 2:3] -= jnp.sum(kq * t['dz'], axis=1, keepdims=True)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ef_ref[:] = acc_ref[:]


def _pair_force_kernel(consts, n_sites, srow_ref, scol_ref, mrow_ref,
                       mcol_ref, out_ref, acc_ref):
    """Direct-space energy/force/potential given converged dipoles.

    out cols: 0..2 force, 3 potential, 4 e_pair row sum.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    srow = srow_ref[:]
    scol = scol_ref[:]
    t = _pair_chain(srow, scol, n_sites, consts, need_cc1=True)

    qi = srow[:, _Q:_Q + 1]
    qj = scol[_Q:_Q + 1, :]
    mxi, myi, mzi = mrow_ref[:, 0:1], mrow_ref[:, 1:2], mrow_ref[:, 2:3]
    mxj, myj, mzj = mcol_ref[0:1, :], mcol_ref[1:2, :], mcol_ref[2:3, :]

    dx, dy, dz = t['dx'], t['dy'], t['dz']
    dot_i = mxi * dx + myi * dy + mzi * dz          # mu_i . (r_j - r_i)
    dot_j = mxj * dx + myj * dy + mzj * dz
    qq = qi * qj
    gli1 = qj * dot_i - qi * dot_j
    mumu = mxi * mxj + myi * myj + mzi * mzj

    sm = t['same_mol']
    s1cc_e = jnp.where(sm, 0.0, t['s_cc1'])
    s3cd_e = jnp.where(sm, 0.0, t['s_cd3'])
    s3cc_f = jnp.where(sm, 0.0, t['s_cc3'])
    s5cd_f = jnp.where(sm, 0.0, t['s_cd5'])

    # energy (cpp:2556-2604)
    e_pair = (t['bn0'] - t['rr1c'] * (1.0 - s1cc_e)) * qq \
        + 0.5 * (t['bn1'] - t['rr3c'] * (1.0 - s3cd_e)) * gli1
    acc_ref[:, 4:5] += 0.5 * jnp.sum(e_pair * t['w'], axis=1, keepdims=True)

    # radial force coefficient
    coeff = (t['bn1'] - (1.0 - s3cc_f) * t['rr3c']) * qq \
        + (t['bn2'] - t['rr5c'] * (1.0 - s5cd_f)) * gli1 \
        + (t['bn2'] - t['rr5c'] * (1.0 - t['s_dd5'])) * mumu \
        - (t['bn3'] - t['rr7c'] * (1.0 - t['s_dd7'])) * (dot_i * dot_j)
    coeff = coeff * t['w']
    fx = jnp.sum(coeff * dx, axis=1, keepdims=True)
    fy = jnp.sum(coeff * dy, axis=1, keepdims=True)
    fz = jnp.sum(coeff * dz, axis=1, keepdims=True)

    # dipole cross terms
    w5 = (t['bn2'] - t['rr5c'] * (1.0 - t['s_dd5'])) * t['w']
    s5dj = jnp.sum(w5 * dot_j, axis=1, keepdims=True)
    w5di = w5 * dot_i
    fx = fx + mxi * s5dj + jnp.sum(w5di * mxj, axis=1, keepdims=True)
    fy = fy + myi * s5dj + jnp.sum(w5di * myj, axis=1, keepdims=True)
    fz = fz + mzi * s5dj + jnp.sum(w5di * mzj, axis=1, keepdims=True)

    w3 = (t['bn1'] - t['rr3c'] * (1.0 - s3cd_e)) * t['w']
    w3q = jnp.sum(w3 * qj, axis=1, keepdims=True)
    fx = fx + qi * jnp.sum(w3 * mxj, axis=1, keepdims=True) - mxi * w3q
    fy = fy + qi * jnp.sum(w3 * myj, axis=1, keepdims=True) - myi * w3q
    fz = fz + qi * jnp.sum(w3 * mzj, axis=1, keepdims=True) - mzi * w3q

    acc_ref[:, 0:1] += fx
    acc_ref[:, 1:2] += fy
    acc_ref[:, 2:3] += fz

    # per-site potential, direct part (cpp:2622-2626)
    k1 = (t['bn0'] - t['rr1c'] * (1.0 - s1cc_e)) * t['w']
    acc_ref[:, 3:4] += (jnp.sum(k1 * qj, axis=1, keepdims=True)
                        - jnp.sum(w3 * dot_j, axis=1, keepdims=True))

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ----------------------------------------------------------------------
# Triangular (symmetry-halved) kernels
# ----------------------------------------------------------------------
# Every per-pair quantity in the chain is symmetric under i<->j (bn*, rr*,
# Thole scales, same_mol; the displacement d only flips sign), so computing
# the full [N,N] pair grid does every pair's transcendental chain twice.
# These variants run only tiles with j >= i and mask to the strict upper
# triangle (ii < jj), accumulating BOTH the row-side (i) and column-side (j)
# outputs of each pair:
#   - row outputs ride the usual [TI, _NS] accumulator (finalized per row
#     block at the last j step);
#   - column outputs are written as per-(i,j) partial blocks of a
#     [ni, _NS, np] output and reduced over i by XLA afterwards (tiny HBM:
#     ni * 32 bytes per site; unique blocks, so no cross-step scratch and
#     no dynamic-slice read-modify-write, which Mosaic lowers poorly);
#   - the SCF factor matrices come out strictly upper-triangular and are
#     symmetrized in XLA (S = U + U^T; the diagonal is identically zero
#     because self pairs are masked).
# Lower tiles are skipped via pl.when (their s3/s5 blocks are zero-filled).
# At water256 (4x4 tiles) this removes 6/16 of the VPU pair-chain work; the
# saving approaches 50% as N grows. Row-sharded (mesh) wrappers keep the
# full-grid kernels: a triangular split would load-imbalance the shards.


def _fixed_field_kernel_tri(consts, n_sites, srow_ref, scol_ref, ef_ref,
                            colf_ref, s3_ref, s5_ref, acc_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < i)
    def _():
        s3_ref[:] = jnp.zeros_like(s3_ref)
        s5_ref[:] = jnp.zeros_like(s5_ref)
        colf_ref[:] = jnp.zeros_like(colf_ref)

    @pl.when(j >= i)
    def _():
        srow = srow_ref[:]
        scol = scol_ref[:]
        t = _pair_chain(srow, scol, n_sites, consts)   # no cc1
        ii = srow[:, _IDX:_IDX + 1]
        jj = scol[_IDX:_IDX + 1, :]
        tri = (ii < jj).astype(srow.dtype)

        # strictly-upper SCF factors; full S = U + U^T on the host side
        s3_ref[:] = ((1.0 - t['s_dd3']) * t['rr3c'] - t['bn1']) * tri
        s5_ref[:] = (t['bn2'] - (1.0 - t['s_dd5']) * t['rr5c']) * tri

        s3cc_eff = jnp.where(t['same_mol'], 0.0, t['s_cc3'])
        kdir = (t['bn1'] - (1.0 - s3cc_eff) * t['rr3c']) * t['w'] * tri
        qi = srow[:, _Q:_Q + 1]
        qj = scol[_Q:_Q + 1, :]
        kq = kdir * qj
        acc_ref[:, 0:1] -= jnp.sum(kq * t['dx'], axis=1, keepdims=True)
        acc_ref[:, 1:2] -= jnp.sum(kq * t['dy'], axis=1, keepdims=True)
        acc_ref[:, 2:3] -= jnp.sum(kq * t['dz'], axis=1, keepdims=True)
        # column side: field_j -= kdir q_i d_ji = +kdir q_i d_ij; written as
        # this (i,j) block's partial, reduced over i by the caller
        kqi = kdir * qi
        colf_ref[0, 0:1, :] = jnp.sum(kqi * t['dx'], axis=0, keepdims=True)
        colf_ref[0, 1:2, :] = jnp.sum(kqi * t['dy'], axis=0, keepdims=True)
        colf_ref[0, 2:3, :] = jnp.sum(kqi * t['dz'], axis=0, keepdims=True)
        colf_ref[0, 3:, :] = jnp.zeros_like(colf_ref[0, 3:, :])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        ef_ref[:] = acc_ref[:]


def _pair_force_kernel_tri(consts, n_sites, srow_ref, scol_ref, mrow_ref,
                           mcol_ref, out_ref, colo_ref, acc_ref):
    """Triangular direct-space energy/force/potential.

    Row out cols: 0..2 force, 3 potential, 4 energy (each unordered pair
    counted once). Column out rows: 0..2 force, 3 potential - written as
    per-(i,j) partial blocks, reduced over i by the caller. The column
    contributions follow from the i<->j swap of the pair terms (d -> -d,
    dot_i -> -dot_j, dot_j -> -dot_i; every scale factor symmetric).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(j < i)
    def _():
        colo_ref[:] = jnp.zeros_like(colo_ref)

    @pl.when(j >= i)
    def _():
        srow = srow_ref[:]
        scol = scol_ref[:]
        t = _pair_chain(srow, scol, n_sites, consts, need_cc1=True)
        ii = srow[:, _IDX:_IDX + 1]
        jj = scol[_IDX:_IDX + 1, :]
        wt = t['w'] * (ii < jj).astype(srow.dtype)

        qi = srow[:, _Q:_Q + 1]
        qj = scol[_Q:_Q + 1, :]
        mxi, myi, mzi = mrow_ref[:, 0:1], mrow_ref[:, 1:2], mrow_ref[:, 2:3]
        mxj, myj, mzj = mcol_ref[0:1, :], mcol_ref[1:2, :], mcol_ref[2:3, :]

        dx, dy, dz = t['dx'], t['dy'], t['dz']
        dot_i = mxi * dx + myi * dy + mzi * dz
        dot_j = mxj * dx + myj * dy + mzj * dz
        qq = qi * qj
        gli1 = qj * dot_i - qi * dot_j
        mumu = mxi * mxj + myi * myj + mzi * mzj

        sm = t['same_mol']
        s1cc_e = jnp.where(sm, 0.0, t['s_cc1'])
        s3cd_e = jnp.where(sm, 0.0, t['s_cd3'])
        s3cc_f = jnp.where(sm, 0.0, t['s_cc3'])
        s5cd_f = jnp.where(sm, 0.0, t['s_cd5'])

        # energy: once per unordered pair (e_pair is i<->j symmetric)
        e_pair = (t['bn0'] - t['rr1c'] * (1.0 - s1cc_e)) * qq \
            + 0.5 * (t['bn1'] - t['rr3c'] * (1.0 - s3cd_e)) * gli1
        acc_ref[:, 4:5] += jnp.sum(e_pair * wt, axis=1, keepdims=True)

        coeff = ((t['bn1'] - (1.0 - s3cc_f) * t['rr3c']) * qq
                 + (t['bn2'] - t['rr5c'] * (1.0 - s5cd_f)) * gli1
                 + (t['bn2'] - t['rr5c'] * (1.0 - t['s_dd5'])) * mumu
                 - (t['bn3'] - t['rr7c'] * (1.0 - t['s_dd7']))
                 * (dot_i * dot_j)) * wt
        w5 = (t['bn2'] - t['rr5c'] * (1.0 - t['s_dd5'])) * wt
        w3 = (t['bn1'] - t['rr3c'] * (1.0 - s3cd_e)) * wt
        k1 = (t['bn0'] - t['rr1c'] * (1.0 - s1cc_e)) * wt

        # row side (force on i from pairs j > i)
        fx = jnp.sum(coeff * dx, axis=1, keepdims=True)
        fy = jnp.sum(coeff * dy, axis=1, keepdims=True)
        fz = jnp.sum(coeff * dz, axis=1, keepdims=True)
        s5dj = jnp.sum(w5 * dot_j, axis=1, keepdims=True)
        w5di = w5 * dot_i
        fx = fx + mxi * s5dj + jnp.sum(w5di * mxj, axis=1, keepdims=True)
        fy = fy + myi * s5dj + jnp.sum(w5di * myj, axis=1, keepdims=True)
        fz = fz + mzi * s5dj + jnp.sum(w5di * mzj, axis=1, keepdims=True)
        w3q = jnp.sum(w3 * qj, axis=1, keepdims=True)
        fx = fx + qi * jnp.sum(w3 * mxj, axis=1, keepdims=True) - mxi * w3q
        fy = fy + qi * jnp.sum(w3 * myj, axis=1, keepdims=True) - myi * w3q
        fz = fz + qi * jnp.sum(w3 * mzj, axis=1, keepdims=True) - mzi * w3q
        acc_ref[:, 0:1] += fx
        acc_ref[:, 1:2] += fy
        acc_ref[:, 2:3] += fz
        acc_ref[:, 3:4] += (jnp.sum(k1 * qj, axis=1, keepdims=True)
                            - jnp.sum(w3 * dot_j, axis=1, keepdims=True))

        # column side (force/potential on j from pairs i < j)
        c_w5di = jnp.sum(w5 * dot_i, axis=0, keepdims=True)
        c_w3qi = jnp.sum(w3 * qi, axis=0, keepdims=True)
        cfx = (-jnp.sum(coeff * dx, axis=0, keepdims=True)
               - mxj * c_w5di
               - jnp.sum(w5 * dot_j * mxi, axis=0, keepdims=True)
               + qj * jnp.sum(w3 * mxi, axis=0, keepdims=True)
               - mxj * c_w3qi)
        cfy = (-jnp.sum(coeff * dy, axis=0, keepdims=True)
               - myj * c_w5di
               - jnp.sum(w5 * dot_j * myi, axis=0, keepdims=True)
               + qj * jnp.sum(w3 * myi, axis=0, keepdims=True)
               - myj * c_w3qi)
        cfz = (-jnp.sum(coeff * dz, axis=0, keepdims=True)
               - mzj * c_w5di
               - jnp.sum(w5 * dot_j * mzi, axis=0, keepdims=True)
               + qj * jnp.sum(w3 * mzi, axis=0, keepdims=True)
               - mzj * c_w3qi)
        colo_ref[0, 0:1, :] = cfx
        colo_ref[0, 1:2, :] = cfy
        colo_ref[0, 2:3, :] = cfz
        colo_ref[0, 3:4, :] = (jnp.sum(k1 * qi, axis=0, keepdims=True)
                               + jnp.sum(w3 * dot_i, axis=0, keepdims=True))
        colo_ref[0, 4:, :] = jnp.zeros_like(colo_ref[0, 4:, :])

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ----------------------------------------------------------------------
# Host-side wrappers
# ----------------------------------------------------------------------

def use_pallas(dtype):
    """Pallas path: TPU + float32 (tests exercise the kernels in interpret
    mode explicitly). Override with MBPOL_ELEC_PALLAS=0/1."""
    import os
    choice = os.environ.get('MBPOL_ELEC_PALLAS', 'auto')
    if choice == '0':
        return False
    if choice == '1':
        return True
    return jax.default_backend() == 'tpu' and dtype == jnp.float32


def _padded(n):
    return ((n + TI - 1) // TI) * TI


def pack_sites(positions, charges, d16_inv, mol_index, is_o, pad_to=None):
    """[N,8] row-side packed site scalars (and padding to the tile size).

    d16_inv: per-site 1/damping^(1/6) so that u = r * d16_inv_i * d16_inv_j.
    pad_to: optional row count (>= the tile-aligned size), e.g. a multiple
    of TI * n_devices for the shard_map'd kernels.
    """
    n = positions.shape[0]
    np_ = _padded(n) if pad_to is None else int(pad_to)
    assert np_ % TI == 0 and np_ >= n
    dt = positions.dtype
    s = jnp.zeros((np_, _NS), dt)
    s = s.at[:n, _X].set(positions[:, 0])
    s = s.at[:n, _Y].set(positions[:, 1])
    s = s.at[:n, _Z].set(positions[:, 2])
    s = s.at[:n, _Q].set(charges)
    s = s.at[:n, _D16].set(d16_inv)
    s = s.at[:n, _MOL].set(mol_index.astype(dt))
    s = s.at[:n, _ISO].set(is_o.astype(dt))
    # global site index (self/validity masks; padded rows get an index
    # >= any n_sites so they mask out everywhere)
    s = s.at[:, _IDX].set(jnp.arange(np_, dtype=dt))
    # padded sites: unique fake molecule ids so they never look same-mol
    s = s.at[n:, _MOL].set(-1.0)
    return s


def _consts(setup, params_thole):
    th = params_thole
    return (float(setup.alpha), float(setup.cutoff) ** 2,
            float(th[0]), float(th[1]), float(th[2]), float(th[3]),
            float(th[4]),
            float(setup.box[0]), float(setup.box[1]), float(setup.box[2]))


def fixed_field_and_scf_factors(setup, thole, srow, n_sites, interpret=False):
    """K1: (efield [n,3], s3 [np,np], s5 [np,np])."""
    np_ = srow.shape[0]
    consts = _consts(setup, thole)
    grid = (np_ // TI, np_ // TJ)
    kern = functools.partial(_fixed_field_kernel, consts, n_sites)
    ef, s3, s5 = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((np_, _NS), srow.dtype),
                   jax.ShapeDtypeStruct((np_, np_), srow.dtype),
                   jax.ShapeDtypeStruct((np_, np_), srow.dtype)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                   pl.BlockSpec((TI, TJ), lambda i, j: (i, j)),
                   pl.BlockSpec((TI, TJ), lambda i, j: (i, j))],
        scratch_shapes=[pltpu.VMEM((TI, _NS), srow.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=300 * np_ * np_, transcendentals=8 * np_ * np_,
            bytes_accessed=2 * np_ * np_ * 4),
    )(srow, srow.T)
    return ef[:n_sites, :3], s3, s5


def fixed_field_and_scf_factors_tri(setup, thole, srow, n_sites,
                                    interpret=False):
    """Triangular K1: (efield [n,3], s3 [np,np], s5 [np,np]).

    Half the pair-chain work of `fixed_field_and_scf_factors`; identical
    physics (the SCF factor matrices are symmetrized from the strict upper
    triangle, the field adds the row- and column-side accumulations)."""
    np_ = srow.shape[0]
    consts = _consts(setup, thole)
    grid = (np_ // TI, np_ // TJ)
    kern = functools.partial(_fixed_field_kernel_tri, consts, n_sites)
    ni = np_ // TI
    ef, colf, s3u, s5u = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((np_, _NS), srow.dtype),
                   jax.ShapeDtypeStruct((ni, _NS, np_), srow.dtype),
                   jax.ShapeDtypeStruct((np_, np_), srow.dtype),
                   jax.ShapeDtypeStruct((np_, np_), srow.dtype)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                   pl.BlockSpec((1, _NS, TJ), lambda i, j: (i, 0, j)),
                   pl.BlockSpec((TI, TJ), lambda i, j: (i, j)),
                   pl.BlockSpec((TI, TJ), lambda i, j: (i, j))],
        scratch_shapes=[pltpu.VMEM((TI, _NS), srow.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=160 * np_ * np_, transcendentals=4 * np_ * np_,
            bytes_accessed=2 * np_ * np_ * 4),
    )(srow, srow.T)
    s3 = s3u + s3u.T
    s5 = s5u + s5u.T
    colf2 = jnp.sum(colf, axis=0)
    field = ef[:n_sites, :3] + colf2[:3, :n_sites].T
    return field, s3, s5


def direct_energy_force_pot_tri(setup, thole, srow, mu, n_sites,
                                interpret=False):
    """Triangular K2: (e_direct scalar, force [n,3], pot [n]). Half the
    pair-chain work of `direct_energy_force_pot`; identical physics."""
    np_ = srow.shape[0]
    consts = _consts(setup, thole)
    mrow = jnp.zeros((np_, _NS), srow.dtype).at[:n_sites, :3].set(mu)
    grid = (np_ // TI, np_ // TJ)
    kern = functools.partial(_pair_force_kernel_tri, consts, n_sites)
    ni = np_ // TI
    out, colo = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((np_, _NS), srow.dtype),
                   jax.ShapeDtypeStruct((ni, _NS, np_), srow.dtype)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
            pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
        ],
        out_specs=[pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                   pl.BlockSpec((1, _NS, TJ), lambda i, j: (i, 0, j))],
        scratch_shapes=[pltpu.VMEM((TI, _NS), srow.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=220 * np_ * np_, transcendentals=4 * np_ * np_,
            bytes_accessed=2 * np_ * np_ * 4),
    )(srow, srow.T, mrow, mrow.T)
    colo2 = jnp.sum(colo, axis=0)
    e = jnp.sum(out[:n_sites, 4])
    force = out[:n_sites, :3] + colo2[:3, :n_sites].T
    pot = out[:n_sites, 3] + colo2[3, :n_sites]
    return e, force, pot


def padded_for_mesh(n, n_devices):
    """Row count for the shard_map'd kernels: a multiple of TI*n_devices so
    every shard holds whole tiles."""
    k = TI * n_devices
    return ((n + k - 1) // k) * k


def _row_sharded_call(mesh, f, srow, *extra_cols):
    """Run `f(srow_local, scol_full, *cols_full)` with rows sharded over the
    mesh's 'dp' axis and everything else replicated. The packed _IDX column
    makes row blocks offset-free, so each shard just runs the same kernel
    grid over its rows x all columns; XLA inserts the all-gather of the
    (tiny) replicated operands and leaves the [rows, N] outputs sharded.

    Role analog: the CUDA platform's interacting-tile decomposition
    (CudaMBPolKernels.cpp:278-304) splits the same pair space across SMs;
    here row blocks split across chips over ICI.
    """
    from jax.sharding import PartitionSpec as P
    import jax as _jax
    axis = mesh.axis_names[0]
    rows = P(axis, None)
    repl = P(None, None)
    n_out = None

    def wrapped(srow_l, scol, *cols):
        outs = f(srow_l, scol, *cols)
        return outs

    return _jax.shard_map(
        wrapped, mesh=mesh,
        in_specs=(rows, repl) + tuple(repl for _ in extra_cols),
        out_specs=(rows, rows, rows),
        check_vma=False)(srow, srow.T, *extra_cols)


def fixed_field_and_scf_factors_sharded(setup, thole, srow, n_sites, mesh,
                                        interpret=False):
    """K1 under a device mesh: rows sharded over 'dp' via shard_map.

    srow must be packed with pad_to=padded_for_mesh(n, ndev). Returns
    (efield [n,3] (unsharded view), s3 [np,np] row-sharded,
    s5 [np,np] row-sharded). Padded rows/cols produce exact zeros in
    s3/s5 (masked by the within/validity masks), so downstream dense SCF
    matmuls can run at the padded size unchanged.
    """
    np_ = srow.shape[0]
    ndev = mesh.devices.size
    assert np_ % (TI * ndev) == 0, (np_, ndev)
    consts = _consts(setup, thole)
    local_rows = np_ // ndev

    def shard_fn(srow_l, scol):
        grid = (local_rows // TI, np_ // TJ)
        kern = functools.partial(_fixed_field_kernel, consts, n_sites)
        ef, s3, s5 = pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((local_rows, _NS), srow_l.dtype),
                       jax.ShapeDtypeStruct((local_rows, np_), srow_l.dtype),
                       jax.ShapeDtypeStruct((local_rows, np_), srow_l.dtype)],
            grid=grid,
            in_specs=[
                pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
            ],
            out_specs=[pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                       pl.BlockSpec((TI, TJ), lambda i, j: (i, j)),
                       pl.BlockSpec((TI, TJ), lambda i, j: (i, j))],
            scratch_shapes=[pltpu.VMEM((TI, _NS), srow_l.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=300 * local_rows * np_,
                transcendentals=8 * local_rows * np_,
                bytes_accessed=2 * local_rows * np_ * 4),
        )(srow_l, scol)
        return ef, s3, s5

    ef, s3, s5 = _row_sharded_call(mesh, shard_fn, srow)
    return ef[:n_sites, :3], s3, s5


def direct_energy_force_pot_sharded(setup, thole, srow, mu, n_sites, mesh,
                                    interpret=False):
    """K2 under a device mesh: rows sharded over 'dp' via shard_map.
    Returns (e_direct scalar, force [n,3], pot [n])."""
    np_ = srow.shape[0]
    ndev = mesh.devices.size
    assert np_ % (TI * ndev) == 0, (np_, ndev)
    consts = _consts(setup, thole)
    local_rows = np_ // ndev
    mrow = jnp.zeros((np_, _NS), srow.dtype).at[:n_sites, :3].set(mu)

    def shard_fn(srow_l, scol, mrow_l, mcol):
        grid = (local_rows // TI, np_ // TJ)
        kern = functools.partial(_pair_force_kernel, consts, n_sites)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((local_rows, _NS), srow_l.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
                pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
                pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            scratch_shapes=[pltpu.VMEM((TI, _NS), srow_l.dtype)],
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=400 * local_rows * np_,
                transcendentals=8 * local_rows * np_,
                bytes_accessed=2 * local_rows * np_ * 4),
        )(srow_l, scol, mrow_l, mcol)
        return out

    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(axis, None), P(None, None)),
        out_specs=P(axis, None),
        check_vma=False)(srow, srow.T, mrow, mrow.T)
    e = jnp.sum(out[:n_sites, 4])
    force = out[:n_sites, :3]
    pot = out[:n_sites, 3]
    return e, force, pot


def direct_energy_force_pot(setup, thole, srow, mu, n_sites, interpret=False):
    """K2: (e_direct scalar, force [n,3], pot [n])."""
    np_ = srow.shape[0]
    consts = _consts(setup, thole)
    mrow = jnp.zeros((np_, _NS), srow.dtype).at[:n_sites, :3].set(mu)
    grid = (np_ // TI, np_ // TJ)
    kern = functools.partial(_pair_force_kernel, consts, n_sites)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((np_, _NS), srow.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
            pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
            pl.BlockSpec((_NS, TJ), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TI, _NS), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TI, _NS), srow.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=400 * np_ * np_, transcendentals=8 * np_ * np_,
            bytes_accessed=2 * np_ * np_ * 4),
    )(srow, srow.T, mrow, mrow.T)
    e = jnp.sum(out[:n_sites, 4])
    force = out[:n_sites, :3]
    pot = out[:n_sites, 3]
    return e, force, pot
