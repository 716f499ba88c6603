"""Fused Pallas TPU kernel for PIP evaluation (energy + gradient).

The jnp formulation of the PIP contraction (ops/polyeval.py) materializes
the monomial matrix mono = exp(log x @ E^T) in HBM - for the 3-body term
that is [n_triplets, 33525] floats, ~3 GB written and re-read several times
per MD step (~89 GB of HBM traffic per energy+force evaluation, measured via
XLA cost analysis). This kernel fuses the whole pipeline

    mono  = exp(logx @ E)          [TP, TM] tile, VMEM-resident
    e    += mono @ c               (energy per row)
    g    += (mono * c) @ E^T       (dE/dlogx per row)

over a (row-tile, monomial-tile) grid so mono never leaves VMEM. HBM
traffic drops to ~(P/TP) * |E| per polynomial (~200 MB/step for water256).

Layout: V (31/36 variables) is padded to the 128 lane width; the energy is
accumulated into the last (zero-padded) column of the [TP, 128] gradient
accumulator, so the kernel has a single output block.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VP = 128        # padded variable dimension (lane width)
TP = 256        # rows (pairs/triplets) per tile
TM = 2048       # monomials per tile
_ECOL = VP - 1  # accumulator column holding the energy


def _kernel(logx_ref, e_ref, et_ref, c_ref, out_ref, acc_ref):
    # NOTE: Mosaic only lowers DEFAULT/HIGHEST dot precision; HIGHEST is
    # required anyway-ish (plain bf16 corrupts the cancelling coefficient
    # sums by O(100 kcal/mol); bf16x2 loses 1-6%).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mono = jnp.exp(jnp.dot(logx_ref[:], e_ref[:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST))    # [TP, TM]
    mc = mono * c_ref[:]
    g = jnp.dot(mc, et_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)                # [TP, VP]
    e = jnp.sum(mc, axis=1, keepdims=True)                          # [TP, 1]
    acc_ref[:] += g
    acc_ref[:, _ECOL:_ECOL + 1] += e

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.lru_cache(maxsize=None)
def _padded_tables(name):
    """(E [VP, Mp], Et [Mp, VP], c [1, Mp]) float32, zero-padded."""
    from mbpol_openmm_plugin_tpu.ops.polyeval import load_pip
    pip = load_pip(name)
    nm, nv = pip.nmono, pip.nvars
    assert nv < _ECOL, 'variable count must leave the energy column free'
    mp = ((nm + TM - 1) // TM) * TM
    E = np.zeros((VP, mp), np.float32)
    E[:nv, :nm] = pip.exponents.T
    c = np.zeros((1, mp), np.float32)
    c[0, :nm] = pip.coeffs
    return E, np.ascontiguousarray(E.T), c


def _fused_call(logx, E, Et, c):
    p = logx.shape[0]
    mp = E.shape[1]
    grid = (p // TP, mp // TM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((p, VP), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TP, VP), lambda i, j: (i, 0)),
            pl.BlockSpec((VP, TM), lambda i, j: (0, j)),
            pl.BlockSpec((TM, VP), lambda i, j: (j, 0)),
            pl.BlockSpec((1, TM), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((TP, VP), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TP, VP), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * p * mp * VP, transcendentals=p * mp,
            bytes_accessed=(p // TP) * mp * VP * 8 + p * VP * 8),
    )(logx, E, Et, c)


# ----------------------------------------------------------------------
# Fused quadratic-form kernel: E = m2^T W m2 with the whole W resident in
# VMEM (~2.3 MB for the 703-basis), single pass over row tiles - no HBM
# round-trips for m2/wm at all.
# ----------------------------------------------------------------------

BQ = 768   # padded basis size (528/703 -> 768)


def _quad_kernel(logx_ref, f_ref, ft_ref, w_ref, out_ref):
    m2 = jnp.exp(jnp.dot(logx_ref[:], f_ref[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST))      # [TP, BQ]
    wm = jnp.dot(m2, w_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)               # [TP, BQ]
    g = jnp.dot(m2 * (2.0 * wm), ft_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)                # [TP, VP]
    e = jnp.sum(m2 * wm, axis=1, keepdims=True)
    out_ref[:] = g
    out_ref[:, _ECOL:_ECOL + 1] = e


@functools.lru_cache(maxsize=None)
def _quad_tables(name):
    from mbpol_openmm_plugin_tpu.ops.polyeval import load_quad
    F, W = load_quad(name)
    b, nv = F.shape
    assert nv < _ECOL and b <= BQ
    Fp = np.zeros((VP, BQ), np.float32)
    Fp[:nv, :b] = F.T
    Wp = np.zeros((BQ, BQ), np.float32)
    Wp[:b, :b] = W
    # padded basis columns have exponent rows all-zero -> m2 = exp(0) = 1,
    # but their W rows/cols are zero so they contribute nothing.
    return Fp, np.ascontiguousarray(Fp.T), Wp


def pip_quad_energy_grad_tpu(name, x):
    """Fused quadratic-form energy + dE/dx on TPU. x: [P, nvars] float32."""
    Fp, Fpt, Wp = _quad_tables(name)
    p, nv = x.shape
    pp = ((p + TP - 1) // TP) * TP
    logx = jnp.pad(jnp.log(x), ((0, pp - p), (0, VP - nv)))
    out = pl.pallas_call(
        _quad_kernel,
        out_shape=jax.ShapeDtypeStruct((pp, VP), jnp.float32),
        grid=(pp // TP,),
        in_specs=[
            pl.BlockSpec((TP, VP), lambda i: (i, 0)),
            pl.BlockSpec((VP, BQ), lambda i: (0, 0)),
            pl.BlockSpec((BQ, VP), lambda i: (0, 0)),
            pl.BlockSpec((BQ, BQ), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TP, VP), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * pp * BQ * (BQ + 2 * VP), transcendentals=pp * BQ,
            bytes_accessed=pp * VP * 8 + BQ * BQ * 4),
    )(logx, jnp.asarray(Fp), jnp.asarray(Fpt), jnp.asarray(Wp))
    e = out[:p, _ECOL]
    g = out[:p, :nv] / x
    return e, g


def pip_energy_grad_tpu(name, x):
    """Fused energy + dE/dx for one PIP on TPU.

    Args:
      name: 'poly2b' | 'poly3b'.
      x: [P, nvars] float32 positive variables.
    Returns:
      (e [P], g [P, nvars]).
    """
    E, Et, c = _padded_tables(name)
    p, nv = x.shape
    pp = ((p + TP - 1) // TP) * TP
    logx = jnp.log(x)
    logx = jnp.pad(logx, ((0, pp - p), (0, VP - nv)))
    out = _fused_call(logx, jnp.asarray(E), jnp.asarray(Et), jnp.asarray(c))
    e = out[:p, _ECOL]
    g = out[:p, :nv] / x
    return e, g


# ----------------------------------------------------------------------
# Round-4 kernel: fully fused exact-product quadratic form with MANUAL
# bf16-split matmuls.
#
# The round-3 _quad_kernel above is 9x slower than the XLA path because
# Mosaic's HIGHEST dot lowering is far worse than XLA's 6-pass bf16
# emulation. This kernel does the same arithmetic as the production XLA
# path (ops/polyeval.pip_quad_energy_and_grad) but with every precision
# pass written out explicitly as native bf16 MXU dots:
#
#   basis     m2 = (xa @ A) * (xa @ B)   one-hot selection, EXACT via the
#                                        3-way bf16 split (3 passes/side;
#                                        each product has one nonzero term)
#   matvec    wm = m2 @ W                6-pass bf16x6 (XLA-HIGHEST
#                                        algorithm: 3-way splits of both
#                                        operands, the 6 highest-order
#                                        cross products)
#   energy    e  = sum(m2 * wm)
#   gradient  gx = (2 m2 * wm) @ F^T     3 passes (z 3-way split; F's
#                                        {0,1,2} entries are bf16-exact) -
#                                        the caller divides by x
#
# vs the XLA path this kills the 1.56 ms gather-bound basis build (the
# selection rides the MXU inside VMEM) and every HBM round-trip of
# m2/wm/z ([23.8k, 704] f32 = 67 MB each).
# ----------------------------------------------------------------------


def _bdot(a, b):
    # precision pinned to DEFAULT: the session-wide
    # jax_default_matmul_precision='highest' otherwise reaches these bf16
    # dots and Mosaic rejects HIGHEST-precision bf16 matmuls ("Bad lhs
    # type") - the multi-pass emulation here IS the precision scheme.
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.DEFAULT)


def _split3(x):
    """Exact 3-way bf16 split (24 = 3x8 mantissa bits; components round-
    trip exactly inside the kernel - no XLA excess-precision elision in
    Mosaic)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_exact_select(xs, sel):
    """sum_c xs_c @ sel for a one-hot sel: exact value selection."""
    hi, mid, lo = xs
    return _bdot(hi, sel) + _bdot(mid, sel) + _bdot(lo, sel)


def _dot6(xs, ws):
    """bf16x6 matmul: the 6 highest-order cross products of the 3-way
    splits (the XLA HIGHEST emulation, written out)."""
    x1, x2, x3 = xs
    w1, w2, w3 = ws
    return (_bdot(x1, w1) + _bdot(x1, w2) + _bdot(x2, w1)
            + _bdot(x1, w3) + _bdot(x2, w2) + _bdot(x3, w1))


def _dot3(xs, w):
    """3-pass product against a bf16-EXACT matrix (entries {0,1,2})."""
    x1, x2, x3 = xs
    return _bdot(x1, w) + _bdot(x2, w) + _bdot(x3, w)


def _quad_bf16_kernel(xa_ref, ab_ref, w1_ref, w2_ref, w3_ref,
                      ft_ref, out_ref):
    xs = _split3(xa_ref[:])                                   # [TQ, VP] x3
    # both one-hot selections in ONE set of wide dots ([VP, 2*BQ] stacked
    # A|B): 3 passes instead of 6 narrow K=128 ones
    sel = _dot_exact_select(xs, ab_ref[:])                    # [TQ, 2*BQ]
    m2 = sel[:, :BQ] * sel[:, BQ:]                            # [TQ, BQ] f32
    ms = _split3(m2)
    wm = _dot6(ms, (w1_ref[:], w2_ref[:], w3_ref[:]))         # [TQ, BQ] f32
    e = jnp.sum(m2 * wm, axis=1, keepdims=True)               # [TQ, 1]
    z = 2.0 * m2 * wm
    g = _dot3(_split3(z), ft_ref[:])                          # [TQ, VP]
    out_ref[:] = g
    out_ref[:, _ECOL:_ECOL + 1] = e


@functools.lru_cache(maxsize=None)
def _quad_bf16_tables(name):
    """(A|B stacked one-hot [VP, 2*BQ] bf16; W 3-way split [BQ, BQ]
    bf16 x3; F^T [BQ, VP] bf16)."""
    from mbpol_openmm_plugin_tpu.ops.polyeval import (
        _quad_factor_selectors, load_quad)
    import ml_dtypes
    A, B = _quad_factor_selectors(name)     # [nv+1, b] one-hot f32
    F, W = load_quad(name)
    b, nv = F.shape
    assert nv + 1 < _ECOL and b <= BQ
    ABp = np.zeros((VP, 2 * BQ), ml_dtypes.bfloat16)
    ABp[:nv + 1, :b] = A
    ABp[:nv + 1, BQ:BQ + b] = B
    Wp = np.zeros((BQ, BQ), np.float32)
    Wp[:b, :b] = W
    w1 = Wp.astype(ml_dtypes.bfloat16)
    r = Wp - w1.astype(np.float32)
    w2 = r.astype(ml_dtypes.bfloat16)
    w3 = (r - w2.astype(np.float32)).astype(ml_dtypes.bfloat16)
    Ftp = np.zeros((BQ, VP), ml_dtypes.bfloat16)
    Ftp[:b, :nv] = F                         # entries {0,1,2}: bf16-exact
    return ABp, w1, w2, w3, Ftp


# ----------------------------------------------------------------------
# Round-4b kernel: TRANSPOSED vech outer-product basis, zero selection
# cost.
#
# polyeval.load_quad_vech establishes that the quadratic-form bases are
# the COMPLETE degree-<=2 monomial sets (528 = 32*33/2, 703 = 37*38/2),
# so in vech order the basis is a structured outer product
#
#     m2[(i,j)] = xa_i * xa_j       blocks i, j = i..Va-1
#
# In a batch-on-LANES layout (variables/basis on sublanes, TL items on
# lanes) every block is a contiguous SUBLANE slice: one sublane-broadcast
# of row i times a row block - no lane gathers, no one-hot MXU passes,
# no HBM round-trips for m2/wm. The W matvec and gradient contraction
# ride the MXU as manual bf16 passes (bf16x6 == the XLA HIGHEST
# algorithm; F entries {0,1,2} are bf16-exact so 3 passes suffice).
#
# Replaces: the 1.56 ms/step lane-gather basis build (round 3) and the
# one-hot selection dots of _quad_bf16_kernel above (round 4a).
# ----------------------------------------------------------------------

VT = 40    # padded augmented-variable sublane count (37 -> 40)
TL = 256   # batch items per tile (lane dimension)
_EROW = VT - 1   # output sublane row carrying the energy


def _vech_kernel(va, b, bp, xat_ref, w1_ref, w2_ref, w3_ref, ft_ref,
                 out_ref, m2_ref):
    # ---- basis build: structured outer product, sublane slices only ----
    m2_ref[b:, :] = jnp.zeros((bp - b, TL), jnp.float32)
    xat = xat_ref[:]                                          # [VT, TL]
    o = 0
    for i in range(va):
        li = va - i
        m2_ref[o:o + li, :] = xat[i:i + 1, :] * xat[i:va, :]
        o += li
    m2 = m2_ref[:]                                            # [BP, TL]
    ms = _split3(m2)
    # ---- W matvec (bf16x6 == XLA HIGHEST), energy, gradient ------------
    wm = (_bdot(w1_ref[:], ms[0]) + _bdot(w1_ref[:], ms[1])
          + _bdot(w2_ref[:], ms[0]) + _bdot(w1_ref[:], ms[2])
          + _bdot(w2_ref[:], ms[1]) + _bdot(w3_ref[:], ms[0]))  # [BP, TL]
    e = jnp.sum(m2 * wm, axis=0, keepdims=True)               # [1, TL]
    z = 2.0 * m2 * wm
    zs = _split3(z)
    g = (_bdot(ft_ref[:], zs[0]) + _bdot(ft_ref[:], zs[1])
         + _bdot(ft_ref[:], zs[2]))                           # [VT, TL]
    out_ref[:] = g
    out_ref[_EROW:_EROW + 1, :] = e


@functools.lru_cache(maxsize=None)
def _vech_tables(name):
    """(va, b, bp, W 3-way split [BP, BP] bf16 x3, F^T [VT, BP] bf16)
    in NATURAL vech order."""
    from mbpol_openmm_plugin_tpu.ops.polyeval import load_quad_vech
    import ml_dtypes
    F, W = load_quad_vech(name)
    # The kernel computes W @ m2 in the transposed layout where the
    # quadratic form needs W^T @ m2, and the 2*m2*wm gradient assumes the
    # same: both are only correct for SYMMETRIC W. True for the shipped
    # poly2b/poly3b tables by construction; assert so an asymmetric future
    # table fails loudly instead of silently evaluating wrong.
    if not np.array_equal(W, W.T):
        raise ValueError(f'{name}: vech kernel requires symmetric W')
    b, nv = F.shape
    va = nv + 1
    assert va < _EROW
    bp = ((b + 127) // 128) * 128
    Wp = np.zeros((bp, bp), np.float32)
    Wp[:b, :b] = W
    w1 = Wp.astype(ml_dtypes.bfloat16)
    r = Wp - w1.astype(np.float32)
    w2 = r.astype(ml_dtypes.bfloat16)
    w3 = (r - w2.astype(np.float32)).astype(ml_dtypes.bfloat16)
    Ftp = np.zeros((VT, bp), ml_dtypes.bfloat16)
    Ftp[:nv, :b] = F.T                       # entries {0,1,2}: bf16-exact
    return va, b, bp, w1, w2, w3, Ftp


def pip_vech_energy_grad_tpu(name, x, interpret=False):
    """Fused vech-basis quadratic form, transposed layout.
    x: [P, nvars] float32. Returns (e [P], g [P, nvars])."""
    va, b, bp, w1, w2, w3, Ftp = _vech_tables(name)
    p, nv = x.shape
    pp = ((p + TL - 1) // TL) * TL
    xa = jnp.pad(x, ((0, pp - p), (0, VT - nv)), constant_values=0.0)
    xa = xa.at[:, nv].set(1.0)
    xat = xa.T                                                # [VT, PP]
    out = pl.pallas_call(
        functools.partial(_vech_kernel, va, b, bp),
        out_shape=jax.ShapeDtypeStruct((VT, pp), jnp.float32),
        grid=(pp // TL,),
        in_specs=[
            pl.BlockSpec((VT, TL), lambda i: (0, i)),
            pl.BlockSpec((bp, bp), lambda i: (0, 0)),
            pl.BlockSpec((bp, bp), lambda i: (0, 0)),
            pl.BlockSpec((bp, bp), lambda i: (0, 0)),
            pl.BlockSpec((VT, bp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((VT, TL), lambda i: (0, i)),
        scratch_shapes=[pltpu.VMEM((bp, TL), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * pp * bp * (6 * bp + 3 * VT),
            transcendentals=0,
            bytes_accessed=pp * VT * 8 + 3 * bp * bp * 2),
        interpret=interpret,
    )(xat, jnp.asarray(w1), jnp.asarray(w2), jnp.asarray(w3),
      jnp.asarray(Ftp))
    e = out[_EROW, :p]
    g = out[:nv, :p].T / x
    return e, g


TQ = 512   # rows per tile for the bf16 quad kernel (VPU/MXU amortization)


def pip_quad_bf16_energy_grad_tpu(name, x, interpret=False):
    """Fused quadratic-form energy + dE/dx, manual bf16 passes.
    x: [P, nvars] float32. Returns (e [P], g [P, nvars])."""
    ABp, w1, w2, w3, Ftp = _quad_bf16_tables(name)
    p, nv = x.shape
    pp = ((p + TQ - 1) // TQ) * TQ
    # augmented variables [x, 1], zero-padded to the lane width
    xa = jnp.pad(x, ((0, pp - p), (0, VP - nv)),
                 constant_values=0.0)
    xa = xa.at[:, nv].set(1.0)
    out = pl.pallas_call(
        _quad_bf16_kernel,
        out_shape=jax.ShapeDtypeStruct((pp, VP), jnp.float32),
        grid=(pp // TQ,),
        in_specs=[
            pl.BlockSpec((TQ, VP), lambda i: (i, 0)),
            pl.BlockSpec((VP, 2 * BQ), lambda i: (0, 0)),
            pl.BlockSpec((BQ, BQ), lambda i: (0, 0)),
            pl.BlockSpec((BQ, BQ), lambda i: (0, 0)),
            pl.BlockSpec((BQ, BQ), lambda i: (0, 0)),
            pl.BlockSpec((BQ, VP), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TQ, VP), lambda i: (i, 0)),
        cost_estimate=pl.CostEstimate(
            # 6 BQxBQ passes + 3 stacked-selection + 3 gradient passes
            flops=2 * pp * BQ * (6 * BQ + 9 * VP),
            transcendentals=0,
            bytes_accessed=pp * VP * 8 + 3 * BQ * BQ * 2),
        interpret=interpret,
    )(xa, jnp.asarray(ABp), jnp.asarray(w1),
      jnp.asarray(w2), jnp.asarray(w3), jnp.asarray(Ftp))
    e = out[:p, _ECOL]
    g = out[:p, :nv] / x
    return e, g
