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
