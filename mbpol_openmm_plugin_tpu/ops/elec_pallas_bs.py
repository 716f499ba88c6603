"""Block-sparse Pallas TPU kernels for large-N PME direct-space electrostatics.

The dense kernels (ops/elec_pallas.py) visit all (i,j) site tiles - O(N^2)
compute and O(N^2) memory for the retained SCF factor matrices, viable to
~2.5k waters. Beyond that, most tiles are empty: with sites sorted into
spatial cells, only tile pairs whose bounding boxes are within the cutoff
interact. These kernels iterate over a padded ACTIVE tile-pair list via
scalar prefetch (PrefetchScalarGridSpec): the pair list is sorted row-major,
so each output row tile is visited by a consecutive run of grid steps and
accumulates in place (initialized on the run's first step, flagged in the
prefetched metadata).

Same physics as the dense kernels (reference formulas,
MBPolReferenceElectrostaticsForce.cpp:2510-2716); the per-tile pair chain is
shared (_pair_chain). Three kernels:

  K1 `_fixed_field_bs_kernel`: fixed charge field + s3/s5 SCF factor BLOCKS
     ([P, TI, TJ], only active tiles materialized - O(N) memory at fixed
     density).
  K3 `_scf_field_bs_kernel`: one SCF dipole-field evaluation
     field_i = sum_j s3_ij mu_j + s5_ij (mu_j . d_ij) d_ij over active
     blocks - the s3 term is a [TI,TJ]x[TJ,3] MXU matmul per block.
  K2 `_pair_force_bs_kernel`: direct-space energy/forces/per-site potential
     given converged dipoles.

The active-pair list enumerates BOTH (I,J) and (J,I) (symmetric), so row
accumulation sees every partner exactly like a dense row sum - no scatter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mbpol_openmm_plugin_tpu.ops.elec_pallas import (
    _NS, _Q, _X, _Y, _Z, TI, TJ, _consts, _pair_chain, _padded)

# metadata bit flags per tile pair
_VALID = 1
_FIRST_IN_ROW = 2


# ----------------------------------------------------------------------
# Active tile-pair machinery (jittable)
# ----------------------------------------------------------------------

def tile_pair_capacity(n_sites, box, cutoff, tile=TI, factor=1.3):
    """Static capacity for the symmetric active tile-pair list."""
    n_tiles = _padded(n_sites) // tile
    box = np.asarray(box, np.float64)
    vol = float(np.prod(box))
    # sites per tile occupy ~tile/density volume; treat the tile extent as a
    # cube of that volume and count neighbor tiles within cutoff + 2 extents
    density = n_sites / vol
    side = (tile / density) ** (1.0 / 3.0)
    reach = cutoff + 2.0 * side
    per = min(n_tiles, int(np.ceil(factor * (4.0 / 3.0) * np.pi * reach ** 3
                                   * density / tile)) + 3)
    return min(n_tiles * per, n_tiles * n_tiles)


def active_tile_pairs_host(pos4_sorted, n_sites, box, cutoff, npad,
                           n_devices=None):
    """Host-side (numpy) AABB replica of `active_tile_pairs`: counts the
    active tile pairs at a sorted site layout. Returns (n_active,
    per_device, act) where per_device is the row-slab active-pair count for
    each of n_devices (None -> [n_active]) and act is the [T, T] boolean
    activity matrix. Used by tune_capacities for capacity planning and by
    the occupancy tests to assert every device owns real work."""
    box = np.asarray(box, np.float64)
    p = np.zeros((npad, 3))
    p[:n_sites] = pos4_sorted - np.floor(pos4_sorted / box) * box
    T = npad // TI
    p3 = p.reshape(T, TI, 3)
    valid = (np.arange(npad) < n_sites).reshape(T, TI, 1)
    mins = np.min(np.where(valid, p3, 1e30), axis=1)
    maxs = np.max(np.where(valid, p3, -1e30), axis=1)
    c = 0.5 * (mins + maxs)
    h = 0.5 * (maxs - mins)
    dc = c[None] - c[:, None]
    dc = dc - np.floor(dc / box + 0.5) * box
    gap = np.abs(dc) - (h[None] + h[:, None])
    has = valid[:, :, 0].any(axis=1)
    act = np.all(gap <= cutoff, axis=-1) & has[:, None] & has[None, :]
    n_act = int(act.sum())
    if n_devices is None:
        return n_act, [n_act], act
    ntl = T // n_devices
    per_dev = [int(act[d * ntl:(d + 1) * ntl].sum())
               for d in range(n_devices)]
    return n_act, per_dev, act


def _tile_aabbs(positions, n_sites, box, tile):
    """Per-tile wrapped-coordinate AABBs: (center [T,3], half [T,3],
    has_sites [T])."""
    np_ = positions.shape[0]
    n_tiles = np_ // tile
    dtype = positions.dtype
    b = jnp.asarray(box, dtype)
    valid_site = (jnp.arange(np_) < n_sites)[:, None]
    big = jnp.asarray(1e30, dtype)
    p3 = positions.reshape(n_tiles, tile, 3)
    v3 = valid_site.reshape(n_tiles, tile, 1)
    # wrap sites into the primary box before taking bounds (AABB in wrapped
    # coordinates; the per-axis gap below is computed minimum-image)
    p3 = p3 - jnp.floor(p3 / b) * b
    mins = jnp.min(jnp.where(v3, p3, big), axis=1)            # [T,3]
    maxs = jnp.max(jnp.where(v3, p3, -big), axis=1)
    center = 0.5 * (mins + maxs)
    half = 0.5 * (maxs - mins)
    has_sites = jnp.any(v3[:, :, 0], axis=1)
    return center, half, has_sites


def active_tile_pairs_rows(positions, n_sites, box, cutoff, capacity,
                           row_lo, n_row_tiles, tile=TI):
    """Active tile pairs for a contiguous row-tile slice.

    Like `active_tile_pairs` but only for row tiles
    [row_lo, row_lo + n_row_tiles) (row_lo may be traced, e.g. the shard
    offset under shard_map); returned `ti` is LOCAL (0..n_row_tiles-1).
    `tj` stays global. Columns always span all tiles, so a row's full
    partner set lives in one slice - row accumulation needs no collective.
    """
    np_ = positions.shape[0]
    n_tiles = np_ // tile
    dtype = positions.dtype
    b = jnp.asarray(box, dtype)
    center, half, has_sites = _tile_aabbs(positions, n_sites, box, tile)
    c_l = jax.lax.dynamic_slice_in_dim(center, row_lo, n_row_tiles, axis=0)
    h_l = jax.lax.dynamic_slice_in_dim(half, row_lo, n_row_tiles, axis=0)
    has_l = jax.lax.dynamic_slice_in_dim(has_sites, row_lo, n_row_tiles, 0)

    dc = center[None, :, :] - c_l[:, None, :]                 # [ntl, T, 3]
    dc = dc - jnp.floor(dc / b + 0.5) * b
    gap = jnp.abs(dc) - (h_l[:, None, :] + half[None, :, :])
    act = jnp.all(gap <= cutoff, axis=-1)
    act = act & has_l[:, None] & has_sites[None, :]

    flat = act.reshape(-1)
    sel = jnp.nonzero(flat, size=capacity, fill_value=0)[0]   # row-major
    n_act = jnp.sum(flat)
    valid = jnp.arange(capacity) < n_act
    ti = (sel // n_tiles).astype(jnp.int32)
    tj = (sel % n_tiles).astype(jnp.int32)
    # padded entries: park on the last local row tile; their contribution is
    # masked to 0. If the parked entry happens to START that row (the tile is
    # all padding, so its diagonal pair is inactive), the FIRST flag below
    # zero-initializes a padding-rows-only output block - harmless.
    ti = jnp.where(valid, ti, n_row_tiles - 1)
    tj = jnp.where(valid, tj, n_tiles - 1)
    first = jnp.concatenate([jnp.ones((1,), bool),
                             ti[1:] != ti[:-1]])
    # first-in-row computed over the FINAL ti sequence (incl. parked padding)
    meta = (valid.astype(jnp.int32) * _VALID
            + first.astype(jnp.int32) * _FIRST_IN_ROW)
    return ti, tj, meta, n_act


def active_tile_pairs(positions, n_sites, box, cutoff, capacity, tile=TI):
    """Padded row-major list of active tile pairs from per-tile AABBs.

    positions: [np_, 3] (sites sorted spatially; rows >= n_sites are padding).
    Returns (ti [cap] int32, tj [cap] int32, meta [cap] int32 bitflags,
    n_active). Conservative superset: a pair is active when the per-axis
    minimum-image AABB gap is <= cutoff on every axis.
    """
    n_tiles = positions.shape[0] // tile
    return active_tile_pairs_rows(positions, n_sites, box, cutoff, capacity,
                                  0, n_tiles, tile=tile)


# ----------------------------------------------------------------------
# Kernels
# ----------------------------------------------------------------------

def _fixed_field_bs_kernel(consts, n_sites, ti_ref, tj_ref, meta_ref,
                           srow_ref, scol_ref, ef_ref, s3_ref, s5_ref):
    p = pl.program_id(0)
    meta = meta_ref[p]
    v = ((meta & _VALID) > 0).astype(srow_ref.dtype)

    @pl.when((meta & _FIRST_IN_ROW) > 0)
    def _():
        ef_ref[:] = jnp.zeros_like(ef_ref)

    srow = srow_ref[:]
    scol = scol_ref[:]
    t = _pair_chain(srow, scol, n_sites, consts)

    s3_ref[0] = v * ((1.0 - t['s_dd3']) * t['rr3c'] - t['bn1'])
    s5_ref[0] = v * (t['bn2'] - (1.0 - t['s_dd5']) * t['rr5c'])

    # cross-water damping sign FIXED vs the reference (see models/pme.py)
    s3cc_eff = jnp.where(t['same_mol'], 0.0, t['s_cc3'])
    kdir = (t['bn1'] - (1.0 - s3cc_eff) * t['rr3c']) * t['w'] * v
    qj = scol[_Q:_Q + 1, :]
    kq = kdir * qj
    ef_ref[:, 0:1] -= jnp.sum(kq * t['dx'], axis=1, keepdims=True)
    ef_ref[:, 1:2] -= jnp.sum(kq * t['dy'], axis=1, keepdims=True)
    ef_ref[:, 2:3] -= jnp.sum(kq * t['dz'], axis=1, keepdims=True)


def _scf_field_bs_kernel(consts, ti_ref, tj_ref, meta_ref, srow_ref, scol_ref,
                         mcol_ref, s3_ref, s5_ref, f_ref):
    """field rows += s3_blk @ mu_cols + (s5_blk * (mu_j.d_ij)) row-contracted
    with d_ij. Recomputes only the (cheap, transcendental-free) deltas."""
    p = pl.program_id(0)
    meta = meta_ref[p]

    @pl.when((meta & _FIRST_IN_ROW) > 0)
    def _():
        f_ref[:] = jnp.zeros_like(f_ref)

    (alpha, cutoff2, g_cc, g_cd, g_dd, g_ddoh, g_ddhh, bx, by, bz) = consts
    srow = srow_ref[:]
    scol = scol_ref[:]
    xi, yi, zi = srow[:, _X:_X + 1], srow[:, _Y:_Y + 1], srow[:, _Z:_Z + 1]
    xj, yj, zj = scol[_X:_X + 1, :], scol[_Y:_Y + 1, :], scol[_Z:_Z + 1, :]
    dx = xj - xi
    dy = yj - yi
    dz = zj - zi
    dx = dx - jnp.floor(dx / bx + 0.5) * bx
    dy = dy - jnp.floor(dy / by + 0.5) * by
    dz = dz - jnp.floor(dz / bz + 0.5) * bz

    s3 = s3_ref[0]
    s5 = s5_ref[0]
    mcol = mcol_ref[:]                     # [8, TJ]; rows 0..2 are mu
    mxj, myj, mzj = mcol[0:1, :], mcol[1:2, :], mcol[2:3, :]
    proj = mxj * dx + myj * dy + mzj * dz
    s5p = s5 * proj

    # s3 term on the MXU: [TI,TJ] x [TJ,8] (mu in cols 0..2 of the packed
    # transpose layout)
    mt = mcol.T                            # [TJ, 8]
    f_ref[:, 0:3] += jnp.dot(s3, mt[:, 0:3],
                             preferred_element_type=s3.dtype)
    f_ref[:, 0:1] += jnp.sum(s5p * dx, axis=1, keepdims=True)
    f_ref[:, 1:2] += jnp.sum(s5p * dy, axis=1, keepdims=True)
    f_ref[:, 2:3] += jnp.sum(s5p * dz, axis=1, keepdims=True)


def _pair_force_bs_kernel(consts, n_sites, ti_ref, tj_ref, meta_ref,
                          srow_ref, scol_ref, mrow_ref, mcol_ref, out_ref):
    """Block-sparse variant of elec_pallas._pair_force_kernel.

    out cols: 0..2 force, 3 potential, 4 e_pair row sum."""
    p = pl.program_id(0)
    meta = meta_ref[p]
    v = ((meta & _VALID) > 0).astype(srow_ref.dtype)

    @pl.when((meta & _FIRST_IN_ROW) > 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    srow = srow_ref[:]
    scol = scol_ref[:]
    t = _pair_chain(srow, scol, n_sites, consts, need_cc1=True)
    w = t['w'] * v

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

    e_pair = (t['bn0'] - t['rr1c'] * (1.0 - s1cc_e)) * qq \
        + 0.5 * (t['bn1'] - t['rr3c'] * (1.0 - s3cd_e)) * gli1
    out_ref[:, 4:5] += 0.5 * jnp.sum(e_pair * w, axis=1, keepdims=True)

    coeff = (t['bn1'] - (1.0 - s3cc_f) * t['rr3c']) * qq \
        + (t['bn2'] - t['rr5c'] * (1.0 - s5cd_f)) * gli1 \
        + (t['bn2'] - t['rr5c'] * (1.0 - t['s_dd5'])) * mumu \
        - (t['bn3'] - t['rr7c'] * (1.0 - t['s_dd7'])) * (dot_i * dot_j)
    coeff = coeff * w
    fx = jnp.sum(coeff * dx, axis=1, keepdims=True)
    fy = jnp.sum(coeff * dy, axis=1, keepdims=True)
    fz = jnp.sum(coeff * dz, axis=1, keepdims=True)

    w5 = (t['bn2'] - t['rr5c'] * (1.0 - t['s_dd5'])) * w
    s5dj = jnp.sum(w5 * dot_j, axis=1, keepdims=True)
    w5di = w5 * dot_i
    fx = fx + mxi * s5dj + jnp.sum(w5di * mxj, axis=1, keepdims=True)
    fy = fy + myi * s5dj + jnp.sum(w5di * myj, axis=1, keepdims=True)
    fz = fz + mzi * s5dj + jnp.sum(w5di * mzj, axis=1, keepdims=True)

    w3 = (t['bn1'] - t['rr3c'] * (1.0 - s3cd_e)) * w
    w3q = jnp.sum(w3 * qj, axis=1, keepdims=True)
    fx = fx + qi * jnp.sum(w3 * mxj, axis=1, keepdims=True) - mxi * w3q
    fy = fy + qi * jnp.sum(w3 * myj, axis=1, keepdims=True) - myi * w3q
    fz = fz + qi * jnp.sum(w3 * mzj, axis=1, keepdims=True) - mzi * w3q

    out_ref[:, 0:1] += fx
    out_ref[:, 1:2] += fy
    out_ref[:, 2:3] += fz

    k1 = (t['bn0'] - t['rr1c'] * (1.0 - s1cc_e)) * w
    out_ref[:, 3:4] += (jnp.sum(k1 * qj, axis=1, keepdims=True)
                        - jnp.sum(w3 * dot_j, axis=1, keepdims=True))


# ----------------------------------------------------------------------
# Host-side wrappers
# ----------------------------------------------------------------------

def _grid_spec(cap, in_specs, out_specs):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(cap,),
        in_specs=in_specs, out_specs=out_specs)


def _k1_call(setup, thole, srow, scol, n_sites, ti, tj, meta, interpret):
    """Raw K1 over one row slice: (ef rows [rows, _NS], s3/s5 [cap,TI,TJ]).

    srow: [rows, _NS] row-side slice (ti indexes blocks of it); scol:
    [_NS, cols] FULL column side (tj indexes blocks of it)."""
    rows = srow.shape[0]
    cap = ti.shape[0]
    consts = _consts(setup, thole)
    kern = functools.partial(_fixed_field_bs_kernel, consts, n_sites)
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((rows, _NS), srow.dtype),
                   jax.ShapeDtypeStruct((cap, TI, TJ), srow.dtype),
                   jax.ShapeDtypeStruct((cap, TI, TJ), srow.dtype)],
        grid_spec=_grid_spec(cap, [
            pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0)),
            pl.BlockSpec((_NS, TJ), lambda p, ti, tj, meta: (0, tj[p])),
        ], [
            pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0)),
            pl.BlockSpec((1, TI, TJ), lambda p, ti, tj, meta: (p, 0, 0)),
            pl.BlockSpec((1, TI, TJ), lambda p, ti, tj, meta: (p, 0, 0)),
        ]),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=300 * cap * TI * TJ, transcendentals=8 * cap * TI * TJ,
            bytes_accessed=2 * cap * TI * TJ * 4),
    )(ti, tj, meta, srow, scol)


def fixed_field_and_scf_blocks(setup, thole, srow, n_sites, ti, tj, meta,
                               interpret=False):
    """K1: (efield [n,3], s3 blocks [P,TI,TJ], s5 blocks [P,TI,TJ])."""
    ef, s3, s5 = _k1_call(setup, thole, srow, srow.T, n_sites, ti, tj, meta,
                          interpret)
    return ef[:n_sites, :3], s3, s5


def _k3_call(setup, thole, srow, scol, s3, s5, mcol, ti, tj, meta, interpret):
    """Raw K3 over one row slice: dipole-field rows [rows, _NS]."""
    rows = srow.shape[0]
    cap = ti.shape[0]
    consts = _consts(setup, thole)
    kern = functools.partial(_scf_field_bs_kernel, consts)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, _NS), srow.dtype),
        grid_spec=_grid_spec(cap, [
            pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0)),
            pl.BlockSpec((_NS, TJ), lambda p, ti, tj, meta: (0, tj[p])),
            pl.BlockSpec((_NS, TJ), lambda p, ti, tj, meta: (0, tj[p])),
            pl.BlockSpec((1, TI, TJ), lambda p, ti, tj, meta: (p, 0, 0)),
            pl.BlockSpec((1, TI, TJ), lambda p, ti, tj, meta: (p, 0, 0)),
        ], pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cap * TI * TJ * 3 + 10 * cap * TI * TJ,
            transcendentals=0,
            bytes_accessed=2 * cap * TI * TJ * 4),
    )(ti, tj, meta, srow, scol, mcol, s3, s5)


def scf_dipole_field_bs(setup, thole, srow, s3, s5, mu_packed, ti, tj, meta,
                        n_sites, interpret=False):
    """K3: dipole field [n,3] from the stored SCF factor blocks.

    mu_packed: [np_, 8] with mu in cols 0..2 (rows >= n_sites zero)."""
    f = _k3_call(setup, thole, srow, srow.T, s3, s5, mu_packed.T,
                 ti, tj, meta, interpret)
    return f[:n_sites, :3]


def _k2_call(setup, thole, srow, scol, mrow, mcol, n_sites, ti, tj, meta,
             interpret):
    """Raw K2 over one row slice: out rows [rows, _NS]
    (cols 0..2 force, 3 potential, 4 e_pair row sum)."""
    rows = srow.shape[0]
    cap = ti.shape[0]
    consts = _consts(setup, thole)
    kern = functools.partial(_pair_force_bs_kernel, consts, n_sites)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, _NS), srow.dtype),
        grid_spec=_grid_spec(cap, [
            pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0)),
            pl.BlockSpec((_NS, TJ), lambda p, ti, tj, meta: (0, tj[p])),
            pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0)),
            pl.BlockSpec((_NS, TJ), lambda p, ti, tj, meta: (0, tj[p])),
        ], pl.BlockSpec((TI, _NS), lambda p, ti, tj, meta: (ti[p], 0))),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=400 * cap * TI * TJ, transcendentals=8 * cap * TI * TJ,
            bytes_accessed=2 * cap * TI * TJ * 4),
    )(ti, tj, meta, srow, scol, mrow, mcol)


def direct_energy_force_pot_bs(setup, thole, srow, mu, n_sites, ti, tj, meta,
                               interpret=False):
    """K2: (e_direct scalar, force [n,3], pot [n])."""
    np_ = srow.shape[0]
    mrow = jnp.zeros((np_, _NS), srow.dtype).at[:n_sites, :3].set(mu)
    out = _k2_call(setup, thole, srow, srow.T, mrow, mrow.T, n_sites,
                   ti, tj, meta, interpret)
    e = jnp.sum(out[:n_sites, 4])
    force = out[:n_sites, :3]
    pot = out[:n_sites, 3]
    return e, force, pot


# ----------------------------------------------------------------------
# Sharded wrappers (device mesh): row tiles split over the 'dp' axis
# ----------------------------------------------------------------------
# Each device owns a contiguous slice of row tiles and a LOCAL active
# tile-pair list for those rows (columns span all tiles, so a row's full
# partner set is device-local and accumulation needs no collective). With
# the serpentine spatial sort, contiguous row ranges are spatial slabs, so
# local pair counts stay balanced. Role analog of the CUDA interacting-tile
# decomposition (CudaMBPolKernels.cpp:278-304), with row-tile blocks split
# across chips over ICI instead of SMs. XLA inserts the collectives: the
# replicated column/mu operands are all-gathered in, the row-sharded
# outputs gathered where the caller slices them.

def _mesh_rows(mesh, np_):
    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    assert np_ % (TI * ndev) == 0, (np_, ndev)
    return P, axis, ndev, np_ // ndev


def active_tile_pairs_sharded(positions, n_sites, box, cutoff, cap_local,
                              mesh, tile=TI):
    """Per-device local active tile-pair lists under the mesh.

    positions: [np_, 3] padded to a multiple of TI * n_devices (sites
    sorted spatially). Returns (ti [ndev*cap_local] with LOCAL row-tile
    indices, tj [ndev*cap_local] global, meta, n_act [ndev]) - the first
    three sharded over 'dp' so each device holds exactly its slice.
    """
    P, axis, ndev, local_rows = _mesh_rows(mesh, positions.shape[0])
    ntl = local_rows // tile

    def f(pos_full):
        d = jax.lax.axis_index(axis)
        ti, tj, meta, n_act = active_tile_pairs_rows(
            pos_full, n_sites, box, cutoff, cap_local, d * ntl, ntl,
            tile=tile)
        return ti, tj, meta, n_act[None]

    return jax.shard_map(
        f, mesh=mesh, in_specs=P(None, None),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False)(positions)


def fixed_field_and_scf_blocks_sharded(setup, thole, srow, n_sites,
                                       ti, tj, meta, mesh, interpret=False):
    """K1 under the mesh: (efield [n,3], s3/s5 blocks [ndev*cap_l,TI,TJ]
    sharded on dim 0). ti/tj/meta from active_tile_pairs_sharded."""
    P, axis, ndev, local_rows = _mesh_rows(mesh, srow.shape[0])

    def f(srow_l, scol, ti_l, tj_l, meta_l):
        return _k1_call(setup, thole, srow_l, scol, n_sites,
                        ti_l, tj_l, meta_l, interpret)

    ef, s3, s5 = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(axis), P(axis), P(axis)),
        out_specs=(P(axis, None), P(axis, None, None), P(axis, None, None)),
        check_vma=False)(srow, srow.T, ti, tj, meta)
    return ef[:n_sites, :3], s3, s5


def scf_dipole_field_bs_sharded(setup, thole, srow, s3, s5, mu_packed,
                                ti, tj, meta, n_sites, mesh, interpret=False):
    """K3 under the mesh: dipole field [n,3]. mu_packed is replicated
    [np_, _NS] (the whole dipole vector is tiny; each device reads all of
    it as the column side)."""
    P, axis, ndev, local_rows = _mesh_rows(mesh, srow.shape[0])

    def f(srow_l, scol, mcol, s3_l, s5_l, ti_l, tj_l, meta_l):
        return _k3_call(setup, thole, srow_l, scol, s3_l, s5_l, mcol,
                        ti_l, tj_l, meta_l, interpret)

    fout = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(None, None),
                  P(axis, None, None), P(axis, None, None),
                  P(axis), P(axis), P(axis)),
        out_specs=P(axis, None),
        check_vma=False)(srow, srow.T, mu_packed.T, s3, s5, ti, tj, meta)
    return fout[:n_sites, :3]


def direct_energy_force_pot_bs_sharded(setup, thole, srow, mu, n_sites,
                                       ti, tj, meta, mesh, interpret=False):
    """K2 under the mesh: (e_direct scalar, force [n,3], pot [n])."""
    np_ = srow.shape[0]
    P, axis, ndev, local_rows = _mesh_rows(mesh, np_)
    mrow = jnp.zeros((np_, _NS), srow.dtype).at[:n_sites, :3].set(mu)

    def f(srow_l, scol, mrow_l, mcol, ti_l, tj_l, meta_l):
        return _k2_call(setup, thole, srow_l, scol, mrow_l, mcol, n_sites,
                        ti_l, tj_l, meta_l, interpret)

    out = jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(axis, None), P(None, None), P(axis, None), P(None, None),
                  P(axis), P(axis), P(axis)),
        out_specs=P(axis, None),
        check_vma=False)(srow, srow.T, mrow, mrow.T, ti, tj, meta)
    e = jnp.sum(out[:n_sites, 4])
    force = out[:n_sites, :3]
    pot = out[:n_sites, 3]
    return e, force, pot


# ----------------------------------------------------------------------
# Spatial sort
# ----------------------------------------------------------------------

def molecule_sort_permutation(o_positions, box, mols_per_tile=TI // 4):
    """Static serpentine cell-major molecule permutation (numpy, computed
    once at setup). Cells are sized to hold ~one tile's worth of molecules
    and walked boustrophedon (direction alternates per row/plane), so a
    tile that straddles a cell boundary spans two ADJACENT cells instead of
    wrapping across the box - keeping tile AABBs compact is what creates
    inactive tile pairs. Correctness never depends on the sort; tile AABBs
    are recomputed per call."""
    o = np.asarray(o_positions, np.float64)
    b = np.asarray(box, np.float64)
    o = o - np.floor(o / b) * b
    n = len(o)
    density = n / float(np.prod(b))
    cell = (mols_per_tile / density) ** (1.0 / 3.0)
    ncell = np.maximum(np.round(b / cell).astype(int), 1)
    ci = np.minimum((o / (b / ncell)).astype(int), ncell - 1)
    cx, cy, cz = ci[:, 0], ci[:, 1], ci[:, 2]
    # serpentine: flip y within odd x-planes, flip z within odd y-rows
    cy_s = np.where(cx % 2 == 1, ncell[1] - 1 - cy, cy)
    cz_s = np.where(cy_s % 2 == 1, ncell[2] - 1 - cz, cz)
    key = (cx * ncell[1] + cy_s) * ncell[2] + cz_s
    return np.argsort(key, kind='stable')
