#!/usr/bin/env python
"""Does an eigenbasis rotation of the PIP quadratic form tame the bf16x3
cancellation error?

The W matvec currently must run at HIGHEST (6-pass bf16 ~ exact f32
products): at HIGH (3-pass, ~2^-16 relative per product) the canceling
coefficients (|W| up to ~1e5, energies ~kcal) lose ~46 kcal/mol on water256.
Candidate fix: W = Q diag(lam) Q^T, E = sum_k lam_k (Q^T m2)_k^2. The inner
products v = m2 @ Q have orthonormal columns (no large coefficients), so the
bf16x3 product error may shrink from 2^-16 * sum|m2_a W_ab m2_b| to
2^-16 * |lam| |v| scale. This script measures both on REAL triplet variables
from the water256 fixture (random x does not expose the cancellation).

Run on CPU: python tools/precision_experiment.py
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402

import ml_dtypes  # noqa: E402


def bf16_split(a, terms=2):
    """Split float64 array into `terms` bf16-representable f64 values + rest."""
    parts = []
    rest = a.copy()
    for _ in range(terms):
        p = rest.astype(ml_dtypes.bfloat16).astype(np.float64)
        parts.append(p)
        rest = rest - p
    return parts, rest


def matmul_bf16x3(a, b):
    """Simulate XLA HIGH precision (bf16x3): a,b are f32-rounded inputs;
    products hi*hi + hi*lo + lo*hi, f32-ish accumulation (we use f64 acc:
    MXU accumulates f32 but accumulation error is secondary here)."""
    (a1, a2), _ = bf16_split(a.astype(np.float32).astype(np.float64))
    (b1, b2), _ = bf16_split(b.astype(np.float32).astype(np.float64))
    return a1 @ b1 + a1 @ b2 + a2 @ b1


def matmul_f32(a, b):
    """Simulate HIGHEST: exact f32 products, f64 accumulation."""
    return a.astype(np.float32).astype(np.float64) @ b.astype(np.float32).astype(np.float64)


def real_triplet_vars(n_max=4096):
    """Polynomial variables x [P, 36] for actual water256 triplets."""
    from mbpol_openmm_plugin_tpu.models import three_body as TB
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites, water_positions
    from mbpol_openmm_plugin_tpu.utils import units

    fix = np.load(os.path.join(REPO, 'tests', 'fixtures',
                               'water256_integration_test.npz'))
    box = [19.3996888399961804 / 10.0] * 3
    sys_ = System.waters(256, box=box)
    pos = compute_virtual_sites(sys_, jnp.asarray(fix['positions']))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-3, max_iterations=50))
    pot.tune_capacities(np.asarray(pos))
    (pl, tl), _ = pot.build_neighbor_lists(pos)
    trip, mask = tl[0], tl[1]
    print('triplets: cap=%d real=%d' % (len(trip), int(np.sum(mask))))

    wpos = water_positions(sys_, pos) * units.NM_TO_ANGSTROM
    wflat = np.asarray(wpos).reshape(-1, 9)
    t = np.asarray(trip)
    pa = wflat[t[:, 0]].reshape(-1, 3, 3)
    pb = wflat[t[:, 1]].reshape(-1, 3, 3)
    pc = wflat[t[:, 2]].reshape(-1, 3, 3)
    boxA = np.asarray(box) * units.NM_TO_ANGSTROM
    pa, pb, pc = TB._image_triplet(jnp.asarray(pa), jnp.asarray(pb),
                                   jnp.asarray(pc), jnp.asarray(boxA))

    # recompute the 36 vars exactly as the model does, on f64
    import inspect
    src_fn = TB.three_body_energy_triplets
    # call through the model to get x: replicate the var stack
    c = TB._consts()
    oa, ha1, ha2 = pa[:, 0], pa[:, 1], pa[:, 2]
    ob, hb1, hb2 = pb[:, 0], pb[:, 1], pb[:, 2]
    oc, hc1, hc2 = pc[:, 0], pc[:, 1], pc[:, 2]

    def var(k, d0, p1, p2):
        return np.exp(-k * (np.linalg.norm(np.asarray(p1 - p2), axis=-1) - d0))

    kHHi, dHHi = c['kHH_intra'], c['dHH_intra']
    kOHi, dOHi = c['kOH_intra'], c['dOH_intra']
    kHH, dHH = c['kHH'], c['dHH']
    kOH, dOH = c['kOH'], c['dOH']
    kOO, dOO = c['kOO'], c['dOO']
    x = np.stack([
        var(kHHi, dHHi, ha1, ha2), var(kHHi, dHHi, hb1, hb2), var(kHHi, dHHi, hc1, hc2),
        var(kOHi, dOHi, oa, ha1), var(kOHi, dOHi, oa, ha2),
        var(kOHi, dOHi, ob, hb1), var(kOHi, dOHi, ob, hb2),
        var(kOHi, dOHi, oc, hc1), var(kOHi, dOHi, oc, hc2),
        var(kHH, dHH, ha1, hb1), var(kHH, dHH, ha1, hb2),
        var(kHH, dHH, ha1, hc1), var(kHH, dHH, ha1, hc2),
        var(kHH, dHH, ha2, hb1), var(kHH, dHH, ha2, hb2),
        var(kHH, dHH, ha2, hc1), var(kHH, dHH, ha2, hc2),
        var(kHH, dHH, hb1, hc1), var(kHH, dHH, hb1, hc2),
        var(kHH, dHH, hb2, hc1), var(kHH, dHH, hb2, hc2),
        var(kOH, dOH, oa, hb1), var(kOH, dOH, oa, hb2),
        var(kOH, dOH, oa, hc1), var(kOH, dOH, oa, hc2),
        var(kOH, dOH, ob, ha1), var(kOH, dOH, ob, ha2),
        var(kOH, dOH, ob, hc1), var(kOH, dOH, ob, hc2),
        var(kOH, dOH, oc, ha1), var(kOH, dOH, oc, ha2),
        var(kOH, dOH, oc, hb1), var(kOH, dOH, oc, hb2),
        var(kOO, dOO, oa, ob), var(kOO, dOO, oa, oc), var(kOO, dOO, ob, oc),
    ], axis=-1)
    mask = np.asarray(mask)
    # switch weights: real contribution weight per triplet
    from mbpol_openmm_plugin_tpu.models.two_body import f_switch
    rab = np.linalg.norm(np.asarray(oa - ob), axis=-1)
    rac = np.linalg.norm(np.asarray(oa - oc), axis=-1)
    rbc = np.linalg.norm(np.asarray(ob - oc), axis=-1)
    sab = np.asarray(f_switch(jnp.asarray(rab), c['r3i'], c['r3f']))
    sac = np.asarray(f_switch(jnp.asarray(rac), c['r3i'], c['r3f']))
    sbc = np.asarray(f_switch(jnp.asarray(rbc), c['r3i'], c['r3f']))
    s = sab * sac + sab * sbc + sac * sbc
    active = mask & (rab > 2) & (rac > 2) & (rbc > 2)
    return x[active], s[active]


def main():
    from mbpol_openmm_plugin_tpu.ops.polyeval import load_quad
    F, W = load_quad('poly3b')
    Ff = F.astype(np.float64)

    x, s = real_triplet_vars()
    P = len(x)
    print('active triplets:', P)

    m2_64 = np.exp(np.log(x) @ Ff.T)
    e_ref = np.sum((m2_64 @ W) * m2_64, axis=1)       # f64 ground truth
    tot_ref = float(np.sum(s * e_ref))
    print('f64 total 3b energy (kcal/mol): %.6f' % tot_ref)

    # current: basis at f32, W matvec HIGHEST (f32 products)
    m2 = m2_64.astype(np.float32).astype(np.float64)
    e_hi = np.sum(matmul_f32(m2, W) * m2, axis=1)
    print('HIGHEST  : total err %+.4f  max|pertriplet| %.5f'
          % (np.sum(s * (e_hi - e_ref)), np.max(np.abs(e_hi - e_ref))))

    # W matvec at HIGH (bf16x3)
    e_h = np.sum(matmul_bf16x3(m2, W) * m2, axis=1)
    print('HIGH     : total err %+.4f  max|pertriplet| %.5f'
          % (np.sum(s * (e_h - e_ref)), np.max(np.abs(e_h - e_ref))))

    # eigenbasis: E = sum lam_k (m2 @ Q)_k^2
    lam, Q = np.linalg.eigh(W)
    print('eig: |lam| range %.2e..%.2e' % (np.min(np.abs(lam)), np.max(np.abs(lam))))
    v64 = m2_64 @ Q
    e_eig64 = np.sum(lam * v64 * v64, axis=1)
    print('eig f64 consistency err: %.2e' % np.max(np.abs(e_eig64 - e_ref)))

    # v at HIGH, squares+weights at f64 (they are elementwise VPU f32 ops)
    v_h = matmul_bf16x3(m2, Q)
    e_eig_h = np.sum(lam * v_h * v_h, axis=1)
    print('EIG/HIGH : total err %+.4f  max|pertriplet| %.5f'
          % (np.sum(s * (e_eig_h - e_ref)), np.max(np.abs(e_eig_h - e_ref))))

    # v at DEFAULT (plain bf16 single pass)
    (a1,), _ = bf16_split(m2.astype(np.float32).astype(np.float64), terms=1)
    (q1,), _ = bf16_split(Q.astype(np.float32).astype(np.float64), terms=1)
    v_b = a1 @ q1
    e_eig_b = np.sum(lam * v_b * v_b, axis=1)
    print('EIG/BF16 : total err %+.4f  max|pertriplet| %.5f'
          % (np.sum(s * (e_eig_b - e_ref)), np.max(np.abs(e_eig_b - e_ref))))

    # gradient path check for eig form at HIGH:
    # dE/dm2 = 2 Q (lam * v); error vs f64
    g_ref = 2.0 * (lam * v64) @ Q.T
    g_h = 2.0 * matmul_bf16x3(lam.astype(np.float32) * v_h, Q.T)
    rel = np.max(np.abs(g_h - g_ref)) / (np.max(np.abs(g_ref)) + 1e-30)
    print('EIG/HIGH grad: max abs err %.3e (rel %.2e)'
          % (np.max(np.abs(g_h - g_ref)), rel))
    g_cur = 2.0 * matmul_f32(matmul_f32(m2, W), np.eye(len(W)))  # = HIGHEST matvec
    rel_cur = np.max(np.abs(g_cur @ np.eye(len(W)) - (2.0 * (m2_64 @ W)))) / (np.max(np.abs(g_ref)) + 1e-30)
    print('(current HIGHEST dE/dm2 rel err: %.2e)' % rel_cur)


if __name__ == '__main__':
    main()
