#!/usr/bin/env python
"""Low-rank truncation curve of the PIP quadratic-form W on real water256
triplet/pair variables: error vs kept eigen-rank r. If r << B/2 suffices at
the HIGHEST-precision error floor (~0.01 kcal/mol per triplet), the eigen
form (2 matmuls of B x r) beats the dense W matvec (B x B, e+g shared)
whenever r < B/2, at full accuracy.

python tools/rank_experiment.py
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

from precision_experiment import matmul_f32, real_triplet_vars  # noqa: E402


def curve(name, x, s, F, W):
    Ff = F.astype(np.float64)
    m2_64 = np.exp(np.log(x) @ Ff.T)
    e_ref = np.sum((m2_64 @ W) * m2_64, axis=1)
    m2 = m2_64.astype(np.float32).astype(np.float64)
    e_highest = np.sum(matmul_f32(m2, W) * m2, axis=1)
    floor_tot = abs(np.sum(s * (e_highest - e_ref)))
    floor_max = np.max(np.abs(e_highest - e_ref))
    print('%s: B=%d  HIGHEST floor: total %.4f  max %.5f'
          % (name, len(W), floor_tot, floor_max))

    lam, Q = np.linalg.eigh(W)
    o = np.argsort(-np.abs(lam))
    lam, Q = lam[o], Q[:, o]
    print('  |lam| deciles:', np.percentile(np.abs(lam), [50, 75, 90, 99]).round(6))
    for r in [64, 128, 192, 256, 320, 384, 448, 512, len(W)]:
        r = min(r, len(W))
        Qr, lr = Q[:, :r], lam[:r]
        v = matmul_f32(m2, Qr)
        e_r = np.sum(lr * v * v, axis=1)
        tot = np.sum(s * (e_r - e_ref))
        mx = np.max(np.abs(e_r - e_ref))
        # grad check: dE/dm2 = 2 Q (lam v) vs full
        g_ref = 2.0 * (m2_64 @ W)
        g_r = 2.0 * matmul_f32(lr * v, Qr.T)
        gerr = np.max(np.abs(g_r - g_ref))
        print('  r=%4d  total err %+9.4f  max|triplet| %8.5f  max|dE/dm2| %8.4f'
              % (r, tot, mx, gerr))


def pair_vars(n_max=8192):
    """Two-body variables from the water256 fixture pairs."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.models import two_body as TWB
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
    pairs, pmask = np.asarray(pl[0]), np.asarray(pl[1])
    pairs = pairs[pmask]
    wpos = np.asarray(water_positions(sys_, pos)) * units.NM_TO_ANGSTROM
    pa = jnp.asarray(wpos[pairs[:, 0]])
    pb = jnp.asarray(wpos[pairs[:, 1]])
    boxA = jnp.asarray(np.asarray(box) * units.NM_TO_ANGSTROM)
    pa, pb = TWB.image_monomer_pair(pa, pb, boxA) \
        if hasattr(TWB, 'image_monomer_pair') else (pa, pb)
    c = TWB._consts()
    oa, ha1, ha2 = pa[:, 0], pa[:, 1], pa[:, 2]
    ob, hb1, hb2 = pb[:, 0], pb[:, 1], pb[:, 2]
    roo = np.asarray(TWB._safe_norm(oa - ob))
    # capture x by monkey-patching pip_apply input
    captured = {}
    import mbpol_openmm_plugin_tpu.ops.polyeval as PE
    orig = PE.pip_apply.__wrapped__('poly2b') if False else None
    from mbpol_openmm_plugin_tpu.models import two_body as _twb

    real_apply = _twb.pip_apply

    def fake_apply(name, **kw):
        fn = real_apply(name, **kw)

        def wrapper(x):
            captured['x'] = np.asarray(x)
            return fn(x)
        return wrapper

    _twb.pip_apply = fake_apply
    try:
        _ = _twb.two_body_energy_pairs(pa, pb, jnp.ones(len(pa), bool))
    finally:
        _twb.pip_apply = real_apply
    x = captured['x']
    s = np.asarray(TWB.f_switch(jnp.asarray(roo), c['r2i'], c['r2f']))
    act = (roo < c['r2f']) & (roo > 2.0)
    return x[act], s[act]


def main():
    from mbpol_openmm_plugin_tpu.ops.polyeval import load_quad
    x3, s3 = real_triplet_vars()
    F3, W3 = load_quad('poly3b')
    curve('poly3b', x3, s3, F3, W3)
    try:
        x2, s2 = pair_vars()
        F2, W2 = load_quad('poly2b')
        curve('poly2b', x2, s2, F2, W2)
    except AttributeError as e:
        print('pair-vars extraction needs adapting:', e)


if __name__ == '__main__':
    main()
