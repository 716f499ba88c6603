#!/usr/bin/env python
"""In-graph cost breakdown of the PME electrostatics at water256.

Per-op isolated timings over the tunneled TPU are dispatch-dominated
(~0.3-0.9 ms floor), so each piece is timed as a lax.scan of K data-dependent
iterations inside ONE jitted program: per-iteration cost = (t_K - t_1)/(K-1).
Pieces: K1/K2 pair kernels (full vs triangular), the spline-matrix build,
the fixed-charge grid pipeline, the dipole grid pipeline (one SCF iteration's
reciprocal work), and the dense SOR matvec.

Usage: python tools/elec_breakdown.py [n_waters] [K]
"""
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update('jax_default_matmul_precision', 'highest')
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/tmp/mbpol_jax_cache'))
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.models import electrostatics as elec
    from mbpol_openmm_plugin_tpu.models import pme as pme_mod
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.ops import elec_pallas as EP
    from mbpol_openmm_plugin_tpu.system import (System, compute_virtual_sites,
                                                make_molecules_whole)

    n_w = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    fix = np.load(os.path.join(REPO, 'tests', 'fixtures',
                               'water256_integration_test.npz'))
    box = [19.3996888399961804 / 10.0] * 3
    sys_ = System.waters(256, box=box)
    pos = jnp.asarray(fix['positions'], jnp.float32)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-3, max_iterations=200))
    pos_v = compute_virtual_sites(sys_, make_molecules_whole(sys_, pos))
    params, setup = pot.elec_params, pot.pme
    charges, _ = elec.assemble_charges(params, pos_v)
    d16_inv = jnp.asarray(np.asarray(params.damping) ** (-1.0 / 6.0),
                          jnp.float32)
    srow = EP.pack_sites(pos_v, charges, d16_inv,
                         jnp.asarray(params.mol_index),
                         jnp.asarray(params.atom_type == 0))
    n = pos_v.shape[0]
    th = params.thole
    np_ = srow.shape[0]
    print(f'n_sites={n} padded={np_} grid={setup.grid} '
          f'device={jax.devices()[0]}', flush=True)

    def scan_time(name, step, x0, k=K):
        """step: x -> x (same shape/dtype); returns per-iteration ms."""
        def run(k_):
            def body(c, _):
                return step(c), None
            f = jax.jit(lambda x: jax.lax.scan(body, x, None, length=k_)[0])
            y = f(x0)
            jax.block_until_ready(y)
            reps = 8
            t0 = time.perf_counter()
            for _ in range(reps):
                y = f(x0)
            jax.block_until_ready(y)
            return (time.perf_counter() - t0) / reps
        t1 = run(1)
        tk = run(k)
        ms = (tk - t1) / (k - 1) * 1e3
        print(f'{name:42s} {ms:8.3f} ms/iter', flush=True)
        return ms

    # --- K1 full vs triangular (chain output back into the row x coord) ---
    def k1_full(x):
        s = srow.at[:, EP._X].add(1e-12 * x[0, 0])
        ef, s3, s5 = EP.fixed_field_and_scf_factors(setup, th, s, n)
        return ef + 1e-20 * (s3[:n, :1] + s5[:n, :1])

    def k1_tri(x):
        s = srow.at[:, EP._X].add(1e-12 * x[0, 0])
        ef, s3, s5 = EP.fixed_field_and_scf_factors_tri(setup, th, s, n)
        return ef + 1e-20 * (s3[:n, :1] + s5[:n, :1])

    x0 = jnp.zeros((n, 3), jnp.float32)
    scan_time('K1 full (field + s3/s5)', k1_full, x0)
    scan_time('K1 triangular (+ U+U^T)', k1_tri, x0)

    mu0 = 0.001 * jnp.ones((n, 3), jnp.float32)

    def k2_full(mu):
        e, f, p = EP.direct_energy_force_pot(setup, th, srow, mu, n)
        return mu + 1e-20 * (f + e + p[:, None])

    def k2_tri(mu):
        e, f, p = EP.direct_energy_force_pot_tri(setup, th, srow, mu, n)
        return mu + 1e-20 * (f + e + p[:, None])

    scan_time('K2 full (e/force/pot)', k2_full, mu0)
    scan_time('K2 triangular', k2_tri, mu0)

    # --- grid machinery ---
    def splines(x):
        Sx, Sy, Sz = pme_mod._spline_matrices(setup, pos_v + 1e-12 * x)
        return x + 1e-20 * (Sx[:, :1, 0] + Sy[:, :1, 0] + Sz[:, :1, 0])

    scan_time('spline matrices (3 axes)', splines, x0)

    Sx, Sy, Sz = pme_mod._spline_matrices(setup, pos_v)
    sx0, sy0, sz0 = Sx[..., 0], Sy[..., 0], Sz[..., 0]
    sx1, sy1, sz1 = Sx[..., 1], Sy[..., 1], Sz[..., 1]

    def fixed_pipeline(x):
        grid = pme_mod._spread_separable(
            setup, (charges + 1e-12 * x[:, 0])[:, None] * sx0, sy0, sz0)
        conv = pme_mod._convolve(setup, grid, jnp.float32)
        P = pme_mod._readback_separable(conv, Sx, Sy, Sz)
        return x + 1e-20 * P[:, :3, 0, 0]

    scan_time('fixed grid pipeline (spread+conv+read)', fixed_pipeline, x0)

    pscale = jnp.asarray(np.asarray(setup.grid), jnp.float32) \
        / jnp.asarray(np.asarray(setup.box), jnp.float32)

    def mu_pipeline(mu):
        smu = mu * pscale[None, :]
        grid = (pme_mod._spread_separable(setup, smu[:, 0:1] * sx1, sy0, sz0)
                + pme_mod._spread_separable(setup, smu[:, 1:2] * sx0, sy1, sz0)
                + pme_mod._spread_separable(setup, smu[:, 2:3] * sx0, sy0, sz1))
        conv = pme_mod._convolve(setup, grid, jnp.float32)
        Pd = pme_mod._readback_separable(conv, Sx, Sy, Sz)
        phid = pme_mod._phi10(Pd)
        return mu + 1e-20 * phid[:, 1:4]

    scan_time('dipole grid pipeline (1 SCF iter recip)', mu_pipeline, mu0)

    # --- grid pipeline internals ---
    def spread_only(x):
        grid = pme_mod._spread_separable(
            setup, (charges + 1e-12 * x[:, 0])[:, None] * sx0, sy0, sz0)
        return x + 1e-20 * grid[:3, 0, 0][None, :]

    scan_time('  spread (1 source)', spread_only, x0)

    g0 = pme_mod._spread_separable(setup, charges[:, None] * sx0, sy0, sz0)

    def conv_only(x):
        conv = pme_mod._convolve(setup, g0 + 1e-12 * x[0, 0], jnp.float32)
        return x + 1e-20 * conv[:3, 0, 0][None, :]

    scan_time('  convolve (DFT fwd+inv)', conv_only, x0)

    def read_only(x):
        P = pme_mod._readback_separable(g0 + 1e-12 * x[0, 0], Sx, Sy, Sz)
        return x + 1e-20 * P[:, :3, 0, 0]

    scan_time('  readback (P-tensor form)', read_only, x0)

    def read_phi10(x):
        phi = pme_mod._readback_phi10(g0 + 1e-12 * x[0, 0], Sx, Sy, Sz)
        return x + 1e-20 * phi[:, :3]

    scan_time('  readback (phi10 form)', read_phi10, x0)

    # --- dense SOR matvec (direct-space part of one SCF iteration) ---
    ef, s3, s5 = EP.fixed_field_and_scf_factors_tri(setup, th, srow, n)
    s3 = s3[:n, :n]
    s5 = s5[:n, :n]
    bvec = jnp.asarray(np.asarray(setup.box), jnp.float32)
    delta = pos_v[None, :, :] - pos_v[:, None, :]
    delta = delta - jnp.floor(delta / bvec + 0.5) * bvec

    def sor_matvec(mu):
        f = elec._dipole_field(mu, s3, s5, delta)
        return mu + 1e-12 * f

    scan_time('dense SOR matvec (s3/s5/delta)', sor_matvec, mu0)


if __name__ == '__main__':
    main()
