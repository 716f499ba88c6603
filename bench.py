#!/usr/bin/env python
"""Headline benchmark: water256 bulk PME MD throughput on one chip.

Mirrors the reference's benchmark protocol (python/utils/run_benchmark.py:
256 waters, PME, 0.9 nm cutoff, repeated force evaluations / MD steps on the
Reference CPU platform, wall-clock). The metric is MD steps/second of the
full potential (all five terms + induced-dipole SCF each step); vs_baseline
is the speedup over the reference-equivalent single-thread CPU evaluation
(denominator recorded in BASELINE_LOCAL.json by tools/measure_cpu_baseline.py;
the reference itself publishes no numbers - SURVEY section 6).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_STEPS = int(os.environ.get('BENCH_STEPS', 100))
DT_FS = 0.2


def build(dtype_bits=32):
    import jax
    # persistent compilation cache: compiles over the tunneled TPU are slow
    # (tens of seconds to minutes) and every fresh process would redo them
    jax.config.update('jax_compilation_cache_dir',
                      os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                     '/tmp/mbpol_jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    # PIP coefficient contractions need true fp32 accumulation (see
    # ops/polyeval.py); never let f32 matmuls decay to bf16 passes.
    jax.config.update('jax_default_matmul_precision', 'highest')
    if dtype_bits == 64:
        jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.md import integrators as I
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.system import (System, compute_virtual_sites,
                                                make_molecules_whole)

    fix = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'tests', 'fixtures', 'water256_integration_test.npz'))
    box = [19.3996888399961804 / 10.0] * 3
    sys_ = System.waters(256, box=box)
    dtype = jnp.float64 if dtype_bits == 64 else jnp.float32
    pos = jnp.asarray(fix['positions'], dtype)
    pos = compute_virtual_sites(sys_, pos)

    # SCF tolerance: the reference kernel's own default (1e-3) - the Force-API
    # default 1e-7 is below float32 resolution of the convergence metric.
    # skin: lists key on O-O distances; O thermal displacement over a
    # 25-step chunk at 0.2 fs is < 0.005 nm, so a 0.02 nm skin keeps the
    # lists valid between rebuilds while inflating the triplet batch only
    # ~1.3x (vs ~2.3x at the conservative 0.05 default for longer steps).
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-3 if dtype_bits == 32 else 1e-7,
                                  max_iterations=200,
                                  nlist_skin=0.02))
    pot.tune_capacities(pos)

    import dataclasses

    dt = DT_FS * 1e-3
    inv_m = np.where(np.asarray(sys_.masses) > 0,
                     1.0 / np.where(np.asarray(sys_.masses) > 0, sys_.masses, 1.0), 0.0)
    inv_m = jnp.asarray(inv_m, dtype)[:, None]

    o_idx = np.asarray(sys_.o_index)
    skin = pot.config.nlist_skin

    def rebuild_lists(p):
        pl, tl, _ = pot._neighbor_lists(make_molecules_whole(sys_, p))
        return (pl, tl)

    def md_chunk(carry, n):
        """Velocity Verlet with SCF warm-starting (previous step's induced
        dipoles; a naive 2*mu1-mu2 linear predictor was tried and is
        UNSTABLE - it pumps energy and NaNs within ~300 steps) and
        fully on-device displacement-triggered neighbor rebuilds: each step
        checks max O displacement since the last build and reruns the list
        build under lax.cond only when 2*disp exceeds half the skin - exact
        list validity with zero host syncs (the previous chunk-boundary
        host check cost ~15 ms per boundary over the tunneled link and
        still left mid-chunk validity to a margin argument)."""
        def body(c, _):
            st, mu, nlists, p_build = c
            v_half = st.velocities + 0.5 * dt * st.forces * inv_m
            p = st.positions + dt * v_half
            disp = jnp.max(jnp.linalg.norm(p[o_idx] - p_build[o_idx], axis=-1))
            nlists, p_build = jax.lax.cond(
                2.0 * disp > 0.5 * skin,
                lambda: (rebuild_lists(p), p),
                lambda: (nlists, p_build))
            e, f, parts, diag = pot._energy_forces_impl(p, mu, nlists=nlists)
            v = v_half + 0.5 * dt * f * inv_m
            st = dataclasses.replace(st, positions=p, velocities=v, forces=f,
                                     potential_energy=e, step=st.step + 1)
            return (st, diag['induced_dipoles'], nlists, p_build), e
        return jax.lax.scan(body, carry, None, length=n)

    e0, f0, parts0, diag0 = pot.energy_forces(pos)   # jitted cold-start eval
    state = I.MDState(positions=pos, velocities=jnp.zeros_like(pos), forces=f0,
                      potential_energy=e0, box=jnp.asarray(box, dtype),
                      step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0))
    inner = jax.jit(md_chunk, static_argnames=('n',))

    def step_fn(carry, n):
        st, mu = carry
        nl, _ = pot.build_neighbor_lists(st.positions)
        (st, mu, _, _), es = inner((st, mu, nl, st.positions), n)
        return (st, mu), es

    return (state, diag0['induced_dipoles']), step_fn, float(e0)


def main():
    import jax
    carry, step_fn, e0 = build(32)

    # warmup/compile with the SAME static step count as the measured call
    carry, pes = step_fn(carry, N_STEPS)
    _ = np.asarray(pes)     # host transfer = reliable device sync

    t0 = time.time()
    carry, pes = step_fn(carry, N_STEPS)
    _ = np.asarray(pes)
    elapsed = time.time() - t0

    steps_per_s = N_STEPS / elapsed
    ns_per_day = steps_per_s * DT_FS * 1e-6 * 86400.0

    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'BASELINE_LOCAL.json')
    vs_baseline = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        cpu_steps_per_s = base.get('water256_pme_cpu_steps_per_second')
        if cpu_steps_per_s:
            vs_baseline = steps_per_s / cpu_steps_per_s

    print(json.dumps(dict(metric='water256_pme_md_steps_per_second',
                          value=round(steps_per_s, 3), unit='steps/s',
                          vs_baseline=round(vs_baseline, 2) if vs_baseline else None,
                          extra=dict(ns_per_day_at_0p2fs=round(ns_per_day, 4),
                                     initial_energy_kJmol=round(e0, 2),
                                     n_steps=N_STEPS,
                                     device=str(jax.devices()[0])))))


if __name__ == '__main__':
    main()
