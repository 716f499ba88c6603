#!/usr/bin/env python
"""Headline benchmark: water256 bulk PME MD throughput on one chip.

Mirrors the reference's benchmark protocol (python/utils/run_benchmark.py:
256 waters, PME, 0.9 nm cutoff, repeated force evaluations / MD steps on the
Reference CPU platform, wall-clock). The metric is MD steps/second of the
full potential (all five terms + induced-dipole SCF each step); vs_baseline
is the speedup over the reference-equivalent single-thread CPU evaluation
(denominator recorded in BASELINE_LOCAL.json by tools/measure_cpu_baseline.py;
the reference itself publishes no numbers - SURVEY section 6).

Three numbers are emitted: the 100-step protocol figure from the converged
fixture (the headline `value`, comparable across rounds), and two
thermalized steady-state figures - the physically honest operating points
after ~1 ps of dynamics:
  - steady_state_sor: reference semantics, SOR iterated to target_epsilon
    every step (2+ warm iterations);
  - steady_state_aspc: Kolafa ASPC closure (scf_method='aspc': dipole
    history predictor + exactly one SOR-damped corrector per step;
    J. Comput. Chem. 25, 335 (2004)) - faster AND drift-free in NVE where
    the loosely-converged SOR loop drifts (measured: -114 kJ/mol per 1000
    steps SOR at 1e-3 vs bounded +-12 kJ/mol over 4000 steps ASPC).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_STEPS = int(os.environ.get('BENCH_STEPS', 100))
STEADY_THERM = int(os.environ.get('BENCH_THERM_STEPS', 900))
STEADY_STEPS = int(os.environ.get('BENCH_STEADY_STEPS', 1000))
DT_FS = 0.2

# Kolafa ASPC predictor coefficients (k -> B_j over mu_{t}, mu_{t-1}, ...);
# each row sums to 1, so a history initialized by tiling the first converged
# dipoles degenerates to the plain warm start for the first steps.
# k = -1 is the plain previous-step warm start (predictor = mu_t).
# MEASURED (r2, water256 TPU): feeding an extrapolated predictor into the
# convergence loop with the loose 1e-3 target is UNSTABLE for every k >= 0
# (NaN within ~1000 steps; same failure mode as the documented naive
# 2*mu1-mu2 attempt) - extrapolation is only safe as true ASPC (predictor
# + exactly one damped corrector, BENCH_SCF=aspc), where time-reversibility
# bounds the energy drift (Kolafa, J. Comput. Chem. 25, 335 (2004)).
_ASPC_B = {
    -1: [1.0],
    0: [2.0, -1.0],
    1: [2.5, -2.0, 0.5],
    2: [2.8, -2.8, 1.2, -0.2],
    3: [3.0, -24.0 / 7.0, 27.0 / 14.0, -4.0 / 7.0, 1.0 / 14.0],
}
# 'sor': iterate the SCF to target_epsilon each step (reference semantics,
#        predictor only warm-starts the loop; safe only with k = -1).
# 'aspc': true ASPC - predictor + exactly one damped corrector
#        (scf_method='aspc' in the potential; models/electrostatics.py).
SCF_MODE = os.environ.get('BENCH_SCF', 'sor')
ASPC_K = int(os.environ.get('BENCH_ASPC_K', 3 if SCF_MODE == 'aspc' else -1))


def build(dtype_bits=32, scf_mode=None):
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
    scf_mode = SCF_MODE if scf_mode is None else scf_mode
    aspc_k = int(os.environ.get('BENCH_ASPC_K', 3)) if scf_mode == 'aspc' \
        else ASPC_K
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-3 if dtype_bits == 32 else 1e-7,
                                  max_iterations=200,
                                  scf_method='aspc' if scf_mode == 'aspc' else 'sor',
                                  aspc_k=max(aspc_k, 0),
                                  nlist_skin=0.02))
    pot.tune_capacities(pos)

    import dataclasses

    dt = DT_FS * 1e-3
    inv_m = np.where(np.asarray(sys_.masses) > 0,
                     1.0 / np.where(np.asarray(sys_.masses) > 0, sys_.masses, 1.0), 0.0)
    inv_m = jnp.asarray(inv_m, dtype)[:, None]

    o_idx = np.asarray(sys_.o_index)
    skin = pot.config.nlist_skin
    B_aspc = jnp.asarray(_ASPC_B[aspc_k], dtype)
    hist_len = len(_ASPC_B[aspc_k])

    def rebuild_lists(p):
        pl, tl, diag = pot._neighbor_lists(make_molecules_whole(sys_, p))
        return (pl, tl), diag['pair_overflow'] | diag['triplet_overflow']

    def md_chunk(carry, n):
        """Velocity Verlet with ASPC-predicted SCF warm starts and fully
        on-device displacement-triggered neighbor rebuilds: each step checks
        max O displacement since the last build and reruns the list build
        under lax.cond only when 2*disp exceeds half the skin - exact list
        validity with zero host syncs. Rebuild overflow flags are OR-ed
        through the carry and surfaced in the bench health output (a silent
        capacity overflow would otherwise truncate lists mid-run)."""
        def body(c, _):
            st, mu_hist, nlists, p_build, ovf = c
            v_half = st.velocities + 0.5 * dt * st.forces * inv_m
            p = st.positions + dt * v_half
            disp = jnp.max(jnp.linalg.norm(p[o_idx] - p_build[o_idx], axis=-1))

            def do_rebuild():
                nl, o = rebuild_lists(p)
                return nl, p, ovf | o

            nlists, p_build, ovf = jax.lax.cond(
                2.0 * disp > 0.5 * skin, do_rebuild,
                lambda: (nlists, p_build, ovf))
            mu0 = jnp.einsum('h,hnd->nd', B_aspc, mu_hist)
            e, f, parts, diag = pot._energy_forces_impl(p, mu0, nlists=nlists)
            mu_hist = jnp.roll(mu_hist, 1, axis=0).at[0].set(diag['induced_dipoles'])
            v = v_half + 0.5 * dt * f * inv_m
            ke = 0.5 * jnp.sum(jnp.asarray(sys_.masses, dtype)[:, None] * v * v)
            st = dataclasses.replace(st, positions=p, velocities=v, forces=f,
                                     potential_energy=e, step=st.step + 1)
            return (st, mu_hist, nlists, p_build, ovf), \
                (e, ke, diag['iterations'], diag['converged'])
        return jax.lax.scan(body, carry, None, length=n)

    e0, f0, parts0, diag0 = pot.energy_forces(pos)   # jitted cold-start eval
    state = I.MDState(positions=pos, velocities=jnp.zeros_like(pos), forces=f0,
                      potential_energy=e0, box=jnp.asarray(box, dtype),
                      step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(0))
    inner = jax.jit(md_chunk, static_argnames=('n',))

    def step_fn(carry, n):
        st, mu_hist = carry
        nl, diag = pot.build_neighbor_lists(st.positions)
        ovf0 = jnp.asarray(bool(diag['pair_overflow']) | bool(diag['triplet_overflow']))
        (st, mu_hist, _, _, ovf), outs = inner(
            (st, mu_hist, nl, st.positions, ovf0), n)
        return (st, mu_hist), outs, ovf

    mu0 = diag0['induced_dipoles']
    mu_hist0 = jnp.tile(mu0[None], (hist_len, 1, 1))
    return (state, mu_hist0), step_fn, float(e0)


def _timed(step_fn, carry, n):
    t0 = time.time()
    carry, outs, ovf = step_fn(carry, n)
    pes, kes, iters, conv = [np.asarray(o) for o in outs]   # transfer = sync
    return carry, (pes, kes, iters, conv, bool(ovf)), time.time() - t0


def _steady(step_fn, carry, therm_steps, steady_steps):
    """Thermalize then measure, in N_STEPS chunks (one compiled program)."""
    for _ in range(therm_steps // N_STEPS):
        carry, _, _ = _timed(step_fn, carry, N_STEPS)
    spes, skes, siters, sconv = [], [], [], []
    ovf = False
    s_elapsed = 0.0
    for _ in range(max(steady_steps // N_STEPS, 1)):
        carry, (p_, k_, i_, c_, o_), dt_ = _timed(step_fn, carry, N_STEPS)
        spes.append(p_)
        skes.append(k_)
        siters.append(i_)
        sconv.append(c_)
        ovf = ovf or o_
        s_elapsed += dt_
    spes = np.concatenate(spes)
    skes = np.concatenate(skes)
    siters = np.concatenate(siters)
    sconv = np.concatenate(sconv)
    etot = spes + skes
    return carry, dict(
        steps_per_second=round(len(spes) / s_elapsed, 3),
        n_steps=len(spes),
        mean_scf_iters=round(float(siters.mean()), 2),
        scf_converged_frac=round(float(sconv.mean()), 4),
        etot_drift_kJmol=round(float(etot[-1] - etot[0]), 3),
        nan_detected=bool(np.isnan(spes).any()),
        neighbor_overflow=bool(ovf))


def main():
    import jax
    carry0, step_fn, e0 = build(32, scf_mode='sor')

    # warmup/compile on a throwaway advance, then measure the headline
    # 100-step protocol FROM THE CONVERGED FIXTURE (comparable across
    # rounds; reference protocol python/utils/run_benchmark.py:18-70)
    _ = _timed(step_fn, carry0, N_STEPS)
    carry, (pes, kes, iters, conv1, ovf1), elapsed = _timed(step_fn, carry0,
                                                            N_STEPS)
    steps_per_s = N_STEPS / elapsed
    ns_per_day = steps_per_s * DT_FS * 1e-6 * 86400.0

    # steady state A: reference semantics (SOR converged to target each step)
    carry, sor = _steady(step_fn, carry, STEADY_THERM, STEADY_STEPS)

    # steady state B: ASPC closure (one damped corrector/step; faster AND
    # drift-free vs the loosely-converged SOR loop). Seed from the SOR
    # thermalized state; short re-thermalization for the new closure.
    st, mu_hist = carry
    carry_a, step_fn_a, _ = build(32, scf_mode='aspc')
    _, mu_hist_a0 = carry_a
    import jax.numpy as jnp
    mu_hist_a = jnp.tile(mu_hist[:1], (mu_hist_a0.shape[0], 1, 1))
    _, aspc = _steady(step_fn_a, (st, mu_hist_a), 2 * N_STEPS, STEADY_STEPS)

    baseline_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'BASELINE_LOCAL.json')
    vs_baseline = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        cpu_steps_per_s = base.get('water256_pme_cpu_steps_per_second')
        if cpu_steps_per_s:
            vs_baseline = steps_per_s / cpu_steps_per_s

    print(json.dumps(dict(
        metric='water256_pme_md_steps_per_second',
        value=round(steps_per_s, 3), unit='steps/s',
        vs_baseline=round(vs_baseline, 2) if vs_baseline else None,
        extra=dict(ns_per_day_at_0p2fs=round(ns_per_day, 4),
                   initial_energy_kJmol=round(e0, 2),
                   n_steps=N_STEPS,
                   steady_state_steps_per_second=sor['steps_per_second'],
                   steady_state_ns_per_day=round(
                       sor['steps_per_second'] * DT_FS * 1e-6 * 86400.0, 4),
                   steady_state_sor=sor,
                   steady_state_aspc=aspc,
                   aspc_steady_state_steps_per_second=aspc['steps_per_second'],
                   neighbor_overflow=bool(ovf1 or sor['neighbor_overflow']
                                          or aspc['neighbor_overflow']),
                   nan_detected=bool(np.isnan(pes).any()
                                     or sor['nan_detected']
                                     or aspc['nan_detected']),
                   device=str(jax.devices()[0])))))


if __name__ == '__main__':
    main()
