"""ASPC (always-stable predictor-corrector) induced-dipole closure.

scf_method='aspc' (models/electrostatics.py:scf_induced_dipoles_aspc) applies
exactly one damped SCF iteration per MD step to a dipole-history predictor
(Kolafa, J. Comput. Chem. 25, 335 (2004)); role analog of the CUDA DIIS
acceleration (multipoleInducedField.cu:374-482). Contract:
  - without a predictor (cold start / one-shot calls) it falls back to the
    fully converged SOR loop, so single-point physics is unchanged;
  - at the converged fixed point the corrector is a no-op;
  - along a short NVE trajectory the energy stays finite and close to the
    fully converged trajectory.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import fixtures
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.models import electrostatics as elec


def _pots():
    sys_, pos = fixtures.load_system('water3')
    sor = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9))
    aspc = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9,
                                   scf_method='aspc', aspc_k=2))
    return sys_, jnp.asarray(pos), sor, aspc


def test_aspc_cold_start_matches_sor():
    _, pos, sor, aspc = _pots()
    e_s, f_s, _, d_s = sor.energy_forces(pos)
    e_a, f_a, _, d_a = aspc.energy_forces(pos)
    np.testing.assert_allclose(float(e_a), float(e_s), rtol=0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(f_a), np.asarray(f_s), atol=1e-10)
    assert bool(d_a['converged'])


def test_aspc_corrector_is_noop_at_fixed_point():
    _, pos, sor, aspc = _pots()
    e_s, f_s, _, d_s = sor.energy_forces(pos)
    mu_conv = d_s['induced_dipoles']
    e_a, f_a, _, d_a = aspc._energy_forces_impl(pos, mu0=mu_conv)
    # dmu ~ target_epsilon at the fixed point -> energy moves by O(eps)
    assert abs(float(e_a) - float(e_s)) < 1e-5
    assert int(d_a['iterations']) == 1
    assert bool(d_a['converged'])


def test_aspc_omega_values():
    # (k+2)/(2k+3), Kolafa eq. 18
    assert elec.aspc_omega(0) == 2.0 / 3.0
    assert elec.aspc_omega(3) == 5.0 / 9.0


_ASPC_B2 = jnp.asarray([2.8, -2.8, 1.2, -0.2])   # k = 2 predictor


def _nve(pot, sys_, pos, n_steps, aspc=False):
    """Tiny velocity-Verlet NVE driver with optional ASPC predictor."""
    dt = 0.2e-3   # ps
    inv_m = np.where(np.asarray(sys_.masses) > 0,
                     1.0 / np.where(np.asarray(sys_.masses) > 0,
                                    sys_.masses, 1.0), 0.0)[:, None]
    e, f, _, diag = pot.energy_forces(pos)
    mu_hist = jnp.tile(diag['induced_dipoles'][None], (4, 1, 1))
    v = jnp.zeros_like(pos)
    etots = []
    impl = jax.jit(pot._energy_forces_impl)
    for _ in range(n_steps):
        v_half = v + 0.5 * dt * f * inv_m
        pos = pos + dt * v_half
        mu0 = (jnp.einsum('h,hnd->nd', _ASPC_B2, mu_hist) if aspc
               else mu_hist[0])
        e, f, _, diag = impl(pos, mu0=mu0)
        mu_hist = jnp.roll(mu_hist, 1, axis=0).at[0].set(diag['induced_dipoles'])
        v = v_half + 0.5 * dt * f * inv_m
        ke = 0.5 * float(jnp.sum(jnp.asarray(sys_.masses)[:, None] * v * v))
        etots.append(float(e) + ke)
    return np.asarray(etots)


def test_simulation_driver_aspc_mode():
    """Simulation carries the ASPC dipole history in its scan and tracks
    the fully converged driver over a short NVE run."""
    from mbpol_openmm_plugin_tpu.md.simulation import (Simulation,
                                                       SimulationConfig)
    sys_, pos = fixtures.load_system('water3')

    def run(scf_method):
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9,
                                      scf_method=scf_method, aspc_k=2))
        sim = Simulation(pot, SimulationConfig(dt=2e-4))
        sim.set_positions(pos)
        m = sim.step(20, report_interval=5)
        return m['total_energy']

    e_sor = run('sor')
    e_aspc = run('aspc')
    assert np.isfinite(e_aspc).all()
    np.testing.assert_allclose(e_aspc, e_sor, atol=2e-2)


def test_aspc_short_nve_tracks_converged_trajectory():
    sys_, pos, sor, aspc = _pots()
    e_ref = _nve(sor, sys_, pos, 30, aspc=False)
    e_aspc = _nve(aspc, sys_, pos, 30, aspc=True)
    assert np.isfinite(e_aspc).all()
    # same initial total energy; trajectories agree closely over 30 steps
    # (the SOR-damped corrector lags the fixed point by ~1e-2 kJ/mol
    # transiently - a 2.5e-4 relative deviation)
    np.testing.assert_allclose(e_aspc, e_ref, atol=2e-2)
    # and the ASPC trajectory conserves energy about as well as full SCF
    drift_ref = abs(e_ref[-1] - e_ref[0])
    drift_aspc = abs(e_aspc[-1] - e_aspc[0])
    assert drift_aspc < max(10.0 * drift_ref, 1e-3)


def test_aspc_closed_form_matches_kolafa_table():
    """The closed form B_j = (-1)^(j+1) j C(2k+4, k+2-j)/C(2k+2, k+1)
    reproduces Kolafa's Table I exactly for k = 0..3 and stays
    partition-of-unity at higher orders."""
    table = {0: [2.0, -1.0],
             1: [2.5, -2.0, 0.5],
             2: [2.8, -2.8, 1.2, -0.2],
             3: [3.0, -24.0 / 7.0, 27.0 / 14.0, -4.0 / 7.0, 1.0 / 14.0]}
    for k, row in table.items():
        np.testing.assert_allclose(elec.aspc_predictor_coefficients(k), row,
                                   rtol=1e-14)
    for k in range(8):
        b = elec.aspc_predictor_coefficients(k)
        assert len(b) == k + 2
        np.testing.assert_allclose(b.sum(), 1.0, atol=1e-12)


def test_aspc_n_corr_depth():
    """n_corr=1 is Kolafa's single damped corrector exactly; deeper
    correctors converge toward the SOR fixed point (smaller energy error
    against the converged evaluation from the same predictor)."""
    sys_, pos = fixtures.load_system('water3')
    sor = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9,
                                  target_epsilon=1e-10))
    e_conv, _, _, d_conv = sor.energy_forces(pos)
    mu_conv = d_conv['induced_dipoles']
    # a deliberately perturbed predictor
    mu_pred = mu_conv * 1.05

    def aspc_energy(n_corr):
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff',
                                      cutoff=0.9, scf_method='aspc',
                                      aspc_k=2, aspc_n_corr=n_corr))
        e, _, _, _ = pot._energy_forces_impl(pos, mu0=mu_pred)
        return abs(float(e) - float(e_conv))

    errs = [aspc_energy(n) for n in (1, 2, 4, 8)]
    assert errs[1] < errs[0] and errs[2] < errs[1] and errs[3] < errs[2]
