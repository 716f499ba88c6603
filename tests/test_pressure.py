"""Instantaneous virial pressure (md/pressure.py): the autodiff
dU/dlambda is pinned against central finite differences of the same
molecular box-scaling move, and the kinetic/ideal part against the
analytic dilute-gas limit.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.md import pressure as PR
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites
from mbpol_openmm_plugin_tpu.utils import units


def _water14_periodic():
    d = fixtures.load('water14')
    sys_ = System.waters(14, box=[1.6, 1.6, 1.6])
    pos = compute_virtual_sites(sys_, jnp.asarray(d['positions'] + 0.8))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.7,
                                  target_epsilon=1e-8, max_iterations=300))
    pot.tune_capacities(pos)
    return sys_, pos, pot


def _scaled_energy(pot, sys_, pos, box, lam):
    """The same molecular-centroid + box scaling, applied in numpy."""
    com, _ = PR._molecular_coms(sys_, pos)
    shift = com * (lam - 1.0)
    p = pos + shift[jnp.asarray(sys_.mol_index)]
    e, _, _, _ = pot._energy_forces_impl(p, box=jnp.asarray(box) * lam)
    return float(e)


def test_du_dlambda_matches_finite_difference():
    """AD through M-sites, charge redistribution, PME, switches, and the
    SCF solve must reproduce the central finite difference of the
    box-scaled energy (f64)."""
    sys_, pos, pot = _water14_periodic()
    box = [1.6, 1.6, 1.6]

    com, _ = PR._molecular_coms(sys_, pos)
    mol = jnp.asarray(sys_.mol_index)

    def energy(lam):
        p = pos + (com * (lam - 1.0))[mol]
        e, _, _, _ = pot._energy_forces_impl(p, box=jnp.asarray(box) * lam)
        return e

    one = jnp.asarray(1.0)
    du = float(jax.jvp(energy, (one,), (one,))[1])
    h = 1e-5
    fd = (_scaled_energy(pot, sys_, pos, box, 1.0 + h)
          - _scaled_energy(pot, sys_, pos, box, 1.0 - h)) / (2 * h)
    assert abs(du - fd) < 1e-3 * max(1.0, abs(fd)), (du, fd)


def test_virial_pressure_kinetic_and_consistency():
    """Pressure with explicit velocities equals the hand-assembled
    (2K_com - dU/dlam)/(3V); the temperature form uses equipartition."""
    sys_, pos, pot = _water14_periodic()
    box = [1.6, 1.6, 1.6]
    rng = np.random.default_rng(5)
    vel = jnp.asarray(rng.normal(0, 0.5, pos.shape))

    p_bar = float(PR.virial_pressure(pot, pos, velocities=vel, box=box))

    com, _ = PR._molecular_coms(sys_, pos)
    mol = jnp.asarray(sys_.mol_index)

    def energy(lam):
        p = pos + (com * (lam - 1.0))[mol]
        e, _, _, _ = pot._energy_forces_impl(p, box=jnp.asarray(box) * lam)
        return e

    one = jnp.asarray(1.0)
    du = float(jax.jvp(energy, (one,), (one,))[1])
    vcom, mol_mass = PR._molecular_coms(sys_, vel)
    twice_k = float(jnp.sum(mol_mass[:, None] * vcom * vcom))
    vol = 1.6 ** 3
    expect = (twice_k - du) / (3 * vol) / PR.BAR_IN_KJ_MOL_NM3
    np.testing.assert_allclose(p_bar, expect, rtol=1e-10)

    # temperature form: the dU/dlam part is shared, kinetic part analytic
    t = 300.0
    p_t = float(PR.virial_pressure(pot, pos, temperature_k=t, box=box))
    ideal = 3 * 14 * units.BOLTZMANN_KJ_MOL_K * t
    expect_t = (ideal - du) / (3 * vol) / PR.BAR_IN_KJ_MOL_NM3
    np.testing.assert_allclose(p_t, expect_t, rtol=1e-10)


def test_dilute_gas_limit_is_ideal():
    """Three waters far apart in a huge box: U' ~ 0, so P -> ideal-gas
    N_mol kT / V (the molecular convention's ideal part)."""
    box = 12.0
    sys_ = System.waters(3, box=[box] * 3)
    full = np.array(fixtures.load('water3')['positions'])
    # spread the molecules ~4 nm apart (rigid whole-molecule shifts)
    for k, off in enumerate(([1.0] * 3, [5.0] * 3, [9.0] * 3)):
        full[4 * k:4 * k + 4] += np.asarray(off)
    pos = compute_virtual_sites(sys_, jnp.asarray(full))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-8, max_iterations=100))
    pot.tune_capacities(pos)
    t = 300.0
    p_bar = float(PR.virial_pressure(pot, pos, temperature_k=t))
    ideal_bar = (3 * units.BOLTZMANN_KJ_MOL_K * t / box ** 3
                 / PR.BAR_IN_KJ_MOL_NM3)
    # virial corrections are tiny but nonzero (PME self/background terms)
    assert abs(p_bar - ideal_bar) < 0.25 * ideal_bar, (p_bar, ideal_bar)


def test_cluster_raises():
    sys_ = System.waters(3)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    with pytest.raises(ValueError):
        PR.virial_pressure(pot, jnp.zeros((12, 3)), temperature_k=300.0)


def test_rpmd_pressure_reduces_to_classical_at_one_bead():
    sys_, pos, pot = _water14_periodic()
    p_cl = float(PR.virial_pressure(pot, pos, temperature_k=300.0))
    p_rp = float(PR.rpmd_virial_pressure(pot, pos[None], 300.0))
    np.testing.assert_allclose(p_rp, p_cl, rtol=1e-10)


def test_rpmd_pressure_dilute_gas_is_ideal():
    """Far-separated molecules with a bead spread: interactions vanish,
    the rigid-shift map leaves intra-bead geometry and the one-body term
    untouched -> P = N_mol kT / V (quantum == classical ideal gas)."""
    from mbpol_openmm_plugin_tpu.md import rpmd as R

    L = 12.0
    sys_ = System.waters(3, box=[L, L, L])
    full = np.array(fixtures.load('water3')['positions'])
    for k, off in enumerate(([1.0] * 3, [5.0] * 3, [9.0] * 3)):
        full[4 * k:4 * k + 4] += np.asarray(off)
    pos = compute_virtual_sites(sys_, jnp.asarray(full))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-8, max_iterations=100))
    pot.tune_capacities(pos)
    # 4 beads with a small Gaussian spread on the real atoms
    st = R.initial_state(sys_, pos, 4, 300.0, jax.random.PRNGKey(0),
                         spread=0.005)
    q = jax.vmap(lambda x: compute_virtual_sites(sys_, x))(st.positions)
    t = 300.0
    p = float(PR.rpmd_virial_pressure(pot, q, t))
    p_ideal = (3 * units.BOLTZMANN_KJ_MOL_K * t / L ** 3
               / PR.BAR_IN_KJ_MOL_NM3)
    # same tolerance as the classical dilute test (PME self/background)
    assert abs(p - p_ideal) < 0.25 * p_ideal, (p, p_ideal)
