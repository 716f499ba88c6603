"""Replica-exchange MD (parallel tempering) tests.

The reference has no enhanced-sampling machinery (one OpenMM context, one
temperature); md/remd.py is beyond-parity. Validation without reference
goldens, following the suite's analytic-results ethos (cf. test_rpmd.py):
the Metropolis sweep is pinned against the exact acceptance probability,
the velocity rescale against the exact KE relation, and the full REMD
loop against harmonic-oscillator equipartition at every ladder
temperature (swaps must not disturb the per-temperature canonical
ensembles). MBPol integration is covered by a water3 smoke +
bitwise-determinism + checkpoint tests, and a sharded-vs-unsharded run on
the virtual 8-device mesh.
"""
import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.md import integrators as I
from mbpol_openmm_plugin_tpu.md import remd
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.parallel import mesh as M
from mbpol_openmm_plugin_tpu.system import System
from mbpol_openmm_plugin_tpu.utils import units


# ----------------------------------------------------------------------
# exchange sweep unit tests
# ----------------------------------------------------------------------
def test_exchange_uniform_ladder_swaps_all_pairs():
    # equal temperatures: log-ratio is 0, log(u) < 0 always -> every
    # candidate pair swaps; perm must be a parity-pair involution
    pe = jnp.asarray([1.0, -3.0, 2.5, 0.1, -1.0])
    T = jnp.full((5,), 300.0)
    for parity in (0, 1):
        perm, accept = remd.exchange_permutation(
            pe, T, jax.random.PRNGKey(0), parity)
        perm = np.asarray(perm)
        np.testing.assert_array_equal(perm[perm], np.arange(5))
        expected = np.arange(5)
        for i in range(parity, 4, 2):
            expected[i], expected[i + 1] = i + 1, i
        np.testing.assert_array_equal(perm, expected)
        acc = np.asarray(accept)
        assert acc.sum() == len(range(parity, 4, 2))


def test_exchange_acceptance_matches_metropolis_probability():
    # R=4, parity 0 -> pairs (0,1) and (2,3); average acceptance over many
    # keys must match min(1, exp[(b_i - b_j)(U_i - U_j)])
    T = np.array([250.0, 300.0, 360.0, 432.0])
    pe = np.array([-10.0, -4.0, -6.0, -5.9])
    betas = 1.0 / (units.BOLTZMANN_KJ_MOL_K * T)
    p01 = min(1.0, np.exp((betas[0] - betas[1]) * (pe[0] - pe[1])))
    p23 = min(1.0, np.exp((betas[2] - betas[3]) * (pe[2] - pe[3])))
    assert 0.01 < p01 < 0.99, p01   # the test must exercise a real rate

    n = 4000
    sweep = jax.jit(jax.vmap(
        lambda k: remd.exchange_permutation(jnp.asarray(pe), jnp.asarray(T),
                                            k, 0)[1]))
    acc = np.asarray(sweep(jax.random.split(jax.random.PRNGKey(7), n)))
    rate01, rate23 = acc[:, 0].mean(), acc[:, 2].mean()
    assert abs(rate01 - p01) < 4.0 * np.sqrt(p01 * (1 - p01) / n) + 1e-9
    assert abs(rate23 - p23) < 4.0 * np.sqrt(max(p23 * (1 - p23), 1e-4) / n) + 1e-9
    assert not acc[:, 1].any() and not acc[:, 3].any()


def test_apply_exchange_velocity_rescale():
    key = jax.random.PRNGKey(3)
    T = np.array([200.0, 400.0])
    sys_ = System.waters(1)
    state = remd.initial_state(sys_, np.zeros((4, 3)), T, key)
    v = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 3))
    state = dataclasses.replace(
        state, velocities=v,
        potential_energy=jnp.asarray([1.0, 2.0]),
        positions=jax.random.normal(jax.random.PRNGKey(6), (2, 4, 3)))
    perm = jnp.asarray([1, 0], jnp.int32)
    out = remd.apply_exchange(state, perm, T)
    # configuration arriving at slot 0 (from slot 1) is rescaled by
    # sqrt(T0/T1): its KE picks up a factor T0/T1 exactly
    np.testing.assert_allclose(np.asarray(out.velocities[0]),
                               np.asarray(v[1]) * np.sqrt(200.0 / 400.0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.velocities[1]),
                               np.asarray(v[0]) * np.sqrt(400.0 / 200.0),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(state.positions)[::-1], rtol=0)
    np.testing.assert_allclose(np.asarray(out.potential_energy), [2.0, 1.0])


# ----------------------------------------------------------------------
# full REMD loop on an analytic potential
# ----------------------------------------------------------------------
def _harmonic_ef(system, k_spring):
    mask = jnp.asarray((np.asarray(system.masses) > 0.0)[:, None])

    def ef(p, mu):
        e = 0.5 * k_spring * jnp.sum(jnp.where(mask, p * p, 0.0))
        f = -k_spring * jnp.where(mask, p, 0.0)
        return e, f, None, jnp.ones((), bool)

    return ef


def _run_harmonic(temps, n_blocks, exchange_interval=10, dt=0.002,
                  friction=5.0, k_spring=2000.0, seed=0, mesh=None):
    """REMD on a 3D isotropic harmonic well per real atom of one water
    (masses 15.999, 1.008, 1.008; M site massless). Returns
    (final_state, walkers [n_blocks, R], pe [n_blocks, interval, R],
    accept [n_blocks, R])."""
    sys_ = System.waters(1)
    R = len(temps)
    block = remd.make_remd_block(sys_, _harmonic_ef(sys_, k_spring), temps,
                                 dt, friction=friction,
                                 exchange_interval=exchange_interval,
                                 mesh=mesh)
    state = remd.initial_state(sys_, np.zeros((4, 3)), temps,
                               jax.random.PRNGKey(seed))

    @functools.partial(jax.jit, static_argnames=('n',))
    def run(state, walker, key, n):
        def body(carry, i):
            state, walker, key = carry
            state, _mu, walker, key, stats = block(state, None, walker, key,
                                                   i % 2)
            return (state, walker, key), (walker, stats['pe'],
                                          stats['accept'])

        return jax.lax.scan(body, (state, walker, key), jnp.arange(n))

    walker0 = jnp.arange(R, dtype=jnp.int32)
    (state, walker, _key), (walkers, pes, accepts) = run(
        state, walker0, jax.random.PRNGKey(seed + 1), n_blocks)
    return state, np.asarray(walkers), np.asarray(pes), np.asarray(accepts)


def test_harmonic_ladder_equipartition_and_mixing():
    temps = np.array([200.0, 300.0, 450.0])
    n_blocks = 2000
    _state, walkers, pes, accepts = _run_harmonic(temps, n_blocks)

    # equipartition per ladder slot: <U>_r = (3 n_real / 2) kT_r = 4.5 kT_r,
    # exchanges included - swaps must preserve each slot's canonical
    # ensemble. First quarter discarded as equilibration.
    burn = n_blocks // 4
    u_mean = pes[burn:].reshape(-1, 3).mean(axis=0)
    expected = 4.5 * units.BOLTZMANN_KJ_MOL_K * temps
    np.testing.assert_allclose(u_mean, expected, rtol=0.12)

    # neighbor swaps actually happen at a healthy rate
    att = np.zeros(3)
    att[0] = (np.arange(n_blocks) % 2 == 0).sum()
    att[1] = n_blocks - att[0]
    rates = accepts.sum(axis=0)[:2] / att[:2]
    assert (rates > 0.05).all() and (rates <= 1.0).all(), rates

    # replica flow: the walker that started cold visits the hottest slot
    assert (walkers[:, -1] == 0).any(), 'no round trip: ladder not mixing'
    # walker ids remain a permutation every block
    assert (np.sort(walkers, axis=1) == np.arange(3)).all()


def test_harmonic_remd_sharded_matches_unsharded():
    # 8 replicas over the 8-device virtual mesh: the trajectory must be
    # bitwise independent of the mesh (noise keys are replicated; the
    # exchange gather is layout-only)
    temps = np.geomspace(200.0, 500.0, 8)
    s0, w0, p0, a0 = _run_harmonic(temps, 40, seed=3)
    s1, w1, p1, a1 = _run_harmonic(temps, 40, seed=3, mesh=M.make_mesh(8))
    np.testing.assert_array_equal(w0, w1)
    np.testing.assert_allclose(p0, p1, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s0.positions),
                               np.asarray(s1.positions), atol=1e-12)


# ----------------------------------------------------------------------
# MBPol driver integration
# ----------------------------------------------------------------------
def _mbpol_remd(seed=1, mesh=None, **cfg_kw):
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9))
    cfg = remd.REMDConfig(dt=0.0002, exchange_interval=5, **cfg_kw)
    sim = remd.REMDSimulation(pot, temperatures=[300.0, 400.0], config=cfg,
                              seed=seed, mesh=mesh)
    sim.set_positions(pos)
    sim.set_velocities_to_temperature()
    return sim


def test_mbpol_remd_smoke_and_determinism():
    sim = _mbpol_remd()
    out = sim.run(3)
    assert out['potential_energy'].shape == (3, 2)
    assert np.isfinite(out['potential_energy']).all()
    assert out['acceptance'].shape == (1,)
    # same seed, fresh driver -> bitwise identical trajectory
    sim2 = _mbpol_remd()
    out2 = sim2.run(3)
    np.testing.assert_array_equal(out['potential_energy'],
                                  out2['potential_energy'])
    np.testing.assert_array_equal(np.asarray(sim.state.positions),
                                  np.asarray(sim2.state.positions))


def test_mbpol_remd_checkpoint_resume():
    sim = _mbpol_remd()
    sim.run(2)
    ck = sim.checkpoint()
    ref = sim.run(2)

    sim2 = _mbpol_remd(scf_warm_start=True)
    sim2.set_positions(np.asarray(sim2.state.positions[0]))
    sim2.load_checkpoint(ck)
    out = sim2.run(2)
    np.testing.assert_array_equal(out['potential_energy'],
                                  ref['potential_energy'])
    np.testing.assert_array_equal(np.asarray(sim2.state.positions),
                                  np.asarray(sim.state.positions))
    np.testing.assert_array_equal(np.asarray(sim2.walker),
                                  np.asarray(sim.walker))


def test_mbpol_remd_driver_mesh_matches_unsharded():
    """REMDSimulation with an explicit replica mesh (2 replicas over 2
    devices) reproduces the unsharded driver. The noise keys are
    replicated, so the trajectories agree to the reduction-order
    (layout) floor of the MBPol evaluation (~1e-10 on water3); exchange
    decisions and walker flow must match exactly."""
    out0 = _mbpol_remd().run(2)
    out1 = _mbpol_remd(mesh=M.make_mesh(2)).run(2)
    np.testing.assert_allclose(out0['potential_energy'],
                               out1['potential_energy'],
                               rtol=1e-8, atol=1e-7)
    np.testing.assert_array_equal(out0['accept'], out1['accept'])
    np.testing.assert_array_equal(out0['walker'], out1['walker'])


def test_remd_validates_ladder():
    sys_, pos = fixtures.load_system('water3')
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff', cutoff=0.9))
    with pytest.raises(ValueError):
        remd.REMDSimulation(pot, temperatures=[])
    with pytest.raises(ValueError):
        remd.REMDSimulation(pot, temperatures=[300.0, 300.0])
    # R = 1 is a valid degenerate ladder (the single-replica baseline for
    # ladder_efficiency): identity exchanges, same vmapped machinery
    sim = remd.REMDSimulation(pot, temperatures=[300.0])
    sim.set_positions(pos)
    sim.set_velocities_to_temperature()
    out = sim.run(2)
    assert np.isfinite(out['potential_energy']).all()
    assert out['acceptance'].shape == (0,) or not np.any(out['acceptance'])


def test_geometric_ladder():
    t = remd.geometric_ladder(280.0, 420.0, 5)
    assert t[0] == pytest.approx(280.0) and t[-1] == pytest.approx(420.0)
    np.testing.assert_allclose(np.diff(np.log(t)), np.diff(np.log(t))[0])


def test_remd_frame_callback_cold_slot():
    """frame_callback receives the cold-slot configuration per block with
    recomputed M-sites and the global MD step count."""
    from mbpol_openmm_plugin_tpu.system import compute_virtual_sites

    sim = _mbpol_remd()
    frames = []
    out = sim.run(3, frame_callback=lambda s, p, b: frames.append((s, p, b)))
    assert len(frames) == 3
    steps = [f[0] for f in frames]
    assert steps == [5, 10, 15]          # exchange_interval = 5
    p0, p1 = frames[0][1], frames[1][1]
    assert p0.shape == (12, 3) and not np.allclose(p0, p1)
    # M-site rows satisfy the virtual-site construction exactly
    np.testing.assert_allclose(
        p0, np.asarray(compute_virtual_sites(sim.system, p0)), atol=1e-12)
    # frames do not perturb the trajectory: same run without callback
    sim2 = _mbpol_remd()
    out2 = sim2.run(3)
    np.testing.assert_array_equal(out['potential_energy'],
                                  out2['potential_energy'])


@pytest.mark.slow
def test_remd_nlist_reuse_matches_per_step_rebuild():
    """nlist_reuse=True (lists built once per exchange block) reproduces
    the per-step-rebuild trajectory - the skin makes the block-start
    lists a superset of the physical lists for the whole block, and
    padded-superset evaluation is exact."""
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.system import compute_virtual_sites

    fix = fixtures.load('water50')
    sys_ = System.waters(50, box=[1.8, 1.8, 1.8])
    pos = compute_virtual_sites(sys_, jnp.asarray(fix['positions']))

    def make(reuse):
        pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45,
                                      target_epsilon=1e-6,
                                      nlist_skin=0.02))
        pot.tune_capacities(pos)
        cfg = remd.REMDConfig(dt=2e-4, exchange_interval=5,
                              nlist_reuse=reuse)
        sim = remd.REMDSimulation(pot, temperatures=[300.0, 360.0],
                                  config=cfg, seed=2)
        sim.set_positions(pos)
        sim.set_velocities_to_temperature()
        return sim

    out0 = make(False).run(2)
    out1 = make(True).run(2)
    np.testing.assert_allclose(out0['potential_energy'],
                               out1['potential_energy'],
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_array_equal(out0['walker'], out1['walker'])

    # misconfiguration raises clearly
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45,
                                  nlist_skin=0.0))
    with pytest.raises(ValueError):
        remd.REMDSimulation(pot, temperatures=[300.0, 360.0],
                            config=remd.REMDConfig(nlist_reuse=True))


def test_remd_nlist_reuse_app_layer_skin_rebuild():
    """The builder's [remd] nlist_reuse path: app-layer potentials carry
    nlist_skin = 0 (rejected, clear error), and the rendered script's
    dataclasses.replace(..., nlist_skin=...) rebuild is accepted."""
    import dataclasses as dc

    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.system import compute_virtual_sites

    fix = fixtures.load('water50')
    sys_ = System.waters(50, box=[1.8, 1.8, 1.8])
    pos = compute_virtual_sites(sys_, jnp.asarray(fix['positions']))
    pot0 = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.45))
    cfg = remd.REMDConfig(nlist_reuse=True)
    with pytest.raises(ValueError, match='nlist_skin'):
        remd.REMDSimulation(pot0, temperatures=[300.0, 360.0], config=cfg)
    pot = MBPol(pot0.system, dc.replace(pot0.config, nlist_skin=0.02))
    sim = remd.REMDSimulation(pot, temperatures=[300.0, 360.0], config=cfg)
    assert sim is not None
