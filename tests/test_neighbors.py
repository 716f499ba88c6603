"""Neighbor-list correctness: padded lists must reproduce dense results.

Mirrors the counting intent of TestReferenceThreeNeighborList.cpp, but
against the complete >= 2-edge triplet set (see ops/neighbors.py docstring
for the documented deviation from the reference's enumeration).
"""
import itertools

import jax.numpy as jnp
import numpy as np

import fixtures
from mbpol_openmm_plugin_tpu.models.three_body import three_body_energy
from mbpol_openmm_plugin_tpu.models.two_body import two_body_energy
from mbpol_openmm_plugin_tpu.ops import neighbors
from mbpol_openmm_plugin_tpu.system import make_molecules_whole


def _brute_force_lists(o, box, cutoff):
    n = len(o)
    d = o[:, None, :] - o[None, :, :]
    if box is not None:
        b = np.asarray(box)
        d -= np.floor(d / b + 0.5) * b
    r = np.sqrt((d ** 2).sum(-1))
    edge = (r < cutoff) & ~np.eye(n, dtype=bool)
    pairs = [(i, j) for i, j in itertools.combinations(range(n), 2) if edge[i, j]]
    trips = [t for t in itertools.combinations(range(n), 3)
             if int(edge[t[0], t[1]]) + int(edge[t[0], t[2]]) + int(edge[t[1], t[2]]) >= 2]
    return pairs, trips


def test_lists_match_brute_force_water50():
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pos = make_molecules_whole(sys_, pos)
    o = np.asarray(pos[sys_.o_index])

    for cutoff in (0.45, 0.65):
        bf_pairs, bf_trips = _brute_force_lists(o, box, cutoff)
        cap_p = neighbors.pair_capacity(50, box, cutoff)
        pairs, pmask, n_p = neighbors.pair_list(jnp.asarray(o), box, cutoff, cap_p)
        got = {tuple(p) for p, m in zip(np.asarray(pairs), np.asarray(pmask)) if m}
        assert got == set(bf_pairs), (cutoff, len(got), len(bf_pairs))
        assert int(n_p) == len(bf_pairs)

        cap_t = neighbors.triplet_capacity(50, box, cutoff)
        trips, tmask, n_t = neighbors.triplet_list(jnp.asarray(o), box, cutoff, cap_t)
        got_t = {tuple(sorted(t)) for t, m in zip(np.asarray(trips), np.asarray(tmask)) if m}
        assert int(n_t) == len(bf_trips), (int(n_t), len(bf_trips))
        assert got_t == {tuple(t) for t in bf_trips}


def test_listed_energies_match_dense_water50():
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pos = make_molecules_whole(sys_, pos)
    o = pos[sys_.o_index]

    cap_p = neighbors.pair_capacity(50, box, 0.65)
    pairs, pmask, _ = neighbors.pair_list(o, box, 0.65, cap_p)
    e_list = two_body_energy(sys_, pos, pairs, pmask)
    e_dense = two_body_energy(sys_, pos)
    np.testing.assert_allclose(float(e_list), float(e_dense), rtol=1e-12)

    cap_t = neighbors.triplet_capacity(50, box, 0.45)
    trips, tmask, _ = neighbors.triplet_list(o, box, 0.45, cap_t)
    e_list3 = three_body_energy(sys_, pos, trips, tmask)
    e_dense3 = three_body_energy(sys_, pos)
    np.testing.assert_allclose(float(e_list3), float(e_dense3), rtol=1e-10)


def test_triplet_energy_permutation_invariance():
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pos = make_molecules_whole(sys_, pos)
    o = pos[sys_.o_index]
    cap_t = neighbors.triplet_capacity(50, box, 0.45)
    trips, tmask, _ = neighbors.triplet_list(o, box, 0.45, cap_t)
    t = np.asarray(trips)
    e1 = three_body_energy(sys_, pos, t, tmask)
    e2 = three_body_energy(sys_, pos, t[:, [2, 0, 1]], tmask)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-10)


def test_skinned_lists_give_identical_energies():
    """Lists built with a Verlet skin are a superset of the physical lists;
    the 2b/3b switches vanish beyond their cutoffs, so energies are exact."""
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pos = make_molecules_whole(sys_, pos)
    o = pos[sys_.o_index]
    for cutoff, term in ((0.65, two_body_energy), (0.45, three_body_energy)):
        cap = (neighbors.pair_capacity(50, box, cutoff + 0.1) if term is two_body_energy
               else neighbors.triplet_capacity(50, box, cutoff + 0.1))
        if term is two_body_energy:
            lst, mask, _ = neighbors.pair_list(o, box, cutoff + 0.1, cap)
        else:
            lst, mask, _ = neighbors.triplet_list(o, box, cutoff + 0.1, cap)
        e_skin = term(sys_, pos, lst, mask)
        e_dense = term(sys_, pos)
        np.testing.assert_allclose(float(e_skin), float(e_dense), rtol=1e-9)  # identical up to summation order


def test_compacted_lists_give_identical_energies():
    """Per-step compaction (ops/neighbors.compact_*) keeps exactly the
    entries with nonzero switch weight: energies and the end-to-end
    potential are unchanged."""
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pos = make_molecules_whole(sys_, pos)
    o = pos[sys_.o_index]

    cap_p = neighbors.pair_capacity(50, box, 0.75)
    pairs, pmask, _ = neighbors.pair_list(o, box, 0.75, cap_p)
    pc, pcm, n_p = neighbors.compact_pairs(o, box, pairs, pmask, 0.65, 0.2, cap_p)
    assert int(n_p) <= int(jnp.sum(pmask))
    e_c = two_body_energy(sys_, pos, pc, pcm)
    e_d = two_body_energy(sys_, pos)
    np.testing.assert_allclose(float(e_c), float(e_d), rtol=1e-10)

    cap_t = neighbors.triplet_capacity(50, box, 0.55)
    trips, tmask, _ = neighbors.triplet_list(o, box, 0.55, cap_t)
    tc, tcm, n_t = neighbors.compact_triplets(o, box, trips, tmask, 0.45, 0.2, cap_t)
    assert int(n_t) <= int(jnp.sum(tmask))
    e_c3 = three_body_energy(sys_, pos, tc, tcm)
    e_d3 = three_body_energy(sys_, pos)
    np.testing.assert_allclose(float(e_c3), float(e_d3), rtol=1e-10)


def test_compact_eval_end_to_end():
    """MBPolConfig(compact_eval=True) reproduces the baseline potential."""
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    base = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                   target_epsilon=1e-7))
    e0, f0, _, _ = base.energy_forces(pos)
    comp = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                   target_epsilon=1e-7, nlist_skin=0.05,
                                   compact_eval=True))
    e1, f1, _, d1 = comp.energy_forces(pos)
    assert not bool(d1['pair_eval_overflow'])
    assert not bool(d1['triplet_eval_overflow'])
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=1e-6)


def test_triplet_two_stage_tuned_and_overflow():
    """Two-stage triplet selection: tuned (k_max, kt) reproduces the exact
    set; undersized k_max or kt is surfaced through the n_found > capacity
    overflow contract instead of silently truncating."""
    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pos = make_molecules_whole(sys_, pos)
    o = pos[sys_.o_index]
    cutoff = 0.55

    cap = neighbors.triplet_capacity(50, box, cutoff)
    ref, rmask, n_ref = neighbors.triplet_list(o, box, cutoff, cap)
    ref_set = {tuple(t) for t, m in zip(np.asarray(ref), np.asarray(rmask)) if m}

    # measured shape parameters (what tune_capacities derives natively)
    d = np.asarray(o)[:, None, :] - np.asarray(o)[None, :, :]
    d -= np.floor(d / np.asarray(box) + 0.5) * np.asarray(box)
    edge = ((d ** 2).sum(-1) < cutoff ** 2) & ~np.eye(50, dtype=bool)
    max_nbr = int(edge.sum(1).max())
    centers = np.asarray(ref)[np.asarray(rmask)][:, 1]
    max_ct = int(np.bincount(centers, minlength=50).max())

    tuned, tmask, n_t = neighbors.triplet_list(
        o, box, cutoff, cap, k_max=max_nbr, kt=max_ct)
    assert int(n_t) == int(n_ref) <= cap
    got = {tuple(t) for t, m in zip(np.asarray(tuned), np.asarray(tmask)) if m}
    assert got == ref_set

    # undersized per-center capacity -> overflow, not silent truncation
    _, _, n_over = neighbors.triplet_list(
        o, box, cutoff, cap, k_max=max_nbr, kt=max_ct - 1)
    assert int(n_over) > cap

    # undersized neighbor fan-out -> overflow as well
    _, _, n_over2 = neighbors.triplet_list(
        o, box, cutoff, cap, k_max=max_nbr - 1, kt=max_ct)
    assert int(n_over2) > cap


def test_tune_capacities_sets_triplet_shape_params():
    """tune_capacities derives nlist_k_max/nlist_kt from native counts and
    the tuned build matches the analytic-shape build exactly."""
    import pytest

    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.ops import native
    try:
        native._lib()
    except Exception:
        pytest.skip('native library unavailable')

    box = [1.8] * 3
    sys_, pos = fixtures.load_system('water50', box=box)
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.85,
                                  target_epsilon=1e-7, nlist_skin=0.05))
    (p0, pm0), (t0, tm0), _ = pot._neighbor_lists(pos)
    assert pot.nlist_k_max is None
    pot.tune_capacities(pos)
    assert pot.nlist_k_max is not None and pot.nlist_kt is not None
    assert pot.nlist_k_max < 49    # actually tuned below the analytic bound
    (p1, pm1), (t1, tm1), diag = pot._neighbor_lists(pos)
    assert not bool(diag['triplet_overflow'])
    trip_set = lambda t, m: {tuple(x) for x, mm
                             in zip(np.asarray(t), np.asarray(m)) if mm}
    assert trip_set(t1, tm1) == trip_set(t0, tm0)
