"""Native voxel-hash neighbor lists vs the jitted builder (and brute force)."""
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.ops import native
from mbpol_openmm_plugin_tpu.system import make_molecules_whole
from test_neighbors import _brute_force_lists


@pytest.mark.parametrize('periodic', [True, False])
def test_native_lists_match_brute_force(periodic):
    box = [1.8] * 3 if periodic else None
    sys_, pos = fixtures.load_system('water50', box=box)
    if periodic:
        pos = make_molecules_whole(sys_, pos)
    o = np.asarray(pos[sys_.o_index])
    for cutoff in (0.45, 0.65):
        bf_pairs, bf_trips = _brute_force_lists(o, box, cutoff)
        pairs, n_p = native.pair_list(o, box, cutoff)
        assert n_p == len(bf_pairs)
        assert {tuple(p) for p in pairs} == set(bf_pairs)
        trips, n_t = native.triplet_list(o, box, cutoff)
        assert n_t == len(bf_trips), (n_t, len(bf_trips))
        assert {tuple(sorted(t)) for t in trips} == {tuple(t) for t in bf_trips}


def test_native_scales_to_large_system():
    rng = np.random.default_rng(0)
    n = 4096
    box = [8.0] * 3
    o = rng.uniform(0, 8.0, size=(n, 3))
    pairs, n_p = native.pair_list(o, box, 0.65, capacity=n * 64)
    trips, n_t = native.triplet_list(o, box, 0.45, capacity=n * 256)
    assert n_p > 0 and n_t > 0
    # spot check a few pairs
    b = np.asarray(box)
    for i, j in pairs[:50]:
        d = o[i] - o[j]
        d -= np.floor(d / b + 0.5) * b
        assert np.linalg.norm(d) < 0.65
