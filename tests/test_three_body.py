"""Golden tests for the three-body term.

Goldens from platforms/reference/tests/TestReferenceMBPolThreeBodyForce.cpp:95-141
(full-precision trimer geometry, E = 0.15586446 kcal/mol + per-atom gradients).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu.models.three_body import three_body_energy
from mbpol_openmm_plugin_tpu.system import System
from mbpol_openmm_plugin_tpu.utils import units

WATER3_POS = np.array([
    [-1.516074336e+00, -2.023167650e-01, 1.454672917e+00],
    [-6.218989773e-01, -6.009430735e-01, 1.572437625e+00],
    [-2.017613812e+00, -4.190350349e-01, 2.239642849e+00],
    [-1.763651687e+00, -3.816594649e-01, -1.300353949e+00],
    [-1.903851736e+00, -4.935677617e-01, -3.457810126e-01],
    [-2.527904158e+00, -7.613550077e-01, -1.733803676e+00],
    [-5.588472140e-01, 2.006699172e+00, -1.392786582e-01],
    [-9.411558180e-01, 1.541226676e+00, 6.163293071e-01],
    [-9.858551734e-01, 1.567124294e+00, -8.830970941e-01],
]) * 0.1

WATER3_GRAD_KCAL_A = np.array([
    [0.29919011, -0.34960381, -0.16238472],
    [0.34138467, -0.01255068, -0.00998383],
    [-0.44376649, 0.03687577, 0.54604510],
    [-0.01094164, -0.36171476, -0.05130395],
    [0.24939202, 1.29382952, 0.22930712],
    [-0.13250943, -0.19313418, -0.34123592],
    [0.56722869, 0.46036139, -0.39999973],
    [-0.75669111, -0.76132457, -0.29799486],
    [-0.11328682, -0.11273867, 0.48755080],
])

GOLDEN_ENERGY_KCAL = 0.15586446


def _as_full_positions(pos9):
    sys_ = System.waters(3)
    full = np.zeros((12, 3))
    full[[0, 1, 2, 4, 5, 6, 8, 9, 10]] = pos9
    return sys_, jnp.asarray(full)


def test_three_body_energy_golden():
    sys_, pos = _as_full_positions(WATER3_POS)
    e = three_body_energy(sys_, pos)
    e_kcal = float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(e_kcal - GOLDEN_ENERGY_KCAL) < 1e-6, e_kcal


def test_three_body_forces_golden():
    sys_, pos = _as_full_positions(WATER3_POS)
    grad = jax.grad(lambda p: three_body_energy(sys_, p))(pos)
    grad_kcal_a = np.asarray(grad) * units.KJ_PER_MOL_TO_KCAL_PER_MOL / units.NM_TO_ANGSTROM
    np.testing.assert_allclose(grad_kcal_a[[0, 1, 2, 4, 5, 6, 8, 9, 10]],
                               WATER3_GRAD_KCAL_A, atol=2e-4)


def test_three_body_periodic_offset_invariance():
    box = 5.0
    sys_, pos = _as_full_positions(WATER3_POS)
    sys_p = sys_.with_box([box, box, box])
    e0 = three_body_energy(sys_p, pos)
    shifted = np.asarray(pos).copy()
    shifted[4:8, 1] += box
    e1 = three_body_energy(sys_p, jnp.asarray(shifted))
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-8)


def test_three_body_far_triplet_zero_nan_free():
    sys_, pos = _as_full_positions(WATER3_POS)
    far = np.asarray(pos).copy()
    far[8:12] += 3.0   # third water far outside r3f
    # only pairs a-b remain close: switch product vanishes
    e = three_body_energy(sys_, jnp.asarray(far))
    assert float(e) == 0.0
    g = jax.grad(lambda p: three_body_energy(sys_, p))(jnp.asarray(far))
    assert np.all(np.isfinite(np.asarray(g)))


def test_triplet_semantics_reference_parity_water50():
    """Opt-in strict-parity triplet mode vs the default complete set.

    The reference's enumeration (ReferenceThreeNeighborList.cpp:215-225)
    emits only middle-centered ascending chains {a<b<c: edge(a,b), edge(b,c)}
    and therefore misses two-edge triplets whose shared center is the
    smallest or largest index. On the water50 fixture (0.45 nm cutoff,
    1.8 nm box) that is 1.2847 kcal/mol of three-body energy - the documented
    deviation (ops/neighbors.py docstring). Both values are pinned so a
    change to either enumeration is caught.
    """
    import fixtures
    from mbpol_openmm_plugin_tpu.ops import neighbors

    sys_, pos = fixtures.load_system('water50', box=[1.8, 1.8, 1.8])
    o_pos = pos[sys_.o_index]
    box = sys_.box
    cutoff = 0.45
    cap = neighbors.triplet_capacity(sys_.n_waters, box, cutoff)
    vals = {}
    for sem in ('complete', 'reference'):
        trips, mask, n = neighbors.triplet_list(o_pos, box, cutoff, cap,
                                                semantics=sem)
        assert int(n) <= cap
        e = three_body_energy(sys_, pos, trips, mask, box=jnp.asarray(box))
        vals[sem] = float(e) * units.KJ_PER_MOL_TO_KCAL_PER_MOL
    assert abs(vals['complete'] - 3.848850) < 1e-4, vals
    assert abs(vals['reference'] - 2.564164) < 1e-4, vals
    assert abs((vals['complete'] - vals['reference']) - 1.284686) < 1e-4


def test_quad_basis_bf16x3_selection_bit_identical(monkeypatch):
    """The one-hot bf16 MXU selection (3-way exact bf16 split, used on TPU
    f32) is bit-identical to the static lane gather for both PIP bases."""
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.ops import polyeval as P
    rng = np.random.default_rng(0)
    for name, nv in (('poly3b', 36), ('poly2b', 31)):
        x = jnp.asarray(rng.uniform(1e-4, 1.0, (97, nv)), jnp.float32)
        monkeypatch.setenv('MBPOL_PIP_BASIS', 'gather')
        g = P.quad_basis(x, name)
        monkeypatch.setenv('MBPOL_PIP_BASIS', 'bf16x3')
        b = P.quad_basis(x, name)
        assert bool((np.asarray(g) == np.asarray(b)).all())


def test_quad_vech_order_matches_gather(monkeypatch):
    """The natural vech order (complete degree-<=2 basis as a structured
    outer product; load_quad_vech) evaluates the same quadratic form as
    the file-order gather basis, for energies AND gradients."""
    from mbpol_openmm_plugin_tpu.ops import polyeval as P
    rng = np.random.default_rng(2)
    for name, nv in (('poly3b', 36), ('poly2b', 31)):
        x = jnp.asarray(rng.uniform(1e-4, 1.0, (97, nv)))
        monkeypatch.setenv('MBPOL_PIP_BASIS', 'gather')
        F, W = P.load_quad(name)
        e0, g0 = P.pip_quad_energy_and_grad(x, jnp.asarray(F),
                                            jnp.asarray(W), name=name)
        monkeypatch.setenv('MBPOL_PIP_BASIS', 'vech')
        Fv, Wv = P.load_quad_vech(name)
        e1, g1 = P.pip_quad_energy_and_grad(x, jnp.asarray(Fv),
                                            jnp.asarray(Wv), name=name)
        sc = float(np.abs(np.asarray(e0)).max())
        assert float(np.max(np.abs(np.asarray(e1 - e0)))) < 1e-12 * sc
        assert float(np.max(np.abs(np.asarray(g1 - g0)))) < 1e-11 * sc


def test_vech_pallas_kernel_interpret_matches_xla():
    """The fused transposed vech kernel (interpret mode) tracks the f32
    XLA quad path within the bf16x6-vs-f32 emulation band on physical-
    range variables."""
    from mbpol_openmm_plugin_tpu.ops import polyeval as P
    from mbpol_openmm_plugin_tpu.ops.pip_pallas import \
        pip_vech_energy_grad_tpu
    rng = np.random.default_rng(3)
    for name, nv in (('poly3b', 36), ('poly2b', 31)):
        xf = rng.uniform(1e-4, 1.0, (300, nv))
        x64 = jnp.asarray(xf, jnp.float64)
        x32 = jnp.asarray(xf, jnp.float32)
        F, W = P.load_quad(name)
        e0, g0 = P.pip_quad_energy_and_grad(x64, jnp.asarray(F),
                                            jnp.asarray(W), name=None)
        ex, gx = P.pip_quad_energy_and_grad(
            x32, jnp.asarray(F, jnp.float32), jnp.asarray(W, jnp.float32),
            name=name)
        e1, g1 = pip_vech_energy_grad_tpu(name, x32, interpret=True)
        err_xla = float(np.max(np.abs(np.asarray(ex, np.float64)
                                      - np.asarray(e0))))
        err_k = float(np.max(np.abs(np.asarray(e1, np.float64)
                                    - np.asarray(e0))))
        # the kernel's manual bf16 passes may lose a small factor vs the
        # XLA HIGHEST codegen but must stay in the same accuracy class
        assert np.isfinite(err_k)
        assert err_k < max(20.0 * err_xla, 1e-3), (name, err_k, err_xla)
        # force path: the F^T contraction + /x gradient must track the f64
        # oracle VALUE-wise, not just shape-wise - a wrong Ftp permutation,
        # a dropped /x, or a W-transpose bug all flip this by orders of
        # magnitude while leaving the energy check green (advisor round 4).
        # Band: same multiplicative allowance over the f32 XLA gradient
        # error as the energy check, with an absolute floor for the bf16x6
        # emulation noise.
        gsc = float(np.abs(np.asarray(g0)).max())
        err_g_xla = float(np.max(np.abs(np.asarray(gx, np.float64)
                                        - np.asarray(g0))))
        err_g_k = float(np.max(np.abs(np.asarray(g1, np.float64)
                                      - np.asarray(g0))))
        assert np.isfinite(err_g_k)
        assert err_g_k < max(20.0 * err_g_xla, 5e-3 * gsc), \
            (name, err_g_k, err_g_xla, gsc)


def test_pip_typed_config_knobs(monkeypatch):
    """MBPolConfig.pip_impl/pip_basis select the evaluator without env vars
    (round-4 verdict: no physics-affecting default reachable only via
    os.environ), and the vech basis choice drags the matching permuted
    tables with it (the basis/table coupling is a single resolved value)."""
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    sys_, pos = _as_full_positions(WATER3_POS)
    monkeypatch.delenv('MBPOL_PIP_BASIS', raising=False)
    monkeypatch.delenv('MBPOL_PIP_IMPL', raising=False)
    e_ref = None
    for impl, basis in ((None, None), ('quad', 'vech'), ('monomial', None)):
        pot = MBPol(sys_, MBPolConfig(terms=('two_body', 'three_body'),
                                      pip_impl=impl, pip_basis=basis))
        e, _, parts, _ = pot.energy_forces(jnp.asarray(pos))
        if e_ref is None:
            e_ref = float(e)
        else:
            assert abs(float(e) - e_ref) < 1e-6 * max(1.0, abs(e_ref)), \
                (impl, basis, float(e), e_ref)


def test_scf_eps_floor_typed_config():
    """The typed scf_eps_floor reaches the f32 SCF clamp (and wins over
    the env default)."""
    from mbpol_openmm_plugin_tpu.models import electrostatics as E
    assert E._f32_eps_floor(None) == 1e-4
    assert E._f32_eps_floor(1e-6) == 1e-6
