"""Data-driven evaluation of permutationally-invariant polynomials (PIPs).

The MB-pol 2-body/3-body corrections are polynomials of degree <= 4 in 31/36
positive variables (exponentials of inter-atomic distances; reference:
MBPolReferenceTwoBodyForce.cpp:170-207, MBPolReferenceThreeBodyForce.cpp:168-206).
The reference evaluates them with ~42k lines of generated scalar C++
(poly-2b-v6x.cpp, poly-3b-v2x.cpp). Here the polynomial is *data*:

    E(x) = mono(x) @ c,   mono_m(x) = prod_i x_i^{e_mi} = exp(log(x) @ e_m)

so a batch of P pair/triplet evaluations is two MXU matmuls:

    M   = exp(log(X) @ E^T)          # [P, nvars] @ [nvars, nmono]
    E_p = M @ c                      # [P, nmono] @ [nmono]

and the gradient (for forces) is one more matmul:

    dE/dX = ((M * c) @ E) / X        # [P, nmono] @ [nmono, nvars]

All variables are strictly positive (they are exp(-k(d-d0)) or exp(..)/d), so
the log/exp transform is exact. Extraction and validation against the
reference binaries: tools/extract_poly.py (agreement ~1e-13 relative).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu import data as _data


class PIPData:
    """Container for one extracted polynomial (exponent matrix + coefficients)."""

    def __init__(self, exponents, coeffs):
        self.exponents = np.asarray(exponents)        # [nmono, nvars] int8
        self.coeffs = np.asarray(coeffs)              # [nmono] float64
        self.nmono, self.nvars = self.exponents.shape


@functools.lru_cache(maxsize=None)
def load_pip(name):
    """name in {'poly2b', 'poly3b'}"""
    d = _data.load(name)
    return PIPData(d['exponents'], d['coeffs'])


# PIP fits have large canceling coefficients (|c| up to ~1e5 summing to
# ~kcal/mol): plain bf16 matmul passes corrupt the energy by O(100 kcal/mol).
# HIGH (bf16x3) measures identical to HIGHEST here (f32-input rounding
# dominates the residual error), so HIGH is used for speed.
_PREC = jax.lax.Precision.HIGH


def _grad_prec():
    """Precision of the PIP gradient contraction (m2*(2wm)) @ F.

    Default HIGHEST (round-5 drift measurement, water256 f32 NVE without
    electrostatics, 10 ps windows on chip): the HIGH (bf16x3) gradient
    contraction's rounding is WHITE FORCE NOISE that heats the system at
    +575 K/ns; at HIGHEST the same arm measures -9 K/ns. Cost: ~10% on
    the PIP-only step (one 6-pass vs 3-pass [P,B]@[B,V] matmul), a few
    percent of a full step. Energy accuracy was never the issue (HIGH
    measures identical to HIGHEST there) - conservation is.
    MBPOL_PIP_GRAD_PREC=high restores the old behavior for A/B runs.
    """
    import os
    v = os.environ.get('MBPOL_PIP_GRAD_PREC', 'highest')
    return (jax.lax.Precision.HIGHEST if v.lower() == 'highest'
            else jax.lax.Precision.HIGH)


def pip_energy(x, exponents, coeffs):
    """Batched PIP evaluation.

    Args:
      x: [..., nvars] strictly-positive polynomial variables.
      exponents: [nmono, nvars] integer exponent matrix (cast to x.dtype).
      coeffs: [nmono] coefficients.
    Returns:
      [...] energies. Differentiable; the VJP is the natural transpose matmul.
    """
    et = exponents.astype(x.dtype)
    mono = jnp.exp(jnp.dot(jnp.log(x), et.T, precision=_PREC))
    return jnp.dot(mono, coeffs.astype(x.dtype), precision=_PREC)


def pip_energy_and_grad(x, exponents, coeffs):
    """Energy and analytic dE/dx in one pass (three matmuls)."""
    et = exponents.astype(x.dtype)
    c = coeffs.astype(x.dtype)
    mono = jnp.exp(jnp.dot(jnp.log(x), et.T, precision=_PREC))
    e = jnp.dot(mono, c, precision=_PREC)
    g = jnp.dot(mono * c, et, precision=_PREC) / x
    return e, g


@functools.lru_cache(maxsize=None)
def load_quad(name):
    """Quadratic-form factorization (tools/factor_pip.py):
    E(x) = m2(x)^T W m2(x) over the degree-<=2 monomial basis."""
    d = _data.load(name + '_quad')
    return np.asarray(d['basis_exponents']), np.asarray(d['W'])


@functools.lru_cache(maxsize=None)
def load_quad_eigen(name):
    """EXACT low-rank eigen factorization of the quadratic form:
    W = Q_r diag(lam_r) Q_r^T.

    The fitted W matrices are rank-deficient by construction (the degree-4
    fit space is smaller than the degree-<=2 product basis): measured
    spectra drop from O(1e-5) to O(1e-16) x max|lam| at r=94/528 (poly2b)
    and r=316/703 (poly3b), so E = sum_k lam_k (m2 . q_k)^2 is exact to
    f64 roundoff with two B x r matmuls instead of the B x B matvec.

    MEASURED VERDICT (r2, real water256 pair/triplet variables): NOT used
    in production. At f32 the eigen basis concentrates the form's mass
    into fewer, larger terms (|lam| up to ~1e3 amplifying the matmul
    accumulation rounding of v), so the per-item error GROWS 6-7x over
    the dense matvec (poly3b 0.148 vs 0.020 kcal/mol max per triplet,
    poly2b 0.166 vs 0.028 per pair; gradients 3x worse) while the FLOP
    saving is only 2r/B (0.90x for poly3b). Kept for tooling
    (tools/rank_experiment.py) and as the recorded design decision.

    Returns (F, Q_r [B, r] f64, lam_r [r] f64).
    """
    F, W = load_quad(name)
    lam, Q = np.linalg.eigh(W.astype(np.float64))
    amax = np.abs(lam).max()
    keep = np.abs(lam) > amax * 1e-9
    if (~keep).any():
        resid = np.abs(lam[~keep]).max() / amax
        # the discarded tail must be numerically zero - a genuine spectral
        # cliff, not an approximation (guards future basis-file changes)
        if resid > 1e-12:
            raise ValueError(
                f'{name}: eigen tail |lam|/max = {resid:.2e} is not a '
                'clean rank cliff; refusing lossy truncation')
    order = np.argsort(-np.abs(lam[keep]))
    return F, Q[:, keep][:, order], lam[keep][order]


@functools.lru_cache(maxsize=None)
def _quad_factor_selectors(name):
    """One-hot factor-selection matrices A, B [V+1, B] such that
    m2 = (xa @ A) * (xa @ B) with xa = [x, 1]: every degree-<=2 basis
    monomial is an EXACT product of two augmented variables. This avoids
    the exp(log x @ F) round trip, whose f32 exponent rounding (~2e-6
    absolute) turns into ~1e-5 relative monomial error - amplified by the
    PIP's canceling coefficients to several kcal/mol on close dimers."""
    F, _ = load_quad(name)
    b, v = F.shape
    if F.sum(axis=1).max() > 2:
        raise ValueError(
            f'{name}: quadratic-form basis has a column of total degree '
            f'{int(F.sum(axis=1).max())} > 2; the two-factor product '
            'decomposition does not apply (re-run tools/factor_pip.py)')
    A = np.zeros((v + 1, b), np.float32)
    B = np.zeros((v + 1, b), np.float32)
    for k in range(b):
        nz = np.nonzero(F[k])[0]
        if len(nz) == 0:                      # constant
            A[v, k] = 1.0
            B[v, k] = 1.0
        elif len(nz) == 1:
            i = nz[0]
            A[i, k] = 1.0
            B[i if F[k, i] == 2 else v, k] = 1.0
        else:
            assert len(nz) == 2 and F[k, nz[0]] == 1 and F[k, nz[1]] == 1, \
                (name, k, F[k, nz])
            A[nz[0], k] = 1.0
            B[nz[1], k] = 1.0
    return A, B


@functools.lru_cache(maxsize=None)
def _quad_factor_indices(name):
    """(idxA, idxB) int32 [B]: m2_k = xa[idxA_k] * xa[idxB_k]."""
    A, B = _quad_factor_selectors(name)
    return np.argmax(A, axis=0).astype(np.int32), \
        np.argmax(B, axis=0).astype(np.int32)


@functools.lru_cache(maxsize=None)
def load_quad_vech(name):
    """Quadratic form re-ordered to the NATURAL vech basis.

    Round-4 structural discovery: the extracted degree-<=2 product bases
    are COMPLETE - poly2b's 528 columns = 32*33/2 and poly3b's 703 =
    37*38/2, i.e. exactly every unordered pair (i <= j) of augmented
    variables xa = [x, 1]. Permuting W/F once at load time into block
    order (i; j = i..Va-1) makes the basis build a structured outer
    product

        m2 = concat_i( xa[..., i:i+1] * xa[..., i:] )

    - contiguous slices, broadcasts and multiplies only. This removes the
    two minor-axis lane-gathers that round 3 measured as 1.56 ms of the
    3-body term's 2.06 ms standalone cost (VPU-lane-shuffle bound).

    MEASURED VERDICT (round 5, forced-execution timing - the round-4
    standalone numbers were dispatch latency on the tunneled platform):
    the vech basis LOSES both standalone and in-graph (poly3b 6.49 ms
    vs 1.97 ms for the gather path at the water256 triplet batch;
    tools/pip_microbench.py, artifacts/pip_microbench_r05.json). The
    slice-concat build defeats XLA's fusion of the basis into the W
    matvec. Kept as a recorded negative result and as the host-side
    table source for the fused vech_pallas kernel.

    Returns (F_nat [B, V], W_nat [B, B]) with rows/cols permuted
    consistently; numerically the same form (exact permutation).
    """
    F, W = load_quad(name)
    ia, ib = _quad_factor_indices(name)
    lo = np.minimum(ia, ib)
    hi = np.maximum(ia, ib)
    va = F.shape[1] + 1
    b = F.shape[0]
    if b != va * (va + 1) // 2 or len({(int(a), int(c))
                                       for a, c in zip(lo, hi)}) != b:
        raise ValueError(f'{name}: basis is not the complete vech over '
                         f'{va} augmented variables; vech order unavailable')
    order = np.lexsort((hi, lo))
    return F[order], W[np.ix_(order, order)]


def _vech_basis(xa):
    """Complete degree-<=2 basis in natural vech order from augmented
    variables xa[..., Va]: block i = xa_i * xa_{i:}. No gathers - each
    block is a broadcast-multiplied contiguous slice."""
    va = xa.shape[-1]
    return jnp.concatenate(
        [xa[..., i:i + 1] * xa[..., i:] for i in range(va)], axis=-1)


def _split3_bf16(x):
    """EXACT 3-way bf16 decomposition of f32: x == hi + mid + lo.

    f32 carries 24 mantissa bits; each bf16 component carries 8, and the
    residual after two round-to-nearest splits has <= 8 significant bits
    left, so the third split is exact (no underflow for the PIP variable
    range ~1e-4..1). This is what makes one-hot SELECTION exact on the
    MXU at bf16 speed: a one-hot matrix is exactly representable in bf16,
    and each output column of (x_c @ A) is a sum with exactly one nonzero
    term per component - summing the three f32 accumulator results
    reconstructs x bit-for-bit."""
    # Each rounding must actually HAPPEN: under jit, XLA's TPU elementwise
    # fusion keeps excess precision through bf16 round-trips (measured:
    # the residuals come out wrong by ~a bf16 ULP of x, i.e. the f32->bf16
    # ->f32 hop was elided), so every component is pinned behind an
    # optimization_barrier before the subtraction that uses it.
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r1 = x - hi.astype(x.dtype)
    mid = jax.lax.optimization_barrier(r1.astype(jnp.bfloat16))
    lo = (r1 - mid.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def _select_exact_bf16(xa, sel):
    """xa[..., idx] as three bf16 MXU passes (exact; see _split3_bf16).
    sel: one-hot [V, B] bf16.

    The optimization_barrier is load-bearing: XLA's algebraic simplifier
    otherwise merges the three dots over the shared `sel` operand into
    dot(hi+mid+lo, sel) - and that sum happens in bf16, collapsing the
    split back to bf16(x) (measured on chip: 3.9e-3 max basis error =
    one bf16 ULP; CPU XLA does not apply the rewrite, so only the TPU
    path was wrong)."""
    hi, mid, lo = jax.lax.optimization_barrier(_split3_bf16(xa))
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((xa.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return dot(hi, sel) + dot(mid, sel) + dot(lo, sel)


def _quad_factor_selectors_bf16(name):
    # numpy held in the lru cache; the bf16 device constants are created
    # per trace (caching jnp arrays across traces leaks tracers)
    A, B = _quad_factor_selectors(name)
    return (jnp.asarray(A, jnp.bfloat16), jnp.asarray(B, jnp.bfloat16))


def quad_basis(x, name, choice=None):
    """Degree-<=2 basis monomials by exact products of the augmented
    variables xa = [x, 1]: numerically identical selection via either a
    static lane gather or one-hot bf16 MXU passes, multiplied pairwise.
    Exact in f32 either way (one product rounding), no transcendentals.

    Implementation choice (`choice` arg; None falls back to the
    MBPOL_PIP_BASIS env override, default 'gather'):
      'gather' - static column gathers. Round 3: 1.56 ms of the 3B term's
        2.06 ms standalone cost at the 23.8k-triplet batch (minor-axis
        gathers are VPU-lane-shuffle bound on TPU).
      'bf16x3' - each selection is THREE bf16 MXU passes over the exact
        3-way bf16 split of xa (_split3_bf16): bit-identical to the
        gather ON CHIP (verified round 4; needs the optimization
        barriers - see _split3_bf16/_select_exact_bf16). MEASURED round
        4, chip: standalone 2.09 vs 1.77 ms and in-graph 247 vs 325
        steps/s - SLOWER despite only ~0.9 ms of MXU work, because the
        barriers pin hi/mid/lo materialization and the six [.,128-pad]@
        [128,704] dots break XLA's gather+variable-construction fusion.
        Third confirmation that matmul selection loses in-graph here;
        kept as the recorded negative result and as the building block
        for a fused Pallas kernel (where fusion is manual anyway).
    """
    if choice is None:
        choice = _basis_choice()
    xa = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    if choice == 'vech':
        # REQUIRES the load_quad_vech-permuted W/F (pip_apply couples the
        # table set to this choice; direct callers must pass matching
        # tables - see pip_quad_energy_and_grad's `basis` arg)
        return _vech_basis(xa)
    if choice == 'bf16x3':
        A, B = _quad_factor_selectors_bf16(name)
        return _select_exact_bf16(xa, A) * _select_exact_bf16(xa, B)
    idx_a, idx_b = _quad_factor_indices(name)
    return jnp.take(xa, jnp.asarray(idx_a), axis=-1) \
        * jnp.take(xa, jnp.asarray(idx_b), axis=-1)


def _basis_choice():
    import os
    return os.environ.get('MBPOL_PIP_BASIS', 'gather')


def pip_quad_energy_and_grad(x, F, W, name=None, basis=None):
    """Quadratic-form PIP evaluation: ~18x fewer FLOPs than the monomial
    expansion (528/703-column basis instead of 12.7k/33.5k monomials), with
    the gradient reusing the W matvec: dE/dm2 = 2 W m2.

    `basis` selects the basis-construction mode ('gather' | 'bf16x3' |
    'vech'; None = MBPOL_PIP_BASIS env fallback) and MUST match the
    ordering of the supplied F/W tables: 'vech' requires the
    load_quad_vech-permuted tables, the others the load_quad file order.
    pip_apply threads both from one resolved choice so they cannot drift
    apart."""
    # The W matvec must run at HIGHEST: its coefficient cancellation on
    # *physical* configurations (variables spanning e-4..1) loses ~46
    # kcal/mol on water256 at HIGH/bf16x3 (random-point tests do not expose
    # this). The gradient contraction is per-variable (<= ~40 nonzero F
    # entries per column), so HIGH suffices there.
    Ft = F.astype(x.dtype)
    Wt = W.astype(x.dtype)
    # Basis via exact products (gather + multiply): the exp(log x @ F)
    # formulation is fundamentally limited by the f32 rounding of log x
    # (~4e-6 absolute exponent error -> ~0.3 kcal/mol per close dimer after
    # the fits' 6-orders-of-magnitude cancellation); exact products reach
    # the f32 product floor (~0.02). Measured cost-neutral vs exp/log (the
    # one-hot-matmul variant of the same idea costs +1.9 ms/step - tiny-K
    # HIGHEST matmuls lower poorly - hence the gather form).
    if name is not None:
        m2 = quad_basis(x, name, choice=basis)
    else:
        m2 = jnp.exp(jnp.dot(jnp.log(x), Ft.T,
                             precision=jax.lax.Precision.HIGHEST))
    wm = jnp.dot(m2, Wt, precision=jax.lax.Precision.HIGHEST)
    e = jnp.sum(m2 * wm, axis=-1)
    g = jnp.dot(m2 * (2.0 * wm), Ft, precision=_grad_prec()) / x
    return e, g


_PALLAS_IMPLS = ('pallas', 'quad_pallas', 'quad_bf16', 'vech_pallas')


def _pip_impl_choice(dtype, override=None):
    """'quad' (default): quadratic-form factorization, fastest everywhere.
    'pallas'/'quad_pallas'/'quad_bf16'/'vech_pallas': fused TPU kernels
    (f32 only). 'monomial': plain jnp monomial matmuls. `override` (from
    MBPolConfig.pip_impl) wins over the MBPOL_PIP_IMPL env var.

    Every Pallas-backed choice falls back off-TPU or off-f32: a real
    pallas_call would fail to lower on CPU or silently mis-lower at f64
    (advisor round 4). The fused-quad kernels fall back to 'quad' (same
    quadratic form via XLA), the monomial kernel to 'monomial'."""
    import os
    choice = override or os.environ.get('MBPOL_PIP_IMPL', 'quad')
    if choice in _PALLAS_IMPLS and (dtype != jnp.float32
                                    or jax.default_backend() == 'cpu'):
        return 'monomial' if choice == 'pallas' else 'quad'
    return choice


@functools.lru_cache(maxsize=None)
def pip_apply(name, impl=None, basis=None):
    """Batched PIP energy fn with an analytic-gradient VJP.

    Returns f(x[P, nvars]) -> e[P], differentiable once. The default
    implementation is the quadratic-form factorization (load_quad); the
    gradient is saved as the VJP residual so reverse-mode never
    rematerializes the basis/monomial matrices.

    `impl`/`basis` are the typed knobs (MBPolConfig.pip_impl/pip_basis);
    None falls back to the MBPOL_PIP_IMPL/MBPOL_PIP_BASIS env overrides
    (tooling), then the defaults ('quad'/'gather').
    """
    pip = load_pip(name)
    exponents = pip.exponents
    coeffs = pip.coeffs

    def impl_fn(x):
        choice = _pip_impl_choice(x.dtype, override=impl)
        basis_choice = basis or _basis_choice()
        if choice == 'quad':
            # XLA path: Mosaic cannot lower HIGH-precision dots, and the
            # fused Pallas variant (pip_quad_energy_grad_tpu) is 9x slower
            # at HIGHEST; XLA fuses this fine. The basis mode decides the
            # (statically permuted) table set - the vech order needs W/F
            # rows matched to the structured outer-product column order;
            # both come from the single `basis_choice` here.
            F, W = (load_quad_vech(name) if basis_choice == 'vech'
                    else load_quad(name))
            return pip_quad_energy_and_grad(x, jnp.asarray(F), jnp.asarray(W),
                                            name=name, basis=basis_choice)
        if choice == 'quad_pallas':
            from mbpol_openmm_plugin_tpu.ops.pip_pallas import \
                pip_quad_energy_grad_tpu
            return pip_quad_energy_grad_tpu(name, x)
        if choice == 'vech_pallas':
            # round-4b fused kernel: structured outer-product basis in
            # VMEM (zero selection cost) + manual bf16 W matvec
            from mbpol_openmm_plugin_tpu.ops.pip_pallas import \
                pip_vech_energy_grad_tpu
            return pip_vech_energy_grad_tpu(name, x)
        if choice == 'quad_bf16':
            # round-4 fused kernel: exact-product basis + manual bf16
            # passes (6-pass W matvec == the XLA HIGHEST algorithm)
            from mbpol_openmm_plugin_tpu.ops.pip_pallas import \
                pip_quad_bf16_energy_grad_tpu
            return pip_quad_bf16_energy_grad_tpu(name, x)
        if choice == 'pallas':
            from mbpol_openmm_plugin_tpu.ops.pip_pallas import pip_energy_grad_tpu
            return pip_energy_grad_tpu(name, x)
        return pip_energy_and_grad(x, jnp.asarray(exponents), jnp.asarray(coeffs))

    @jax.custom_jvp
    def f(x):
        return impl_fn(x)[0]

    @f.defjvp
    def f_jvp(primals, tangents):
        # custom_jvp (not custom_vjp) so the PIP term is differentiable in
        # BOTH modes from the one analytic gradient: reverse (forces) via
        # transposition of the linear tangent rule, and forward (jvp) for
        # scalar derivatives like the virial dU/dlambda (md/pressure.py),
        # where reverse-mode is unavailable through the SCF while_loop.
        (x,), (xdot,) = primals, tangents
        e, g = impl_fn(x)
        return e, jnp.sum(g * xdot, axis=-1)

    return f
