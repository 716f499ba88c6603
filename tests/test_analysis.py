"""Analysis helpers (analysis.py): validated against analytic results -
an ideal-gas RDF is flat at 1, the VDOS of a harmonic trajectory peaks at
its analytic frequency, and the dipole series matches the api-layer
moments.
"""
import numpy as np
import pytest

from mbpol_openmm_plugin_tpu import analysis
from mbpol_openmm_plugin_tpu.system import System


def _random_gas_system(n_waters, box, seed=0):
    """Waters at uniform-random positions (ideal gas of O sites)."""
    rng = np.random.default_rng(seed)
    sys_ = System.waters(n_waters, box=[box] * 3)
    frames = rng.uniform(0.0, box, size=(20, 4 * n_waters, 3))
    return sys_, frames


def test_rdf_ideal_gas_is_flat():
    sys_, frames = _random_gas_system(64, 2.0)
    r, g = analysis.radial_distribution(sys_, frames, n_bins=40)
    # beyond the first few bins (poor statistics), g ~ 1
    assert abs(float(np.mean(g[10:])) - 1.0) < 0.08
    assert r[-1] <= 1.0 + 1e-9          # r_max defaults to box/2


def test_rdf_lattice_shells():
    """O sites on a simple cubic lattice: g(r) is zero below the lattice
    constant, with the first shell exactly at a and nothing between the
    shells at a and a*sqrt(2)."""
    a, n_side = 0.5, 4
    n = n_side ** 3
    sys_ = System.waters(n, box=[a * n_side] * 3)
    pos = np.zeros((4 * n, 3))
    grid = np.stack(np.meshgrid(*[np.arange(n_side)] * 3,
                                indexing='ij'), -1).reshape(-1, 3) * a
    pos[sys_.o_index] = grid
    r, g = analysis.radial_distribution(sys_, pos[None], n_bins=100)
    first = r[np.nonzero(g)[0][0]]
    assert abs(first - a) < 0.02, first
    between = (r > a * 1.05) & (r < a * np.sqrt(2) * 0.95)
    assert np.all(g[between] == 0.0)


def test_vacf_vdos_harmonic_peak():
    """Velocity trajectory of independent harmonic oscillators: VDOS peaks
    at w/(2 pi c) cm^-1."""
    sys_ = System.waters(2)
    w = 300.0                       # rad/ps
    dt = 1e-3                       # ps
    t = np.arange(4096) * dt
    rng = np.random.default_rng(1)
    phase = rng.uniform(0, 2 * np.pi, size=(1, 8, 3))
    v = np.cos(w * t[:, None, None] + phase)
    v = np.where((np.asarray(sys_.masses) > 0)[None, :, None], v, 0.0)
    freq, spec = analysis.vibrational_density_of_states(sys_, v, dt)
    f_peak = freq[np.argmax(spec)]
    expect = w / (2 * np.pi) / 0.0299792458      # rad/ps -> cm^-1
    assert abs(f_peak - expect) / expect < 0.05, (f_peak, expect)
    # VACF starts at 1 by construction
    acf = analysis.velocity_autocorrelation(sys_, v)
    assert abs(acf[0] - 1.0) < 1e-12


def test_dipole_series_water3():
    import jax.numpy as jnp

    import fixtures
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.system import compute_virtual_sites

    fix = fixtures.load('water3_cluster')
    sys_ = System.waters(3)
    pos = compute_virtual_sites(sys_, jnp.asarray(fix['positions']))
    pot = MBPol(sys_, MBPolConfig(nonbonded_method='NoCutoff'))
    d = analysis.dipole_series(pot, np.asarray(pos)[None])
    assert d.shape == (1, 3)
    # water3 cluster has a nonzero net dipole of a few Debye
    assert 0.5 < float(np.linalg.norm(d[0])) < 20.0


def test_msd_brownian_recovers_diffusion_coefficient():
    """An explicit Brownian walk with step variance 2*D*dt per dimension
    must give MSD = 6 D t, and the Einstein fit must recover D. Wrapping
    the walk into the box and letting the helper unwrap must not change
    the answer."""
    n_frames, n_mol, dt, D = 2048, 32, 0.1, 2.3e-3     # nm^2/ps
    box = 1.5
    sys_ = System.waters(n_mol, box=[box] * 3)
    rng = np.random.default_rng(7)
    steps = rng.normal(0.0, np.sqrt(2 * D * dt),
                       size=(n_frames - 1, n_mol, 3))
    com = np.concatenate([np.zeros((1, n_mol, 3)),
                          np.cumsum(steps, axis=0)]) + box / 2
    # rigid molecules riding the COM walk (species='com' sees pure
    # diffusion): place O so the mass-weighted mean is exactly `com`
    frames = np.zeros((n_frames, 4 * n_mol, 3))
    m = np.asarray(sys_.masses)
    o, h1, h2 = sys_.o_index, sys_.h1_index, sys_.h2_index
    a = np.array([0.09572, 0.0, 0.0])                  # H1 offset from O
    b = np.array([-0.024, 0.0927, 0.0])                # H2 offset from O
    m_tot = (m[o] + m[h1] + m[h2])[:, None]
    shift = (m[h1][:, None] * a + m[h2][:, None] * b) / m_tot   # [nmol, 3]
    frames[:, o] = com - shift[None]
    frames[:, h1] = frames[:, o] + a
    frames[:, h2] = frames[:, o] + b

    t, msd = analysis.mean_squared_displacement(
        sys_, frames, dt, species='com', unwrap=False)
    d_fit = analysis.diffusion_coefficient(t, msd)
    assert abs(d_fit - D) / D < 0.25, (d_fit, D)
    # early-time MSD tracks 6 D t closely (many molecules + origins)
    k = len(t) // 8
    np.testing.assert_allclose(msd[1:k], 6 * D * t[1:k], rtol=0.2)

    # wrapped into the box -> unwrap reproduces the same MSD exactly
    # (steps above are << box/2)
    wrapped = frames - np.floor(frames / box) * box
    t3, msd3 = analysis.mean_squared_displacement(
        sys_, wrapped, dt, species='com', box=[box] * 3, unwrap=True)
    np.testing.assert_allclose(msd3, msd, atol=1e-9)


def test_msd_ballistic_is_quadratic():
    """Constant-velocity 'trajectory': a rigid translation IS pure
    system-COM motion, so the default (remove_system_com=True, the
    standard self-diffusion convention - round 5: residual net momentum
    from a thermostatted stage inflated D_self 3x) gives MSD == 0;
    disabling the removal recovers MSD(t) = |v|^2 t^2 exactly."""
    n, dt, v = 64, 0.5, np.array([0.01, -0.02, 0.005])
    sys_ = System.waters(3)
    t_axis = np.arange(n) * dt
    frames = np.tile(np.linspace(0, 1, 12 * 3).reshape(1, -1, 3), (n, 1, 1))
    frames = frames + (v[None, :] * t_axis[:, None])[:, None, :]
    for sp in ('com', 'O', 'H', 'all'):
        t, msd = analysis.mean_squared_displacement(sys_, frames, dt,
                                                    species=sp, unwrap=False)
        np.testing.assert_allclose(msd, 0.0, atol=1e-10)
        t, msd = analysis.mean_squared_displacement(
            sys_, frames, dt, species=sp, unwrap=False,
            remove_system_com=False)
        np.testing.assert_allclose(msd, float(v @ v) * t ** 2, atol=1e-10)


def test_green_kubo_ou_process_matches_einstein():
    """Ornstein-Uhlenbeck velocities (exact discretization, relaxation
    rate gamma, stationary per-dimension variance s^2) have
    <v(0).v(t)> = 3 s^2 exp(-gamma t), so D = s^2/gamma exactly. The
    Green-Kubo running integral must plateau there, and the Einstein-MSD
    fit on the integrated positions must agree."""
    n, n_mol, dt = 8192, 128, 0.02
    gamma, s = 4.0, 0.3                                 # 1/ps, nm/ps
    d_true = s * s / gamma
    sys_ = System.waters(n_mol)
    rng = np.random.default_rng(11)
    a = np.exp(-gamma * dt)
    v_mol = np.empty((n, n_mol, 3))
    v_mol[0] = rng.normal(0.0, s, (n_mol, 3))
    noise = rng.normal(0.0, s * np.sqrt(1 - a * a), (n - 1, n_mol, 3))
    for i in range(1, n):
        v_mol[i] = a * v_mol[i - 1] + noise[i - 1]
    # every site of a molecule rides the molecular velocity -> the COM
    # velocity IS v_mol regardless of masses
    vel = np.repeat(v_mol, 4, axis=1)

    t, d_run = analysis.diffusion_coefficient_gk(sys_, vel, dt,
                                                 species='com')
    # read the plateau where the ACF has decayed (5-15 relaxation times)
    # but before tail noise accumulates in the running integral
    k5, k15 = int(5.0 / gamma / dt), int(15.0 / gamma / dt)
    plateau = d_run[k5:k15].mean()
    assert abs(plateau - d_true) / d_true < 0.1, (plateau, d_true)

    # Einstein route on the integrated trajectory agrees
    pos = np.concatenate([np.zeros((1, 4 * n_mol, 3)),
                          np.cumsum(vel[:-1] * dt, axis=0)])
    tm, msd = analysis.mean_squared_displacement(sys_, pos, dt,
                                                 species='com', unwrap=False)
    d_msd = analysis.diffusion_coefficient(tm, msd)
    assert abs(d_msd - d_true) / d_true < 0.15, (d_msd, d_true)


def test_static_dielectric_analytic():
    """Gaussian total dipole with known per-component variance: the
    fluctuation formula is checked against an independently hand-derived
    prefactor (eps - 1 = 30.338 * var_D^2 / (V_nm3 * T)), and a frozen
    dipole gives exactly eps = 1."""
    rng = np.random.default_rng(3)
    sigma = 40.0                                        # Debye
    mu = rng.normal(0.0, sigma, size=(200000, 3)) + np.array([5.0, 0, -2.0])
    v_nm3, temp = 7.3, 298.0
    eps = analysis.static_dielectric(mu, v_nm3, temp)
    var = float(np.sum(np.var(mu, axis=0)))
    expect = 1.0 + 30.3383 * var / (v_nm3 * temp)
    np.testing.assert_allclose(eps, expect, rtol=1e-4)
    # sample variance of 3*200k ~ sigma^2 within ~1%
    np.testing.assert_allclose(eps, 1.0 + 30.3383 * 3 * sigma ** 2 /
                               (v_nm3 * temp), rtol=0.02)
    assert analysis.static_dielectric(np.tile([3.0, 1.0, 0.0], (10, 1)),
                                      [2.0, 2.0, 2.0], 300.0) == 1.0


def test_infrared_spectrum_harmonic_peak():
    """A dipole oscillating at a known frequency must peak there, and the
    omega^2 prefactor must kill the zero-frequency (static-dipole) bin."""
    dt = 5e-4                       # ps
    f_thz = 20.0                    # 20 THz ~ 667 cm^-1
    t = np.arange(8192) * dt
    mu = np.stack([np.cos(2 * np.pi * f_thz * t),
                   np.zeros_like(t), 3.0 + 0 * t], axis=1)
    freq, inten = analysis.infrared_spectrum(mu, dt)
    peak = freq[np.argmax(inten)]
    np.testing.assert_allclose(peak, f_thz / 0.0299792458, rtol=0.02)
    # the static z-dipole contributes nothing beyond the windowing
    # leakage floor (derivative form kills the DC line itself)
    assert inten[0] < 1e-3 * inten.max()


def test_mbar_harmonic_ladder():
    """MBAR free energies + reweighting against exact harmonic results:
    Z(beta) ~ beta^(-d/2) so f_k - f_0 = (d/2) ln(beta_k/beta_0), and
    <U>(beta) = d/(2 beta). Samples drawn directly from the canonical
    Gaussian at each ladder temperature (the estimator's input contract -
    what REMD produces per slot)."""
    rng = np.random.default_rng(0)
    kB = 8.31446261815324e-3
    d, K, N = 6, 4, 4000
    T = np.geomspace(250.0, 450.0, K)
    kappa = 2000.0
    U = np.stack([
        0.5 * kappa * (rng.normal(0.0, np.sqrt(kB * t / kappa),
                                  (N, d)) ** 2).sum(-1) for t in T])
    f = analysis.mbar_free_energies(U, T)
    betas = 1.0 / (kB * T)
    f_exact = 0.5 * d * np.log(betas / betas[0])
    np.testing.assert_allclose(f, f_exact, atol=0.02)

    out = analysis.mbar_reweight(U, T, 330.0, f=f, observable=U)
    assert abs(out['mean'] - 0.5 * d * kB * 330.0) < 0.1
    assert 0.2 * K * N < out['n_eff'] <= K * N
    np.testing.assert_allclose(out['weights'].sum(), 1.0, rtol=1e-12)

    # reweighting AT a simulated temperature reproduces that slot's mean
    out2 = analysis.mbar_reweight(U, T, float(T[2]), f=f, observable=U)
    assert abs(out2['mean'] - U[2].mean()) < 0.15, (out2['mean'], U[2].mean())

    # shape validation
    with pytest.raises(ValueError):
        analysis.mbar_free_energies(U, T[:2])
    with pytest.raises(ValueError):
        analysis.mbar_reweight(U, T, 300.0, f=f, observable=U[:2])


def test_structure_factor_ideal_gas_and_bragg():
    rng = np.random.default_rng(1)
    L = 2.0
    # ideal gas: S(q) = 1 exactly in expectation at every allowed q != 0
    sys_ = System.waters(32, box=[L, L, L])
    frames = np.zeros((40, sys_.n_atoms, 3))
    frames[:, sys_.o_index] = rng.uniform(0, L, (40, 32, 3))
    q, s = analysis.static_structure_factor(sys_, frames, q_max=25.0)
    assert (q > 0).all() and len(q) > 5
    assert abs(np.mean(s) - 1.0) < 0.15, np.mean(s)

    # simple-cubic Bragg peak: oxygens on an m^3 lattice of spacing a ->
    # S = N exactly at q = 2 pi/a. m = 4 so the Bragg magnitude bin
    # contains ONLY reciprocal-lattice vectors (|n|^2 = 16 has no
    # non-axis integer solutions; |n|^2 = 9 would mix in (2,2,1)-type
    # vectors and dilute the peak)
    m = 4
    a = L / m
    sysl = System.waters(m ** 3, box=[L, L, L])
    g = np.stack(np.meshgrid(*([np.arange(m) * a] * 3),
                             indexing='ij'), -1).reshape(-1, 3)
    f = np.zeros((1, sysl.n_atoms, 3))
    f[0, sysl.o_index] = g
    q_b = 2.0 * np.pi / a
    qv, sv = analysis.static_structure_factor(sysl, f, q_max=q_b + 1.0,
                                              n_bins=400)
    peak = sv[np.argmin(np.abs(qv - q_b))]
    np.testing.assert_allclose(peak, m ** 3, rtol=1e-10)
    # and S << N away from the Bragg condition
    off = sv[(qv > 2.0) & (qv < 0.8 * q_b)]
    assert (off < 1e-10).all()


def test_hydrogen_bonds_geometric_criterion():
    sys_ = System.waters(2)
    pos = np.zeros((8, 3))
    r_oh = 0.0957
    # donor: O at origin, H1 pointing straight at the acceptor
    pos[0] = [0.0, 0.0, 0.0]
    pos[1] = [r_oh, 0.0, 0.0]
    pos[2] = [-0.024, 0.0928, 0.0]     # H2 off-axis (104.5 deg)
    # acceptor at 0.29 nm, its hydrogens pointing away
    pos[4] = [0.29, 0.0, 0.0]
    pos[5] = [0.29 + 0.06, 0.06, 0.0]
    pos[6] = [0.29 + 0.06, -0.06, 0.0]
    assert analysis.hydrogen_bonds(sys_, pos)[0] == 1

    # stretch past the distance cutoff -> 0
    far = pos.copy()
    far[4:] += [0.12, 0.0, 0.0]
    assert analysis.hydrogen_bonds(sys_, far)[0] == 0

    # rotate the donated H past the angle cutoff -> 0
    bent = pos.copy()
    bent[1] = [r_oh * np.cos(np.deg2rad(40)), r_oh * np.sin(np.deg2rad(40)), 0.0]
    assert analysis.hydrogen_bonds(sys_, bent)[0] == 0


def test_tetrahedral_order_ice_and_ideal_gas():
    # diamond-cubic oxygen lattice (ice-like): every O has 4 perfectly
    # tetrahedral nearest neighbors -> q = 1 exactly
    a = 0.6
    cells = 2
    frac = np.array([[0, 0, 0], [0, .5, .5], [.5, 0, .5], [.5, .5, 0]])
    frac = np.concatenate([frac, frac + 0.25])
    site = []
    for i in range(cells):
        for j in range(cells):
            for k in range(cells):
                site.append((frac + [i, j, k]) * a)
    o_pos = np.concatenate(site)
    L = cells * a
    sys_ = System.waters(len(o_pos), box=[L, L, L])
    f = np.zeros((1, sys_.n_atoms, 3))
    f[0, sys_.o_index] = o_pos
    q = analysis.tetrahedral_order(sys_, f)
    np.testing.assert_allclose(q, 1.0, atol=1e-10)

    # ideal gas: <q> = 0 (the Errington-Debenedetti rescaling is chosen
    # to make uniformly random orientations average to zero)
    rng = np.random.default_rng(2)
    frames = np.zeros((30, sys_.n_atoms, 3))
    frames[:, sys_.o_index] = rng.uniform(0, L, (30, len(o_pos), 3))
    qg = analysis.tetrahedral_order(sys_, frames)
    assert abs(qg.mean()) < 0.05, qg.mean()


def test_mbar_heat_capacity_harmonic():
    """Configurational Cv of a d-dof harmonic well is exactly (d/2) kB at
    every temperature (Var(U) = (d/2) (kB T)^2)."""
    rng = np.random.default_rng(3)
    kB = 8.31446261815324e-3
    d, K, N = 6, 4, 6000
    T = np.geomspace(250.0, 450.0, K)
    kappa = 2000.0
    U = np.stack([
        0.5 * kappa * (rng.normal(0.0, np.sqrt(kB * t / kappa),
                                  (N, d)) ** 2).sum(-1) for t in T])
    ts, cv = analysis.mbar_heat_capacity(U, T,
                                         target_temperatures=[280.0, 400.0])
    np.testing.assert_allclose(cv, 0.5 * d * kB, rtol=0.08)
