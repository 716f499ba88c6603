"""The full MB-pol potential: assembly of all five force terms.

Replaces the reference's OpenMM System + per-force kernel dispatch
(MBPolReferenceKernels.cpp) with a single jittable function: positions of the
real atoms in, per-term energies and total forces out. Virtual M sites are
placed inside the function, so autodiff distributes their forces to the
parent atoms exactly like OpenMM's virtual-site force redistribution; the
explicitly-computed electrostatic forces are redistributed with the same
average3 weights.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mbpol_openmm_plugin_tpu import data as _data
from mbpol_openmm_plugin_tpu.models import electrostatics as elec
from mbpol_openmm_plugin_tpu.models import pme as pme_mod
from mbpol_openmm_plugin_tpu.models.dispersion import dispersion_energy
from mbpol_openmm_plugin_tpu.models.one_body import one_body_energy
from mbpol_openmm_plugin_tpu.models.three_body import three_body_energy
from mbpol_openmm_plugin_tpu.models.two_body import two_body_energy
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites, water_positions


@dataclasses.dataclass(frozen=True)
class MBPolConfig:
    """Static evaluation options (shapes the jitted computation).

    nonbonded_method: 'NoCutoff' (cluster) or 'PME'.
    cutoff: nonbonded cutoff in nm (dispersion truncation + PME direct space).
    """
    nonbonded_method: str = 'NoCutoff'
    cutoff: float = 0.9
    include_charge_redistribution: bool = True
    ewald_error_tolerance: float = 1e-4
    ewald_alpha: Optional[float] = None      # derived from tolerance if None
    pme_grid: Optional[tuple] = None         # derived from tolerance if None
    target_epsilon: float = 1e-7
    max_iterations: int = 200
    terms: tuple = ('electrostatics', 'one_body', 'two_body', 'three_body', 'dispersion')


class MBPol:
    """MB-pol potential for a fixed topology.

    Typical use:
        pot = MBPol(system, MBPolConfig(nonbonded_method='PME'))
        energy, forces, breakdown = pot.energy_forces(positions)
    `positions` are [natoms, 3] nm including M-site slots (their values are
    overwritten by virtual-site placement).
    """

    def __init__(self, system: System, config: MBPolConfig = MBPolConfig()):
        if config.nonbonded_method not in ('NoCutoff', 'PME'):
            raise ValueError(config.nonbonded_method)
        if config.nonbonded_method == 'PME' and not system.periodic:
            raise ValueError('PME requires a periodic box')
        self.system = system
        self.config = config
        self.elec_params = elec.ElecParams.for_system(
            system,
            include_charge_redistribution=config.include_charge_redistribution,
            target_epsilon=config.target_epsilon,
            max_iterations=config.max_iterations,
        ) if 'electrostatics' in config.terms else None
        if config.nonbonded_method == 'PME' and self.elec_params is not None:
            self.pme = pme_mod.PmeSetup.from_config(system, config)
        else:
            self.pme = None
        self._energy_forces = jax.jit(self._energy_forces_impl)

    # ------------------------------------------------------------------
    def _smooth_terms(self, positions):
        """Closed-form terms (1b/2b/3b/dispersion); differentiable."""
        cfg = self.config
        sys_ = self.system
        pos = compute_virtual_sites(sys_, positions)
        parts = {}
        if 'one_body' in cfg.terms:
            parts['one_body'] = jnp.sum(one_body_energy(water_positions(sys_, pos)))
        if 'two_body' in cfg.terms:
            parts['two_body'] = two_body_energy(sys_, pos)
        if 'three_body' in cfg.terms:
            parts['three_body'] = three_body_energy(sys_, pos)
        if 'dispersion' in cfg.terms:
            cut = cfg.cutoff if (sys_.periodic or cfg.nonbonded_method != 'NoCutoff') else cfg.cutoff
            parts['dispersion'] = dispersion_energy(sys_, pos, cutoff=cut)
        return parts

    def _energy_forces_impl(self, positions):
        sys_ = self.system

        def smooth_total(p):
            parts = self._smooth_terms(p)
            total = functools.reduce(jnp.add, parts.values()) if parts \
                else jnp.zeros((), p.dtype)
            return total, parts

        (e_smooth, parts), grad = jax.value_and_grad(smooth_total, has_aux=True)(positions)
        forces = -grad
        diag = {}

        if self.elec_params is not None:
            pos_v = compute_virtual_sites(sys_, positions)
            if self.pme is not None:
                e_elec, f_elec, diag = pme_mod.pme_electrostatics(
                    self.elec_params, self.pme, pos_v)
            else:
                e_elec, f_elec, diag = elec.cluster_electrostatics(self.elec_params, pos_v)
            parts = dict(parts, electrostatics=e_elec)
            # redistribute M-site forces to parents (average3 weights)
            ff = _data.load('forcefield')
            w = ff['vsite_weights']
            f_m = f_elec[sys_.m_index]
            f_elec = f_elec.at[sys_.m_index].set(0.0)
            f_elec = f_elec.at[sys_.o_index].add(w[0] * f_m)
            f_elec = f_elec.at[sys_.h1_index].add(w[1] * f_m)
            f_elec = f_elec.at[sys_.h2_index].add(w[2] * f_m)
            forces = forces + f_elec
            e_smooth = e_smooth + e_elec

        return e_smooth, forces, parts, diag

    # ------------------------------------------------------------------
    def energy_forces(self, positions):
        """Returns (total energy kJ/mol, forces kJ/mol/nm [natoms,3],
        per-term energy dict, diagnostics dict)."""
        return self._energy_forces(positions)

    def energy(self, positions):
        return self._energy_forces(positions)[0]
