"""Capacity-plan tests: the public constructor path (r3 verdict item 7)
and the physical-cutoff eval buffers (r3 advisor finding).

parallel.plan.plan_capacities sizes every static shape of an
(n_devices, N) run; since round 4 the plan is a constructor input -
MBPol(system, config, mesh=mesh, plan=plan) - instead of the deprecated
CapacityPlan.apply() mutation of private attributes.
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import fixtures
from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
from mbpol_openmm_plugin_tpu.parallel.plan import plan_capacities
from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites

WATER256_BOX = [19.3996888399961804 / 10.0] * 3


def _fixture():
    d = fixtures.load('water256_integration_test')
    sys_ = System.waters(256, box=WATER256_BOX)
    pos = compute_virtual_sites(sys_, jnp.asarray(d['positions']))
    return sys_, pos


def test_plan_eval_caps_physical_cutoffs():
    """Eval buffers are sized at the physical cutoffs (tighter than the
    skin-inflated list capacities), both analytic and exact."""
    sys_, pos = _fixture()
    cfg = MBPolConfig(nonbonded_method='PME', cutoff=0.9, nlist_skin=0.05)
    analytic = plan_capacities(256, WATER256_BOX, config=cfg)
    exact = plan_capacities(256, WATER256_BOX, config=cfg,
                            positions=np.asarray(pos))
    for plan in (analytic, exact):
        assert plan.pair_eval_cap <= plan.pair_cap
        assert plan.trip_eval_cap <= plan.trip_cap
    # the triplet batch is where the skin really bites (r^6 volume factor)
    assert exact.trip_eval_cap < exact.trip_cap
    assert 'eval buffers' in exact.describe()


def test_plan_constructor_single_device():
    """MBPol(system, config, plan=plan) adopts the planned capacities and
    evaluates to the same energy as the default-capacity potential."""
    sys_, pos = _fixture()
    cfg = MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                      target_epsilon=1e-7, nlist_skin=0.02,
                      compact_eval=True)
    plan = plan_capacities(256, WATER256_BOX, config=cfg,
                           positions=np.asarray(pos))
    pot_plan = MBPol(sys_, cfg, plan=plan)
    assert pot_plan.pair_cap == plan.pair_cap
    assert pot_plan.trip_cap == plan.trip_cap
    assert pot_plan.pair_eval_cap == plan.pair_eval_cap
    assert pot_plan.trip_eval_cap == plan.trip_eval_cap
    assert pot_plan.nlist_k_max == plan.nlist_k_max

    pot_ref = MBPol(sys_, cfg)
    e_ref, f_ref, _, diag_ref = pot_ref.energy_forces(pos)
    e_plan, f_plan, _, diag = pot_plan.energy_forces(pos)
    assert not bool(diag['pair_overflow'] | diag['triplet_overflow'])
    assert not bool(diag.get('pair_eval_overflow', False)
                    | diag.get('triplet_eval_overflow', False))
    np.testing.assert_allclose(float(e_plan), float(e_ref), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(f_plan), np.asarray(f_ref),
                               atol=1e-7)


def test_plan_device_count_mismatch_raises():
    sys_, _ = _fixture()
    cfg = MBPolConfig(nonbonded_method='PME', cutoff=0.9, nlist_skin=0.02)
    plan = plan_capacities(256, WATER256_BOX, n_devices=8, config=cfg)
    with pytest.raises(ValueError, match='devices'):
        MBPol(sys_, cfg, plan=plan)


def test_plan_apply_shim_deprecated():
    """The old mutation path still works but warns and returns a NEW
    potential built through the constructor."""
    sys_, pos = _fixture()
    cfg = MBPolConfig(nonbonded_method='PME', cutoff=0.9, nlist_skin=0.02)
    plan = plan_capacities(256, WATER256_BOX, config=cfg,
                           positions=np.asarray(pos))
    pot = MBPol(sys_, cfg)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        pot2 = plan.apply(pot)
    assert any(issubclass(x.category, DeprecationWarning) for x in w)
    assert pot2 is not pot
    assert pot2.pair_cap == plan.pair_cap
