#!/usr/bin/env python
"""HLO cost analysis of the full water256 PME step: total FLOPs and bytes
so we know whether the step is compute- or bandwidth-bound before optimizing.

Usage: python tools/cost_analysis.py [n_waters]
"""
import functools
import os
import sys

import numpy as np

print = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp

    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites

    n_w = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    fix = np.load(os.path.join(REPO, 'tests', 'fixtures',
                               'water256_integration_test.npz'))
    box = [19.3996888399961804 / 10.0] * 3
    sys_ = System.waters(n_w, box=box)
    pos = compute_virtual_sites(sys_, jnp.asarray(fix['positions'], jnp.float32))

    pot = MBPol(sys_, MBPolConfig(nonbonded_method='PME', cutoff=0.9,
                                  target_epsilon=1e-3, max_iterations=200,
                                  nlist_skin=0.05))
    pot.tune_capacities(pos)
    nl, _ = pot.build_neighbor_lists(pos)
    e, f, parts, diag = pot.energy_forces(pos)
    mu = diag['induced_dipoles']

    import dataclasses

    def analyze(name, fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        fl = ca.get('flops', 0.0)
        ba = ca.get('bytes accessed', 0.0)
        print(f'{name:24s} flops={fl/1e9:8.2f} G   bytes={ba/1e6:9.1f} MB')

    analyze('full step', lambda p, m, n: pot._energy_forces_impl(p, m, nlists=n)[:2],
            pos, mu, nl)
    for t in ['one_body', 'two_body', 'three_body', 'dispersion']:
        cfg2 = dataclasses.replace(pot.config, terms=(t,))
        p2 = MBPol(pot.system, cfg2)
        p2.pair_cap, p2.trip_cap = pot.pair_cap, pot.trip_cap
        analyze(t, lambda p, n, p2=p2: p2._energy_forces_impl(p, nlists=n)[:2],
                pos, nl)
    from mbpol_openmm_plugin_tpu.models import pme as pme_mod
    analyze('electrostatics', lambda p, m: pme_mod.pme_electrostatics(
        pot.elec_params, pot.pme, p, mu0=m)[:2], pos, mu)
    analyze('neighbor lists', lambda p: pot._neighbor_lists(p), pos)


if __name__ == '__main__':
    main()
