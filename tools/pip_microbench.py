#!/usr/bin/env python
"""Standalone chip timing of the PIP quadratic-form evaluation paths.

Times energy+gradient for the water256-scale 3B triplet batch (and the 2B
pair batch) under each basis/implementation mode, isolating the
round-3-measured 1.56 ms gather-bound basis build:

    gather   - static minor-axis lane gathers (round-3 production)
    vech     - structured outer product over the complete basis
               (load_quad_vech; no gathers at all)
    bf16x3   - one-hot bf16 MXU selection (recorded negative result)
    quad_bf16- fused Pallas kernel (ops/pip_pallas.py)

Usage (on chip): python tools/pip_microbench.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_fn(f, x, n=30):
    f(x)[1].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        e, g = f(x)
    g.block_until_ready()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/tmp/mbpol_jax_cache')
    jax.config.update('jax_default_matmul_precision', 'highest')
    import jax.numpy as jnp
    from mbpol_openmm_plugin_tpu.ops import polyeval as pe

    rng = np.random.default_rng(0)
    out = {}
    for name, nv, batch in (('poly3b', 36, 23841), ('poly2b', 31, 6912)):
        x = jnp.asarray(np.exp(rng.uniform(-8, 0, (batch, nv))), jnp.float32)
        ref = None
        for mode in ('gather', 'vech', 'quad_bf16', 'vech_pallas'):
            if mode in ('quad_bf16', 'vech_pallas'):
                os.environ['MBPOL_PIP_BASIS'] = 'gather'
                os.environ['MBPOL_PIP_IMPL'] = mode
            else:
                os.environ['MBPOL_PIP_BASIS'] = mode
                os.environ['MBPOL_PIP_IMPL'] = 'quad'
            pe.pip_apply.cache_clear()
            f = pe.pip_apply(name)

            def eg(x, f=f):
                e, g = jax.jvp(f, (x,), (jnp.ones_like(x),))
                gr = jax.grad(lambda y: jnp.sum(f(y)))(x)
                return e, gr

            eg_j = jax.jit(eg)
            ms = time_fn(eg_j, x)
            e, g = eg_j(x)
            if ref is None:
                ref = (np.asarray(e), np.asarray(g))
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(e) - ref[0]))
                            / (np.abs(ref[0]).max() + 1e-30))
            out[f'{name}.{mode}'] = {'ms': round(ms, 3),
                                     'rel_e_err': float(f'{err:.2e}')}
            print(name, mode, f'{ms:.3f} ms  rel_e_err {err:.2e}', flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
