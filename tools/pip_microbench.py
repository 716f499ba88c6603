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


def make_chain(eg, n):
    """Time n data-chained iterations under lax.scan and fetch a scalar.

    Round-4 verdict weak #3: on the tunneled 'axon' platform
    block_until_ready() returns WITHOUT synchronizing (control experiment:
    an 8192^3 f32 matmul "completes" in 23 us = 47 PFLOP/s), so the old
    dispatch-loop timing measured launch latency, not execution. Forcing
    execution requires fetching a value to host; chaining the iterations
    (each input depends on the previous output through a numerically
    negligible 1e-30*g term XLA cannot fold away) makes ONE host fetch
    time all n executions, like bench.py's scan-based protocol."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(c, _):
            e, g = eg(c)
            # data dependence: ~3e-22 relative perturbation at the PIP
            # variable scale (c >= e^-8), preserves positivity for log(c)
            return c * (1.0 + 1e-30 * g), jnp.sum(e)
        c, es = jax.lax.scan(body, x, None, length=n)
        return jnp.sum(es) + jnp.sum(c)
    return chain


def time_fn(eg, x, n=50):
    chain = make_chain(eg, n)
    float(np.asarray(chain(x)))          # compile + warm (fetch = sync)
    t0 = time.perf_counter()
    float(np.asarray(chain(x)))          # scalar fetch forces execution
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
            # typed knobs (round 5): impl/basis are explicit pip_apply
            # args now - no env mutation, no cache_clear
            if mode in ('quad_bf16', 'vech_pallas'):
                f = pe.pip_apply(name, impl=mode, basis='gather')
            else:
                f = pe.pip_apply(name, impl='quad', basis=mode)

            def eg(x, f=f):
                e, g = jax.jvp(f, (x,), (jnp.ones_like(x),))
                gr = jax.grad(lambda y: jnp.sum(f(y)))(x)
                return e, gr

            eg_j = jax.jit(eg)
            ms = time_fn(eg, x)
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
