"""Accuracy of the fixed-depth Q(3/4, x) vs scipy (the reference's
ttm::gammq is a Numerical-Recipes implementation of the same function)."""
import numpy as np
from scipy.special import gammaincc

import jax.numpy as jnp

from mbpol_openmm_plugin_tpu.ops.gamma import gammq34


def test_gammq34_accuracy():
    x = np.concatenate([np.linspace(1e-8, 1.74, 400),
                        np.linspace(1.75, 50.0, 400),
                        np.logspace(-6, 2, 200)])
    ref = gammaincc(0.75, x)
    got = np.asarray(gammq34(jnp.asarray(x)))
    err = np.abs(got - ref)
    assert err.max() < 1e-10, err.max()  # reference ttm::gammq itself converges to ~3e-7 (NR EPS)


def test_gammq34_edge_cases():
    out = np.asarray(gammq34(jnp.asarray([0.0, 1e-300, 700.0])))
    assert abs(out[0] - 1.0) < 1e-12
    assert np.all(np.isfinite(out))
