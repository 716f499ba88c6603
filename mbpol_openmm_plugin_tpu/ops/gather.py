"""Gathers as one-hot matmuls.

TPU gathers are element-serialized, and the VJP of a gather is a scatter-add
(worse). For moderate table sizes it is much faster to express
table[idx] as onehot(idx) @ table: the forward is an MXU matmul and the VJP
is the transposed matmul - no scatters anywhere. Exactness: one-hot rows
select single table rows, but the matmul must not round the *values*, so the
dot is pinned to HIGHEST precision (cost is negligible at these shapes).
"""
import jax
import jax.numpy as jnp

# above this (rows * table_rows) footprint fall back to a plain gather
_MAX_ONEHOT_ELEMS = 256 * 1024 * 1024 // 4


def gather_rows(table, idx, n_rows=None):
    """table: [n, d]; idx: [P] int; returns table[idx] ([P, d])."""
    n = table.shape[0] if n_rows is None else n_rows
    p = idx.shape[0]
    if p * n > _MAX_ONEHOT_ELEMS or jax.default_backend() == 'cpu':
        return table[idx]
    onehot = (idx[:, None] == jnp.arange(n)[None, :]).astype(table.dtype)
    return jnp.dot(onehot, table, precision=jax.lax.Precision.HIGHEST)
