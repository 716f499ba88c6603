"""Shared access to the extracted geometry fixtures (tools/extract_fixtures.py)."""
import os
import numpy as np

HERE = os.path.join(os.path.dirname(__file__), 'fixtures')


def load(name):
    with np.load(os.path.join(HERE, name + '.npz')) as z:
        return {k: z[k] for k in z.files}


def load_system(name, box=None):
    """Returns (System, positions[jnp-ready numpy]) with M sites placed."""
    from mbpol_openmm_plugin_tpu.system import System, compute_virtual_sites
    import jax.numpy as jnp
    d = load(name)
    sys_ = System.from_atom_names(d['names'], d['resnames'], box=box)
    pos = jnp.asarray(d['positions'])
    pos = compute_virtual_sites(sys_, pos)
    return sys_, pos
