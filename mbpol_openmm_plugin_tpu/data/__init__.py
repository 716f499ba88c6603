"""Loaders for the extracted MB-pol parameter archives.

The .npz files are produced by tools/extract_constants.py and
tools/extract_poly.py from the reference's hard-coded C arrays; they are the
canonical physics data of the model (fit coefficients, not code).
"""
import functools
import os
import numpy as np

_HERE = os.path.dirname(__file__)


@functools.lru_cache(maxsize=None)
def load(name):
    """Load one archive ('onebody', 'twobody_constants', 'threebody_constants',
    'dms', 'poly2b', 'poly3b') as a dict of numpy arrays/scalars."""
    with np.load(os.path.join(_HERE, name + '.npz')) as z:
        return {k: z[k] for k in z.files}
