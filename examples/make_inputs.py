#!/usr/bin/env python
"""Write the example input PDBs (water14 cluster, water256 bulk) from the
extracted geometry fixtures."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

import fixtures  # noqa: E402
from mbpol_openmm_plugin_tpu.app.pdbfile import Atom, Topology, write_pdb_frame  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def emit(fixture, out):
    d = fixtures.load(fixture)
    atoms = [Atom(i, str(n), str(rn), int(ri)) for i, (n, rn, ri) in
             enumerate(zip(d['names'], d['resnames'], d['resids']))]
    topo = Topology(atoms)
    with open(os.path.join(HERE, out), 'w') as fh:
        write_pdb_frame(fh, topo, d['positions'])
    print('wrote', out)


if __name__ == '__main__':
    emit('water14_cluster', 'water14_cluster.pdb')
    emit('water256_bulk', 'water256_bulk.pdb')
    emit('water3', 'water3.pdb')
