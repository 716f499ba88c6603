"""Thole parameter plumbing (mirrors python/check_thole_param.py): XML attrs
must reach the electrostatics parameters in order [TCC,TCD,TDD,TDDOH,TDDHH]."""
import numpy as np

from mbpol_openmm_plugin_tpu import app
from mbpol_openmm_plugin_tpu.app.forcefield import ForceField


def test_thole_order_from_xml():
    ff = ForceField(app.mbpol_xml_path())
    np.testing.assert_allclose(ff.thole, [0.4, 0.4, 0.055, 0.626, 0.055])


def test_thole_reaches_potential():
    from mbpol_openmm_plugin_tpu.models.potential import MBPol, MBPolConfig
    from mbpol_openmm_plugin_tpu.system import System
    sys_ = System.waters(2)
    pot = MBPol(sys_, MBPolConfig(thole=(0.5, 0.4, 0.05, 0.6, 0.06)))
    np.testing.assert_allclose(pot.elec_params.thole, [0.5, 0.4, 0.05, 0.6, 0.06])
