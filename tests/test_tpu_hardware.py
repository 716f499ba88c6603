"""Real-hardware production-path validation as a first-class pytest target.

The CPU float64 suite is the tight-parity oracle; this module runs the
float32 production paths (fused/block-sparse Pallas electrostatics, MXU
matmul-DFT PME, sharded kernel wrappers, PIMD/REMD drivers) on an attached
TPU so a Mosaic lowering or hardware-numerics regression is caught by
`pytest -m tpu` rather than only by a failed benchmark run.

The checks themselves live in tools/tpu_smoke.py (reference goldens from
SURVEY section 6 at measured float32-floor tolerances). They execute in a
fresh subprocess because this suite's conftest pins the CPU backend and
float64 for the golden tests; the smoke needs a clean interpreter that
selects the TPU platform.

Marked both `tpu` and `slow`: excluded from the default CI run
(`-m "not slow"`), selected on hardware with `pytest -m tpu`.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PROBE_TIMEOUT = 120
_SMOKE_TIMEOUT = 1800


def _tpu_attached():
    """Probe for a usable TPU in a subprocess with a hard timeout (a downed
    tunnel makes jax.devices() hang at the transport level, which must skip
    the test, not hang the suite)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    try:
        r = subprocess.run(
            [sys.executable, '-c',
             'import jax; d = jax.devices()[0]; print(d.platform)'],
            env=env, capture_output=True, text=True, timeout=_PROBE_TIMEOUT)
    except subprocess.TimeoutExpired:
        return False
    return r.returncode == 0 and 'tpu' in r.stdout.lower()


@pytest.mark.tpu
@pytest.mark.slow
def test_tpu_production_goldens():
    if not os.environ.get('MBPOL_TEST_TPU_SMOKE') and not _tpu_attached():
        pytest.skip('no TPU attached (set MBPOL_TEST_TPU_SMOKE=1 to force)')
    env = {k: v for k, v in os.environ.items()
           if k not in ('JAX_PLATFORMS', 'XLA_FLAGS')}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'tpu_smoke.py')],
        env=env, cwd=REPO, capture_output=True, text=True,
        timeout=_SMOKE_TIMEOUT)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr)
    assert r.returncode == 0, 'TPU production-path goldens failed'
