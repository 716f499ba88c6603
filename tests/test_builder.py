"""End-to-end mbpol_builder test: render a script from an INI and execute it
(mirrors the reference CI step, .travis.yml:37-39). Also exercises the
reference's own example INI format."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_builder_end_to_end(tmp_path):
    # generate inputs
    subprocess.run([sys.executable, os.path.join(REPO, 'examples', 'make_inputs.py')],
                   check=True, cwd=str(tmp_path))
    ini = os.path.join(REPO, 'examples', 'mbpol_config.ini')
    script = tmp_path / 'run.py'
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini, str(script)],
                       cwd=str(tmp_path), capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO,
                                JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr
    text = script.read_text()
    assert 'app.Simulation' in text and 'simulation.step' in text

    # copy the pdb next to the script (ini references the bare filename)
    import shutil
    shutil.copy(os.path.join(REPO, 'examples', 'water14_cluster.pdb'),
                tmp_path / 'water14_cluster.pdb')
    r = subprocess.run([sys.executable, str(script)], cwd=str(tmp_path),
                       capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO,
                                JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr[-3000:]
    assert (tmp_path / 'water14_cluster.log').exists()
    assert (tmp_path / 'water14_cluster_trajectory.pdb').exists()
    # AMBER NetCDF trajectory (save_velocities_every in the INI)
    from scipy.io import netcdf_file
    nc = netcdf_file(str(tmp_path / 'water14_cluster.nc'), 'r', mmap=False)
    assert nc.Conventions == b'AMBER'
    assert set(nc.variables) >= {'coordinates', 'velocities', 'forces'}
    nc.close()
