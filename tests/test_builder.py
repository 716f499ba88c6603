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


def test_builder_renders_pimd_section(tmp_path):
    """[pimd] INI section renders a PIMDSimulation driver script."""
    ini = os.path.join(REPO, 'examples', 'example_ini',
                       'mbpol_cluster_pimd.ini')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'PIMDSimulation' in r.stdout
    assert 'n_beads=8' in r.stdout
    assert 'contraction=1' in r.stdout
    assert 'kinetic_virial' in r.stdout
    # compiles as python
    import ast
    ast.parse(r.stdout)


import pytest


@pytest.mark.slow
def test_builder_pimd_end_to_end(tmp_path):
    """Render and EXECUTE a tiny PIMD INI (2 beads, 3 steps)."""
    subprocess.run([sys.executable, os.path.join(REPO, 'examples', 'make_inputs.py')],
                   check=True, cwd=str(tmp_path))
    import shutil
    shutil.copy(os.path.join(REPO, 'examples', 'water14_cluster.pdb'),
                tmp_path / 'water14_cluster.pdb')
    ini_text = (tmp_path / 'pimd.ini')
    src = open(os.path.join(REPO, 'examples', 'example_ini',
                            'mbpol_cluster_pimd.ini')).read()
    src = (src.replace('n_beads = 8', 'n_beads = 2')
              .replace('equilibration_steps = 100', 'equilibration_steps = 1')
              .replace('production_steps = 400', 'production_steps = 2')
              .replace('save_energy_every = 100', 'save_energy_every = 1')
              .replace('save_positions_every = 100',
                       'save_positions_every = 1'))
    ini_text.write_text(src)
    script = tmp_path / 'run_pimd.py'
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini_text), str(script)], cwd=str(tmp_path),
                       capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, str(script)], cwd=str(tmp_path),
                       capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr[-3000:]
    assert 'KE_virial' in r.stdout or 'kcalmol' in r.stdout
    assert (tmp_path / 'water14_pimd_pimd.npz').exists()
    # centroid trajectory (save_positions_every): PDB MODEL frames of the
    # bead-centroid positions via app.PIMDCentroidWriter
    traj = (tmp_path / 'water14_pimd_centroid_trajectory.pdb').read_text()
    assert traj.count('MODEL') == 2 and 'HETATM' in traj


def test_builder_renders_pimd_npt(tmp_path):
    """[pimd] + [barostat] renders an NPT ring-polymer driver (pressure
    converted atm -> bar as in the classical MonteCarloBarostat branch)."""
    ini = tmp_path / 'npt_pimd.ini'
    ini.write_text('''
[system]
pdb_filename = water256.pdb
simulation_name = npt_pimd
nonbonded = PME
pme_box_size_nm = 1.94
temperature_k = 300

[pimd]
n_beads = 8
contraction = 1

[barostat]
pressure_atm = 1
barostat_interval = 25

[integrator]
timestep_fs = 0.1
production_steps = 100

[logging]
save_energy_every = 50
save_positions_every = 50
''')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini)], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'barostat_pressure=float(1) * 1.01325' in r.stdout
    assert 'barostat_interval=int(25)' in r.stdout
    assert 'PIMDCentroidWriter' in r.stdout
    import ast
    ast.parse(r.stdout)


def test_builder_renders_isotope(tmp_path):
    """[system] isotope = D2O threads through to createSystem(isotope=...)."""
    import configparser
    src = os.path.join(REPO, 'examples', 'example_ini',
                       'mbpol_cluster_pimd.ini')
    cfg = configparser.ConfigParser()
    cfg.read(src)
    cfg['system']['isotope'] = 'D2O'
    ini = tmp_path / 'd2o.ini'
    with open(ini, 'w') as f:
        cfg.write(f)
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini)], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'isotope="D2O"' in r.stdout
    import ast
    ast.parse(r.stdout)
    # default H2O renders no isotope kwarg
    r0 = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                         src], capture_output=True, text=True,
                        env=dict(os.environ, PYTHONPATH=REPO))
    assert 'isotope' not in r0.stdout


def test_builder_renders_remd_section(tmp_path):
    """[remd] INI section renders an REMDSimulation driver script."""
    ini = os.path.join(REPO, 'examples', 'example_ini',
                       'mbpol_cluster_remd.ini')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'REMDSimulation' in r.stdout
    assert 'geometric_ladder(250.0, 400.0, 4)' in r.stdout
    assert 'exchange_interval=25' in r.stdout
    import ast
    ast.parse(r.stdout)

    # [pimd] + [remd] is rejected
    import configparser
    cfg = configparser.ConfigParser()
    cfg.read(ini)
    cfg.add_section('pimd')
    cfg['pimd']['n_beads'] = '2'
    bad = tmp_path / 'bad.ini'
    with open(bad, 'w') as f:
        cfg.write(f)
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(bad)], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode != 0
    assert 'mutually exclusive' in r.stderr + r.stdout


@pytest.mark.slow
def test_builder_remd_end_to_end(tmp_path):
    """Render and EXECUTE a tiny REMD INI (2 replicas, 2x2 steps)."""
    subprocess.run([sys.executable, os.path.join(REPO, 'examples', 'make_inputs.py')],
                   check=True, cwd=str(tmp_path))
    import shutil
    shutil.copy(os.path.join(REPO, 'examples', 'water14_cluster.pdb'),
                tmp_path / 'water14_cluster.pdb')
    src = open(os.path.join(REPO, 'examples', 'example_ini',
                            'mbpol_cluster_remd.ini')).read()
    src = (src.replace('n_replicas = 4', 'n_replicas = 2')
              .replace('exchange_interval = 25', 'exchange_interval = 2')
              .replace('equilibration_steps = 100', 'equilibration_steps = 2')
              .replace('production_steps = 1000', 'production_steps = 4'))
    ini = tmp_path / 'remd.ini'
    ini.write_text(src)
    script = tmp_path / 'run_remd.py'
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini), str(script)], cwd=str(tmp_path),
                       capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, str(script)], cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=1200,
                       env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS='cpu'))
    assert r.returncode == 0, r.stderr + r.stdout
    assert 'slot,T_K,U_kcalmol,acceptance_to_next' in r.stdout
    assert (tmp_path / 'water14_remd_remd.npz').exists()


def test_builder_renders_pimd_pressure(tmp_path):
    """[logging] save_pressure in a PME [pimd] INI adds the quantum virial
    pressure column (report_pressure=True)."""
    import ast
    import configparser
    cfg = configparser.ConfigParser()
    cfg.read(os.path.join(REPO, 'examples', 'example_ini',
                          'mbpol_bulk_npt_pimd.ini'))
    if not cfg.has_section('logging'):
        cfg.add_section('logging')
    cfg['logging']['save_pressure'] = 'true'
    cfg['pimd']['contraction'] = '0'      # estimator needs uncontracted
    ini = tmp_path / 'p.ini'
    with open(ini, 'w') as f:
        cfg.write(f)
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini)], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'report_pressure=True' in r.stdout
    assert 'P_bar' in r.stdout
    ast.parse(r.stdout)

    # with contraction the pressure column is omitted (the virial
    # estimator must match the contracted effective potential)
    cfg['pimd']['contraction'] = '1'
    with open(ini, 'w') as f:
        cfg.write(f)
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini)], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'report_pressure' not in r.stdout


def test_builder_remd_cold_trajectory_render(tmp_path):
    """[remd] + save_positions_every renders the cold-slot trajectory
    writer (TrajectoryFrameWriter adapter)."""
    import ast
    import configparser
    cfg = configparser.ConfigParser()
    cfg.read(os.path.join(REPO, 'examples', 'example_ini',
                          'mbpol_cluster_remd.ini'))
    if not cfg.has_section('logging'):
        cfg.add_section('logging')
    cfg['logging']['save_positions_every'] = '50'
    ini = tmp_path / 't.ini'
    with open(ini, 'w') as f:
        cfg.write(f)
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        str(ini)], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'TrajectoryFrameWriter' in r.stdout
    assert '_cold_trajectory.pdb' in r.stdout
    assert 'frame_callback=cold_writer' in r.stdout
    ast.parse(r.stdout)


def test_builder_renders_bulk_remd(tmp_path):
    """The bulk [remd] INI renders nlist_reuse + the cold-slot
    trajectory writer and parses."""
    import ast
    ini = os.path.join(REPO, 'examples', 'example_ini',
                       'mbpol_bulk_remd.ini')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'nlist_reuse=True' in r.stdout
    # the app layer builds skin-0 potentials; the script must rebuild
    # with a skin or REMDSimulation(nlist_reuse=True) raises
    assert 'dataclasses.replace(pot.config, nlist_skin=0.02)' in r.stdout
    assert 'TrajectoryFrameWriter' in r.stdout
    ast.parse(r.stdout)


def test_builder_renders_respa_integrator(tmp_path):
    """[integrator] respa_inner > 1 renders the MTS (r-RESPA) integrator
    with timestep_fs as the OUTER step; absent/1 keeps plain Verlet."""
    import ast
    ini = os.path.join(REPO, 'examples', 'example_ini',
                       'mbpol_bulk_nve_respa.ini')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'MTSVerletIntegrator(0.4*unit.femtoseconds, innerSteps=2)' in r.stdout
    ast.parse(r.stdout)

    # respa_mid > 1 renders the three-level ladder
    ini = os.path.join(REPO, 'examples', 'example_ini',
                       'mbpol_bulk_nve_respa3.ini')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert ('MTSVerletIntegrator(1.2*unit.femtoseconds, innerSteps=2, '
            'midSteps=3)') in r.stdout
    ast.parse(r.stdout)

    # control: the plain NVE INI keeps the single-timestep integrator
    ini = os.path.join(REPO, 'examples', 'example_ini', 'mbpol_bulk_nve.ini')
    r = subprocess.run([sys.executable, os.path.join(REPO, 'bin', 'mbpol_builder'),
                        ini], capture_output=True, text=True,
                       env=dict(os.environ, PYTHONPATH=REPO))
    assert r.returncode == 0, r.stderr
    assert 'VerletIntegrator(' in r.stdout
    assert 'MTSVerletIntegrator' not in r.stdout
