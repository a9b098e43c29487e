"""Thin-CLI tests (in-process; the CPU mesh backend from conftest)."""

import json
import os

import numpy as np

from deconv3d_tpu.__main__ import main
from deconv3d_tpu.cube import Cube


def _write_cube(tmp_path, rng):
    data = rng.normal(size=(16, 6, 6)).astype(np.float32)
    cube = Cube.from_data(
        data, variance=np.full_like(data, 0.04), crval=4750.0, cdelt=1.25
    )
    path = str(tmp_path / "in.fits")
    cube.to_fits(path)
    return path


def test_cli_info(tmp_path, rng, capsys):
    path = _write_cube(tmp_path, rng)
    assert main(["info", "--cube", path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["shape_lyx"] == [16, 6, 6]
    assert out["has_variance"] is True


def test_cli_run(tmp_path, rng, capsys):
    path = _write_cube(tmp_path, rng)
    out_prefix = str(tmp_path / "res")
    rc = main([
        "run", "--cube", path, "--out", out_prefix,
        "--iterations", "20", "--fsf", "gaussian", "--fsf-fwhm", "0.5",
        "--lsf", "gaussian", "--lsf-fwhm", "2.0", "--sampler", "gibbs",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["sweeps"] == 20
    assert stats["acceptance_rate"] == 1.0
    for suffix in ("_clean.fits", "_stats.json", "_traces.npz"):
        assert os.path.exists(out_prefix + suffix)


def test_cli_run_until(tmp_path, rng, capsys):
    path = _write_cube(tmp_path, rng)
    out_prefix = str(tmp_path / "res_until")
    rc = main([
        "run", "--cube", path, "--out", out_prefix,
        "--iterations", "400", "--burn-in", "20", "--chains", "2",
        "--fsf", "gaussian", "--fsf-fwhm", "0.5",
        "--lsf", "gaussian", "--lsf-fwhm", "2.0", "--sampler", "gibbs",
        "--until-rhat", "1.3", "--min-ess", "10",
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert "run_until" in stats
    assert stats["run_until"]["sweeps"] <= 400
    assert stats["run_until"]["ess_chi2"] > 0


def test_cli_map(tmp_path, rng, capsys):
    path = _write_cube(tmp_path, rng)
    out_fits = str(tmp_path / "map.fits")
    rc = main([
        "map", "--cube", path, "--out", out_fits,
        "--fsf", "gaussian", "--fsf-fwhm", "0.3",
        "--lsf", "gaussian", "--lsf-fwhm", "1.5", "--tol", "1e-7",
    ])
    assert rc == 0
    assert json.loads(capsys.readouterr().out)["out"] == out_fits
    m = Cube.from_fits(out_fits)
    assert list(m.shape) == [16, 6, 6]
    assert np.isfinite(np.asarray(m.data)).all()


def test_cli_run_tabulated_kernels(tmp_path, rng, capsys):
    """--fsf/--lsf tabulated load measured rasters from .npy/.npz files."""
    from deconv3d_tpu import instruments as ins

    path = _write_cube(tmp_path, rng)
    lam = 4750.0 + 1.25 * np.arange(16)
    fsf_bank = ins.GaussianFSF(fwhm=0.5).bank(lam, size=5, pixel_scale=0.2)
    lsf_bank = ins.GaussianLSF(fwhm=2.0).bank(lam, cdelt=1.25, width=5)
    fsf_path = str(tmp_path / "fsf.npy")
    lsf_path = str(tmp_path / "lsf.npz")
    np.save(fsf_path, fsf_bank)
    np.savez(lsf_path, kernel=lsf_bank)
    out_prefix = str(tmp_path / "res_tab")
    rc = main([
        "run", "--cube", path, "--out", out_prefix,
        "--iterations", "10", "--sampler", "gibbs",
        "--fsf", "tabulated", "--fsf-image", fsf_path,
        "--lsf", "tabulated", "--lsf-kernel", lsf_path,
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["sweeps"] == 10
    assert os.path.exists(out_prefix + "_clean.fits")
