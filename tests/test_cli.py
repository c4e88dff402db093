"""CLI / file-driver / version tests (reference test parity:
test_calibration.py:758-765, 882-934; test_version.py)."""

import os
import sys

import numpy as np
import pytest

from calamity_tpu import calibration, simulate, version
from calamity_tpu.io import CalData, VisData


@pytest.fixture()
def input_file(tmp_path, redundant_visdata):
    path = os.path.join(str(tmp_path), "input.uvh5")
    redundant_visdata.write_uvh5(path)
    return path


def test_dpss_fit_argparser_defaults(monkeypatch):
    monkeypatch.setattr(sys, "argv", [sys.argv[0], "--input_data_files", "input.uvh5"])
    ap = calibration.dpss_fit_argparser()
    args = ap.parse_args()
    assert args.learning_rate == 1e-2
    assert args.tol == 1e-14
    assert args.maxsteps == 10000
    assert args.input_data_files == ["input.uvh5"]
    assert args.horizon == 1.0
    assert args.model_regularization == "post_hoc"
    assert args.patience == 0  # reference semantics by default


@pytest.mark.slow
def test_read_calibrate_and_model_dpss(tmp_path, input_file, redundant_visdata,
                                       monkeypatch):
    tmp = str(tmp_path)
    outfile_resid = os.path.join(tmp, "resid_fit.uvh5")
    outfile_model = os.path.join(tmp, "model_fit.uvh5")
    outfile_gain = os.path.join(tmp, "gains_fit.calfits")
    gains = CalData.blank_from_visdata(redundant_visdata)
    gains.x_orientation = "east"
    gname = os.path.join(tmp, "gains_input.calfits")
    gains.write_calfits(gname)

    model, resid, fitted_gains, fit_info = calibration.read_calibrate_and_model_dpss(
        input_data_files=input_file,
        input_model_files=input_file,
        input_gain_files=gname,
        resid_outfilename=outfile_resid,
        model_outfilename=outfile_model,
        gain_outfilename=outfile_gain,
        maxsteps=300,
        tol=1e-10,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
    )
    for fn in (outfile_resid, outfile_model, outfile_gain):
        assert os.path.exists(fn)
    back = VisData.from_uvh5(outfile_model)
    assert np.isfinite(back.data_array).all()
    # provenance string is recorded in output history
    assert "[calamity_tpu provenance]" in back.history
    gback = CalData.from_calfits(outfile_gain)
    assert gback.x_orientation == "east"
    assert "calibration_kwargs" in fit_info

    # argparser round trip driving the same files, with precision 64 and
    # autocorrelation weights (reference test_calibration.py:908-934)
    monkeypatch.setattr(sys, "argv", [
        sys.argv[0],
        "--input_data_files", input_file,
        "--input_model_files", input_file,
        "--input_gain_files", gname,
        "--resid_outfilename", outfile_resid,
        "--model_outfilename", outfile_model,
        "--gain_outfilename", outfile_gain,
        "--precision", "64",
        "--use_autocorrs_in_weights",
        "--maxsteps", "100",
        "--clobber",
    ])
    ap = calibration.dpss_fit_argparser()
    args = ap.parse_args()
    _, _, _, fit_info = calibration.read_calibrate_and_model_dpss(**vars(args))
    assert fit_info["calibration_kwargs"]["dtype"] == np.float64
    for fn in (outfile_resid, outfile_model, outfile_gain):
        assert os.path.exists(fn)


@pytest.mark.slow
def test_host_data_dtype_cli(tmp_path, input_file, monkeypatch):
    """--host_data_dtype complex64 halves host storage without changing
    the fit: outputs match the default (file-dtype) run closely."""
    tmp = str(tmp_path)
    out64 = os.path.join(tmp, "model64.uvh5")
    out32 = os.path.join(tmp, "model32.uvh5")
    common = dict(
        input_data_files=input_file,
        maxsteps=60,
        tol=1e-10,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
    )
    m128, r128, g128, _ = calibration.read_calibrate_and_model_dpss(
        model_outfilename=out64, **common
    )
    m64, r64, g64, _ = calibration.read_calibrate_and_model_dpss(
        model_outfilename=out32, host_data_dtype="complex64", **common
    )
    assert m64.data_array.dtype == np.complex64
    assert m128.data_array.dtype == np.complex128
    scale = np.max(np.abs(m128.data_array))
    assert np.allclose(m64.data_array, m128.data_array, atol=1e-4 * scale)
    assert np.allclose(g64.gain_array, g128.gain_array, atol=1e-4)
    # file outputs stay spec-complex128 regardless of host dtype
    assert VisData.from_uvh5(out32).data_array.dtype == np.complex128

    with pytest.raises(ValueError, match="host_data_dtype"):
        calibration.read_calibrate_and_model_dpss(
            input_data_files=input_file, host_data_dtype="float32"
        )

    # argparse surface round-trips the flag
    monkeypatch.setattr(sys, "argv", [sys.argv[0], "--input_data_files", input_file,
                                      "--host_data_dtype", "complex64"])
    args = calibration.dpss_fit_argparser().parse_args()
    assert args.host_data_dtype == "complex64"


@pytest.mark.slow
def test_weights_file_cli(tmp_path, input_file, redundant_visdata, monkeypatch):
    """--weights_file loads a UVFlag HDF5 weights object into the fit and
    matches passing the same object in memory."""
    from calamity_tpu.io import FlagWeights

    rng = np.random.default_rng(3)
    uvf = FlagWeights(redundant_visdata, mode="flag")
    uvf.weights_array[:] = np.abs(rng.standard_normal(uvf.weights_array.shape))
    wpath = os.path.join(str(tmp_path), "weights.h5")
    uvf.to_uvflag_h5(wpath)

    common = dict(
        input_data_files=input_file,
        maxsteps=200,
        tol=1e-10,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
    )
    m1, r1, g1, _ = calibration.read_calibrate_and_model_dpss(
        weights_file=wpath, **common
    )
    m2, r2, g2, _ = calibration.read_calibrate_and_model_dpss(
        weights_file=None, **common
    )
    # the random weights change the fit; identical-weight runs agree
    assert not np.allclose(g1.gain_array, g2.gain_array)
    m3, r3, g3, _ = calibration.read_calibrate_and_model_dpss(
        weights_file=wpath, **common
    )
    np.testing.assert_allclose(g1.gain_array, g3.gain_array)
    # flag parses
    monkeypatch.setattr(sys, "argv", [sys.argv[0], "--input_data_files", input_file,
                                      "--weights_file", wpath])
    args = calibration.dpss_fit_argparser().parse_args()
    assert args.weights_file == wpath
    # mutual exclusion with autocorr weights
    with pytest.raises(ValueError, match="mutually exclusive"):
        calibration.read_calibrate_and_model_dpss(
            weights_file=wpath, use_autocorrs_in_weights=True, **common
        )


def test_read_calibrate_clobber_fails_fast(tmp_path, input_file):
    out = os.path.join(str(tmp_path), "resid.uvh5")
    open(out, "w").close()
    with pytest.raises(IOError):
        calibration.read_calibrate_and_model_dpss(
            input_data_files=input_file, resid_outfilename=out, maxsteps=5
        )


@pytest.mark.slow
def test_calh5_gain_output(tmp_path, input_file):
    out = os.path.join(str(tmp_path), "g.calh5")
    calibration.read_calibrate_and_model_dpss(
        input_data_files=input_file,
        gain_outfilename=out,
        maxsteps=50,
        tol=1e-10,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
    )
    g = CalData.from_calh5(out)
    assert np.isfinite(g.gain_array).all()


def test_multipol_fit():
    """4-pol dataset: per-pol fits converge independently
    (BASELINE.json config 3 concept)."""
    uvd = simulate.make_golomb_array(nants=6, nfreqs=64, npols=4, seed=2)
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        uvdata=uvd,
        gains=None,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        maxsteps=800,
        tol=1e-12,
        learning_rate=1e-2,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
    )
    assert len(hist) == 4
    assert gains.Njones == 4
    rms = lambda x: np.sqrt(np.mean(np.abs(x) ** 2))
    for p in range(4):
        assert rms(model.data_array[..., p]) >= 50 * rms(resid.data_array[..., p])


def test_version_info():
    info = version.construct_version_info()
    assert info["version"] == version.__version__
    hist = version.history_string(notes="unit test")
    assert "unit test" in hist
    assert "version" in hist


def test_probe_git_state_at_repo_toplevel(tmp_path):
    """A package directory that IS the repo toplevel keeps its git
    provenance (ADVICE r2: the containment check excluded equality)."""
    import subprocess

    repo = str(tmp_path / "r")
    os.makedirs(repo)
    env = {**os.environ, "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
           "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"}
    subprocess.run(["git", "init", "-q", repo], check=True, env=env)
    open(os.path.join(repo, "f"), "w").write("x")
    subprocess.run(["git", "-C", repo, "add", "f"], check=True, env=env)
    subprocess.run(["git", "-C", repo, "commit", "-q", "-m", "c"], check=True, env=env)
    state = version.probe_git_state(repo)
    assert state.commit != ""


def test_profiler_output(tmp_path, golomb_visdata):
    """Opt-in profiling writes trace files (reference parity:
    tf.profiler usage, tested at reference test_calibration.py:817-819)."""
    import glob

    logdir = os.path.join(str(tmp_path), "profile")
    calibration.calibrate_and_model_dpss(
        uvdata=golomb_visdata,
        gains=None,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        maxsteps=20,
        tol=0.0,
        n_profile_steps=5,
        profile_log_dir=logdir,
        model_regularization="post_hoc",
    )
    assert os.path.exists(logdir)
    assert len(glob.glob(logdir + "/**/*", recursive=True)) > 0


def test_multi_file_concat(tmp_path, golomb_visdata):
    """Multiple input files concatenate along the time axis
    (reference uvd.read(list) behavior, calibration.py:1757-1761)."""
    u1 = golomb_visdata.copy()
    u2 = golomb_visdata.copy()
    u2.time_array = u2.time_array + 2.0
    p1 = os.path.join(str(tmp_path), "a.uvh5")
    p2 = os.path.join(str(tmp_path), "b.uvh5")
    u1.write_uvh5(p1)
    u2.write_uvh5(p2)
    model, resid, gains, info = calibration.read_calibrate_and_model_dpss(
        input_data_files=[p1, p2],
        maxsteps=50,
        tol=1e-8,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
    )
    assert model.Ntimes == 2
    assert len(info[0]) == 2  # both times fitted


def test_no_correct_model_flag_reachable(monkeypatch):
    """--no-correct_model must actually reach the driver (VERDICT r1 #10):
    with gains perturbed, an uncorrected model differs from the corrected
    one by the gain corruption."""
    monkeypatch.setattr(sys, "argv", [sys.argv[0], "--input_data_files", "x.uvh5",
                                      "--no-correct_model", "--no-correct_resid"])
    args = calibration.dpss_fit_argparser().parse_args()
    assert args.correct_model is False
    assert args.correct_resid is False
    monkeypatch.setattr(sys, "argv", [sys.argv[0], "--input_data_files", "x.uvh5",
                                      "--nsamples_in_weights"])
    args = calibration.dpss_fit_argparser().parse_args()
    assert args.correct_model is True  # default preserved
    assert args.nsamples_in_weights is True

    uvd = simulate.make_golomb_array(nants=6, nfreqs=64, seed=3)
    from calamity_tpu import cal_utils

    gains = cal_utils.blank_uvcal_from_uvdata(uvd)
    rng = np.random.default_rng(0)
    gains.gain_array *= 1.0 + 0.05 * rng.standard_normal(gains.gain_array.shape)
    common = dict(
        uvdata=uvd, min_dly=2.0 / 0.3, offset=2.0 / 0.3,
        maxsteps=50, tol=0.0, model_regularization=None, freeze_model=True,
    )
    m_corr, _, _, _ = calibration.calibrate_and_model_dpss(
        gains=gains.copy(), correct_model=True, **common)
    m_raw, _, _, _ = calibration.calibrate_and_model_dpss(
        gains=gains.copy(), correct_model=False, **common)
    # gain-corrupted model differs from the corrected model
    assert not np.allclose(m_corr.data_array, m_raw.data_array)
