"""Tests for mid-fit checkpoint/resume (solver.checkpoint)."""

import os

import numpy as np
import pytest

from calamity_tpu import calibration, models
from calamity_tpu.solver import checkpoint as ckpt_mod
from test_calibration import RMS, project_onto_dpss


@pytest.fixture()
def projected(golomb_visdata):
    uvd = golomb_visdata.copy()
    comps = models.yield_pbl_dpss_model_comps(uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3)
    return project_onto_dpss(uvd, comps)


def _run(uvd, ckdir, maxsteps, resume=True):
    # comps_precision pinned: these tests target the single-phase
    # checkpoint machinery (the default "mixed" schedule writes phase
    # subdirectories, covered by the *_mixed tests below)
    return calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvd,
        gains=None,
        maxsteps=maxsteps,
        tol=0.0,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        checkpoint_dir=ckdir,
        checkpoint_every=50,
        resume=resume,
        comps_precision="float32",
    )


def test_checkpoints_written_and_fit_converges(tmp_path, projected):
    ckdir = str(tmp_path / "ck")
    model, resid, gains, hist = _run(projected, ckdir, maxsteps=150)
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    poltime_dir = os.path.join(ckdir, "pol0_t0")
    assert ckpt_mod.latest_checkpoint(poltime_dir) is not None
    steps = sorted(
        int(n.split("_")[1]) for n in os.listdir(poltime_dir) if n.startswith("step_")
    )
    assert steps == [50, 100, 150]
    assert len(hist[0][0]["loss"]) == 150


@pytest.mark.slow
def test_resume_continues_descent(tmp_path, projected):
    """Interrupted run + resume reproduces the uninterrupted trajectory."""
    ck_a = str(tmp_path / "a")
    ck_b = str(tmp_path / "b")
    # uninterrupted: 120 steps
    model_a, resid_a, gains_a, hist_a = _run(projected, ck_a, maxsteps=120)
    # interrupted at 60, then resumed to 120
    _run(projected, ck_b, maxsteps=60)
    model_b, resid_b, gains_b, hist_b = _run(projected, ck_b, maxsteps=120)
    la = np.asarray(hist_a[0][0]["loss"])
    lb = np.asarray(hist_b[0][0]["loss"])
    assert len(lb) == 120
    # resumed history continues the first run's losses
    assert np.allclose(la[:60], lb[:60], rtol=1e-5)
    assert np.allclose(la[60:], lb[60:], rtol=1e-3, atol=1e-10)
    assert np.allclose(gains_a.gain_array, gains_b.gain_array, atol=1e-5)


def test_fresh_run_ignores_checkpoints_when_resume_false(tmp_path, projected):
    ckdir = str(tmp_path / "c")
    _run(projected, ckdir, maxsteps=60)
    model, resid, gains, hist = _run(projected, ckdir, maxsteps=60, resume=False)
    assert len(hist[0][0]["loss"]) == 60


def test_checkpoint_overwrite_same_path(tmp_path):
    """Saving twice to the same step path must persist the SECOND state —
    orbax refuses to overwrite by default, and silently falling back to the
    numpy writer would leave load_checkpoint preferring the stale orbax
    directory."""
    import jax.numpy as jnp

    def mk(v):
        params = (jnp.full((3,), v), jnp.full((3,), v + 1.0))
        return ckpt_mod.FitCheckpoint(
            params=params,
            opt_state=(jnp.zeros((3,)),),
            step=int(v),
            prev_loss=float(v),
            best_loss=float(v),
            best_params=params,
            history=np.full((int(v),), v, dtype=np.float64),
        )

    path = str(tmp_path / "step_10")
    ckpt_mod.save_checkpoint(path, mk(1.0))
    ckpt_mod.save_checkpoint(path, mk(2.0))
    back = ckpt_mod.load_checkpoint(path, mk(2.0))
    assert float(back.prev_loss) == 2.0
    assert np.allclose(np.asarray(back.params[0]), 2.0)
    assert len(back.history) == 2


def test_checkpointed_mixed_precision_phases(tmp_path, projected):
    """comps_precision='mixed' with checkpointing runs each phase in its
    own checkpoint subdirectory, and resume with completed phase-2
    checkpoints skips the bf16 phase entirely."""
    ckdir = str(tmp_path / "mx")
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected,
        gains=None,
        maxsteps=120,
        tol=0.0,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        checkpoint_dir=ckdir,
        checkpoint_every=50,
        comps_precision="mixed",
    )
    base = os.path.join(ckdir, "pol0_t0")
    assert ckpt_mod.latest_checkpoint(os.path.join(base, "phase_bf16")) is not None
    assert ckpt_mod.latest_checkpoint(os.path.join(base, "phase_f32")) is not None
    n1, n2 = hist[0][0]["phase_steps"]
    assert n1 == 120 and n2 == 120  # tol=0 runs both phases to maxsteps
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    # resume: phase-2 checkpoints exist, so the bf16 phase is skipped and
    # phase 2 continues from its last checkpoint
    model2, resid2, gains2, hist2 = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected,
        gains=None,
        maxsteps=170,
        tol=0.0,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        checkpoint_dir=ckdir,
        checkpoint_every=50,
        comps_precision="mixed",
    )
    m1, m2_ = hist2[0][0]["phase_steps"]
    # bf16 phase is skipped on resume, but its diagnostics are restored
    # from the persisted phase-1 marker, so the reported history matches
    # an uninterrupted run's shape (ADVICE r2)
    assert m1 == 120
    assert m2_ == 170
    assert len(hist2[0][0]["loss"]) == 120 + 170
    assert np.allclose(
        np.asarray(hist2[0][0]["loss"][:120]),
        np.asarray(hist[0][0]["loss"][:120]),
        rtol=1e-6,
    )


def test_latest_checkpoint_skips_unloadable_dirs(tmp_path):
    """A present-but-empty step dir (crash relic) must not shadow an older
    loadable checkpoint (ADVICE r2: non-atomic save)."""
    import jax.numpy as jnp

    params = (jnp.zeros((2,)),)
    ck = ckpt_mod.FitCheckpoint(
        params=params, opt_state=(jnp.zeros((2,)),), step=50, prev_loss=1.0,
        best_loss=1.0, best_params=params, history=np.zeros((50,)),
    )
    ckpt_mod.save_checkpoint(str(tmp_path / "step_50"), ck)
    os.makedirs(str(tmp_path / "step_100"))  # half-written: no state inside
    latest = ckpt_mod.latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("step_50")
    # and a stale .tmp sibling never parses as a step
    os.makedirs(str(tmp_path / "step_150.tmp"))
    assert ckpt_mod.latest_checkpoint(str(tmp_path)).endswith("step_50")


def _run_batched(uvd, ckdir, maxsteps, resume=True, comps_precision="float32",
                 mesh=None, steps_per_execution=None):
    return calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvd,
        gains=None,
        maxsteps=maxsteps,
        tol=0.0,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        mesh=mesh,
        checkpoint_dir=ckdir,
        checkpoint_every=50,
        resume=resume,
        comps_precision=comps_precision,
        steps_per_execution=steps_per_execution,
    )


@pytest.fixture()
def projected_multitime(projected):
    uvd2 = projected.copy()
    uvd2.time_array = uvd2.time_array + 2.0
    return projected + uvd2


@pytest.mark.slow
def test_batched_checkpoint_resume_bitexact_f32(tmp_path, projected_multitime):
    """Interrupted + resumed batched (time-parallel) descent reproduces the
    uninterrupted trajectory bit-exactly (VERDICT r2 item 1)."""
    import jax

    mesh = None
    ck_a = str(tmp_path / "a")
    ck_b = str(tmp_path / "b")
    model_a, resid_a, gains_a, hist_a = _run_batched(
        projected_multitime, ck_a, maxsteps=120, mesh=mesh
    )
    _run_batched(projected_multitime, ck_b, maxsteps=60, mesh=mesh)
    model_b, resid_b, gains_b, hist_b = _run_batched(
        projected_multitime, ck_b, maxsteps=120, mesh=mesh
    )
    for t in (0, 1):
        la = np.asarray(hist_a[0][t]["loss"])
        lb = np.asarray(hist_b[0][t]["loss"])
        assert len(la) == len(lb) == 120
        assert np.array_equal(la, lb)  # bit-exact, not just close
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)
    # checkpoints exist under the batched subdirectory
    assert ckpt_mod.latest_checkpoint(os.path.join(ck_a, "batched")) is not None


def test_steps_per_execution_invariance(tmp_path, projected_multitime):
    """Bounding single device executions (steps_per_execution) changes
    neither the trajectory nor the checkpoint cadence: seg_len is a traced
    scalar, so sub-checkpoint_every calls reuse the same executable and
    saves still land every checkpoint_every steps."""
    ck_a = str(tmp_path / "a")
    ck_b = str(tmp_path / "b")
    model_a, resid_a, gains_a, hist_a = _run_batched(
        projected_multitime, ck_a, maxsteps=120
    )
    model_b, resid_b, gains_b, hist_b = _run_batched(
        projected_multitime, ck_b, maxsteps=120, steps_per_execution=7
    )
    for t in (0, 1):
        la = np.asarray(hist_a[0][t]["loss"])
        lb = np.asarray(hist_b[0][t]["loss"])
        assert len(la) == len(lb) == 120
        assert np.array_equal(la, lb)  # bit-exact, not just close
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)
    # capped executions did NOT change the save cadence (checkpoint_every
    # 50): saves at 50, 100, and the 120-step tail — same as uncapped
    steps = sorted(
        int(p.name.split("_")[1])
        for p in (tmp_path / "b" / "batched").iterdir()
        if p.name.startswith("step_")
    )
    steps_a = sorted(
        int(p.name.split("_")[1])
        for p in (tmp_path / "a" / "batched").iterdir()
        if p.name.startswith("step_")
    )
    assert steps == steps_a == [50, 100, 120]
    # uncheckpointed capped run (plan-routed) matches too
    model_c, resid_c, gains_c, hist_c = _run_batched(
        projected_multitime, None, maxsteps=120, steps_per_execution=7
    )
    for t in (0, 1):
        assert np.array_equal(
            np.asarray(hist_a[0][t]["loss"]), np.asarray(hist_c[0][t]["loss"])
        )
    assert np.array_equal(gains_a.gain_array, gains_c.gain_array)


def test_steps_per_execution_counts_warmup():
    """The folded warm-up iteration counts against the execution bound:
    cap=1 degenerates to a warm-up-only first call and the trajectory
    still matches batched_fit_core bit-exactly."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import (
        batched_fit_checkpointed,
        batched_fit_core,
    )
    from calamity_tpu.solver.fit import FitConfig

    rng = np.random.default_rng(3)
    nb, na, F, V, G = 2, 4, 16, 4, 6
    chunk = (
        jnp.asarray(rng.standard_normal((G, 1, F, V)).astype(np.float32)),
        jnp.asarray(rng.integers(0, na, (G, 1)).astype(np.int32)),
        jnp.asarray(rng.integers(0, na, (G, 1)).astype(np.int32)),
    )
    dr = jnp.asarray(rng.standard_normal((nb, G, 1, F)).astype(np.float32))
    di = jnp.asarray(rng.standard_normal((nb, G, 1, F)).astype(np.float32))
    w = jnp.asarray(np.abs(rng.standard_normal((nb, G, 1, F))).astype(np.float32))

    def params():
        r = np.random.default_rng(7)
        return (
            jnp.ones((nb, na, F), jnp.float32),
            jnp.zeros((nb, na, F), jnp.float32),
            (jnp.asarray(r.standard_normal((nb, G, V)).astype(np.float32)),),
            (jnp.asarray(r.standard_normal((nb, G, V)).astype(np.float32)),),
        )

    cfg = FitConfig(maxsteps=12, tol=0.0)
    pz = jnp.zeros((nb,), jnp.float32)
    ref = batched_fit_core(cfg, (chunk,), (dr,), (di,), (w,), *params(), pz, pz)
    href = np.asarray(ref.loss_history)
    for cap in (1, 2):
        res = batched_fit_checkpointed(
            cfg, (chunk,), (dr,), (di,), (w,), *params(), pz, pz,
            None, 12, False, False, steps_per_execution=cap,
        )
        assert int(res.nsteps) == 12
        assert np.array_equal(np.asarray(res.loss_history)[:12], href[:12])


def test_tail_save_skip(tmp_path):
    """tail_save=False (the warm-started scan's setting) suppresses ONLY
    the final partial-segment checkpoint: periodic saves still land, the
    returned trajectory is bit-identical, and with checkpoint_every >
    maxsteps no checkpoint is written at all (the scan's per-time marker
    is the durability there)."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_checkpointed
    from calamity_tpu.solver.checkpoint import latest_checkpoint
    from calamity_tpu.solver.fit import FitConfig

    rng = np.random.default_rng(3)
    nb, na, F, V, G = 2, 4, 16, 4, 6
    chunk = (
        jnp.asarray(rng.standard_normal((G, 1, F, V)).astype(np.float32)),
        jnp.asarray(rng.integers(0, na, (G, 1)).astype(np.int32)),
        jnp.asarray(rng.integers(0, na, (G, 1)).astype(np.int32)),
    )
    dr = jnp.asarray(rng.standard_normal((nb, G, 1, F)).astype(np.float32))
    di = jnp.asarray(rng.standard_normal((nb, G, 1, F)).astype(np.float32))
    w = jnp.asarray(np.abs(rng.standard_normal((nb, G, 1, F))).astype(np.float32))

    def params():
        r = np.random.default_rng(7)
        return (
            jnp.ones((nb, na, F), jnp.float32),
            jnp.zeros((nb, na, F), jnp.float32),
            (jnp.asarray(r.standard_normal((nb, G, V)).astype(np.float32)),),
            (jnp.asarray(r.standard_normal((nb, G, V)).astype(np.float32)),),
        )

    cfg = FitConfig(maxsteps=10, tol=0.0)
    pz = jnp.zeros((nb,), jnp.float32)

    def run(ckdir, ck_every=500, **kw):
        return batched_fit_checkpointed(
            cfg, (chunk,), (dr,), (di,), (w,), *params(), pz, pz,
            ckdir, ck_every, False, False, **kw,
        )

    ck_a = str(tmp_path / "with_tail")
    ref = run(ck_a)
    assert latest_checkpoint(ck_a) is not None  # 10 < 500: tail save only
    ck_b = str(tmp_path / "no_tail")
    res = run(ck_b, tail_save=False)
    assert latest_checkpoint(ck_b) is None
    assert np.array_equal(
        np.asarray(res.loss_history)[:10], np.asarray(ref.loss_history)[:10]
    )
    # periodic saves are NOT suppressed: ck_every=4 -> saves at 4 and 8,
    # tail (step 10) skipped
    ck_c = str(tmp_path / "periodic")
    run(ck_c, ck_every=4, tail_save=False)
    assert os.path.basename(latest_checkpoint(ck_c)) == "step_8"


def test_steps_per_execution_rejected_on_serial_path(projected_multitime):
    """The serial path raises loudly instead of silently ignoring the
    execution bound (the time_parallel paths — batched AND warm-started
    scan — support it; VERDICT r3 item 2)."""
    with pytest.raises(ValueError, match="steps_per_execution"):
        calibration.calibrate_and_model_dpss(
            min_dly=2.0 / 0.3, offset=2.0 / 0.3,
            uvdata=projected_multitime, gains=None, maxsteps=10, tol=0.0,
            steps_per_execution=5,
        )


def test_loss_block_rejected_on_serial_path(projected_multitime):
    """loss_block_ngrps is implemented for the time_parallel paths only;
    the serial path raises instead of silently dropping the
    activation-HBM bound (review r3)."""
    with pytest.raises(ValueError, match="loss_block_ngrps"):
        calibration.calibrate_and_model_dpss(
            min_dly=2.0 / 0.3, offset=2.0 / 0.3,
            uvdata=projected_multitime, gains=None, maxsteps=10, tol=0.0,
            loss_block_ngrps=4,
        )


@pytest.mark.slow
def test_batched_checkpoint_resume_mixed(tmp_path, projected_multitime):
    """Mixed-precision batched descent with checkpointing: phase dirs are
    written, a resume with completed bf16 checkpoints skips phase 1 and
    restores its diagnostics, and the result matches an uninterrupted
    mixed run bit-exactly."""
    ck_a = str(tmp_path / "ma")
    ck_b = str(tmp_path / "mb")
    model_a, resid_a, gains_a, hist_a = _run_batched(
        projected_multitime, ck_a, maxsteps=120, comps_precision="mixed"
    )
    base = os.path.join(ck_a, "batched")
    assert ckpt_mod.latest_checkpoint(os.path.join(base, "phase_bf16")) is not None
    assert ckpt_mod.latest_checkpoint(os.path.join(base, "phase_f32")) is not None
    # simulate a kill during phase 2: copy phase-1 state + marker only
    import shutil

    shutil.copytree(os.path.join(base, "phase_bf16"),
                    os.path.join(ck_b, "batched", "phase_bf16"))
    shutil.copy(os.path.join(base, "phase1_history.npz"),
                os.path.join(ck_b, "batched", "phase1_history.npz"))
    model_b, resid_b, gains_b, hist_b = _run_batched(
        projected_multitime, ck_b, maxsteps=120, comps_precision="mixed"
    )
    for t in (0, 1):
        la = np.asarray(hist_a[0][t]["loss"])
        lb = np.asarray(hist_b[0][t]["loss"])
        assert len(la) == len(lb) == 240  # both phases recorded
        assert np.array_equal(la, lb)
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)


def test_resume_accepts_host_entry_state(tmp_path, projected_multitime):
    """batched_fit_checkpointed on a resume must accept pure-HOST (numpy)
    entry parameters and reproduce the device-entry trajectory bit-exactly.

    This is the contract the full-scale HBM discipline relies on: on a
    resume the restore supersedes every entry buffer, so the driver keeps
    the placeholder coefficients on the host and the optimizer-state
    template is built without allocating (observed full-array OOM: the
    superseded device-resident init + opt.init ate the segment plan's
    entire headroom — a fresh run donates those same buffers into its
    first segment, which is why only resumes blew up)."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_checkpointed
    from calamity_tpu.solver.fit import FitConfig
    from calamity_tpu.solver.tensorize import FitSpec

    uvd = projected_multitime
    comps = models.yield_pbl_dpss_model_comps(
        uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    ants = sorted(set(uvd.ant_1_array) | set(uvd.ant_2_array))
    ants_map = {a: i for i, a in enumerate(ants)}
    spec = FitSpec(uvd, comps, ants_map, dtype=np.float32)
    pol = uvd.get_pols()[0]
    times = np.unique(uvd.time_array)[:2]
    data_r, data_i, wgts = [], [], []
    for t in times:
        dr, di, w = spec.pack_data(uvd, pol, t, as_numpy=True)
        data_r.append(dr)
        data_i.append(di)
        wgts.append(w)
    nchunks = len(spec.chunks)
    data_r = tuple(np.stack([d[c] for d in data_r]) for c in range(nchunks))
    data_i = tuple(np.stack([d[c] for d in data_i]) for c in range(nchunks))
    wgts = tuple(np.stack([w[c] for w in wgts]) for c in range(nchunks))
    g_r = np.ones((2, spec.nants, spec.nfreqs), dtype=np.float32)
    g_i = np.zeros((2, spec.nants, spec.nfreqs), dtype=np.float32)
    chunks = spec.device_chunks()
    fg_shapes = [
        (2, chunks[c][1].shape[0], chunks[c][0].shape[-1])
        for c in range(nchunks)
    ]
    cfg = FitConfig(
        optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
        maxsteps=120, tol=0.0,
    )
    prior = jnp.zeros((2,), dtype=jnp.float32)

    def run(ckdir, device_entries):
        fg_r = tuple(np.zeros(s, dtype=np.float32) for s in fg_shapes)
        fg_i = tuple(np.zeros(s, dtype=np.float32) for s in fg_shapes)
        gr, gi = g_r, g_i
        if device_entries:
            fg_r = tuple(jnp.asarray(x) for x in fg_r)
            fg_i = tuple(jnp.asarray(x) for x in fg_i)
            gr, gi = jnp.asarray(gr), jnp.asarray(gi)
        return batched_fit_checkpointed(
            cfg, chunks, data_r, data_i, wgts, gr, gi, fg_r, fg_i,
            prior, prior, ckdir, 50, True, False,
        )

    ck_dev = str(tmp_path / "dev")
    ck_host = str(tmp_path / "host")
    # interrupt both at step 60 (maxsteps=60 run), then resume to 120
    cfg60 = cfg._replace(maxsteps=60)
    for ck in (ck_dev, ck_host):
        batched_fit_checkpointed(
            cfg60, chunks, data_r, data_i, wgts,
            jnp.asarray(g_r), jnp.asarray(g_i),
            tuple(jnp.zeros(s, dtype=jnp.float32) for s in fg_shapes),
            tuple(jnp.zeros(s, dtype=jnp.float32) for s in fg_shapes),
            prior, prior, ck, 50, True, False,
        )
    res_dev = run(ck_dev, device_entries=True)
    res_host = run(ck_host, device_entries=False)  # numpy templates
    assert np.array_equal(np.asarray(res_dev.g_r), np.asarray(res_host.g_r))
    n = int(res_dev.nsteps)
    assert n == int(res_host.nsteps) == 120
    assert np.array_equal(
        np.asarray(res_dev.loss_history[:n]), np.asarray(res_host.loss_history[:n])
    )


def test_phase2_resume_skips_bf16_conversion(tmp_path, projected_multitime,
                                             monkeypatch):
    """A mixed-precision resume that lands in phase 2 must not build the
    bf16 basis copy: it is never read, and at full-array scale the unused
    device-resident copy costs HBM headroom the f32 segment plan needs."""
    ck = str(tmp_path / "ck")
    _run_batched(projected_multitime, ck, maxsteps=120, comps_precision="mixed")
    assert ckpt_mod.latest_checkpoint(
        os.path.join(ck, "batched", "phase_f32")
    ) is not None

    from calamity_tpu.solver import fit as fit_mod

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("bf16 basis conversion ran on a phase-2 resume")

    monkeypatch.setattr(fit_mod, "convert_chunks_dtype", _boom)
    model, resid, gains, hist = _run_batched(
        projected_multitime, ck, maxsteps=120, comps_precision="mixed"
    )
    assert len(np.asarray(hist[0][0]["loss"])) == 240  # both phases recorded
    assert np.all(np.isfinite(gains.gain_array))


def test_resume_skips_warm_start_lstsq(tmp_path, projected_multitime, monkeypatch):
    """A checkpointed resume of the batched path must not recompute the
    lstsq warm starts: the restored parameters supersede them, and at
    full-array scale they cost minutes of sky-upload + Cholesky/solve per
    supervised relaunch. The bit-exactness of the resumed trajectory under
    the skip is covered by test_batched_checkpoint_resume_bitexact_f32
    (same configuration); this test pins that the skip actually engages."""
    ck = str(tmp_path / "ck")
    _run_batched(projected_multitime, ck, maxsteps=60)

    from calamity_tpu.ops import lstsq as lstsq_mod

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("lstsq warm start recomputed on a resumed fit")

    monkeypatch.setattr(lstsq_mod, "gram_cholesky_chunk", _boom)
    model, resid, gains, hist = _run_batched(projected_multitime, ck, maxsteps=120)
    assert len(np.asarray(hist[0][0]["loss"])) == 120
    assert np.all(np.isfinite(gains.gain_array))

    # a FRESH fit (no checkpoint to restore) still needs the warm starts
    with pytest.raises(AssertionError, match="recomputed"):
        _run_batched(projected_multitime, str(tmp_path / "fresh"), maxsteps=10)


def test_batched_checkpoint_resume_sharded(tmp_path, projected_multitime):
    """Checkpoint/resume of the batched descent under the virtual 8-device
    mesh: restored state is device_put back onto the mesh and the resumed
    run completes with finite, converged outputs."""
    from calamity_tpu import parallel

    mesh = parallel.make_mesh(n_data=2, n_bl=4)
    ck = str(tmp_path / "sh")
    _run_batched(projected_multitime, ck, maxsteps=60, mesh=mesh)
    model, resid, gains, hist = _run_batched(
        # bounded executions compose with the mesh (jit route, plan=None)
        projected_multitime, ck, maxsteps=200, mesh=mesh,
        steps_per_execution=13,
    )
    assert len(hist[0][0]["loss"]) == 200
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert np.all(np.isfinite(gains.gain_array))


def test_scan_checkpoint_resume(tmp_path, projected_multitime):
    """The warm-started time scan checkpoints per completed time; deleting
    the later time's checkpoint and rerunning resumes from the carry and
    reproduces the uninterrupted per-time solutions bit-exactly."""
    import shutil

    def run(ckdir, maxsteps=150):
        return calibration.calibrate_and_model_dpss(
            min_dly=2.0 / 0.3,
            offset=2.0 / 0.3,
            uvdata=projected_multitime,
            gains=None,
            maxsteps=maxsteps,
            tol=0.0,
            correct_resid=True,
            correct_model=True,
            model_regularization="post_hoc",
            time_parallel=True,
            init_guesses_from_previous_time_step=True,
            checkpoint_dir=ckdir,
            resume=True,
        )

    ck = str(tmp_path / "scan")
    model_a, resid_a, gains_a, hist_a = run(ck)
    scan_dir = os.path.join(ck, "pol0_scan")
    assert os.path.isdir(os.path.join(scan_dir, "step_1"))
    assert os.path.isdir(os.path.join(scan_dir, "step_2"))
    # simulate a kill between time 1 and time 2
    shutil.rmtree(os.path.join(scan_dir, "step_2"))
    model_b, resid_b, gains_b, hist_b = run(ck)
    for t in (0, 1):
        assert np.array_equal(
            np.asarray(hist_a[0][t]["loss"]), np.asarray(hist_b[0][t]["loss"])
        )
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)

    # a resume may CHANGE the step budget (supervised relaunches tune it;
    # the serial and batched paths both support this) — stored rows carry
    # the saving run's maxsteps, fresh rows the new one, and the stacked
    # history must pad with the nan sentinel instead of crashing (review r3)
    shutil.rmtree(os.path.join(scan_dir, "step_2"))
    model_c, resid_c, gains_c, hist_c = run(ck, maxsteps=220)
    row0 = np.asarray(hist_c[0][0]["loss"], dtype=float)  # restored: 150 steps
    row1 = np.asarray(hist_c[0][1]["loss"], dtype=float)  # fresh: 220 steps
    assert np.array_equal(row0, np.asarray(hist_a[0][0]["loss"]))
    assert len(row1) == 220 and np.all(np.isfinite(row1))


def _run_scan(uvdata, maxsteps=120, **kw):
    kw.setdefault("tol", 0.0)
    return calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvdata,
        gains=None,
        maxsteps=maxsteps,
        model_regularization="post_hoc",
        time_parallel=True,
        init_guesses_from_previous_time_step=True,
        **kw,
    )


@pytest.mark.slow
def test_scan_segmentation_invariance(tmp_path, projected_multitime):
    """VERDICT r3 item 2: the warm-started scan's endurance mode. The
    per-time descents run through the segmented batched machinery, so
    (a) segmentation (steps_per_execution) must not change the trajectory
    — bit-exact vs the checkpoint-cadence-only segmented run — and
    (b) the segmented mode must agree with the fused lax.scan path to
    descent-noise tolerance (different loss contraction order)."""
    model_f, resid_f, gains_f, hist_f = _run_scan(projected_multitime)
    model_a, resid_a, gains_a, hist_a = _run_scan(
        projected_multitime, checkpoint_dir=str(tmp_path / "a"),
        checkpoint_every=40,
    )
    model_b, resid_b, gains_b, hist_b = _run_scan(
        projected_multitime, checkpoint_dir=str(tmp_path / "b"),
        checkpoint_every=40, steps_per_execution=7,
    )
    for t in hist_a[0]:
        assert np.array_equal(
            np.asarray(hist_a[0][t]["loss"]), np.asarray(hist_b[0][t]["loss"])
        )
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)
    # vs the fused scan: same math, different (batched) contraction order
    scale = np.sqrt(np.mean(np.abs(model_f.data_array) ** 2))
    assert np.allclose(model_a.data_array, model_f.data_array,
                       rtol=1e-3, atol=2e-3 * scale)
    assert np.allclose(gains_a.gain_array, gains_f.gain_array, atol=1e-3)


@pytest.mark.slow
def test_scan_loss_block(tmp_path, projected_multitime):
    """loss_block_ngrps on the warm-started scan (previously rejected):
    group-blocked loss evaluation must reproduce the unblocked segmented
    trajectory."""
    model_a, resid_a, gains_a, hist_a = _run_scan(
        projected_multitime, maxsteps=60, steps_per_execution=9,
    )
    model_b, resid_b, gains_b, hist_b = _run_scan(
        projected_multitime, maxsteps=60, steps_per_execution=9,
        loss_block_ngrps=4,
    )
    for t in hist_a[0]:
        a = np.asarray(hist_a[0][t]["loss"])
        b = np.asarray(hist_b[0][t]["loss"])
        assert np.allclose(a, b, rtol=1e-5, atol=1e-7)
    assert np.allclose(gains_a.gain_array, gains_b.gain_array, atol=1e-4)


def test_scan_mid_time_kill_and_resume(tmp_path, projected_multitime, monkeypatch):
    """A crash in the MIDDLE of a warm-started time's descent (after a
    segment checkpoint landed, before the time completed) resumes from the
    mid-time segment state and reproduces the uninterrupted run bit-exactly
    — the endurance contract the reference's recommended multi-time mode
    (calibration.py:1085-1087) never had."""
    from calamity_tpu.solver import checkpoint as ckpt

    ck_a = str(tmp_path / "full")
    model_a, resid_a, gains_a, hist_a = _run_scan(
        projected_multitime, checkpoint_dir=ck_a, checkpoint_every=40,
        steps_per_execution=7,
    )

    ck_b = str(tmp_path / "killed")
    real_save = ckpt.save_state

    def killing_save(path, tree_state, scalar_state):
        if "time_1" in path and path.endswith("step_80"):
            raise RuntimeError("injected mid-time crash")
        return real_save(path, tree_state, scalar_state)

    monkeypatch.setattr(ckpt, "save_state", killing_save)
    with pytest.raises(RuntimeError, match="injected"):
        _run_scan(
            projected_multitime, checkpoint_dir=ck_b, checkpoint_every=40,
            steps_per_execution=7,
        )
    monkeypatch.setattr(ckpt, "save_state", real_save)
    scan_dir = os.path.join(ck_b, "pol0_scan")
    assert os.path.isdir(os.path.join(scan_dir, "step_1"))  # time 0 done
    assert not os.path.isdir(os.path.join(scan_dir, "step_2"))
    assert ckpt.latest_checkpoint(
        os.path.join(scan_dir, "time_1")
    ) is not None  # mid-time segment state survived
    model_b, resid_b, gains_b, hist_b = _run_scan(
        projected_multitime, checkpoint_dir=ck_b, checkpoint_every=40,
        steps_per_execution=7,
    )
    for t in hist_a[0]:
        assert np.array_equal(
            np.asarray(hist_a[0][t]["loss"]), np.asarray(hist_b[0][t]["loss"])
        )
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)
    # completed times' mid-time segment dirs are cleaned up
    assert not os.path.isdir(os.path.join(scan_dir, "time_1"))


@pytest.mark.slow
def test_scan_mixed_precision(tmp_path, projected_multitime):
    """comps_precision="mixed" on the warm-started scan (previously
    rejected): each time runs the bf16 bulk + f32 polish schedule with the
    optimizer state carried across the switch; the fit reaches the f32
    floor and a mid-run kill resumes to the identical result."""
    model_a, resid_a, gains_a, hist_a = _run_scan(
        projected_multitime, maxsteps=150, comps_precision="mixed",
        correct_resid=True, correct_model=True,
        checkpoint_dir=str(tmp_path / "ma"), checkpoint_every=60,
    )
    rms = lambda x: np.sqrt(np.mean(np.abs(x) ** 2))
    assert rms(model_a.data_array) >= 1e2 * rms(resid_a.data_array)
    # two phases recorded per time
    for t in hist_a[0]:
        assert len(hist_a[0][t]["loss"]) == 300
    # resume after a kill between time 1 and time 2 reproduces the run
    import shutil

    scan_dir = os.path.join(str(tmp_path / "ma"), "pol0_scan")
    shutil.rmtree(os.path.join(scan_dir, "step_2"))
    model_b, resid_b, gains_b, hist_b = _run_scan(
        projected_multitime, maxsteps=150, comps_precision="mixed",
        correct_resid=True, correct_model=True,
        checkpoint_dir=str(tmp_path / "ma"), checkpoint_every=60,
    )
    for t in hist_a[0]:
        assert np.array_equal(
            np.asarray(hist_a[0][t]["loss"]), np.asarray(hist_b[0][t]["loss"])
        )
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)


def test_checkpointed_divergence_terminates(tmp_path, projected):
    """A diverging checkpointed fit must terminate instead of rewriting the
    same checkpoint forever (ADVICE r1, high severity)."""
    ckdir = str(tmp_path / "dv")
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected,
        gains=None,
        maxsteps=500,
        tol=0.0,
        learning_rate=1e12,
        model_regularization="post_hoc",
        checkpoint_dir=ckdir,
        checkpoint_every=50,
    )
    losses = np.asarray(hist[0][0]["loss"])
    assert len(losses) < 500  # stopped early, did not hang
    assert not np.isfinite(losses[-1])


@pytest.mark.slow
def test_patience_serial_stop_and_resume(tmp_path):
    """patience stops the serial descent after exactly `patience` steps
    without a new minimum — uninterrupted, checkpointed, AND resumed from
    an interruption (the resume reconstructs steps-since-best from the
    stored history, so the stop step must match bit-exactly)."""
    from calamity_tpu.solver.fit import fit_gains_and_foregrounds

    from conftest import zero_plateau_fit_args

    chunks, data_r, data_i, wgts, g_r, g_i, fg = zero_plateau_fit_args()
    common = dict(
        g_r=g_r, g_i=g_i, fg_r=fg, fg_i=fg, data_r=data_r, data_i=data_i,
        wgts=wgts, chunks=chunks, optimizer="Adamax", learning_rate=1e-2,
        tol=0.0, use_min=True, patience=40, comps_precision="float32",
    )
    # uninterrupted, no checkpointing: first recorded step is the only
    # "best", so the stop lands at step patience + 1
    *_, hist_a = fit_gains_and_foregrounds(maxsteps=200, **common)
    assert len(hist_a["loss"]) == 41
    assert all(l == 0.0 for l in hist_a["loss"])
    # checkpointed, uninterrupted
    from calamity_tpu.solver import fit as fit_mod

    fit_mod._fit_segment.clear_cache()
    ck_b = str(tmp_path / "b")
    *_, hist_b = fit_gains_and_foregrounds(
        maxsteps=200, checkpoint_dir=ck_b, checkpoint_every=15, **common
    )
    assert len(hist_b["loss"]) == 41
    # exactly two trace signatures: the warm-up (seg_len=1) and the main
    # segment — since_best must enter with the SAME int32-array aval on the
    # first and every later call (a weak-typed Python 0 would add a third
    # signature = an extra minutes-long XLA compile at full scale)
    assert fit_mod._fit_segment._cache_size() == 2
    # interrupted at 20 steps, resumed with the full budget: the resumed
    # run must reconstruct since_best=19 from the stored history and stop
    # at the same total step count
    ck_c = str(tmp_path / "c")
    *_, hist_c1 = fit_gains_and_foregrounds(
        maxsteps=20, checkpoint_dir=ck_c, checkpoint_every=15, **common
    )
    assert len(hist_c1["loss"]) == 20
    *_, hist_c2 = fit_gains_and_foregrounds(
        maxsteps=200, checkpoint_dir=ck_c, checkpoint_every=15, **common
    )
    assert len(hist_c2["loss"]) == 41


def test_patience_batched_checkpoint_resume(tmp_path):
    """The batched path carries per-slice steps-since-best through
    checkpoint save/load: an interrupted + resumed run freezes the
    plateaued slice at the same global step as an uninterrupted one."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import (
        batched_fit_checkpointed,
        batched_fit_core,
    )
    from calamity_tpu.solver.fit import FitConfig

    from conftest import zero_plateau_fit_args

    chunks, data_r, data_i, wgts, g_r, g_i, fg = zero_plateau_fit_args()
    # batch the zero-plateau fit twice (both slices plateau)
    def b(x):
        return jnp.stack([x, x])

    data_r = (b(data_r[0]),)
    data_i = (b(data_i[0]),)
    wgts = (b(wgts[0]),)
    g_r, g_i = b(g_r), b(g_i)
    # DISTINCT buffers: params are donated, and real drivers never alias
    # the real and imaginary coefficient arrays
    fg_br = (b(fg[0]),)
    fg_bi = (jnp.zeros_like(fg_br[0]),)
    zero = jnp.zeros((2,))
    cfg = FitConfig(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                    maxsteps=200, tol=0.0, use_min=True, patience=40)
    res_a = batched_fit_core(cfg, chunks, data_r, data_i, wgts, g_r, g_i,
                             fg_br, fg_bi, zero, zero)
    assert np.asarray(res_a.nsteps_slice).tolist() == [41, 41]
    # interrupted at 20 (maxsteps cap), then resumed to the full budget
    ck = str(tmp_path / "ck")
    cfg20 = cfg._replace(maxsteps=20)
    batched_fit_checkpointed(cfg20, chunks, data_r, data_i, wgts, g_r, g_i,
                             fg_br, fg_bi, zero, zero, ck, 15, True, False)
    res_b = batched_fit_checkpointed(cfg, chunks, data_r, data_i, wgts, g_r,
                                     g_i, fg_br, fg_bi, zero, zero, ck, 15,
                                     True, False)
    assert np.asarray(res_b.nsteps_slice).tolist() == [41, 41]
    assert int(res_b.nsteps) == 41


def test_patience_setting_not_baked_into_batched_checkpoint(tmp_path):
    """The checkpoint tree format must not depend on cfg.patience: a run
    can be resumed with a DIFFERENT patience setting than the one that
    saved it (the natural move when a long run is seen oscillating), and
    the reconstructed steps-since-best makes the late-enabled stop land
    exactly where an always-on run would."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_checkpointed
    from calamity_tpu.solver.fit import FitConfig

    from conftest import zero_plateau_fit_args

    base = dict(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                tol=0.0, use_min=True)

    def make_args():
        # fresh buffers per call: the fit donates its parameter arrays
        chunks, data_r, data_i, wgts, g_r, g_i, fg = zero_plateau_fit_args()

        def b(x):
            return jnp.stack([x, x])

        fg_br = (b(fg[0]),)
        return (chunks, (b(data_r[0]),), (b(data_i[0]),), (b(wgts[0]),),
                b(g_r), b(g_i), fg_br, (jnp.zeros_like(fg_br[0]),),
                jnp.zeros((2,)), jnp.zeros((2,)))
    # saved WITHOUT patience (20 zero-loss steps in the history), resumed
    # WITH patience=40: since-best reconstructs to 19, so the freeze lands
    # at global step 41 — identical to an always-patience run
    ck = str(tmp_path / "a")
    batched_fit_checkpointed(
        FitConfig(maxsteps=20, patience=0, **base), *make_args(), ck, 15,
        True, False
    )
    res = batched_fit_checkpointed(
        FitConfig(maxsteps=200, patience=40, **base), *make_args(), ck, 15,
        True, False
    )
    assert np.asarray(res.nsteps_slice).tolist() == [41, 41]
    # saved WITH patience, resumed WITHOUT: the plateau never freezes and
    # the fit runs out its budget
    ck2 = str(tmp_path / "b")
    batched_fit_checkpointed(
        FitConfig(maxsteps=20, patience=40, **base), *make_args(), ck2, 15,
        True, False
    )
    res2 = batched_fit_checkpointed(
        FitConfig(maxsteps=50, patience=0, **base), *make_args(), ck2, 15,
        True, False
    )
    assert np.asarray(res2.nsteps_slice).tolist() == [50, 50]


def test_patience_divergence_not_reported_as_converged(tmp_path, capsys):
    """A non-finite loss landing exactly on the patience boundary must
    surface as the divergence watchdog, not a patience convergence: the
    steps-since-best counter also increments on NaN steps (NaN < best is
    False), so without the finite gate the segmented loop takes the
    "converged" break with NaN params."""
    import jax.numpy as jnp

    from calamity_tpu.solver.fit import fit_gains_and_foregrounds

    from conftest import zero_plateau_fit_args

    chunks, data_r, data_i, wgts, g_r, g_i, fg = zero_plateau_fit_args()
    data_r = (jnp.full_like(data_r[0], jnp.nan),)
    *_, hist = fit_gains_and_foregrounds(
        g_r=g_r, g_i=g_i, fg_r=fg, fg_i=fg, data_r=data_r, data_i=data_i,
        wgts=wgts, chunks=chunks, optimizer="Adamax", learning_rate=1e-2,
        tol=0.0, use_min=False, patience=1, comps_precision="float32",
        maxsteps=50, checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=10,
        verbose=True,
    )
    assert "Divergence detected" in capsys.readouterr().out
