"""Tests for the batched/sharded time-parallel path and mesh utilities."""

import jax
import numpy as np
import pytest

from calamity_tpu import cal_utils, calibration, models, parallel
from test_calibration import RMS, project_onto_dpss


@pytest.fixture()
def projected_multitime(golomb_visdata):
    uvd = golomb_visdata.copy()
    comps = models.yield_pbl_dpss_model_comps(uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3)
    project_onto_dpss(uvd, comps)
    uvd2 = uvd.copy()
    uvd2.time_array = uvd2.time_array + 2.0
    uvd3 = uvd.copy()
    uvd3.time_array = uvd3.time_array + 4.0
    return (uvd + uvd2) + uvd3


def test_make_mesh():
    mesh = parallel.make_mesh()
    assert mesh.axis_names == ("data", "bl")
    assert mesh.shape["data"] * mesh.shape["bl"] == len(jax.devices())
    mesh2 = parallel.make_mesh(n_data=2, n_bl=4)
    assert mesh2.shape["data"] == 2 and mesh2.shape["bl"] == 4
    with pytest.raises(ValueError):
        parallel.make_mesh(n_data=3, n_bl=5)


def test_time_parallel_matches_serial(projected_multitime):
    """Batched descent converges all 3 times at once; products match the
    serial path's quality."""
    gains0 = cal_utils.blank_uvcal_from_uvdata(projected_multitime)
    common = dict(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        maxsteps=2000,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
    )
    model_s, resid_s, gains_s, hist_s = calibration.calibrate_and_model_dpss(
        gains=gains0, **common
    )
    model_p, resid_p, gains_p, hist_p = calibration.calibrate_and_model_dpss(
        gains=gains0, time_parallel=True, **common
    )
    assert RMS(model_p.data_array) >= 1e2 * RMS(resid_p.data_array)
    assert len(hist_p[0]) == 3
    # batched and serial converge to comparable residual levels
    assert RMS(resid_p.data_array) <= 10 * max(RMS(resid_s.data_array), 1e-12)


def test_time_parallel_sharded(projected_multitime):
    """Full batched fit sharded over an 8-device ('data','bl') mesh, with
    batch (3 -> 4) and group (15 -> 16) padding exercised."""
    mesh = parallel.make_mesh(n_data=2, n_bl=4)
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=2000,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        mesh=mesh,
    )
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert RMS(projected_multitime.data_array) >= 1e2 * RMS(resid.data_array)
    assert len(hist[0]) == 3
    assert np.all(np.isfinite(gains.gain_array))


def test_time_parallel_sharded_mixed_precision(projected_multitime):
    """comps_precision='mixed' through the meshed batched path: the bf16
    chunk copies inherit the ('data','bl') shardings and the optimizer
    state carries across the precision switch under the mesh."""
    mesh = parallel.make_mesh(n_data=2, n_bl=4)
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=2000,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        mesh=mesh,
        comps_precision="mixed",
    )
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert len(hist[0]) == 3
    assert np.all(np.isfinite(gains.gain_array))


def test_multipol_mesh_mixed_precision():
    """4-pol dataset through the sharded batched path with the mixed
    precision schedule: 8 (time=2 x pol=4) slices in one descent, every
    pol converging."""
    from calamity_tpu import simulate

    uvd = simulate.make_golomb_array(nants=6, nfreqs=64, npols=4, seed=2)
    uvd2 = uvd.copy()
    uvd2.time_array = uvd2.time_array + 2.0
    both = uvd + uvd2
    mesh = parallel.make_mesh(n_data=2, n_bl=4)
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        uvdata=both,
        gains=None,
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        maxsteps=800,
        tol=1e-12,
        learning_rate=1e-2,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        mesh=mesh,
        comps_precision="mixed",
    )
    assert len(hist) == 4 and all(len(hist[p]) == 2 for p in range(4))
    for p in range(4):
        assert RMS(model.data_array[..., p]) >= 50 * RMS(resid.data_array[..., p])


def test_comps_precision_float64_data():
    """bf16 basis storage composes with float64 fits (comps cast bf16, all
    accumulation in the data dtype)."""
    import jax

    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        from calamity_tpu import simulate

        uvd = simulate.make_golomb_array(nants=6, nfreqs=64, seed=4)
        model, resid, gains, hist = calibration.calibrate_and_model_dpss(
            uvdata=uvd,
            gains=None,
            min_dly=2.0 / 0.3,
            offset=2.0 / 0.3,
            maxsteps=600,
            tol=1e-12,
            dtype=np.float64,
            correct_resid=True,
            correct_model=True,
            model_regularization="post_hoc",
            comps_precision="bfloat16",
        )
        assert RMS(model.data_array) >= 50 * RMS(resid.data_array)
        assert np.isfinite(gains.gain_array).all()
    finally:
        # restore the PRIOR value — conftest enables x64 session-wide;
        # forcing False here would silently downcast every later f64 test
        jax.config.update("jax_enable_x64", prev_x64)


def test_time_parallel_sum_regularized(projected_multitime):
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=2000,
        tol=1e-10,
        correct_resid=False,
        correct_model=False,
        model_regularization="sum",
        time_parallel=True,
    )
    resid = cal_utils.apply_gains(resid, gains)
    model = cal_utils.apply_gains(model, gains)
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)


def test_time_parallel_skip_flagged(projected_multitime):
    uvd = projected_multitime.copy()
    t0 = np.unique(uvd.time_array)[0]
    uvd.flag_array[np.isclose(uvd.time_array, t0, rtol=0, atol=1e-7)] = True
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvd,
        gains=None,
        maxsteps=1000,
        tol=1e-10,
        time_parallel=True,
        model_regularization="post_hoc",
    )
    assert 0 not in hist[0]
    assert 1 in hist[0] and 2 in hist[0]
    for ap in model.get_antpairs():
        assert np.all(model.get_flags(ap + ("xx",))[0])


def test_time_parallel_warm_start_scan(projected_multitime):
    """time_parallel + init_guesses_from_previous_time_step: the compiled
    scan carries parameters across times; later times converge in fewer
    recorded steps than the cold first time."""
    model, resid, gains, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=2000,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        init_guesses_from_previous_time_step=True,
    )
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert len(hist[0]) == 3
    n0 = len(hist[0][0]["loss"])
    # warm-started later times start near the solution (same sky per time
    # in this fixture), so they stop far earlier
    assert len(hist[0][1]["loss"]) < n0
    assert len(hist[0][2]["loss"]) < n0


def test_time_scan_sharded_matches_unsharded(projected_multitime):
    """The warm-started time scan sharded over 'bl' on the virtual 8-device
    mesh matches the unsharded scan to tolerance (VERDICT r2 item 2: this
    combination previously raised)."""
    kwargs = dict(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=600,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        init_guesses_from_previous_time_step=True,
    )
    # single-device mesh = unsharded baseline through the identical code
    # path (mesh=None would auto-mesh over the 8 virtual devices)
    mesh1 = parallel.make_mesh(n_data=1, n_bl=1, devices=jax.devices()[:1])
    model_u, resid_u, gains_u, hist_u = calibration.calibrate_and_model_dpss(
        mesh=mesh1, **kwargs
    )
    mesh = parallel.make_mesh(n_data=1, n_bl=8)
    model_s, resid_s, gains_s, hist_s = calibration.calibrate_and_model_dpss(
        mesh=mesh, **kwargs
    )
    assert RMS(model_s.data_array) >= 1e2 * RMS(resid_s.data_array)
    assert len(hist_s[0]) == len(hist_u[0]) == 3
    # f32 descents with shard-order-dependent psum rounding drift slightly
    # over hundreds of steps; the solutions must agree to well under the
    # residual level, not bitwise
    scale = RMS(model_u.data_array)
    assert np.allclose(model_s.data_array, model_u.data_array,
                       rtol=1e-3, atol=2e-3 * scale)
    assert np.allclose(gains_s.gain_array, gains_u.gain_array, atol=1e-3)
    assert RMS(resid_s.data_array) <= 2 * max(RMS(resid_u.data_array), 1e-12)


@pytest.mark.slow
def test_time_scan_segmented_on_mesh(tmp_path, projected_multitime):
    """Scan-path segmentation invariance UNDER THE MESH (VERDICT r3 item
    2's done criterion): the warm-started scan sharded over 'bl' with
    bounded device executions must reproduce the mesh run without the
    bound bit-exactly — same segment program, traced seg_len."""
    mesh = parallel.make_mesh(n_data=1, n_bl=8)
    kwargs = dict(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=80,
        tol=0.0,
        model_regularization="post_hoc",
        time_parallel=True,
        init_guesses_from_previous_time_step=True,
        mesh=mesh,
    )
    model_a, resid_a, gains_a, hist_a = calibration.calibrate_and_model_dpss(
        checkpoint_dir=str(tmp_path / "a"), checkpoint_every=40, **kwargs
    )
    model_b, resid_b, gains_b, hist_b = calibration.calibrate_and_model_dpss(
        checkpoint_dir=str(tmp_path / "b"), checkpoint_every=40,
        steps_per_execution=7, **kwargs
    )
    for t in hist_a[0]:
        assert np.array_equal(
            np.asarray(hist_a[0][t]["loss"]), np.asarray(hist_b[0][t]["loss"])
        )
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)


@pytest.mark.slow
def test_blocked_loss_matches_unblocked():
    """loss_block evaluates chunks as a scan over group blocks; values AND
    gradients must match the single-evaluation path for dense, plain-
    shared and shared-batched layouts (it exists to bound activation HBM,
    not to change math)."""
    import jax
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import (
        batched_chunk_losses,
        batched_chunk_losses_sum_regularized,
    )

    rng = np.random.default_rng(7)
    nbatch, nants, nfreqs = 3, 6, 16

    def mk_chunk(ngrps, nu, nvecs):
        comps = jnp.asarray(rng.standard_normal((nu, 1, nfreqs, nvecs)))
        a0 = jnp.asarray(rng.integers(0, nants, (ngrps, 1)), dtype=jnp.int32)
        a1 = jnp.asarray(rng.integers(0, nants, (ngrps, 1)), dtype=jnp.int32)
        fr = jnp.asarray(rng.standard_normal((nbatch, ngrps, nvecs)))
        fi = jnp.asarray(rng.standard_normal((nbatch, ngrps, nvecs)))
        dr = jnp.asarray(rng.standard_normal((nbatch, ngrps, 1, nfreqs)))
        di = jnp.asarray(rng.standard_normal((nbatch, ngrps, 1, nfreqs)))
        w = jnp.asarray(np.abs(rng.standard_normal((nbatch, ngrps, 1, nfreqs))))
        return (comps, a0, a1), fr, fi, dr, di, w

    dense = mk_chunk(12, 12, 4)       # dense per-group operators
    shared = mk_chunk(12, 1, 4)       # one operator for all groups
    sb = mk_chunk(12, 3, 4)           # shared-batched: 3 classes x gmax 4
    chunks = tuple(c[0] for c in (dense, shared, sb))
    fr = tuple(c[1] for c in (dense, shared, sb))
    fi = tuple(c[2] for c in (dense, shared, sb))
    dr = tuple(c[3] for c in (dense, shared, sb))
    di = tuple(c[4] for c in (dense, shared, sb))
    w = tuple(c[5] for c in (dense, shared, sb))
    g_r = jnp.asarray(1 + 0.1 * rng.standard_normal((nbatch, nants, nfreqs)))
    g_i = jnp.asarray(0.1 * rng.standard_normal((nbatch, nants, nfreqs)))

    def tot(block):
        def f(gr, gi, frs, fis):
            return jnp.sum(
                batched_chunk_losses(gr, gi, frs, fis, chunks, dr, di, w,
                                     loss_block=block)
            )
        return f

    v0, grad0 = jax.value_and_grad(tot(None), argnums=(0, 2))(g_r, g_i, fr, fi)
    for block in (4, 8):
        v1, grad1 = jax.value_and_grad(tot(block), argnums=(0, 2))(
            g_r, g_i, fr, fi
        )
        assert np.isclose(float(v0), float(v1), rtol=1e-10)
        for a, b in zip(jax.tree_util.tree_leaves(grad0),
                        jax.tree_util.tree_leaves(grad1)):
            assert np.allclose(np.asarray(a), np.asarray(b), rtol=1e-8)

    prior_r = jnp.asarray(rng.standard_normal((nbatch,)))
    prior_i = jnp.asarray(rng.standard_normal((nbatch,)))
    s0 = batched_chunk_losses_sum_regularized(
        g_r, g_i, fr, fi, chunks, dr, di, w, prior_r, prior_i
    )
    s1 = batched_chunk_losses_sum_regularized(
        g_r, g_i, fr, fi, chunks, dr, di, w, prior_r, prior_i, loss_block=4
    )
    assert np.allclose(np.asarray(s0), np.asarray(s1), rtol=1e-10)


def test_per_slice_convergence_freeze():
    """A fast-converging slice's parameters are bitwise-stable after its
    convergence step while a slow slice keeps descending (VERDICT r1 #6)."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_core
    from calamity_tpu.solver.fit import FitConfig

    rng = np.random.default_rng(0)
    nants, nfreqs, ngrps, nvecs = 4, 32, 6, 4
    comps = jnp.asarray(rng.standard_normal((ngrps, 1, nfreqs, nvecs)))
    a0 = jnp.asarray([[0], [0], [0], [1], [1], [2]], dtype=np.int32)
    a1 = jnp.asarray([[1], [2], [3], [2], [3], [3]], dtype=np.int32)
    chunks = ((comps, a0, a1),)
    true_fg = rng.standard_normal((2, ngrps, nvecs))
    vis = np.einsum("bgv,gxfv->bgxf", true_fg, np.asarray(comps))
    # BOTH slices target vis[0]; slice 0's coefficients start AT the exact
    # solution (converges immediately), slice 1's start far away (keeps
    # stepping)
    data_r = (jnp.asarray(np.stack([vis[0], vis[0]])),)
    data_i = (jnp.asarray(np.zeros_like(np.stack([vis[0], vis[0]]))),)
    wgts = (jnp.full((2,) + vis[0].shape, 1.0 / vis[0].size),)
    fg0 = np.stack([true_fg[0], true_fg[0] + 5.0])
    g_r = jnp.ones((2, nants, nfreqs))
    g_i = jnp.zeros((2, nants, nfreqs))
    cfg = FitConfig(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                    maxsteps=300, tol=1e-9, freeze_model=True)
    res = batched_fit_core(
        cfg, chunks, data_r, data_i, wgts, g_r, g_i,
        (jnp.asarray(fg0),), (jnp.asarray(fg0) * 0,),
    )
    ns = np.asarray(res.nsteps_slice)
    assert ns[0] < ns[1], "fast slice must freeze before slow slice"
    assert int(res.nsteps) == ns.max()
    hist = np.asarray(res.loss_history)
    # frozen slice's history is NaN past its convergence step
    assert np.isnan(hist[ns[0]:, 0]).all()
    assert np.isfinite(hist[: ns[1], 1]).all()


def test_per_slice_freeze_params_stable():
    """After freezing, gains for the converged slice stay bitwise identical
    while the slow slice's gains keep changing."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_core
    from calamity_tpu.solver.fit import FitConfig

    rng = np.random.default_rng(1)
    nants, nfreqs, ngrps, nvecs = 4, 16, 6, 3
    comps = jnp.asarray(rng.standard_normal((ngrps, 1, nfreqs, nvecs)))
    a0 = jnp.asarray([[0], [0], [0], [1], [1], [2]], dtype=np.int32)
    a1 = jnp.asarray([[1], [2], [3], [2], [3], [3]], dtype=np.int32)
    chunks = ((comps, a0, a1),)
    true_fg = rng.standard_normal((ngrps, nvecs))
    vis = np.einsum("gv,gxfv->gxf", true_fg, np.asarray(comps))
    data_r = (jnp.asarray(np.stack([vis, vis])),)
    data_i = (jnp.zeros_like(data_r[0]),)
    wgts = (jnp.full_like(data_r[0], 1.0 / vis.size),)
    fg0 = np.stack([true_fg, true_fg + 3.0])
    g_r = jnp.ones((2, nants, nfreqs))
    g_i = jnp.zeros((2, nants, nfreqs))
    fgr = (jnp.asarray(fg0),)
    fgi = (jnp.zeros_like(fgr[0]),)

    def run(maxsteps):
        cfg = FitConfig(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                        maxsteps=maxsteps, tol=1e-9, freeze_model=False)
        return batched_fit_core(cfg, chunks, data_r, data_i, wgts, g_r, g_i, fgr, fgi)

    long = run(400)
    ns = np.asarray(long.nsteps_slice)
    assert ns[0] < ns[1]
    short = run(int(ns[0]))  # stop exactly at the fast slice's freeze step
    # fast slice frozen at its convergence step: identical in both runs
    np.testing.assert_array_equal(
        np.asarray(long.g_r)[0], np.asarray(short.g_r)[0]
    )
    np.testing.assert_array_equal(
        np.asarray(long.fg_r[0])[0], np.asarray(short.fg_r[0])[0]
    )
    # slow slice kept moving
    assert not np.array_equal(np.asarray(long.g_r)[1], np.asarray(short.g_r)[1])


def _grid_core_multitime(ntimes=2, nside=5, nfreqs=64):
    """Grid-core array whose packing routes through shared-BATCHED chunks
    (many operator classes), multi-time, projected onto the DPSS basis."""
    import itertools

    from calamity_tpu import simulate
    from calamity_tpu.io.visdata import VisData

    spacing = 14.6
    xs, ys = np.meshgrid(np.arange(nside), np.arange(nside))
    antpos = np.zeros((nside * nside, 3))
    antpos[:, 0] = xs.ravel() * spacing
    antpos[:, 1] = ys.ravel() * spacing
    pairs, vecs = [], []
    for i, j in itertools.combinations(range(nside * nside), 2):
        v = antpos[j] - antpos[i]
        if np.linalg.norm(v) <= 2.1 * spacing:
            pairs.append((i, j))
            vecs.append(v)
    vecs = np.asarray(vecs)
    nbls = len(pairs)
    freqs = 100e6 + 100e3 * np.arange(nfreqs)
    uniq, inverse = np.unique(np.round(vecs, 6), axis=0, return_inverse=True)
    vis_uniq = simulate.point_source_visibilities(uniq, freqs, nsrc=20, seed=2)
    data1 = vis_uniq[inverse]
    data = np.concatenate([data1 * (1.0 + 0.1 * t) for t in range(ntimes)])
    times1 = np.full(nbls, 2459122.25)
    uvd = VisData(
        telescope_name="GRID", instrument="GRID",
        latitude=simulate.HERA_LAT, longitude=simulate.HERA_LON,
        altitude=simulate.HERA_ALT, channel_width=100e3,
        ant_1_array=np.tile([p[0] for p in pairs], ntimes).astype(np.int64),
        ant_2_array=np.tile([p[1] for p in pairs], ntimes).astype(np.int64),
        antenna_numbers=np.arange(nside * nside, dtype=np.int64),
        antenna_names=[f"A{i}" for i in range(nside * nside)],
        antenna_positions=simulate._enu_to_ecef_rel(
            antpos, simulate.HERA_LAT, simulate.HERA_LON
        ),
        freq_array=freqs[None, :],
        integration_time=np.full(nbls * ntimes, 10.7),
        lst_array=np.zeros(nbls * ntimes),
        polarization_array=np.asarray([-5], dtype=np.int64),
        time_array=np.concatenate([times1 + 2.0 * t for t in range(ntimes)]),
        uvw_array=np.tile(vecs, (ntimes, 1)),
        data_array=data[:, None, :, None].astype(np.complex128),
        flag_array=np.zeros((nbls * ntimes, 1, nfreqs, 1), dtype=bool),
        nsample_array=np.ones((nbls * ntimes, 1, nfreqs, 1), dtype=np.float32),
    )
    comps = models.yield_pbl_dpss_model_comps(uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3)
    project_onto_dpss(uvd, comps)
    return uvd, comps


@pytest.mark.slow
def test_shared_batched_sharded_over_mesh():
    """The flagship full-HERA packing (shared-BATCHED chunks, U operator
    classes) sharded over the ('data','bl') mesh matches the dense serial
    fit (VERDICT r1 #1)."""
    from calamity_tpu.solver.tensorize import FitSpec

    uvd, comps = _grid_core_multitime(ntimes=2)
    gains0 = cal_utils.blank_uvcal_from_uvdata(uvd)
    # confirm this packing actually routes through shared-batched chunks
    ants_map = {int(a): i for i, a in enumerate(gains0.ant_array)}
    spec = FitSpec(uvd, comps, ants_map, dtype=np.float64, shared_basis=True)
    assert any(
        1 < c.comps.shape[0] < c.a0.shape[0] for c in spec.chunks
    ), "fixture must produce shared-batched chunks"

    common = dict(
        min_dly=2.0 / 0.3, offset=2.0 / 0.3, uvdata=uvd, gains=gains0,
        fg_model_comps_dict=comps, maxsteps=1500, tol=1e-11,
        correct_resid=True, correct_model=True, model_regularization="post_hoc",
    )
    mesh = parallel.make_mesh(n_data=2, n_bl=4)
    m_mesh, r_mesh, g_mesh, hist = calibration.calibrate_and_model_dpss(
        shared_basis=True, time_parallel=True, mesh=mesh, **common
    )
    m_ser, r_ser, g_ser, _ = calibration.calibrate_and_model_dpss(
        shared_basis=False, **common
    )
    assert RMS(m_mesh.data_array) >= 1e2 * RMS(r_mesh.data_array)
    assert len(hist[0]) == 2
    assert np.all(np.isfinite(g_mesh.gain_array))
    assert np.allclose(
        m_mesh.data_array, m_ser.data_array,
        atol=1e-4 * RMS(m_ser.data_array), rtol=0,
    )


@pytest.mark.slow
def test_batched_chunk_losses_match_per_slice():
    """The explicitly-batched loss equals per-slice chunked_loss for the
    dense, shared and shared-batched packings (incl. bf16 comps)."""
    import jax.numpy as jnp

    from calamity_tpu.ops.loss import chunked_loss
    from calamity_tpu.parallel.batched import batched_chunk_losses

    rng = np.random.default_rng(0)
    nb, na, F, V = 3, 6, 32, 8

    def mk_chunk(kind):
        if kind == "dense":
            ngrps, nu = 5, 5
            comps = rng.standard_normal((ngrps, 1, F, V)).astype(np.float32)
        elif kind == "shared":
            ngrps, nu = 5, 1
            comps = rng.standard_normal((1, 1, F, V)).astype(np.float32)
        else:  # shared-batched
            nu, gmax = 2, 3
            ngrps = nu * gmax
            comps = rng.standard_normal((nu, 1, F, V)).astype(np.float32)
        a0 = rng.integers(0, na, (ngrps, 1)).astype(np.int32)
        a1 = rng.integers(0, na, (ngrps, 1)).astype(np.int32)
        d_r = rng.standard_normal((nb, ngrps, 1, F)).astype(np.float32)
        d_i = rng.standard_normal((nb, ngrps, 1, F)).astype(np.float32)
        w = np.abs(rng.standard_normal((nb, ngrps, 1, F))).astype(np.float32)
        fr = rng.standard_normal((nb, ngrps, V)).astype(np.float32)
        fi = rng.standard_normal((nb, ngrps, V)).astype(np.float32)
        return (jnp.asarray(comps), jnp.asarray(a0), jnp.asarray(a1)), (
            jnp.asarray(d_r), jnp.asarray(d_i), jnp.asarray(w),
            jnp.asarray(fr), jnp.asarray(fi),
        )

    g_r = jnp.asarray(1 + 0.1 * rng.standard_normal((nb, na, F)), jnp.float32)
    g_i = jnp.asarray(0.1 * rng.standard_normal((nb, na, F)), jnp.float32)
    for kind in ("dense", "shared", "shared_batched"):
        for dtype in (jnp.float32, jnp.bfloat16):
            chunk, (d_r, d_i, w, fr, fi) = mk_chunk(kind)
            chunk = (chunk[0].astype(dtype), chunk[1], chunk[2])
            batched = batched_chunk_losses(
                g_r, g_i, (fr,), (fi,), (chunk,), (d_r,), (d_i,), (w,)
            )
            per_slice = [
                float(chunked_loss(
                    g_r[b], g_i[b], (fr[b],), (fi[b],), (chunk,),
                    (d_r[b],), (d_i[b],), (w[b],),
                ))
                for b in range(nb)
            ]
            tol = 2e-2 if dtype == jnp.bfloat16 else 2e-5
            np.testing.assert_allclose(
                np.asarray(batched), per_slice, rtol=tol,
                err_msg=f"{kind} {dtype}",
            )


def test_compress_freq_invariant_wgts():
    """Frequency-invariant weight cubes collapse to a broadcastable
    trailing-1 axis; frequency-dependent ones pass through unchanged."""
    from calamity_tpu.calibration import _compress_freq_invariant_wgts

    rng = np.random.default_rng(3)
    flat = np.repeat(
        np.abs(rng.standard_normal((2, 4, 3, 1))).astype(np.float32), 5, axis=-1
    )
    out = _compress_freq_invariant_wgts(flat)
    assert out.shape == (2, 4, 3, 1)
    assert np.array_equal(out[..., 0], flat[..., 0])
    # flagged channel -> frequency-dependent -> untouched
    varied = flat.copy()
    varied[0, 1, 2, 3] = 0.0
    out2 = _compress_freq_invariant_wgts(varied)
    assert out2 is varied
    # already compressed passes through
    assert _compress_freq_invariant_wgts(out) is out


@pytest.mark.slow
def test_auto_layout_plan_matches_jit_path(projected_multitime, monkeypatch):
    """The AOT auto-layout segment route (default on single device;
    mesh=False opts out of the virtual-device auto mesh) produces the same
    trajectory as the plain jit batched_fit_core route
    (CALAMITY_SEGMENT_LAYOUTS=jit): same per-slice step counts and
    recorded losses to float tolerance, same products."""
    from calamity_tpu.parallel.batched import _SEGMENT_PLAN_CACHE

    common = dict(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=150,
        tol=0.0,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
        time_parallel=True,
        mesh=False,
    )
    monkeypatch.setenv("CALAMITY_SEGMENT_LAYOUTS", "jit")
    model_j, resid_j, gains_j, hist_j = calibration.calibrate_and_model_dpss(**common)
    monkeypatch.delenv("CALAMITY_SEGMENT_LAYOUTS")
    _SEGMENT_PLAN_CACHE.clear()  # count THIS fit's plans (the cache is LRU-bounded)
    model_a, resid_a, gains_a, hist_a = calibration.calibrate_and_model_dpss(**common)
    # the auto route actually built plans (one per mixed-precision phase)
    assert len(_SEGMENT_PLAN_CACHE) == 2
    for t in range(3):
        la = np.asarray(hist_a[0][t]["loss"])
        lj = np.asarray(hist_j[0][t]["loss"])
        # default comps_precision="mixed": both phases recorded, both routes
        assert len(la) == len(lj) == 300
        # the two routes compile different programs (dynamic-bound segment
        # loop vs batched_fit_core's static loop): identical math, but f32
        # fusion-order noise is visible once the loss reaches its ~1e-11
        # convergence floor — hence the absolute-floor term
        np.testing.assert_allclose(la, lj, rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(
        gains_a.gain_array, gains_j.gain_array, atol=1e-6, rtol=0
    )


def test_segment_plan_cache_reuse(projected_multitime):
    """Identical single-device fit signatures reuse one compiled layout
    plan, and a plan is ONE executable: segment length and warm-up are
    traced scalars, so the warm-up first segment and any partial final
    segment do not trigger per-variant recompiles (each full-scale
    compile is minutes of single-core XLA wall-clock)."""
    from calamity_tpu.parallel.batched import _SEGMENT_PLAN_CACHE

    common = dict(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=projected_multitime,
        gains=None,
        maxsteps=40,
        tol=0.0,
        time_parallel=True,
        mesh=False,
    )
    from calamity_tpu.parallel.batched import _SEGMENT_PLAN_CACHE_CAPACITY

    _SEGMENT_PLAN_CACHE.clear()  # the cache is process-global and LRU-bounded
    calibration.calibrate_and_model_dpss(**common)
    n_after_first = len(_SEGMENT_PLAN_CACHE)
    assert n_after_first > 0
    plans = [p for p in _SEGMENT_PLAN_CACHE.values() if p.seg_cap == 40]
    assert plans  # one per mixed-precision phase
    calibration.calibrate_and_model_dpss(**common)
    assert len(_SEGMENT_PLAN_CACHE) == n_after_first

    # the cache is BOUNDED: a process sweeping configurations must not pin
    # one compiled full-scale executable per configuration forever
    # (review r3) — inserting past capacity evicts the oldest entries
    from calamity_tpu.parallel.batched import _cache_segment_plan

    first_real_key = next(iter(_SEGMENT_PLAN_CACHE))
    for i in range(_SEGMENT_PLAN_CACHE_CAPACITY + 2):
        _cache_segment_plan(("synthetic", i), object())
    assert len(_SEGMENT_PLAN_CACHE) <= _SEGMENT_PLAN_CACHE_CAPACITY
    assert first_real_key not in _SEGMENT_PLAN_CACHE
    _SEGMENT_PLAN_CACHE.clear()


def test_checkpoint_resume_under_auto_plan(tmp_path, projected_multitime):
    """Interrupted + resumed single-device (auto-layout plan) checkpointed
    batched descent reproduces the uninterrupted run bit-exactly, with the
    warm-up folded into the first segment only."""
    def run(ckdir, maxsteps):
        return calibration.calibrate_and_model_dpss(
            min_dly=2.0 / 0.3,
            offset=2.0 / 0.3,
            uvdata=projected_multitime,
            gains=None,
            maxsteps=maxsteps,
            tol=0.0,
            time_parallel=True,
            mesh=False,
            checkpoint_dir=ckdir,
            checkpoint_every=50,
            resume=True,
            comps_precision="float32",
        )

    ck_a = str(tmp_path / "a")
    ck_b = str(tmp_path / "b")
    model_a, resid_a, gains_a, hist_a = run(ck_a, 120)
    run(ck_b, 60)
    model_b, resid_b, gains_b, hist_b = run(ck_b, 120)
    for t in range(3):
        la = np.asarray(hist_a[0][t]["loss"])
        lb = np.asarray(hist_b[0][t]["loss"])
        assert len(la) == len(lb) == 120
        assert np.array_equal(la, lb)
    assert np.array_equal(gains_a.gain_array, gains_b.gain_array)
    assert np.array_equal(model_a.data_array, model_b.data_array)


def test_checkpoint_resume_across_use_min_flip(tmp_path, projected_multitime):
    """A batched checkpoint saved with one use_min setting resumes under
    the other (drivers may couple use_min to patience — hera_full_demo —
    so a --patience change across a resume flips the tree structure; the
    resume adapts instead of refusing)."""
    def run(ckdir, maxsteps, use_min):
        return calibration.calibrate_and_model_dpss(
            min_dly=2.0 / 0.3,
            offset=2.0 / 0.3,
            uvdata=projected_multitime,
            gains=None,
            maxsteps=maxsteps,
            tol=0.0,
            use_min=use_min,
            time_parallel=True,
            mesh=False,
            checkpoint_dir=ckdir,
            checkpoint_every=50,
            resume=True,
            comps_precision="float32",
        )

    for first, second in ((False, True), (True, False)):
        ck = str(tmp_path / f"flip_{int(first)}")
        run(ck, 60, first)
        model, resid, gains, hist = run(ck, 120, second)
        for t in range(3):
            losses = np.asarray(hist[0][t]["loss"])
            assert len(losses) == 120
            assert np.all(np.isfinite(losses))
        assert np.all(np.isfinite(gains.gain_array))


def test_freeze_model_sum_reg_under_auto_plan(projected_multitime):
    """freeze_model + sum regularization through the single-device layout
    plan: the constant coefficient tensors route through put_entries and
    gain-only calibration still recovers |g| ~ 1 per slice."""
    rng = np.random.default_rng(7)
    gains0 = cal_utils.blank_uvcal_from_uvdata(projected_multitime)
    gains0.gain_array = gains0.gain_array * (
        1 + 1e-2 * rng.standard_normal(gains0.gain_array.shape)
        + 1e-2j * rng.standard_normal(gains0.gain_array.shape)
    )
    corrupted = cal_utils.apply_gains(projected_multitime, gains0, inverse=True)
    model, resid, fitted, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=corrupted,
        gains=None,
        sky_model=projected_multitime,
        freeze_model=True,
        maxsteps=2500,
        tol=1e-12,
        correct_resid=True,
        correct_model=True,
        model_regularization="sum",
        learning_rate=1e-2,
        time_parallel=True,
        mesh=False,
    )
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert np.allclose(np.abs(fitted.gain_array), np.abs(gains0.gain_array),
                       rtol=0.0, atol=1e-3)


def test_patience_freezes_plateaued_slice():
    """A slice that never reaches a NEW strict loss minimum freezes after
    exactly `patience` recorded steps (slice 0 starts at its exact
    solution: zero data, zero coefficients, loss identically 0), while a
    still-improving slice keeps stepping; the improving slice's history
    prefix is identical to a patience=0 run and use_min returns the
    per-slice argmin loss."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_core
    from calamity_tpu.solver.fit import FitConfig

    from conftest import zero_plateau_fit_args

    # slice 0 reuses the shared zero-plateau scenario's geometry
    chunks, *_ = zero_plateau_fit_args()
    comps = chunks[0][0]
    nants, nfreqs = 4, 32
    ngrps, _, _, nvecs = comps.shape
    true_fg = np.random.default_rng(1).standard_normal((ngrps, nvecs))
    vis = np.einsum("gv,gxfv->gxf", true_fg, np.asarray(comps))
    # slice 0: zero data + zero coeffs -> loss exactly 0 every step, never
    # a new strict minimum; slice 1: real data, offset start, improves
    data_r = (jnp.asarray(np.stack([np.zeros_like(vis), vis])),)
    data_i = (jnp.asarray(np.zeros((2,) + vis.shape)),)
    wgts = (jnp.full((2,) + vis.shape, 1.0 / vis.size),)
    fg0 = np.stack([np.zeros_like(true_fg), true_fg + 5.0])
    g_r = jnp.ones((2, nants, nfreqs))
    g_i = jnp.zeros((2, nants, nfreqs))
    base = dict(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                maxsteps=200, tol=0.0, use_min=True)
    args = (chunks, data_r, data_i, wgts, g_r, g_i,
            (jnp.asarray(fg0),), (jnp.asarray(fg0) * 0,))
    res0 = batched_fit_core(FitConfig(**base), *args)
    res = batched_fit_core(FitConfig(**base, patience=40), *args)
    ns = np.asarray(res.nsteps_slice)
    hist0 = np.asarray(res0.loss_history)
    hist = np.asarray(res.loss_history)
    # plateaued slice freezes exactly patience steps after its first
    # recorded step (the only "best")
    assert ns[0] == 41, ns
    # improving slice keeps going to maxsteps
    assert ns[1] == 200, ns
    assert np.array_equal(hist[:41, 0], hist0[:41, 0])
    assert np.array_equal(hist[:, 1], hist0[:, 1])
    assert np.asarray(res.final_loss)[0] == 0.0
    # history is recorded in float32 regardless of fit dtype (HBM bound)
    assert np.float32(np.asarray(res.final_loss)[1]) == np.nanmin(hist[:, 1])


def test_blocked_init_from_data_matches_unblocked():
    """ops.lstsq.blocked_init_from_data (one jitted scan over group
    blocks, slicing the resident cubes — the no-sky warm-start path) must
    reproduce the single-call batched init and the prior/weight sums, for
    dense, plain-shared and shared-batched operator layouts."""
    import jax.numpy as jnp

    from calamity_tpu.ops.lstsq import (
        blocked_init_from_data,
        gram_cholesky_chunk,
        init_coeffs_from_cholesky_batched,
    )

    rng = np.random.default_rng(7)
    nbatch, nbls, nf, nv = 2, 3, 16, 4
    for nu, ngrps in ((12, 12), (1, 12), (3, 12)):
        comps = rng.standard_normal((nu, nbls, nf, nv)).astype(np.float32)
        dr = rng.standard_normal((nbatch, ngrps, nbls, nf)).astype(np.float32)
        di = rng.standard_normal((nbatch, ngrps, nbls, nf)).astype(np.float32)
        w = np.abs(rng.standard_normal((nbatch, ngrps, nbls, nf))).astype(np.float32)
        chol, active = gram_cholesky_chunk(jnp.asarray(comps))
        cr0, ci0 = init_coeffs_from_cholesky_batched(
            chol, active, jnp.asarray(comps), jnp.asarray(dr), jnp.asarray(di),
            jnp.asarray(w),
        )
        cr, ci, wsum, pr, pi = blocked_init_from_data(
            chol, active, jnp.asarray(comps), jnp.asarray(dr), jnp.asarray(di),
            jnp.asarray(w), blk=4,
        )
        assert np.allclose(np.asarray(cr), np.asarray(cr0), rtol=1e-5, atol=1e-6), nu
        assert np.allclose(np.asarray(ci), np.asarray(ci0), rtol=1e-5, atol=1e-6), nu
        assert np.allclose(np.asarray(wsum), w.sum(axis=(1, 2, 3)), rtol=1e-5)
        assert np.allclose(np.asarray(pr), (dr * w).sum(axis=(1, 2, 3)), rtol=1e-4)
        assert np.allclose(np.asarray(pi), (di * w).sum(axis=(1, 2, 3)), rtol=1e-4)
        # bf16 weights upcast inside (the wgts_precision="bfloat16" path)
        cr_lo, *_ = blocked_init_from_data(
            chol, active, jnp.asarray(comps), jnp.asarray(dr), jnp.asarray(di),
            jnp.asarray(w).astype(jnp.bfloat16), blk=4,
        )
        assert np.allclose(np.asarray(cr_lo), np.asarray(cr0), rtol=3e-2, atol=1e-3)


@pytest.mark.slow
def test_scale_default_stopping_reaches_same_floor(golomb_visdata):
    """The scale entry points (hera_full_demo, scale_demo, hera_core_demo,
    run_endurance.sh) default to patience>0 + use_min — the measured-best
    stopping config (docs/DESIGN.md 'Patience stopping'; VERDICT r3 item
    7). Regression: that config must reach the same loss floor as
    reference semantics (patience=0) while stopping earlier on the
    plateau, and the demos must keep the default wired."""
    uvd = golomb_visdata.copy()
    comps = models.yield_pbl_dpss_model_comps(
        uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    project_onto_dpss(uvd, comps)
    # an un-modelable noise floor makes the fit end on the oscillating
    # plateau the measurement describes (a perfect-fit fixture decays
    # forever and patience would never fire)
    rng = np.random.default_rng(3)
    noise = 1e-3 * np.sqrt(np.mean(np.abs(uvd.data_array) ** 2))
    uvd.data_array = uvd.data_array + noise * (
        rng.standard_normal(uvd.data_array.shape)
        + 1j * rng.standard_normal(uvd.data_array.shape)
    )
    kwargs = dict(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvd,
        gains=None,
        maxsteps=500,
        tol=0.0,
        comps_precision="float32",
        model_regularization="post_hoc",
        time_parallel=True,
    )
    _, _, _, hist0 = calibration.calibrate_and_model_dpss(**kwargs)
    _, _, _, hist_p = calibration.calibrate_and_model_dpss(
        patience=60, use_min=True, **kwargs
    )
    l0 = np.asarray(hist0[0][0]["loss"])
    lp = np.asarray(hist_p[0][0]["loss"])
    # patience never runs longer, and the argmin-tracked floor matches the
    # reference-semantics run's best visit (early stopping is demonstrated
    # on a true plateau in test_patience_freezes_plateaued_slice; on this
    # noisy fixture micro-improvements can keep resetting the window, so
    # only no-regression is asserted here)
    assert len(lp) <= len(l0)
    assert np.nanmin(lp) <= np.nanmin(l0) * 1.05
    # the demos keep the measured-best default (tripwire against silently
    # reverting to patience=0)
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    for script in (
        "examples/hera_full_demo.py",
        "examples/scale_demo.py",
        "examples/hera_core_demo.py",
    ):
        with open(os.path.join(root, script)) as f:
            src = f.read()
        i = src.index('"--patience"')
        assert "default=500" in src[i : i + 120], script
    with open(os.path.join(root, "scripts/run_endurance.sh")) as f:
        assert "--patience 500" in f.read()


def test_patience_freeze_composes_with_mesh():
    """The per-slice since-best carry shards like the freeze mask: the
    zero-plateau batched fit sharded over a ('data','bl') mesh freezes at
    the same step as the single-device run (the endurance configuration
    pairs patience with the mesh)."""
    import jax
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import batched_fit_core
    from calamity_tpu.parallel.mesh import fit_shardings, make_mesh, shard_chunk
    from calamity_tpu.solver.fit import FitConfig

    from conftest import zero_plateau_fit_args

    def make(shard):
        chunks, data_r, data_i, wgts, g_r, g_i, fg = zero_plateau_fit_args()

        def b(x):
            return jnp.stack([x, x])

        data_r, data_i, wgts = b(data_r[0]), b(data_i[0]), b(wgts[0])
        g_r, g_i = b(g_r), b(g_i)
        fg_r = b(fg[0])
        fg_i = jnp.zeros_like(fg_r)
        if shard:
            mesh = make_mesh(n_data=2, n_bl=2, devices=jax.devices()[:4])
            sh = fit_shardings(mesh)
            chunk, data_r, data_i, wgts = shard_chunk(
                mesh, chunks[0], data_r, data_i, wgts
            )
            chunks = (chunk,)
            g_r = jax.device_put(g_r, sh["gains"])
            g_i = jax.device_put(g_i, sh["gains"])
            fg_r = jax.device_put(fg_r, sh["coeffs"])
            fg_i = jax.device_put(fg_i, sh["coeffs"])
        return (chunks, (data_r,), (data_i,), (wgts,), g_r, g_i,
                (fg_r,), (fg_i,), jnp.zeros((2,)), jnp.zeros((2,)))

    cfg = FitConfig(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                    maxsteps=200, tol=0.0, use_min=True, patience=40)
    res_m = batched_fit_core(cfg, *make(True))
    res_s = batched_fit_core(cfg, *make(False))
    assert np.asarray(res_m.nsteps_slice).tolist() == [41, 41]
    # equal_nan: rows past a frozen slice's last recorded step stay NaN
    assert np.array_equal(
        np.asarray(res_m.loss_history), np.asarray(res_s.loss_history),
        equal_nan=True,
    )


def test_patience_stops_warmstart_scan():
    """patience bounds each per-time while_loop inside the compiled
    warm-started scan: on the zero plateau every time stops after exactly
    patience + 1 recorded steps with its argmin (zero) loss."""
    import jax.numpy as jnp

    from calamity_tpu.parallel.batched import scanned_warmstart_fit_core
    from calamity_tpu.solver.fit import FitConfig

    from conftest import zero_plateau_fit_args

    chunks, data_r, data_i, wgts, g_r, g_i, fg = zero_plateau_fit_args()

    def T(x):
        return jnp.stack([x, x])  # two times

    cfg = FitConfig(optimizer="Adamax", opt_kwargs=(("learning_rate", 1e-2),),
                    maxsteps=200, tol=0.0, use_min=True, patience=40)
    _, history, nsteps, finals = scanned_warmstart_fit_core(
        cfg, chunks, (T(data_r[0]),), (T(data_i[0]),), (T(wgts[0]),),
        g_r, g_i, fg, (jnp.zeros_like(fg[0]),),
        jnp.zeros((2,)), jnp.zeros((2,)),
    )
    assert np.asarray(nsteps).tolist() == [41, 41]
    assert np.asarray(finals).tolist() == [0.0, 0.0]
    hist = np.asarray(history)
    assert hist.shape == (2, 200)
    assert np.all(hist[:, :41] == 0.0)


def test_loss_block_size_validation_and_mesh_unit():
    """_loss_block_size rejects nonsensical requests instead of silently
    degrading to per-group scans, and rounds mesh-run blocks to shard
    ('bl') boundaries so sliced/re-put blocks keep their sharding."""
    from calamity_tpu.parallel.batched import _loss_block_size

    with pytest.raises(ValueError, match="loss_block_ngrps"):
        _loss_block_size(8, 1, 0)
    with pytest.raises(ValueError, match="loss_block_ngrps"):
        _loss_block_size(8, 1, -3)
    assert _loss_block_size(8, 1, None) is None  # blocking off
    assert _loss_block_size(8, 1, 8) is None  # would not split
    assert _loss_block_size(8, 1, 2) == 2  # plain: largest divisor <= 2
    # mesh: blocks round to lcm(gmax, n_bl) multiples
    assert _loss_block_size(8, 1, 2, multiple_of=4) == 4
    assert _loss_block_size(16, 2, 5, multiple_of=4) == 4
    # group axis not divisible by the unit: cannot block, fall back whole
    assert _loss_block_size(6, 1, 2, multiple_of=4) is None


@pytest.mark.slow
def test_mesh_sky_model_blocked_warmstart(projected_multitime):
    """sky_model + mesh + loss_block_ngrps: the blocked warm-start init
    device_puts sky blocks onto the P('data','bl') sharding, so block
    sizes must land on shard boundaries (a block of 2 groups on a 4-way
    'bl' mesh previously raised at setup). use_model_snr_weights covers
    the reweighted-cube re-pin on the same path."""
    mesh = parallel.make_mesh(n_data=2, n_bl=4)
    rng = np.random.default_rng(11)
    gains0 = cal_utils.blank_uvcal_from_uvdata(projected_multitime)
    gains0.gain_array = gains0.gain_array * (
        1 + 1e-2 * rng.standard_normal(gains0.gain_array.shape)
        + 1e-2j * rng.standard_normal(gains0.gain_array.shape)
    )
    corrupted = cal_utils.apply_gains(projected_multitime, gains0, inverse=True)
    model, resid, fitted, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=corrupted,
        gains=None,
        sky_model=projected_multitime,
        maxsteps=1500,
        tol=1e-11,
        correct_resid=True,
        correct_model=True,
        model_regularization="sum",
        use_model_snr_weights=True,
        time_parallel=True,
        mesh=mesh,
        loss_block_ngrps=2,
    )
    assert np.all(np.isfinite(fitted.gain_array))
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
