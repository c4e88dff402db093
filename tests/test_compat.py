"""Reference-named compatibility shims round-trip tests."""

import numpy as np

from calamity_tpu import cal_utils, compat, models


def test_chunk_alias(golomb_visdata):
    comps = models.yield_pbl_dpss_model_comps(
        golomb_visdata, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    chunked = compat.chunk_fg_comp_dict_by_nbls(comps)
    maxvecs = max(m.shape[1] for m in comps.values())
    assert list(chunked.keys()) == [(1, maxvecs)]


def test_tensorize_comps_reference_layout(golomb_visdata):
    comps = models.yield_pbl_dpss_model_comps(
        golomb_visdata, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    gains = cal_utils.blank_uvcal_from_uvdata(golomb_visdata)
    ants_map = {int(a): i for i, a in enumerate(gains.ant_array)}
    fg_comps, corr_inds = compat.tensorize_fg_model_comps_dict(
        comps, ants_map, golomb_visdata.Nfreqs, visdata=golomb_visdata, dtype=np.float64
    )
    # reference layout: (nvecs, ngrps, nbls, nfreqs)
    assert fg_comps[0].ndim == 4
    nvecs, ngrps, nbls, nfreqs = fg_comps[0].shape
    assert nbls == 1 and nfreqs == 200 and ngrps == 15
    # contents match the component dict
    ncomp_total = 0
    flat = {tuple(k[0][0]): v for k, v in comps.items()}
    for g in range(ngrps):
        i, j = corr_inds[0][g][0]
        inv = {v: k for k, v in ants_map.items()}
        ap = (inv[i], inv[j])
        mat = flat[ap]
        assert np.allclose(fg_comps[0][: mat.shape[1], g, 0, :], mat.T)
        ncomp_total += 1
    assert ncomp_total == 15


def test_full_compat_pipeline(golomb_visdata):
    comps = models.yield_pbl_dpss_model_comps(
        golomb_visdata, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    gains = cal_utils.blank_uvcal_from_uvdata(golomb_visdata)
    ants_map = {int(a): i for i, a in enumerate(gains.ant_array)}
    spec = compat.make_fit_spec(golomb_visdata, comps, ants_map, dtype=np.float64)
    t = spec.times[0]
    data_r, data_i, wgts = compat.tensorize_data(spec, golomb_visdata, "xx", t)
    g_r, g_i = compat.tensorize_gains(spec, gains, "xx", t)
    assert np.asarray(g_r).shape == (6, 200)
    fg_r = compat.tensorize_fg_coeffs(data_r, wgts, spec)
    fg_i = compat.tensorize_fg_coeffs(data_i, wgts, spec)
    cube = compat.yield_fg_model_array(spec, fg_r, fg_i)
    assert cube.shape == (6, 6, 200)
    # the modeled cube reproduces the data on modeled baselines
    rms = np.sqrt(np.mean(np.abs(golomb_visdata.data_array) ** 2))
    for chunk, meta in zip(spec.chunks, spec.meta):
        for g in range(meta.antpairs.shape[0]):
            ap = tuple(meta.antpairs[g, 0])
            i, j = ants_map[ap[0]], ants_map[ap[1]]
            d = golomb_visdata.get_data(ap + ("xx",))[0]
            # projected? raw data may have out-of-basis power; loose check
            assert np.mean(np.abs(cube[i, j] - d) ** 2) ** 0.5 < 0.2 * rms


def test_tensorize_fg_coeffs_shared_basis(redundant_visdata):
    """The coefficient-init shim handles shared-basis FitSpecs (whose chunk
    comps have group dim 1) and reference-layout comps lists — not just
    dense triples."""
    from calamity_tpu import cal_utils, models

    comps = models.yield_pbl_dpss_model_comps(
        redundant_visdata, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    gains = cal_utils.blank_uvcal_from_uvdata(redundant_visdata)
    ants_map = {int(a): i for i, a in enumerate(gains.ant_array)}
    spec = compat.make_fit_spec(
        redundant_visdata, comps, ants_map, shared_basis=True
    )
    t = spec.times[0]
    data_r, data_i, wgts = compat.tensorize_data(spec, redundant_visdata, "xx", t)
    out = compat.tensorize_fg_coeffs(data_r, wgts, spec)
    assert len(out) == len(spec.chunks)
    for c, d in zip(out, data_r):
        assert np.asarray(c).shape[0] == np.asarray(d).shape[0]

    # reference-layout list from the module's own tensorizer
    fg_comps, corr_inds = compat.tensorize_fg_model_comps_dict(
        comps, ants_map, redundant_visdata.Nfreqs, visdata=redundant_visdata
    )
    spec_dense = compat.make_fit_spec(redundant_visdata, comps, ants_map)
    dr2, di2, w2 = compat.tensorize_data(spec_dense, redundant_visdata, "xx", t)
    out2 = compat.tensorize_fg_coeffs(dr2, w2, fg_comps)
    for c, comps_ref in zip(out2, fg_comps):
        assert np.asarray(c).shape == (comps_ref.shape[1], comps_ref.shape[0])


def test_yield_fg_model_array_real_and_padding(redundant_visdata):
    """Real-part contract when fg_coeffs_i is None, and shared-batched
    padding entries must not write into the cube."""
    from calamity_tpu import cal_utils, models

    comps = models.yield_pbl_dpss_model_comps(
        redundant_visdata, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    gains = cal_utils.blank_uvcal_from_uvdata(redundant_visdata)
    ants_map = {int(a): i for i, a in enumerate(gains.ant_array)}
    spec = compat.make_fit_spec(
        redundant_visdata, comps, ants_map, shared_basis=True
    )
    t = spec.times[0]
    data_r, data_i, wgts = compat.tensorize_data(spec, redundant_visdata, "xx", t)
    fg_r = compat.tensorize_fg_coeffs(data_r, wgts, spec)
    cube_real = compat.yield_fg_model_array(spec, fg_r)
    assert cube_real.dtype.kind == "f"  # real part only, per docstring
    fg_i = compat.tensorize_fg_coeffs(data_i, wgts, spec)
    cube = compat.yield_fg_model_array(spec, fg_r, fg_i)
    assert cube.dtype.kind == "c"
    # if any chunk has padding rows, entry (0, 0) must not be clobbered by
    # them: rebuild with coefficients forced nonzero in padded slots
    has_padding = any(not m.valid.all() for m in spec.meta)
    if has_padding:
        fg_r_bad = [np.asarray(c) + 7.0 for c in fg_r]
        cube2 = compat.yield_fg_model_array(spec, fg_r_bad, fg_i)
        # (0,0) is an auto entry no cross-only dataset models: stays zero
        assert np.allclose(cube2[0, 0], 0.0) or (0, 0) in [
            tuple(m.antpairs[g, b])
            for m in spec.meta
            for g in range(m.valid.shape[0])
            for b in range(m.valid.shape[1])
            if m.valid[g, b]
        ]
