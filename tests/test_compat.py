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
