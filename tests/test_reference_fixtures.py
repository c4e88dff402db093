"""Cross-validation against the upstream reference's binary uvh5 fixtures.

These tests replay the reference's own integration scenarios
(reference tests/test_calibration.py:18-48, 475-596) on the actual
reference data files when available (they live outside this repo and are
not shipped; tests skip cleanly if absent).
"""

import os

import numpy as np
import pytest

from calamity_tpu import cal_utils, calibration, models
from calamity_tpu.io import VisData

REF_DATA = "/root/reference/calamity/data"
GSM = os.path.join(
    REF_DATA,
    "Garray_antenna_diameter2.0_fractional_spacing1.0_nant6_nf200_"
    "df100.000kHz_f0100.000MHzcompressed_True_autosFalse_gsm.uvh5",
)
EOR = os.path.join(
    REF_DATA,
    "Garray_antenna_diameter2.0_fractional_spacing1.0_nant6_nf200_"
    "df100.000kHz_f0100.000MHzcompressed_True_autosFalse_eor_-50.0dB.uvh5",
)
MWA = os.path.join(REF_DATA, "mwa_noise_sim_realistic_flags.uvh5")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not available"
)

from test_calibration import RMS, project_onto_dpss as _project  # noqa: E402


@pytest.fixture()
def ref_sky_model_projected():
    uvd = VisData.from_uvh5(GSM)
    uvd.select(bls=[ap for ap in uvd.get_antpairs() if ap[0] != ap[1]], inplace=True)
    comps = models.yield_pbl_dpss_model_comps(uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3)
    return _project(uvd, comps)


def test_reference_gsm_perfect_data(ref_sky_model_projected):
    """Reference scenario: projected GSM sky, blank gains -> resid 100x down."""
    uvd = ref_sky_model_projected
    gains = cal_utils.blank_uvcal_from_uvdata(uvd)
    model, resid, fitted, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvd,
        gains=gains,
        maxsteps=3000,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
    )
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert RMS(uvd.data_array) >= 1e2 * RMS(resid.data_array)


def test_reference_gsm_plus_eor_noisy_gains(ref_sky_model_projected):
    """Reference scenario: GSM+EoR data, randomized starting gains."""
    uvd = ref_sky_model_projected.copy()
    eor = VisData.from_uvh5(EOR)
    eor.select(bls=[ap for ap in eor.get_antpairs() if ap[0] != ap[1]], inplace=True)
    uvd.data_array = uvd.data_array + eor.data_array
    rng = np.random.default_rng(0)
    gains = cal_utils.blank_uvcal_from_uvdata(uvd)
    gains.gain_array = gains.gain_array + 1e-2 * rng.standard_normal(
        gains.gain_array.shape
    ) + 1e-2j * rng.standard_normal(gains.gain_array.shape)
    model, resid, fitted, hist = calibration.calibrate_and_model_dpss(
        min_dly=2.0 / 0.3,
        offset=2.0 / 0.3,
        uvdata=uvd,
        gains=gains,
        maxsteps=3000,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        model_regularization="post_hoc",
    )
    assert RMS(model.data_array) >= 1e2 * RMS(resid.data_array)
    assert RMS(uvd.data_array) >= 1e2 * RMS(resid.data_array)


def test_reference_mwa_rfi_flags_finite():
    """Reference scenario: MWA noise sim with realistic RFI flags produces
    finite outputs (reference test_calibration.py:519-541)."""
    uvd = VisData.from_uvh5(MWA)
    model, resid, fitted, hist = calibration.calibrate_and_model_dpss(
        min_dly=4.0 / 0.3,
        offset=100.0,
        uvdata=uvd,
        gains=None,
        maxsteps=200,
        tol=1e-10,
        correct_resid=True,
        correct_model=True,
        red_tol=0.3,
        model_regularization="post_hoc",
    )
    assert np.all(np.isfinite(resid.data_array))
    assert np.all(np.isfinite(model.data_array))
    assert np.all(np.isfinite(fitted.gain_array))


def test_reference_overlap_grouping_structure():
    """The uv-overlap fitting-group partition on the reference 6-ant array
    has the documented structure (one big merged group of long baselines,
    singleton short baselines — reference test_modeling.py:20-32)."""
    uvd = VisData.from_uvh5(GSM)
    fitting_grps, vecs, conns, labels = models.get_uv_overlapping_grps_conjugated(
        uvd, red_tol_freq=0.5, n_angle_bins=200
    )
    sizes = sorted(len(fg) for fg in fitting_grps)
    all_red_grps = [rg for fg in fitting_grps for rg in fg]
    # every baseline appears exactly once; grouping is a partition
    assert len(all_red_grps) == len(set(all_red_grps))
    assert sum(len(rg) for rg in all_red_grps) == 15
    # the reference array merges its long-baseline track into one large group
    assert sizes[-1] >= 6
    assert sizes[0] == 1
