"""Regenerate the committed golden uvh5 fixture.

Run from the repo root:  python tests/data/make_golden.py

Produces ``golden_golomb_projected.uvh5``: a 6-antenna Golomb array, 200
channels, one time, cross baselines only, with the synthetic sky projected
onto the per-baseline DPSS basis (min_dly=offset=2/0.3 ns) so a
near-perfect calibration fit exists — the same fixture concept as the
reference's packaged GSM file (reference calamity/data/__init__.py:2).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from calamity_tpu import models, simulate  # noqa: E402
from test_calibration import project_onto_dpss  # noqa: E402


DATA_DIR = os.path.dirname(os.path.abspath(__file__))
GOLDEN_UVH5 = os.path.join(DATA_DIR, "golden_golomb_projected.uvh5")
GOLDEN_CALFITS = os.path.join(DATA_DIR, "golden_gains.calfits")
GOLDEN_CALH5 = os.path.join(DATA_DIR, "golden_gains.calh5")
GOLDEN_UVFLAG = os.path.join(DATA_DIR, "golden_weights.uvflag.h5")


def make_golden_visdata():
    """The deterministic VisData behind golden_golomb_projected.uvh5."""
    uvd = simulate.make_golomb_array(nants=6, nfreqs=200, seed=42)
    comps = models.yield_pbl_dpss_model_comps(
        uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    project_onto_dpss(uvd, comps)
    uvd.history = (
        "golden fixture: simulate.make_golomb_array(nants=6, nfreqs=200, "
        "seed=42) projected onto the DPSS basis"
    )
    return uvd


def make_golden_caldata():
    """Deterministic CalData for the byte-golden calfits/calh5 fixtures.

    Built from the COMMITTED golden uvh5 (the stable anchor) with a fixed
    analytic gain pattern — no RNG, so a writer producing different BYTES
    than the committed golden is a format drift, not fixture noise."""
    import numpy as np

    from calamity_tpu import cal_utils
    from calamity_tpu.io import VisData

    vis = VisData.from_uvh5(GOLDEN_UVH5)
    cal = cal_utils.blank_uvcal_from_uvdata(vis)
    shape = cal.gain_array.shape
    idx = np.arange(np.prod(shape), dtype=np.float64).reshape(shape)
    cal.gain_array = (1.0 + 0.01 * np.cos(0.13 * idx)) * np.exp(
        1j * 0.05 * np.sin(0.29 * idx)
    )
    cal.history = "golden fixture: deterministic analytic gain pattern"
    return cal


def make_golden_flagweights():
    """Deterministic FlagWeights for the byte-golden UVFlag-HDF5 fixture."""
    import numpy as np

    from calamity_tpu.io import FlagWeights, VisData

    vis = VisData.from_uvh5(GOLDEN_UVH5)
    fw = FlagWeights(vis)
    shape = fw.weights_array.shape
    idx = np.arange(np.prod(shape), dtype=np.float64).reshape(shape)
    fw.weights_array = np.abs(np.sin(0.07 * idx)) + 0.5
    fw.history = "golden fixture: deterministic analytic weight pattern"
    return fw


def main():
    uvd = make_golden_visdata()
    uvd.write_uvh5(GOLDEN_UVH5, clobber=True)
    print(f"wrote {GOLDEN_UVH5}")
    cal = make_golden_caldata()
    cal.write_calfits(GOLDEN_CALFITS, clobber=True)
    print(f"wrote {GOLDEN_CALFITS}")
    cal.write_calh5(GOLDEN_CALH5, clobber=True)
    print(f"wrote {GOLDEN_CALH5}")
    fw = make_golden_flagweights()
    fw.to_uvflag_h5(GOLDEN_UVFLAG, clobber=True)
    print(f"wrote {GOLDEN_UVFLAG}")


if __name__ == "__main__":
    main()
