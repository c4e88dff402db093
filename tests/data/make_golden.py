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


def main():
    uvd = simulate.make_golomb_array(nants=6, nfreqs=200, seed=42)
    comps = models.yield_pbl_dpss_model_comps(
        uvd, offset=2.0 / 0.3, min_dly=2.0 / 0.3
    )
    project_onto_dpss(uvd, comps)
    uvd.history = (
        "golden fixture: simulate.make_golomb_array(nants=6, nfreqs=200, "
        "seed=42) projected onto the DPSS basis"
    )
    out = os.path.join(
        os.path.dirname(__file__), "golden_golomb_projected.uvh5"
    )
    uvd.write_uvh5(out, clobber=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
