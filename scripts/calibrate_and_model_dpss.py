#!/usr/bin/env python
# CLI entry for DPSS calibration and foreground modeling
# (reference parity: scripts/calibrate_and_model_dpss.py).

from calamity_tpu import calibration

ap = calibration.dpss_fit_argparser()
args = ap.parse_args()
calibration.read_calibrate_and_model_dpss(**vars(args))
