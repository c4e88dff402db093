"""Flag/weight container (UVFlag equivalent).

Replacement for the subset of ``pyuvdata.UVFlag`` (mode="flag" with a
weights_array) used by the reference for data-fitting weights
(calibration.py:282-298, 916-960, tests/test_calibration.py:66-69).
"""

from __future__ import annotations

import copy as _copy

import numpy as np


class FlagWeights:
    """Flags + per-sample fitting weights aligned with a VisData blt grid."""

    def __init__(self, visdata=None, mode="flag"):
        self.mode = mode
        if visdata is not None:
            self.ant_1_array = np.asarray(visdata.ant_1_array)
            self.ant_2_array = np.asarray(visdata.ant_2_array)
            self.time_array = np.asarray(visdata.time_array)
            self.freq_array = np.asarray(visdata.freq_array)
            self.polarization_array = np.asarray(visdata.polarization_array)
            self.x_orientation = visdata.x_orientation
            self.flag_array = np.asarray(visdata.flag_array).copy()
            self.weights_array = np.zeros(visdata.flag_array.shape, dtype=np.float64)
        else:
            self.ant_1_array = None
            self.ant_2_array = None
            self.time_array = None
            self.freq_array = None
            self.polarization_array = None
            self.x_orientation = None
            self.flag_array = None
            self.weights_array = None

    def copy(self):
        return _copy.deepcopy(self)

    def get_antpairs(self):
        seen = {}
        for a1, a2 in zip(self.ant_1_array.tolist(), self.ant_2_array.tolist()):
            seen.setdefault((a1, a2), None)
        return list(seen.keys())

    def antpair2ind(self, ant1, ant2=None):
        if ant2 is None:
            ant1, ant2 = ant1
        return np.nonzero((self.ant_1_array == ant1) & (self.ant_2_array == ant2))[0]
