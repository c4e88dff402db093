"""Small shared utilities (logging, progress bars, baseline selection).

Parity targets: reference calamity/utils.py (echo, PBARS, select_baselines).
"""

from __future__ import annotations

import numpy as np
import tqdm

try:  # pragma: no cover - notebook variant is cosmetic
    import tqdm.notebook as _tqdm_notebook

    PBARS = {True: _tqdm_notebook.tqdm, False: tqdm.tqdm}
except Exception:  # pragma: no cover
    PBARS = {True: tqdm.tqdm, False: tqdm.tqdm}


def echo(message, verbose=True):
    """Print-if-verbose (reference utils.py:8-10)."""
    if verbose:
        print(message)


def select_baselines(
    visdata, bllen_min=0.0, bllen_max=np.inf, bl_ew_min=0.0, ex_ants=None, select_ants=None
):
    """In-place selection by baseline length / EW projection / antenna lists.

    Reference parity: utils.select_baselines (utils.py:13-37). Baseline
    vector is ENU(ant1) - ENU(ant2); the EW cut uses its absolute east
    component, so orientation does not matter."""
    if ex_ants is None:
        ex_ants = []
    ex_ants = set(ex_ants)
    antpos, antnums = visdata.get_ENU_antpos(pick_data_ants=True)
    if select_ants is None:
        select_ants = set(antnums.tolist())
    else:
        select_ants = set(select_ants)
    posdict = {an: ap for an, ap in zip(antnums.tolist(), antpos)}
    antpairs_to_keep = []
    for ap in visdata.get_antpairs():
        blvec = posdict[ap[0]] - posdict[ap[1]]
        bllen = np.linalg.norm(blvec)
        if (
            bllen >= bllen_min
            and bllen <= bllen_max
            and np.abs(blvec[0]) > bl_ew_min
            and ap[0] not in ex_ants
            and ap[1] not in ex_ants
            and ap[0] in select_ants
            and ap[1] in select_ants
        ):
            antpairs_to_keep.append(ap)
    visdata.select(bls=antpairs_to_keep, inplace=True)
