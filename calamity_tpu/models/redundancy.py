"""Redundant-baseline grouping from antenna positions.

Replaces the reference's delegation to pyuvdata.get_redundancies
(reference modeling.py:10-81). Groups data antenna pairs whose ENU baseline
vectors agree within ``tol`` meters, after conjugating each pair into a
canonical half-space so redundant groups never contain conjugate pairs.
"""

from __future__ import annotations

import numpy as np


def _canonical_orientation(ap, vec, tol):
    """Flip (ant1, ant2) so the baseline vector points into the canonical
    half-space: east > 0, ties broken by north > 0 then up >= 0."""
    e, n, u = vec
    flip = False
    if e < -tol / 2.0:
        flip = True
    elif abs(e) <= tol / 2.0:
        if n < -tol / 2.0:
            flip = True
        elif abs(n) <= tol / 2.0 and u < 0.0:
            flip = True
    if flip:
        return (ap[1], ap[0]), -np.asarray(vec)
    return ap, np.asarray(vec)


def get_redundant_grps_data(visdata, remove_redundancy=False, tol=1.0, include_autos=False):
    """Redundant groups of data antenna pairs.

    Behavior parity with reference modeling.get_redundant_grps_data
    (modeling.py:10-81): returns pairs in canonical (conjugation-free)
    orientation; with ``remove_redundancy`` every baseline becomes its own
    length-1 group (the default calibration path, modeling.py:354).

    Returns
    -------
    antpairs : set (kept for reference-signature parity; empty set)
    red_grps : list of lists of (ant1, ant2) tuples
    vec_bin_centers : list of len-3 float arrays (ENU baseline vectors)
    lengths : list of float baseline lengths (meters)
    """
    enu, antnums = visdata.get_ENU_antpos(pick_data_ants=True)
    pos = {an: p for an, p in zip(antnums.tolist(), enu)}
    pairs = visdata.get_antpairs()
    if not include_autos:
        pairs = [ap for ap in pairs if ap[0] != ap[1]]

    canon = []
    for ap in pairs:
        vec = pos[ap[1]] - pos[ap[0]]  # uvw convention: pos(ant2) - pos(ant1)
        cap, cvec = _canonical_orientation(ap, vec, tol)
        canon.append((cap, cvec))

    # greedy clustering of canonical vectors within tol
    red_grps = []
    centers = []
    for cap, cvec in canon:
        placed = False
        for gi, center in enumerate(centers):
            if np.linalg.norm(cvec - center) <= tol:
                red_grps[gi].append(cap)
                placed = True
                break
        if not placed:
            red_grps.append([cap])
            centers.append(cvec)

    lengths = [float(np.linalg.norm(c)) for c in centers]
    # deterministic ordering: by (length, angle)
    angles = [float(np.arctan2(c[1], c[0])) for c in centers]
    order = sorted(range(len(red_grps)), key=lambda i: (lengths[i], angles[i]))
    red_grps = [red_grps[i] for i in order]
    centers = [centers[i] for i in order]
    lengths = [lengths[i] for i in order]

    if remove_redundancy:
        red_grps_t, centers_t, lengths_t = [], [], []
        for grp, c, ln in zip(red_grps, centers, lengths):
            for ap in grp:
                red_grps_t.append([ap])
                centers_t.append(c)
                lengths_t.append(ln)
        red_grps, centers, lengths = red_grps_t, centers_t, lengths_t

    return set(), red_grps, centers, lengths
