"""Byte-golden format tests (VERDICT r3 item 8).

pyuvdata is not installable in this environment, so the optional interop
suite (test_pyuvdata_interop.py) skips. These tests anchor the written
formats without it:

1. BYTE-GOLDEN writer stability — the committed golden files
   (tests/data/golden_*.{uvh5,calfits,calh5,uvflag.h5}) were written by
   THIS repo's writers from deterministic content (tests/data/
   make_golden.py); regenerating the same content must reproduce the
   committed bytes exactly. All four writers are byte-deterministic (the
   calfits writer is pure numpy; the HDF5 writers embed no timestamps),
   so any drift in the emitted layout fails these tests loudly.
2. LAYOUT CONSTANTS — the golden bytes are parsed with RAW tooling (plain
   FITS record walking / direct h5py), no repo readers, and checked
   against pyuvdata's documented layout constants: the calfits axis
   convention (pyuvdata.uvcal.calfits: NAXIS1=4 data arrays,
   CTYPE2..6 = JONES/TIME/FREQS/IF/ANTAXIS, ANTENNAS binary table) and
   the uvh5/UVFlag-HDF5 Header/Data dataset inventories. A writer change
   that kept self-consistency (reader+writer drift together, which the
   round-trip tests cannot see) still fails here.
3. VALUE ROUND-TRIPS — the repo readers recover the builder's exact
   float64 values from the golden bytes.

Regenerate after an INTENTIONAL format change:
    python tests/data/make_golden.py
"""

import filecmp
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "data"))
import make_golden as mg  # noqa: E402

from calamity_tpu.io import CalData, FlagWeights, VisData  # noqa: E402


# --------------------------------------------------------------------- #
# 1. byte-golden writer stability
# --------------------------------------------------------------------- #
def test_calfits_writer_byte_golden(tmp_path):
    cal = mg.make_golden_caldata()
    out = str(tmp_path / "g.calfits")
    cal.write_calfits(out)
    assert filecmp.cmp(mg.GOLDEN_CALFITS, out, shallow=False), (
        "calfits writer no longer reproduces the committed golden bytes — "
        "format drift (regenerate the golden only for intentional changes)"
    )


def test_calh5_writer_byte_golden(tmp_path):
    cal = mg.make_golden_caldata()
    out = str(tmp_path / "g.calh5")
    cal.write_calh5(out)
    assert filecmp.cmp(mg.GOLDEN_CALH5, out, shallow=False), (
        "calh5 writer drifted from the committed golden bytes"
    )


def test_uvflag_writer_byte_golden(tmp_path):
    fw = mg.make_golden_flagweights()
    out = str(tmp_path / "g.uvflag.h5")
    fw.to_uvflag_h5(out)
    assert filecmp.cmp(mg.GOLDEN_UVFLAG, out, shallow=False), (
        "UVFlag-HDF5 writer drifted from the committed golden bytes"
    )


def test_uvh5_writer_byte_golden(tmp_path):
    # read the committed golden and rewrite it: reader+writer together
    # must reproduce the bytes (the golden was written by this repo)
    vis = VisData.from_uvh5(mg.GOLDEN_UVH5)
    out = str(tmp_path / "g.uvh5")
    vis.write_uvh5(out)
    assert filecmp.cmp(mg.GOLDEN_UVH5, out, shallow=False), (
        "uvh5 read->write no longer reproduces the committed golden bytes"
    )


# --------------------------------------------------------------------- #
# 2. layout constants, parsed WITHOUT the repo readers
# --------------------------------------------------------------------- #
def _fits_cards(block):
    """Decode one 2880-byte FITS header record into {keyword: raw value}."""
    cards = {}
    for i in range(0, 2880, 80):
        card = block[i : i + 80].decode("ascii")
        key = card[:8].strip()
        if key == "END":
            return cards, True
        if card[8:10] == "= ":
            cards[key] = card[10:].split("/")[0].strip()
    return cards, False


def _read_fits_headers(path):
    """All HDU headers of a FITS file as a list of {keyword: value}."""
    headers = []
    with open(path, "rb") as f:
        raw = f.read()
    pos = 0
    while pos < len(raw):
        cards = {}
        done = False
        while not done and pos < len(raw):
            block = raw[pos : pos + 2880]
            pos += 2880
            got, done = _fits_cards(block)
            cards.update(got)
        headers.append(cards)
        # skip the data area: |BITPIX|/8 * prod(NAXISn), padded to 2880
        bitpix = abs(int(cards.get("BITPIX", "8")))
        naxis = int(cards.get("NAXIS", "0"))
        nelem = 1
        for ax in range(1, naxis + 1):
            nelem *= int(cards.get(f"NAXIS{ax}", "0"))
        nbytes = (bitpix // 8) * nelem * max(int(cards.get("GCOUNT", "1")), 1)
        nbytes += int(cards.get("PCOUNT", "0"))
        if naxis == 0:
            nbytes = 0
        pos += -(-nbytes // 2880) * 2880
    return headers


def test_calfits_layout_constants():
    """The golden calfits conforms to pyuvdata's documented calfits
    convention (pyuvdata docs: calfits memo / uvcal.calfits writer) —
    checked on raw FITS records, independent of the repo's reader."""
    headers = _read_fits_headers(mg.GOLDEN_CALFITS)
    assert len(headers) >= 2  # primary + ANTENNAS table
    pri = headers[0]
    assert pri["SIMPLE"] == "T"
    assert int(pri["BITPIX"]) == -64  # float64 data cube
    assert int(pri["NAXIS"]) == 6
    # NAXIS1 = 4: gain.real, gain.imag, flag, quality
    assert int(pri["NAXIS1"]) == 4
    for ax, name in ((2, "JONES"), (3, "TIME"), (4, "FREQS"),
                     (5, "IF"), (6, "ANTAXIS")):
        assert pri[f"CTYPE{ax}"].strip("' ") == name, (ax, pri.get(f"CTYPE{ax}"))
    for key in ("CALTYPE", "CALSTYLE", "GNCONVEN", "TELESCOP"):
        assert key in pri, f"missing required calfits keyword {key}"
    assert pri["CALTYPE"].strip("' ") == "gain"
    assert pri["GNCONVEN"].strip("' ") in ("divide", "multiply")
    ant = next(
        (h for h in headers[1:] if h.get("EXTNAME", "").strip("' ") == "ANTENNAS"),
        None,
    )
    assert ant is not None, "ANTENNAS binary table extension missing"
    assert ant["XTENSION"].strip("' ") == "BINTABLE"
    ttypes = {v.strip("' ") for k, v in ant.items() if k.startswith("TTYPE")}
    assert {"ANTNAME", "ANTINDEX", "ANTARR"} <= ttypes, ttypes


def test_uvh5_layout_constants():
    """The golden uvh5 carries the Header/Data inventory of the uvh5 memo
    (pyuvdata docs/references/uvh5_memo): checked with raw h5py."""
    with h5py.File(mg.GOLDEN_UVH5, "r") as f:
        assert "Header" in f and "Data" in f
        hdr, data = f["Header"], f["Data"]
        required_hdr = [
            "latitude", "longitude", "altitude", "telescope_name",
            "instrument", "object_name", "history", "freq_array",
            "time_array", "integration_time", "ant_1_array", "ant_2_array",
            "polarization_array", "antenna_numbers", "antenna_names",
            "antenna_positions", "Nants_data", "Nants_telescope", "Nbls",
            "Nblts", "Nfreqs", "Npols", "Ntimes", "Nspws", "uvw_array",
        ]
        for name in required_hdr:
            assert name in hdr, f"uvh5 Header/{name} missing"
        for name in ("visdata", "flags", "nsamples"):
            assert name in data, f"uvh5 Data/{name} missing"
        assert data["visdata"].dtype.kind == "c"
        assert data["flags"].dtype == np.bool_
        assert data["visdata"].shape[0] == int(hdr["Nblts"][()])
        assert data["visdata"].shape[-2:] == (
            int(hdr["Nfreqs"][()]), int(hdr["Npols"][()])
        )


def test_uvflag_layout_constants():
    """The golden UVFlag-HDF5 file carries the baseline-type flag-mode
    layout pyuvdata.UVFlag reads (Header type/mode strings + Data
    flag/weights arrays)."""
    def _s(x):
        x = x[()]
        return x.decode() if isinstance(x, bytes) else str(x)

    with h5py.File(mg.GOLDEN_UVFLAG, "r") as f:
        hdr, data = f["Header"], f["Data"]
        assert _s(hdr["type"]) == "baseline"
        assert _s(hdr["mode"]) == "flag"
        for name in ("Nblts", "Nfreqs", "Npols", "time_array",
                     "ant_1_array", "ant_2_array", "freq_array",
                     "polarization_array"):
            assert name in hdr, f"UVFlag Header/{name} missing"
        assert "flag_array" in data and "weights_array" in data
        assert data["flag_array"].dtype == np.bool_
        assert data["flag_array"].shape == data["weights_array"].shape


def test_calh5_layout_constants():
    """The golden calh5 (native HDF5 gains layout) keeps its Header/Data
    inventory and dtypes."""
    with h5py.File(mg.GOLDEN_CALH5, "r") as f:
        hdr, data = f["Header"], f["Data"]
        for name in ("Nants_data", "Nfreqs", "Ntimes", "Njones",
                     "freq_array", "time_array", "ant_array",
                     "jones_array", "gain_convention", "cal_type"):
            assert name in hdr, f"calh5 Header/{name} missing"
        assert data["gains"].dtype == np.complex128
        assert data["flags"].dtype == np.bool_
        assert data["qualities"].dtype == np.float64


# --------------------------------------------------------------------- #
# 3. value round-trips through the golden bytes
# --------------------------------------------------------------------- #
def test_calfits_golden_value_roundtrip():
    cal = mg.make_golden_caldata()
    back = CalData.from_calfits(mg.GOLDEN_CALFITS)
    assert np.array_equal(back.gain_array, cal.gain_array)
    assert np.array_equal(back.flag_array, cal.flag_array)
    assert np.array_equal(np.asarray(back.freq_array).ravel(),
                          np.asarray(cal.freq_array).ravel())
    assert np.array_equal(back.ant_array, cal.ant_array)


def test_calh5_golden_value_roundtrip():
    cal = mg.make_golden_caldata()
    back = CalData.from_calh5(mg.GOLDEN_CALH5)
    assert np.array_equal(back.gain_array, cal.gain_array)
    assert np.array_equal(back.flag_array, cal.flag_array)


def test_uvflag_golden_value_roundtrip():
    fw = mg.make_golden_flagweights()
    back = FlagWeights.from_uvflag_h5(mg.GOLDEN_UVFLAG)
    assert np.array_equal(back.weights_array, fw.weights_array)
    assert np.array_equal(back.flag_array, fw.flag_array)
