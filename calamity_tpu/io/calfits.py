"""Minimal pure-numpy FITS writer/reader for calibration gains.

The reference writes gains with ``UVCal.write_calfits`` (calibration.py:1810)
via astropy. Neither pyuvdata nor astropy is a dependency of this framework,
so this module implements the small FITS subset needed to persist CalData as
a standards-compliant FITS file (2880-byte records, big-endian data, IMAGE
extensions). Layout:

  primary HDU : metadata keywords only (no data)
  GAINS       : float64 image, shape (2, Njones, Ntimes, Nfreqs, Nspws, Nants)
                plane 0 = real, plane 1 = imag
  FLAGS       : uint8 image, same trailing shape
  QUALITY     : float64 image, same trailing shape
  ANTARR/FREQS/TIMES/JONES/TRANGE/LSTARR : 1-d metadata images

This is not byte-identical to pyuvdata's calfits layout (which cannot be
verified without astropy in this environment) but is self-consistent,
readable by any FITS library, and round-trips through read_calfits.
"""

from __future__ import annotations

import os

import numpy as np

RECORD = 2880


def _card(keyword, value=None, comment=None):
    """Format one 80-character FITS header card."""
    key = f"{keyword:<8.8s}"
    if value is None:
        card = key
    else:
        if isinstance(value, bool):
            val = "T" if value else "F"
            card = f"{key}= {val:>20s}"
        elif isinstance(value, (int, np.integer)):
            card = f"{key}= {value:>20d}"
        elif isinstance(value, (float, np.floating)):
            card = f"{key}= {value:>20.13E}"
        else:
            sval = str(value).replace("'", "''")[:67]
            card = f"{key}= '{sval}'"
        if comment:
            card += f" / {comment}"
    return f"{card:<80.80s}"[:80]


def _header_bytes(cards):
    text = "".join(cards) + _card("END")
    raw = text.encode("ascii")
    rem = len(raw) % RECORD
    if rem:
        raw += b" " * (RECORD - rem)
    return raw


_BITPIX = {
    np.dtype(">u1"): 8,
    np.dtype(">i2"): 16,
    np.dtype(">i4"): 32,
    np.dtype(">i8"): 64,
    np.dtype(">f4"): -32,
    np.dtype(">f8"): -64,
}
_DTYPE_FOR_BITPIX = {v: k for k, v in _BITPIX.items()}


def _data_bytes(arr):
    raw = arr.tobytes()
    rem = len(raw) % RECORD
    if rem:
        raw += b"\x00" * (RECORD - rem)
    return raw


def _image_hdu(name, arr, primary=False, extra_cards=()):
    """Serialize one image HDU (header + data blocks)."""
    if arr is not None:
        if arr.dtype == np.uint8:
            arr = arr.astype(">u1")
        elif arr.dtype.kind == "f" and arr.dtype.itemsize == 4:
            arr = arr.astype(">f4")
        elif arr.dtype.kind in "iu":
            arr = arr.astype(">i8")
        else:
            arr = arr.astype(">f8")
    cards = []
    if primary:
        cards.append(_card("SIMPLE", True, "conforms to FITS standard"))
    else:
        cards.append(_card("XTENSION", "IMAGE", "Image extension"))
    if arr is None:
        cards.append(_card("BITPIX", 8))
        cards.append(_card("NAXIS", 0))
    else:
        cards.append(_card("BITPIX", _BITPIX[arr.dtype]))
        cards.append(_card("NAXIS", arr.ndim))
        # FITS axis order is reversed relative to C order
        for i, n in enumerate(reversed(arr.shape)):
            cards.append(_card(f"NAXIS{i + 1}", n))
    if primary:
        cards.append(_card("EXTEND", True))
    else:
        cards.append(_card("PCOUNT", 0))
        cards.append(_card("GCOUNT", 1))
        cards.append(_card("EXTNAME", name))
    cards.extend(extra_cards)
    out = _header_bytes(cards)
    if arr is not None:
        out += _data_bytes(arr)
    return out


def write_calfits(cal, path, clobber=False):
    if os.path.exists(path) and not clobber:
        raise IOError(f"{path} exists and clobber=False")
    cal._sync_metadata()
    meta_cards = [
        _card("TELESCOP", cal.telescope_name),
        _card("LAT", float(cal.latitude)),
        _card("LON", float(cal.longitude)),
        _card("ALT", float(cal.altitude)),
        _card("INTTIME", float(cal.integration_time)),
        _card("CHWIDTH", float(cal.channel_width)),
        _card("GNCONVEN", cal.gain_convention),
        _card("CALSTYLE", cal.cal_style),
        _card("CALTYPE", cal.cal_type),
        _card("XORIENT", cal.x_orientation or "none"),
        _card("NANTSDAT", int(cal.Nants_data)),
        _card("NANTSTEL", int(cal.Nants_telescope)),
        _card("HISTORY", (cal.history or "")[:70]),
    ]
    gains = np.stack([cal.gain_array.real, cal.gain_array.imag], axis=0)
    # move the (ants, spws, freqs, times, jones) block so that FITS reversed
    # order reads naturally; keep C-order (2, nants, nspws, nfreqs, ntimes, njones)
    blob = _image_hdu("PRIMARY", None, primary=True, extra_cards=meta_cards)
    blob += _image_hdu("GAINS", gains)
    blob += _image_hdu("FLAGS", cal.flag_array.astype(np.uint8))
    blob += _image_hdu("QUALITY", cal.quality_array.astype(np.float64))
    blob += _image_hdu("ANTARR", np.asarray(cal.ant_array, dtype=np.int64))
    blob += _image_hdu("FREQS", np.asarray(cal.freq_array, dtype=np.float64))
    blob += _image_hdu("TIMES", np.asarray(cal.time_array, dtype=np.float64))
    blob += _image_hdu("JONES", np.asarray(cal.jones_array, dtype=np.int64))
    if cal.time_range is not None:
        blob += _image_hdu("TRANGE", np.asarray(cal.time_range, dtype=np.float64))
    if cal.lst_array is not None:
        blob += _image_hdu("LSTARR", np.asarray(cal.lst_array, dtype=np.float64))
    if cal.antenna_positions is not None:
        blob += _image_hdu("ANTPOS", np.asarray(cal.antenna_positions, dtype=np.float64))
    if cal.antenna_numbers is not None:
        blob += _image_hdu("ANTNUMS", np.asarray(cal.antenna_numbers, dtype=np.int64))
    with open(path, "wb") as f:
        f.write(blob)


def _parse_header(raw):
    """Parse header cards from one or more 2880-byte records."""
    cards = {}
    pos = 0
    while True:
        record = raw[pos : pos + RECORD]
        for i in range(0, RECORD, 80):
            card = record[i : i + 80].decode("ascii", errors="replace")
            key = card[:8].strip()
            if key == "END":
                return cards, pos + RECORD
            if "= " in card[8:10] or card[8:10] == "= ":
                body = card[10:]
                if "/" in body and not body.strip().startswith("'"):
                    body = body.split("/")[0]
                body = body.strip()
                if body.startswith("'"):
                    val = body.strip().strip("'").strip()
                elif body == "T":
                    val = True
                elif body == "F":
                    val = False
                else:
                    try:
                        val = int(body)
                    except ValueError:
                        try:
                            val = float(body)
                        except ValueError:
                            val = body
                cards[key] = val
        pos += RECORD
        if pos >= len(raw):
            return cards, pos


def _read_hdus(path):
    with open(path, "rb") as f:
        raw = f.read()
    hdus = []
    pos = 0
    while pos < len(raw):
        cards, hdr_end = _parse_header(raw[pos:])
        pos += hdr_end
        naxis = int(cards.get("NAXIS", 0))
        arr = None
        if naxis > 0:
            shape = tuple(
                int(cards[f"NAXIS{i}"]) for i in range(naxis, 0, -1)
            )  # back to C order
            dtype = _DTYPE_FOR_BITPIX[int(cards["BITPIX"])]
            count = int(np.prod(shape))
            nbytes = count * dtype.itemsize
            arr = np.frombuffer(raw[pos : pos + nbytes], dtype=dtype).reshape(shape)
            pos += ((nbytes + RECORD - 1) // RECORD) * RECORD
        name = cards.get("EXTNAME", "PRIMARY")
        hdus.append((name, cards, arr))
    return hdus


def read_calfits(cls, path):
    hdus = _read_hdus(path)
    by_name = {name: (cards, arr) for name, cards, arr in hdus}
    pcards = hdus[0][1]
    obj = cls()
    obj.telescope_name = pcards.get("TELESCOP", "unknown")
    obj.latitude = float(pcards.get("LAT", 0.0))
    obj.longitude = float(pcards.get("LON", 0.0))
    obj.altitude = float(pcards.get("ALT", 0.0))
    obj.integration_time = float(pcards.get("INTTIME", 0.0))
    obj.channel_width = float(pcards.get("CHWIDTH", 0.0))
    obj.gain_convention = pcards.get("GNCONVEN", "divide")
    obj.cal_style = pcards.get("CALSTYLE", "redundant")
    obj.cal_type = pcards.get("CALTYPE", "gain")
    xorient = pcards.get("XORIENT", "none")
    obj.x_orientation = None if xorient == "none" else xorient
    obj.history = str(pcards.get("HISTORY", ""))
    gains = by_name["GAINS"][1].astype(np.float64)
    obj.gain_array = gains[0] + 1j * gains[1]
    obj.flag_array = by_name["FLAGS"][1].astype(bool)
    obj.quality_array = by_name["QUALITY"][1].astype(np.float64)
    obj.ant_array = by_name["ANTARR"][1].astype(int)
    obj.freq_array = by_name["FREQS"][1].astype(np.float64)
    obj.time_array = by_name["TIMES"][1].astype(np.float64)
    obj.jones_array = by_name["JONES"][1].astype(int)
    if "TRANGE" in by_name:
        obj.time_range = by_name["TRANGE"][1].astype(np.float64)
    if "LSTARR" in by_name:
        obj.lst_array = by_name["LSTARR"][1].astype(np.float64)
    if "ANTPOS" in by_name:
        obj.antenna_positions = by_name["ANTPOS"][1].astype(np.float64)
    if "ANTNUMS" in by_name:
        obj.antenna_numbers = by_name["ANTNUMS"][1].astype(int)
    obj._sync_metadata()
    return obj
