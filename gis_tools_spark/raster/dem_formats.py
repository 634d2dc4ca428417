"""DEM container formats — ENVI hdr/img and SRTM .hgt — pure numpy.

Reference parity: gis-tools parses ENVI headers in
utils/sys/reader.py:14-72 (``read_hdr``/``read_img``: 'key = value'
lines, the ENVI data-type code table, and the map-info origin stored at
the TOP-LEFT PIXEL CENTER — shifted by half a pixel to corner
anchoring) and builds its GeoGrid from them (coordinates.py:279-300);
SRTM tiles arrive as raw big-endian int16 .hgt grids
(raster.py:826-887 downloads them; the payload layout is public:
N×N samples, corner-registered at integer degrees, void = -32768).

Deviations from the reference, on purpose:
* read_img (reader.py:72) reshapes to (x_size, y_size) — transposed
  for any non-square image; here rows = lines (y) as ENVI defines.
* interleave: ENVI BSQ/BIL/BIP all reduce to a reshape for the
  single-band images the reference reads; multi-band honors the
  interleave key.
"""

from __future__ import annotations

import re

import numpy as np

# ENVI data-type code → numpy dtype (reference reader.py:40-41, minus
# the removed np.byte/np.complex aliases)
_ENVI_DTYPES = {1: np.uint8, 2: np.int16, 3: np.int32, 4: np.float32,
                5: np.float64, 9: np.complex64, 12: np.uint16,
                13: np.uint32, 14: np.int64, 15: np.uint64}

SRTM_NODATA = -32768


def parse_hdr(text: str) -> dict:
    """ENVI header text → {x_size, y_size, dtype, bands, interleave,
    byte_order, gt_x0, gt_rx, gt_y0, gt_ry, proj, nodata}.

    map info = {proj, ref_x, ref_y, easting, northing, x_res, y_res, …}
    with (easting, northing) at the (ref_x, ref_y) PIXEL CENTER
    (1-based); the engine's gt_* anchor the top-left pixel CORNER —
    the same -res/2 / +res/2 shift the reference applies."""
    fields: dict = {"bands": 1, "interleave": "bsq", "byte_order": 0,
                    "gt_x0": None, "gt_rx": None, "gt_y0": None,
                    "gt_ry": None, "proj": None, "nodata": None}
    for line in text.splitlines():
        m = re.match(r"\s*([^=]+?)\s*=\s*(.+)\s*$", line)
        if not m:
            continue
        key = m.group(1).lower()
        value = m.group(2)
        if key == "samples":
            fields["x_size"] = int(value)
        elif key == "lines":
            fields["y_size"] = int(value)
        elif key == "bands":
            fields["bands"] = int(value)
        elif key == "data type":
            code = int(value)
            if code not in _ENVI_DTYPES:
                raise NotImplementedError(f"ENVI data type {code}")
            fields["dtype"] = np.dtype(_ENVI_DTYPES[code])
        elif key == "interleave":
            fields["interleave"] = value.strip().lower()
        elif key == "byte order":
            fields["byte_order"] = int(value)
        elif key == "data ignore value":
            fields["nodata"] = float(value)
        elif key == "map info":
            val = value.strip()
            if val.startswith("{"):
                val = val[1:-1]
            parts = [p.strip() for p in val.split(",")]
            fields["proj"] = parts[0]
            ref_x, ref_y = float(parts[1]), float(parts[2])
            east, north = float(parts[3]), float(parts[4])
            rx, ry = float(parts[5]), float(parts[6])
            fields["gt_rx"] = rx
            fields["gt_ry"] = ry
            # shift the referenced pixel center back to the image's
            # top-left pixel corner (ref_x/ref_y are 1-based)
            fields["gt_x0"] = east - (ref_x - 0.5) * rx
            fields["gt_y0"] = north + (ref_y - 0.5) * ry
    if "x_size" not in fields or "y_size" not in fields:
        raise ValueError("ENVI header missing samples/lines")
    if "dtype" not in fields:
        raise ValueError("ENVI header missing data type")
    return fields


def decode_envi(hdr_text: str, img: bytes):
    """(hdr text, raw img bytes) → (array, info). Single band → (h,w);
    multi-band → (h,w,bands) regardless of stored interleave."""
    f = parse_hdr(hdr_text)
    w, h, nb = f["x_size"], f["y_size"], f["bands"]
    dt = f["dtype"].newbyteorder(">" if f["byte_order"] else "<")
    arr = np.frombuffer(bytes(img), dtype=dt)
    if len(arr) < w * h * nb:
        raise ValueError("ENVI img shorter than samples*lines*bands")
    arr = arr[:w * h * nb]
    il = f["interleave"]
    if nb == 1:
        out = arr.reshape(h, w)
    elif il == "bsq":
        out = arr.reshape(nb, h, w).transpose(1, 2, 0)
    elif il == "bil":
        out = arr.reshape(h, nb, w).transpose(0, 2, 1)
    elif il == "bip":
        out = arr.reshape(h, w, nb)
    else:
        raise NotImplementedError(f"ENVI interleave {il!r}")
    info = {k: f[k] for k in ("gt_x0", "gt_rx", "gt_y0", "gt_ry",
                              "proj", "nodata")}
    return out.astype(f["dtype"]), info


_HGT_RE = re.compile(r"([NS])(\d{1,2})([EW])(\d{1,3})", re.IGNORECASE)


def decode_hgt(name: str, buf: bytes):
    """SRTM .hgt tile → (array int16, info). The grid is N×N big-endian
    int16, corner-registered: sample centers sit ON integer-degree
    lines, so the 1° tile spans N-1 intervals (res = 1/(N-1)) and gt_*
    anchor half a sample outside the named corner. The tile name
    (e.g. N44E005) is the LOWER-LEFT corner."""
    buf = bytes(buf)
    n2 = len(buf) // 2
    n = int(round(n2 ** 0.5))
    if n * n * 2 != len(buf) or n < 2:
        raise ValueError(f"not an SRTM hgt payload ({len(buf)} bytes)")
    m = _HGT_RE.search(name)
    if not m:
        raise ValueError(f"cannot parse tile corner from {name!r}")
    lat = int(m.group(2)) * (1 if m.group(1).upper() == "N" else -1)
    lon = int(m.group(4)) * (1 if m.group(3).upper() == "E" else -1)
    arr = np.frombuffer(buf, dtype=">i2").reshape(n, n).astype(np.int16)
    res = 1.0 / (n - 1)
    info = {"gt_x0": lon - res / 2, "gt_rx": res,
            "gt_y0": (lat + 1) + res / 2, "gt_ry": res,
            "proj": "latlon", "nodata": float(SRTM_NODATA)}
    return arr, info
