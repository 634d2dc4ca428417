"""EXIF APP1 reader/writer for JPEG image tables (pure stdlib+struct).

The engine's input model is a geotagged image+caption table; in the
wild the geotag lives in the JPEG itself as an EXIF APP1 segment — a
little-endian TIFF stream whose IFD0 links an Exif sub-IFD (capture
time) and a GPS IFD (lat/lon/alt as degree/minute/second RATIONALs
with N/S/E/W refs, EXIF 2.3 §4.6.6).  This module writes and parses
that segment from scratch, reusing the repo's TIFF IFD reader
(raster/geotiff.py:_read_ifd_at) for the parse side.

The reference reads geo metadata through GDAL's header scan
(/root/reference/gistools/raster.py:158-165); here the same job is a
pure-Python byte walk so a 10^12-row table can geotag-extract in Arrow
batches without any native dependency.

Exactness contract (drives the driver gate): ``build_exif`` encodes
latitude/longitude from integer microdegrees ``u`` as
``(deg, 1) (0, 1) (9*rem, 2500)`` — exact rationals, since
``rem`` microdegrees = ``9*rem/2500`` arc-seconds.  The parser's
``deg + min/60 + sec/3600`` double arithmetic lands within 3 ulp of
``u/1e6``, so ``floor(lat*1e6 + 0.5)`` recovers ``u`` EXACTLY.
"""

from __future__ import annotations

import struct

from .geotiff import _read_ifd_at

# IFD0 tags
_T_ORIENTATION = 274
_T_DATETIME = 306
_T_EXIF_IFD = 34665
_T_GPS_IFD = 34853
# Exif sub-IFD
_T_DT_ORIGINAL = 36867
# GPS IFD
_T_LAT_REF, _T_LAT = 1, 2
_T_LON_REF, _T_LON = 3, 4
_T_ALT_REF, _T_ALT = 5, 6

_TIFF_LE = b"II*\x00\x08\x00\x00\x00"


def _dms_rationals(udeg: int) -> tuple:
    """|microdegrees| -> ((d,1),(0,1),(9*rem,2500)) exact DMS."""
    d, rem = divmod(abs(int(udeg)), 1_000_000)
    return ((d, 1), (0, 1), (9 * rem, 2500))


class _IfdWriter:
    """One little-endian classic-TIFF IFD with a trailing value heap.

    Entries must be added in ascending tag order (TIFF requirement).
    ``place(off)`` resolves heap offsets once the IFD's absolute
    position inside the TIFF stream is known.
    """

    def __init__(self):
        self.entries: list[tuple[int, int, int, bytes, bool]] = []

    def add(self, tag: int, typ: int, values) -> None:
        if typ == 2:                       # ASCII
            raw = values.encode("latin1") + b"\x00"
            cnt = len(raw)
        elif typ == 5:                     # RATIONAL pairs
            cnt = len(values)
            raw = b"".join(struct.pack("<II", n, d) for n, d in values)
        elif typ == 3:                     # SHORT
            cnt = len(values)
            raw = struct.pack("<%dH" % cnt, *values)
        elif typ == 4:                     # LONG
            cnt = len(values)
            raw = struct.pack("<%dI" % cnt, *values)
        elif typ == 1:                     # BYTE
            cnt = len(values)
            raw = bytes(values)
        else:
            raise ValueError(f"unsupported TIFF type {typ}")
        self.entries.append((tag, typ, cnt, raw, len(raw) > 4))

    def size(self) -> int:
        heap = sum(len(r) + (len(r) & 1) for *_, r, big in self.entries
                   if big)
        return 2 + 12 * len(self.entries) + 4 + heap

    def place(self, off: int) -> bytes:
        """Serialize with the IFD starting at absolute offset ``off``."""
        body = struct.pack("<H", len(self.entries))
        heap = bytearray()
        heap_base = off + 2 + 12 * len(self.entries) + 4
        for tag, typ, cnt, raw, big in self.entries:
            if big:
                voff = heap_base + len(heap)
                heap.extend(raw)
                if len(heap) & 1:
                    heap.append(0)
                body += struct.pack("<HHII", tag, typ, cnt, voff)
            else:
                body += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(
                    4, b"\x00")
        body += struct.pack("<I", 0)       # next-IFD = none
        return body + bytes(heap)


def build_exif(*, lat_udeg: int | None = None, lon_udeg: int | None = None,
               alt_mm: int | None = None, dt: str | None = None,
               orientation: int | None = None) -> bytes:
    """EXIF APP1 segment (marker + length + Exif\\0\\0 + TIFF stream).

    ``lat_udeg``/``lon_udeg`` are signed integer MICRODEGREES (exact
    round-trip — see module docstring), ``alt_mm`` integer millimetres
    above (>=0) / below (<0) sea level, ``dt`` an EXIF
    'YYYY:MM:DD HH:MM:SS' string stored as both DateTime and
    DateTimeOriginal, ``orientation`` the EXIF 1-8 code.
    """
    ifd0, exif, gps = _IfdWriter(), _IfdWriter(), _IfdWriter()
    if orientation is not None:
        ifd0.add(_T_ORIENTATION, 3, (int(orientation),))
    if dt is not None:
        ifd0.add(_T_DATETIME, 2, dt)
        exif.add(_T_DT_ORIGINAL, 2, dt)
    if lat_udeg is not None and lon_udeg is not None:
        gps.add(_T_LAT_REF, 2, "N" if lat_udeg >= 0 else "S")
        gps.add(_T_LAT, 5, _dms_rationals(lat_udeg))
        gps.add(_T_LON_REF, 2, "E" if lon_udeg >= 0 else "W")
        gps.add(_T_LON, 5, _dms_rationals(lon_udeg))
    if alt_mm is not None:
        gps.add(_T_ALT_REF, 1, (0 if alt_mm >= 0 else 1,))
        gps.add(_T_ALT, 5, ((abs(int(alt_mm)), 1000),))
    # IFD0 links the sub-IFDs by absolute TIFF offset: lay out
    # IFD0 | Exif IFD | GPS IFD after the 8-byte TIFF header.
    have_exif, have_gps = bool(exif.entries), bool(gps.entries)
    # sub-IFD pointer entries must be counted before sizing IFD0
    if have_exif:
        ifd0.add(_T_EXIF_IFD, 4, (0,))
    if have_gps:
        ifd0.add(_T_GPS_IFD, 4, (0,))
    off0 = 8
    off_exif = off0 + ifd0.size()
    off_gps = off_exif + (exif.size() if have_exif else 0)
    # patch the pointer values now that offsets are known
    fixed = []
    for tag, typ, cnt, raw, big in ifd0.entries:
        if tag == _T_EXIF_IFD:
            raw = struct.pack("<I", off_exif)
        elif tag == _T_GPS_IFD:
            raw = struct.pack("<I", off_gps)
        fixed.append((tag, typ, cnt, raw, big))
    ifd0.entries = sorted(fixed)           # TIFF: ascending tag order
    tiff = _TIFF_LE + ifd0.place(off0)
    if have_exif:
        tiff += exif.place(off_exif)
    if have_gps:
        tiff += gps.place(off_gps)
    payload = b"Exif\x00\x00" + tiff
    return b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment right after SOI (EXIF 2.3 placement)."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def geotag(jpeg: bytes, *, lat_udeg: int, lon_udeg: int,
           alt_mm: int | None = None, dt: str | None = None,
           orientation: int | None = None) -> bytes:
    """Convenience: build + insert in one call."""
    return insert_app1(jpeg, build_exif(
        lat_udeg=lat_udeg, lon_udeg=lon_udeg, alt_mm=alt_mm, dt=dt,
        orientation=orientation))


def _find_app1(jpeg: bytes) -> bytes | None:
    """Marker walk to the first APP1 whose payload is Exif\\0\\0."""
    if jpeg[:2] != b"\xFF\xD8":
        return None
    pos, n = 2, len(jpeg)
    while pos < n - 3:
        if jpeg[pos] != 0xFF:
            return None                    # desynced: not a marker
        marker = jpeg[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):         # EOI / entropy data: stop
            return None
        ln = int.from_bytes(jpeg[pos + 2:pos + 4], "big")
        if marker == 0xE1 and jpeg[pos + 4:pos + 10] == b"Exif\x00\x00":
            return jpeg[pos + 10:pos + 2 + ln]
        pos += 2 + ln
    return None


def _sub_ifd(tiff: bytes, bo: str, ifd0: dict, tag: int) -> dict:
    off = ifd0.get(tag)
    if not off:
        return {}
    try:
        return _read_ifd_at(tiff, bo, False, int(off[0]))[0]
    except (ValueError, struct.error):
        return {}


def parse_exif(jpeg: bytes) -> dict:
    """Parse geotag metadata out of a JPEG's EXIF APP1.

    Returns {'lat': float|None, 'lon': float|None, 'alt_m': float|None,
    'dt': str|None, 'orientation': int|None}; all-None when the image
    has no (well-formed) EXIF.  Never raises on arbitrary bytes.
    """
    out = {"lat": None, "lon": None, "alt_m": None, "dt": None,
           "orientation": None}
    try:
        tiff = _find_app1(bytes(jpeg))
        if tiff is None or len(tiff) < 8:
            return out
        if tiff[:4] == b"II*\x00":
            bo = "<"
        elif tiff[:4] == b"MM\x00*":
            bo = ">"
        else:
            return out
        off0 = struct.unpack(bo + "I", tiff[4:8])[0]
        ifd0 = _read_ifd_at(tiff, bo, False, off0)[0]
    except (ValueError, struct.error, IndexError):
        return out
    if _T_ORIENTATION in ifd0:
        out["orientation"] = int(ifd0[_T_ORIENTATION][0])
    if _T_DATETIME in ifd0:
        out["dt"] = str(ifd0[_T_DATETIME][0])
    sub = _sub_ifd(tiff, bo, ifd0, _T_EXIF_IFD)
    if _T_DT_ORIGINAL in sub:
        out["dt"] = str(sub[_T_DT_ORIGINAL][0])
    gps = _sub_ifd(tiff, bo, ifd0, _T_GPS_IFD)
    try:
        if _T_LAT in gps and _T_LON in gps:
            d, m, s = (list(gps[_T_LAT]) + [0.0, 0.0])[:3]
            lat = d + m / 60.0 + s / 3600.0
            if str(gps.get(_T_LAT_REF, ("N",))[0]).upper().startswith("S"):
                lat = -lat
            d, m, s = (list(gps[_T_LON]) + [0.0, 0.0])[:3]
            lon = d + m / 60.0 + s / 3600.0
            if str(gps.get(_T_LON_REF, ("E",))[0]).upper().startswith("W"):
                lon = -lon
            out["lat"], out["lon"] = float(lat), float(lon)
        if _T_ALT in gps:
            alt = float(gps[_T_ALT][0])
            ref = gps.get(_T_ALT_REF, (0,))[0]
            out["alt_m"] = -alt if ref in (1, b"\x01") else alt
    except (TypeError, ValueError, IndexError):
        pass
    return out
