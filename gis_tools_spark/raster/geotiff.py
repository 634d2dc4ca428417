"""From-scratch GeoTIFF codec — pure numpy/stdlib, no GDAL wheel.

The reference reads every raster through GDAL's GeoTIFF driver
(/root/reference/gistools/raster.py:158-165 gdal.Open → ReadAsArray,
raster.py:99-141 windowed reads); this module closes that surface for
the engine's raster-tile model (image_id, bytes, w, h, fmt, gt_*):
``decode`` returns the pixel array plus the georeferencing parsed from
the GeoTIFF tags, ``encode`` writes a classic little-endian GeoTIFF any
conformant reader (GDAL, libtiff, QGIS) opens.

Reader — classic TIFF, II and MM byte orders:
  * striped and tiled layouts, chunky (PlanarConfig=1) samples
  * compressions: none (1), LZW (5, TIFF flavor with early change),
    deflate (8 and the legacy 32946), PackBits (32773)
  * predictors: none (1), horizontal differencing (2), floating-point
    byte-split differencing (3)
  * dtypes: uint8/16/32, int8/16/32, float32/64 via
    BitsPerSample x SampleFormat
  * geo: ModelPixelScale+ModelTiepoint or ModelTransformation →
    GDAL-style (x0, rx, 0, y0, 0, -ry); GeoKeyDirectory → EPSG
    (GeographicType 2048 / ProjectedCSType 3072); GDAL_NODATA
  * BigTIFF (43-magic, 8-byte offsets, LONG8/SLONG8/IFD8) — the
    layout 100 TB-era rasters actually ship — both read and written
    (encode(bigtiff=True)); planar (PlanarConfig=2) and
    subsampled-YCbCr raise NotImplementedError — honest limits,
    never a garbage parse.

Writer — classic little-endian, single IFD, strips: none or deflate,
1- or 3-sample, all reader dtypes, ModelPixelScale/Tiepoint +
GeoKeyDirectory (geographic or projected EPSG) + GDAL_NODATA.

Conformance is tested both directions against the system libtiff via
ctypes (tests/test_geotiff.py): libtiff reads this writer's files
pixel-exactly, and this reader reads libtiff-written files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF tag ids
_T_WIDTH, _T_LENGTH, _T_BPS, _T_COMP, _T_PHOTO = 256, 257, 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_RPS, _T_STRIP_CNT = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR, _T_SFMT = 284, 317, 339
_T_TILE_W, _T_TILE_L, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_PIXSCALE, _T_TIEPOINT, _T_TRANSFORM = 33550, 33922, 34264
_T_GEOKEYS, _T_GEODOUBLES, _T_GEOASCII = 34735, 34736, 34737
_T_GDAL_NODATA = 42113

_TYPE_FMT = {1: "B", 2: "s", 3: "H", 4: "I", 5: "II", 6: "b", 7: "B",
             8: "h", 9: "i", 10: "ii", 11: "f", 12: "d",
             16: "Q", 17: "q", 18: "Q"}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8, 16: 8, 17: 8, 18: 8}


def _sniff(buf: bytes):
    """TIFF header → (byte order, is_bigtiff). Classic 42 and BigTIFF
    43 headers (BigTIFF: 8-byte offsets, 20-byte IFD entries)."""
    if buf[:4] == b"II*\0":
        return "<", False
    if buf[:4] == b"MM\0*":
        return ">", False
    if buf[:2] == b"II" and buf[2:4] == b"+\0":
        bo = "<"
    elif buf[:2] == b"MM" and buf[2:4] == b"\0+":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    if struct.unpack(bo + "HH", buf[4:8]) != (8, 0):
        raise ValueError("malformed BigTIFF header")
    return bo, True


def _read_ifd(buf: bytes, bo: str, big: bool = False):
    """First IFD → {tag: tuple(values)} (rationals as float). Handles
    classic (12-byte entries, 4-byte offsets) and BigTIFF (20-byte
    entries, 8-byte offsets, LONG8/SLONG8/IFD8 types)."""
    if big:
        off = struct.unpack(bo + "Q", buf[8:16])[0]
        if off + 8 > len(buf):
            raise ValueError("truncated TIFF (no IFD)")
        n = struct.unpack(bo + "Q", buf[off:off + 8])[0]
        ent0, esz, inline = off + 8, 20, 8
    else:
        off = struct.unpack(bo + "I", buf[4:8])[0]
        if off + 2 > len(buf):
            raise ValueError("truncated TIFF (no IFD)")
        n = struct.unpack(bo + "H", buf[off:off + 2])[0]
        ent0, esz, inline = off + 2, 12, 4
    if ent0 + esz * n > len(buf):
        raise ValueError("truncated TIFF (IFD overruns buffer)")
    tags: dict[int, tuple] = {}
    for i in range(n):
        e = ent0 + esz * i
        if big:
            tag, typ, cnt = struct.unpack(bo + "HHQ", buf[e:e + 12])
        else:
            tag, typ, cnt = struct.unpack(bo + "HHI", buf[e:e + 8])
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * cnt
        vpos = e + (12 if big else 8)
        voff = vpos if size <= inline else struct.unpack(
            bo + ("Q" if big else "I"), buf[vpos:vpos + inline])[0]
        raw = buf[voff:voff + size]
        if len(raw) < size:
            raise ValueError(f"truncated TIFF tag {tag}")
        if typ == 2:
            tags[tag] = (raw.split(b"\0")[0].decode("latin1"),)
        elif typ in (5, 10):
            pairs = struct.unpack(bo + "%d%s" % (2 * cnt,
                                                 _TYPE_FMT[typ][0]), raw)
            tags[tag] = tuple(pairs[2 * k] / (pairs[2 * k + 1] or 1)
                              for k in range(cnt))
        else:
            tags[tag] = struct.unpack(bo + "%d%s" % (cnt, _TYPE_FMT[typ]),
                                      raw)
    return tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW: MSB-first codes, CLEAR=256, EOI=257, code width
    grows at 510/1022/2046 (early change)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))

    reset()
    width = 9
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                reset()
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            prev = entry
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i:i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _undo_predictor(raw: np.ndarray, predictor: int, rows: int, cols: int,
                    spp: int, dtype: np.dtype, bo: str) -> np.ndarray:
    """raw uint8 bytes of one chunk → (rows, cols, spp) array."""
    itemsize = dtype.itemsize
    if predictor == 3:
        # floating-point predictor: per row, undo byte differencing then
        # de-interleave the byte planes (MSB plane first)
        b = raw.reshape(rows, cols * spp * itemsize)
        b = np.cumsum(b.astype(np.uint16), axis=1).astype(np.uint8)
        planes = b.reshape(rows, itemsize, cols * spp)
        be = np.ascontiguousarray(planes.transpose(0, 2, 1))
        arr = np.frombuffer(be.tobytes(),
                            dtype=np.dtype(dtype).newbyteorder(">"))
        return arr.reshape(rows, cols, spp).astype(dtype)
    arr = np.frombuffer(raw.tobytes(),
                        dtype=np.dtype(dtype).newbyteorder(
                            "<" if bo == "<" else ">"))
    arr = arr.reshape(rows, cols, spp).astype(dtype)
    if predictor == 2:
        if dtype.kind == "f":
            raise ValueError("predictor 2 on float samples")
        arr = np.cumsum(arr.astype(np.int64), axis=1)
        arr = arr.astype(dtype)
    return arr


def _dtype_of(bps: int, sfmt: int) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None:
        raise NotImplementedError(f"SampleFormat {sfmt}")
    try:
        return np.dtype(f"{kind}{bps // 8}")
    except TypeError:
        raise NotImplementedError(f"{bps}-bit SampleFormat {sfmt}")


def read_info(buf: bytes) -> dict:
    """Header-only parse: {w, h, spp, dtype, gt_x0, gt_rx, gt_y0, gt_ry,
    epsg, nodata} without touching (or decompressing) a single pixel —
    the ingest path of a 100 TB tile table reads tags, not rasters."""
    buf = bytes(buf)
    bo, big = _sniff(buf)
    t = _read_ifd(buf, bo, big)
    bps = int(t.get(_T_BPS, (1,))[0])
    sfmt = int(t.get(_T_SFMT, (1,))[0])
    info = {"w": int(t[_T_WIDTH][0]), "h": int(t[_T_LENGTH][0]),
            "spp": int(t.get(_T_SPP, (1,))[0]),
            "dtype": str(_dtype_of(bps, sfmt)),
            "gt_x0": None, "gt_rx": None, "gt_y0": None, "gt_ry": None,
            "epsg": None, "nodata": None}
    _geo_info(t, info)
    return info


def _geo_info(t: dict, info: dict) -> None:
    if _T_TRANSFORM in t:
        m = t[_T_TRANSFORM]
        info.update(gt_x0=m[3], gt_rx=m[0], gt_y0=m[7], gt_ry=-m[5])
    elif _T_PIXSCALE in t and _T_TIEPOINT in t:
        sx, sy = t[_T_PIXSCALE][0], t[_T_PIXSCALE][1]
        i, j, _k, x, y = t[_T_TIEPOINT][:5]
        info.update(gt_x0=x - i * sx, gt_rx=sx, gt_y0=y + j * sy, gt_ry=sy)
    if _T_GEOKEYS in t:
        keys = t[_T_GEOKEYS]
        for k in range(4, len(keys), 4):
            kid, loc, _cnt, val = keys[k:k + 4]
            if kid in (2048, 3072) and loc == 0 and val not in (0, 32767):
                info["epsg"] = int(val)
    if _T_GDAL_NODATA in t:
        try:
            info["nodata"] = float(t[_T_GDAL_NODATA][0])
        except ValueError:
            pass


def decode(buf: bytes):
    """GeoTIFF bytes → (array, info) where array is (h, w) or (h, w, spp)
    and info = {gt_x0, gt_rx, gt_y0, gt_ry, epsg, nodata} (None where
    the file carries no such tag)."""
    buf = bytes(buf)
    bo, big = _sniff(buf)
    t = _read_ifd(buf, bo, big)
    w = int(t[_T_WIDTH][0])
    h = int(t[_T_LENGTH][0])
    spp = int(t.get(_T_SPP, (1,))[0])
    bps = int(t.get(_T_BPS, (1,))[0])
    if any(b != bps for b in t.get(_T_BPS, (bps,))):
        raise NotImplementedError("mixed BitsPerSample")
    sfmt = int(t.get(_T_SFMT, (1,))[0])
    comp = int(t.get(_T_COMP, (1,))[0])
    planar = int(t.get(_T_PLANAR, (1,))[0])
    predictor = int(t.get(_T_PREDICTOR, (1,))[0])
    photo = int(t.get(_T_PHOTO, (1,))[0])
    if planar != 1:
        raise NotImplementedError("PlanarConfig=2 (separate planes)")
    if photo == 6:
        raise NotImplementedError("YCbCr TIFF")
    if bps < 8:
        raise NotImplementedError(f"{bps}-bit samples")
    dtype = _dtype_of(bps, sfmt)

    def _chunk(raw: bytes) -> bytes:
        if comp == 1:
            return raw
        if comp in (8, 32946):
            return zlib.decompress(raw)
        if comp == 5:
            return _lzw_decode(raw)
        if comp == 32773:
            return _packbits_decode(raw)
        raise NotImplementedError(f"TIFF compression {comp}")

    if _T_TILE_OFF in t:
        tw = int(t[_T_TILE_W][0])
        tl = int(t[_T_TILE_L][0])
        offs, cnts = t[_T_TILE_OFF], t[_T_TILE_CNT]
        ntx = -(-w // tw)
        nty = -(-h // tl)
        if len(offs) < ntx * nty:
            raise ValueError("tile table shorter than grid")
        out = np.zeros((nty * tl, ntx * tw, spp), dtype=dtype)
        for ty in range(nty):
            for tx in range(ntx):
                i = ty * ntx + tx
                raw = np.frombuffer(_chunk(buf[offs[i]:offs[i] + cnts[i]]),
                                    dtype=np.uint8)
                need = tl * tw * spp * dtype.itemsize
                if len(raw) < need:
                    raw = np.concatenate([raw, np.zeros(need - len(raw),
                                                        np.uint8)])
                out[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = \
                    _undo_predictor(raw[:need], predictor, tl, tw, spp,
                                    dtype, bo)
        arr = out[:h, :w]
    else:
        rps = int(t.get(_T_RPS, (h,))[0]) or h
        offs, cnts = t[_T_STRIP_OFF], t[_T_STRIP_CNT]
        parts = []
        done = 0
        for i in range(len(offs)):
            rows = min(rps, h - done)
            if rows <= 0:
                break
            raw = np.frombuffer(_chunk(buf[offs[i]:offs[i] + cnts[i]]),
                                dtype=np.uint8)
            need = rows * w * spp * dtype.itemsize
            if len(raw) < need:
                raise ValueError("strip shorter than its row span")
            parts.append(_undo_predictor(raw[:need], predictor, rows, w,
                                         spp, dtype, bo))
            done += rows
        if done < h:
            raise ValueError("strips cover fewer rows than ImageLength")
        arr = np.concatenate(parts, axis=0)
    if spp == 1:
        arr = arr[:, :, 0]

    info = {"gt_x0": None, "gt_rx": None, "gt_y0": None, "gt_ry": None,
            "epsg": None, "nodata": None}
    _geo_info(t, info)
    return arr, info


# ------------------------------------------------------------------ encode

def _entry(tag: int, typ: int, values, heap: bytearray, heap_base: int):
    fmt = _TYPE_FMT[typ]
    if typ == 2:
        raw = values.encode("latin1") + b"\0"
        cnt = len(raw)
    else:
        cnt = len(values)
        raw = struct.pack("<%d%s" % (cnt, fmt), *values)
    if len(raw) <= 4:
        return struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
    off = heap_base + len(heap)
    heap.extend(raw)
    if len(heap) & 1:
        heap.append(0)
    return struct.pack("<HHII", tag, typ, cnt, off)


def _entry_big(tag: int, typ: int, values, heap: bytearray,
               heap_base: int):
    """BigTIFF 20-byte IFD entry (8-byte count + inline value)."""
    fmt = _TYPE_FMT[typ]
    if typ == 2:
        raw = values.encode("latin1") + b"\0"
        cnt = len(raw)
    else:
        cnt = len(values)
        raw = struct.pack("<%d%s" % (cnt, fmt), *values)
    if len(raw) <= 8:
        return struct.pack("<HHQ", tag, typ, cnt) + raw.ljust(8, b"\0")
    off = heap_base + len(heap)
    heap.extend(raw)
    if len(heap) & 1:
        heap.append(0)
    return struct.pack("<HHQQ", tag, typ, cnt, off)


def encode(arr: np.ndarray, gt: tuple | None = None,
           epsg: int | None = None, nodata: float | None = None,
           compression: str = "deflate", bigtiff: bool = False) -> bytes:
    """(h,w) or (h,w,spp) array → little-endian GeoTIFF (classic, or
    BigTIFF with ``bigtiff=True`` — 8-byte offsets, LONG8 strip
    tables; the container huge mosaics need).

    gt is the engine's (gt_x0, gt_rx, gt_y0, gt_ry) — north-up GDAL
    transform; epsg 4326-style geographic codes land in GeographicType,
    others in ProjectedCSType."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w, spp = arr.shape
    dtype = arr.dtype
    if dtype.kind not in "uif" or dtype.itemsize not in (1, 2, 4, 8):
        raise ValueError(f"unsupported dtype {dtype}")
    sfmt = {"u": 1, "i": 2, "f": 3}[dtype.kind]
    arr = np.ascontiguousarray(arr.astype(dtype.newbyteorder("<")))

    # strips of ~256 KB (whole rows)
    rps = max(1, min(h, (256 << 10) // max(1, w * spp * dtype.itemsize)))
    strips = []
    for r0 in range(0, h, rps):
        raw = arr[r0:r0 + rps].tobytes()
        strips.append(zlib.compress(raw, 6)
                      if compression == "deflate" else raw)
    comp = 8 if compression == "deflate" else 1

    if bigtiff:
        header = b"II+\0" + struct.pack("<HH", 8, 0) + struct.pack("<Q", 16)
    else:
        header = b"II*\0" + struct.pack("<I", 8)
    off_typ = 16 if bigtiff else 4
    # lay out: header | IFD | heap | strip data
    tags = [
        (_T_WIDTH, 3, (w,)), (_T_LENGTH, 3, (h,)),
        (_T_BPS, 3, (dtype.itemsize * 8,) * spp),
        (_T_COMP, 3, (comp,)),
        (_T_PHOTO, 3, (2 if spp >= 3 else 1,)),
        (_T_STRIP_OFF, off_typ, [0] * len(strips)),   # patched below
        (_T_SPP, 3, (spp,)), (_T_RPS, 3, (rps,)),
        (_T_STRIP_CNT, off_typ, [len(s) for s in strips]),
        (_T_PLANAR, 3, (1,)), (_T_SFMT, 3, (sfmt,) * spp),
    ]
    if gt is not None:
        x0, rx, y0, ry = gt
        tags.append((_T_PIXSCALE, 12, (float(rx), float(ry), 0.0)))
        tags.append((_T_TIEPOINT, 12,
                     (0.0, 0.0, 0.0, float(x0), float(y0), 0.0)))
    if epsg is not None:
        geographic = 4000 <= epsg < 5000
        keys = [1, 1, 0, 3,
                1024, 0, 1, (2 if geographic else 1),
                1025, 0, 1, 1]
        keys += ([2048, 0, 1, epsg] if geographic
                 else [3072, 0, 1, epsg])
        tags.append((_T_GEOKEYS, 3, keys))
    if nodata is not None:
        tags.append((_T_GDAL_NODATA, 2, repr(float(nodata))))
    tags.sort(key=lambda e: e[0])

    nifd = len(tags)
    if bigtiff:
        ifd_size = 8 + 20 * nifd + 8
        heap_base = 16 + ifd_size
    else:
        ifd_size = 2 + 12 * nifd + 4
        heap_base = 8 + ifd_size
    # strip offsets depend on the total heap size, which is fixed by the
    # entry COUNT/SIZES alone: write a zero placeholder first (same byte
    # size as the real array), then patch once data_base is known
    heap = bytearray()
    entries = []
    strip_entry_idx = None
    strip_heap_pos = None
    for i, (tag, typ, vals) in enumerate(tags):
        if tag == _T_STRIP_OFF:
            strip_entry_idx = i
            if len(strips) > 1:      # single offset fits inline
                strip_heap_pos = len(heap)
        entries.append((_entry_big if bigtiff else _entry)(
            tag, typ, vals, heap, heap_base))
    data_base = heap_base + len(heap)
    offs = []
    pos = data_base
    for s in strips:
        offs.append(pos)
        pos += len(s) + (len(s) & 1)
    osz = 8 if bigtiff else 4
    ofmt = "Q" if bigtiff else "I"
    if strip_heap_pos is None:
        if bigtiff:
            entries[strip_entry_idx] = struct.pack(
                "<HHQQ", _T_STRIP_OFF, off_typ, 1, offs[0])
        else:
            entries[strip_entry_idx] = struct.pack(
                "<HHII", _T_STRIP_OFF, off_typ, 1, offs[0])
    else:
        heap[strip_heap_pos:strip_heap_pos + osz * len(offs)] = \
            struct.pack("<%d%s" % (len(offs), ofmt), *offs)

    out = bytearray(header)
    out += struct.pack("<Q" if bigtiff else "<H", nifd)
    for e in entries:
        out += e
    out += struct.pack("<" + ofmt, 0)    # no next IFD
    out += heap
    for s in strips:
        out += s
        if len(s) & 1:
            out += b"\0"
    return bytes(out)
