"""ISO-BMFF (MP4) container layer — probe, sample tables, frame
slicing — from scratch over blob columns.

What a 100 TB video-crawl pipeline actually does BEFORE any GPU decode
is container work: read ftyp/moov to get duration, codec fourcc,
resolution and frame count (``probe``); expand the stbl tables
(stts/stsz/stsc/stco/stss) into a per-sample (offset, size, dts,
keyframe) table (``sample_table``); and slice the selected encoded
frames out of mdat by offset (``extract_samples``).  All of that is
implemented here on the public ISO/IEC 14496-12 box layout, pure
bytes, no wheel.  Decoding the sliced payloads stays honest: the
engine's own ``rawg`` (raw grayscale) samples decode to arrays; avc1/
hev1/vp09 payloads raise NotImplementedError exactly like
media.decode_video (a motion-compensated video decoder is out of
proportion here — COVERAGE.md scope note).

A minimal single-track writer (``write_mp4``) emits conformant boxes
(non-trivial stsc chunking, stss keyframe marks, 16.16 fixed-point
tkhd dimensions) for fixtures and the interchange sink; the reader is
additionally exercised on streams the writer cannot produce (64-bit
co64, version-1 mvhd/mdhd) through hand-built boxes in the tests.

Reference parity note: gis-tools has no media ops; this serves the
brief's multimodal-pipeline scope (raster/media.py family).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


class Mp4Error(ValueError):
    pass


def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) at one nesting level."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise Mp4Error(f"bad box size {size} at {pos}")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, *path: bytes):
    """First box at `path` (e.g. b'moov', b'trak' descends one level per
    component); returns (payload_start, payload_end) or None."""
    lo, hi = start, end
    for comp in path:
        found = None
        for typ, a, b in _boxes(data, lo, hi):
            if typ == comp:
                found = (a, b)
                break
        if found is None:
            return None
        lo, hi = found
    return lo, hi


def _find_all(data: bytes, start: int, end: int, comp: bytes):
    return [(a, b) for typ, a, b in _boxes(data, start, end) if typ == comp]


def _fullbox(data: bytes, a: int) -> tuple[int, int]:
    """(version, first-field offset) of a full box payload at `a`."""
    return data[a], a + 4


def _mvhd_like(data: bytes, a: int, b: int) -> tuple[int, int]:
    """(timescale, duration) from mvhd/mdhd (versions 0 and 1)."""
    ver, p = _fullbox(data, a)
    if ver == 1:
        ts = int.from_bytes(data[p + 16:p + 20], "big")
        dur = int.from_bytes(data[p + 20:p + 28], "big")
    else:
        ts = int.from_bytes(data[p + 8:p + 12], "big")
        dur = int.from_bytes(data[p + 12:p + 16], "big")
    return ts, dur


def _u32s(data: bytes, a: int, n: int) -> np.ndarray:
    return np.frombuffer(data[a:a + 4 * n], dtype=">u4").astype(np.int64)


def probe(data: bytes) -> dict:
    """Container metadata: brand, movie duration, per-track codec /
    dimensions / sample count — no sample payload is touched."""
    data = bytes(data)
    top = list(_boxes(data, 0, len(data)))
    if not any(t == b"ftyp" for t, _, _ in top) or \
            not any(t == b"moov" for t, _, _ in top):
        raise Mp4Error("not an ISO-BMFF file (missing ftyp/moov)")
    ft = _find(data, 0, len(data), b"ftyp")
    brand = data[ft[0]:ft[0] + 4].decode("latin1")
    moov = _find(data, 0, len(data), b"moov")
    mvhd = _find(data, moov[0], moov[1], b"mvhd")
    ts, dur = _mvhd_like(data, *mvhd)
    tracks = []
    for ta, tb in _find_all(data, moov[0], moov[1], b"trak"):
        tkhd = _find(data, ta, tb, b"tkhd")
        ver, p = _fullbox(data, tkhd[0])
        tid_off = p + (16 if ver == 1 else 8)
        track_id = int.from_bytes(data[tid_off:tid_off + 4], "big")
        w = int.from_bytes(data[tkhd[1] - 8:tkhd[1] - 4], "big") / 65536.0
        h = int.from_bytes(data[tkhd[1] - 4:tkhd[1]], "big") / 65536.0
        mdia = _find(data, ta, tb, b"mdia")
        mts, mdur = _mvhd_like(data, *_find(data, mdia[0], mdia[1], b"mdhd"))
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        kind = data[hdlr[0] + 8:hdlr[0] + 12].decode("latin1")
        stbl = _find(data, mdia[0], mdia[1], b"minf", b"stbl")
        stsd = _find(data, stbl[0], stbl[1], b"stsd")
        codec, sw, sh = None, 0, 0
        n_entries = int.from_bytes(data[stsd[0] + 4:stsd[0] + 8], "big")
        if n_entries:
            ea = stsd[0] + 8
            codec = data[ea + 4:ea + 8].decode("latin1")
            if kind == "vide":
                sw = int.from_bytes(data[ea + 32:ea + 34], "big")
                sh = int.from_bytes(data[ea + 34:ea + 36], "big")
        stsz = _find(data, stbl[0], stbl[1], b"stsz")
        n_samples = int.from_bytes(data[stsz[0] + 8:stsz[0] + 12], "big")
        tracks.append({
            "track_id": track_id, "kind": kind, "codec": codec,
            "w": int(sw or round(w)), "h": int(sh or round(h)),
            "timescale": mts, "duration_s": mdur / mts if mts else 0.0,
            "n_samples": n_samples,
        })
    return {"brand": brand, "timescale": ts,
            "duration_s": dur / ts if ts else 0.0, "tracks": tracks}


def sample_table(data: bytes, track_id: int | None = None) -> dict:
    """Expand one track's stbl into per-sample arrays:
    offsets, sizes (int64), dts (in track timescale), keyframe flags.
    This is the exact mechanics a frame-sampling pipeline joins on."""
    data = bytes(data)
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4Error("missing moov")
    for ta, tb in _find_all(data, moov[0], moov[1], b"trak"):
        tkhd = _find(data, ta, tb, b"tkhd")
        ver, p = _fullbox(data, tkhd[0])
        tid_off = p + (16 if ver == 1 else 8)
        tid = int.from_bytes(data[tid_off:tid_off + 4], "big")
        if track_id is not None and tid != track_id:
            continue
        stbl = _find(data, ta, tb, b"mdia", b"minf", b"stbl")
        # sizes
        a, b = _find(data, stbl[0], stbl[1], b"stsz")
        fixed = int.from_bytes(data[a + 4:a + 8], "big")
        n = int.from_bytes(data[a + 8:a + 12], "big")
        sizes = (np.full(n, fixed, dtype=np.int64) if fixed
                 else _u32s(data, a + 12, n))
        # durations -> dts
        a, b = _find(data, stbl[0], stbl[1], b"stts")
        cnt = int.from_bytes(data[a + 4:a + 8], "big")
        runs = _u32s(data, a + 8, 2 * cnt).reshape(cnt, 2)
        deltas = np.repeat(runs[:, 1], runs[:, 0])[:n]
        dts = np.concatenate([[0], np.cumsum(deltas)[:-1]]).astype(np.int64)
        # chunk layout
        a, b = _find(data, stbl[0], stbl[1], b"stsc")
        cnt = int.from_bytes(data[a + 4:a + 8], "big")
        stsc = _u32s(data, a + 8, 3 * cnt).reshape(cnt, 3)
        co = _find(data, stbl[0], stbl[1], b"stco")
        if co is not None:
            ccnt = int.from_bytes(data[co[0] + 4:co[0] + 8], "big")
            chunk_off = _u32s(data, co[0] + 8, ccnt)
        else:
            co = _find(data, stbl[0], stbl[1], b"co64")
            if co is None:
                raise Mp4Error("missing stco/co64")
            ccnt = int.from_bytes(data[co[0] + 4:co[0] + 8], "big")
            chunk_off = np.frombuffer(
                data[co[0] + 8:co[0] + 8 + 8 * ccnt],
                dtype=">u8").astype(np.int64)
        # samples-per-chunk for every chunk (stsc runs until next entry)
        spc = np.empty(ccnt, dtype=np.int64)
        for i in range(len(stsc)):
            first = stsc[i, 0] - 1
            last = (stsc[i + 1, 0] - 1) if i + 1 < len(stsc) else ccnt
            spc[first:last] = stsc[i, 1]
        offsets = np.empty(n, dtype=np.int64)
        si = 0
        for ci in range(ccnt):
            k = int(min(spc[ci], n - si))
            if k <= 0:
                break
            offsets[si:si + k] = chunk_off[ci] + np.concatenate(
                [[0], np.cumsum(sizes[si:si + k])[:-1]])
            si += k
        if si != n:
            raise Mp4Error("stsc/stco tables cover %d of %d samples"
                           % (si, n))
        # keyframes
        key = np.zeros(n, dtype=bool)
        ss = _find(data, stbl[0], stbl[1], b"stss")
        if ss is None:
            key[:] = True                      # all sync per spec
        else:
            cnt = int.from_bytes(data[ss[0] + 4:ss[0] + 8], "big")
            key[_u32s(data, ss[0] + 8, cnt) - 1] = True
        return {"track_id": tid, "offsets": offsets, "sizes": sizes,
                "dts": dts, "keyframe": key}
    raise Mp4Error(f"track {track_id!r} not found")


def extract_samples(data: bytes, indices, track_id: int | None = None
                    ) -> list[bytes]:
    """Encoded sample payloads sliced straight out of mdat by offset."""
    data = bytes(data)
    st = sample_table(data, track_id)
    out = []
    for i in indices:
        o, s = int(st["offsets"][i]), int(st["sizes"][i])
        if o + s > len(data):
            raise Mp4Error(f"sample {i} extends past file end")
        out.append(data[o:o + s])
    return out


def sample_entry_config(data: bytes, fourcc: bytes,
                        track_id: int | None = None) -> bytes:
    """Payload of a codec-config child box (``hvcC``, ``avcC``, …)
    inside a track's stsd visual sample entry. Child boxes start after
    the 78 fixed VisualSampleEntry bytes (86 with the box header)."""
    data = bytes(data)
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4Error("missing moov")
    for ta, tb in _find_all(data, moov[0], moov[1], b"trak"):
        tkhd = _find(data, ta, tb, b"tkhd")
        ver, p = _fullbox(data, tkhd[0])
        tid_off = p + (16 if ver == 1 else 8)
        tid = int.from_bytes(data[tid_off:tid_off + 4], "big")
        if track_id is not None and tid != track_id:
            continue
        stsd = _find(data, ta, tb, b"mdia", b"minf", b"stbl", b"stsd")
        if stsd is None or int.from_bytes(data[stsd[0] + 4:stsd[0] + 8],
                                          "big") < 1:
            raise Mp4Error("missing stsd entry")
        ea = stsd[0] + 8
        esz = int.from_bytes(data[ea:ea + 4], "big")
        for typ, a, b in _boxes(data, ea + 86, ea + esz):
            if typ == fourcc:
                return data[a:b]
        raise Mp4Error(f"no {fourcc!r} box in sample entry")
    raise Mp4Error(f"track {track_id!r} not found")


# ------------------------------------------------------------------ writer

def write_mp4(frames: list[bytes], *, codec: str = "rawg", w: int, h: int,
              fps: float = 12.0, timescale: int = 1200,
              keyframe_every: int = 8, chunk_sizes=(3, 5),
              sample_entry_extra: bytes = b"") -> bytes:
    """Minimal single-video-track ISO-BMFF writer (fixtures + sink).
    Non-trivial chunking (alternating chunk sizes) and stss marks so
    the reader's stsc/stco/stss expansion is genuinely exercised.

    ``sample_entry_extra`` is appended inside the visual sample entry —
    the codec-config child box (e.g. a complete ``hvcC`` box for an
    ``hvc1`` track, built by raster/native_hevc.py)."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    n = len(frames)
    delta = int(round(timescale / fps))
    # layout chunks
    chunks, i, ci = [], 0, 0
    while i < n:
        k = chunk_sizes[ci % len(chunk_sizes)]
        chunks.append(list(range(i, min(i + k, n))))
        i += k
        ci += 1
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mdat payload + chunk offsets (known after ftyp; mdat follows moov,
    # so build moov with a placeholder, measure, then rebuild)
    sizes = [len(f) for f in frames]

    def build_moov(chunk_offsets):
        stts = box(b"stts", struct.pack(">IIII", 0, 1, n, delta))
        stsz = box(b"stsz", struct.pack(">III", 0, 0, n)
                   + b"".join(struct.pack(">I", s) for s in sizes))
        stsc_entries, prev = [], None
        for idx, ch in enumerate(chunks):
            if prev is None or len(ch) != prev:
                stsc_entries.append((idx + 1, len(ch), 1))
                prev = len(ch)
        stsc = box(b"stsc", struct.pack(">II", 0, len(stsc_entries))
                   + b"".join(struct.pack(">III", *e) for e in stsc_entries))
        stco = box(b"stco", struct.pack(">II", 0, len(chunk_offsets))
                   + b"".join(struct.pack(">I", o) for o in chunk_offsets))
        keys = list(range(1, n + 1, keyframe_every))
        stss = box(b"stss", struct.pack(">II", 0, len(keys))
                   + b"".join(struct.pack(">I", k) for k in keys))
        entry = (struct.pack(">I", 86 + len(sample_entry_extra))
                 + codec.encode("latin1")[:4].ljust(4)
                 + b"\x00" * 6 + struct.pack(">H", 1)
                 + b"\x00" * 16 + struct.pack(">HH", w, h)
                 + struct.pack(">II", 0x480000, 0x480000)
                 + struct.pack(">I", 0) + struct.pack(">H", 1)
                 + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
                 + sample_entry_extra)
        stsd = box(b"stsd", struct.pack(">II", 0, 1) + entry)
        stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
        url = box(b"url ", struct.pack(">I", 1))
        dref = box(b"dref", struct.pack(">II", 0, 1) + url)
        dinf = box(b"dinf", dref)
        vmhd = box(b"vmhd", struct.pack(">I", 1) + b"\x00" * 8)
        minf = box(b"minf", vmhd + dinf + stbl)
        dur = n * delta
        mdhd = box(b"mdhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
                   + struct.pack(">HH", 0x55C4, 0))
        hdlr = box(b"hdlr", struct.pack(">II", 0, 0) + b"vide"
                   + b"\x00" * 12 + b"gis_tools_spark\x00")
        mdia = box(b"mdia", mdhd + hdlr + minf)
        matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                             0x40000000)
        tkhd = box(b"tkhd", struct.pack(">IIIIII", 7, 0, 0, 1, 0, dur)
                   + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                   + matrix + struct.pack(">II", w << 16, h << 16))
        trak = box(b"trak", tkhd + mdia)
        mvhd = box(b"mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
                   + struct.pack(">IH", 0x10000, 0x0100) + b"\x00" * 10
                   + matrix + b"\x00" * 24 + struct.pack(">I", 2))
        return box(b"moov", mvhd + trak)

    moov_probe = build_moov([0] * len(chunks))
    mdat_payload = b"".join(frames)
    base = len(ftyp) + len(moov_probe) + 8      # mdat header
    offs, pos = [], base
    for ch in chunks:
        offs.append(pos)
        pos += sum(sizes[j] for j in ch)
    moov = build_moov(offs)
    assert len(moov) == len(moov_probe)
    return ftyp + moov + box(b"mdat", mdat_payload)


# ------------------------------------------------------------------ Spark operators

VIDEO_PROBE_SCHEMA = ("video_id string, ok boolean, brand string, "
                      "duration_s double, codec string, w int, h int, "
                      "n_frames int, n_key int")


def video_probe(df, *, blob_col: str = "bytes", id_col: str = "video_id"):
    """Container-level metadata extraction over a blob table — the op a
    crawl pipeline runs on every video BEFORE spending GPU decode.
    Corrupt rows marked ok=false, never fatal."""
    import pandas as pd

    def _run(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[blob_col]):
                vid = str(vid)
                try:
                    info = probe(bytes(blob))
                    v = next((t for t in info["tracks"]
                              if t["kind"] == "vide"), None)
                    if v is None:
                        raise Mp4Error("no video track")
                    st = sample_table(bytes(blob), v["track_id"])
                    rows.append((vid, True, info["brand"],
                                 float(v["duration_s"]), v["codec"],
                                 int(v["w"]), int(v["h"]),
                                 int(v["n_samples"]),
                                 int(st["keyframe"].sum())))
                except (Mp4Error, ValueError, IndexError, struct.error):
                    rows.append((vid, False, None, 0.0, None, 0, 0, 0, 0))
            yield pd.DataFrame(rows, columns=[
                "video_id", "ok", "brand", "duration_s", "codec", "w", "h",
                "n_frames", "n_key"])

    return df.select(id_col, blob_col).mapInPandas(
        _run, schema=VIDEO_PROBE_SCHEMA)
