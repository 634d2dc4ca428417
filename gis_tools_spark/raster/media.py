"""Multimodal media operators for large-scale training-data pipelines:
image resize, video frame sampling, audio feature extraction.

These go beyond the reference's raster surface (closest analog:
``RasterMap.gdal_resample`` /root/reference/gistools/raster.py:303-327,
which resizes geo-rasters) — the build brief asks for the media ops a
100 TB multimodal pipeline needs. Design rules:

* media payloads are opaque ``binary`` columns with typed metadata
  (w/h/fmt, n_frames/fps, sample_rate) — one row per asset;
* every kernel is an Arrow-batched ``mapInPandas`` with an explicit
  output schema, so the plumbing (partitioning, batch shape, schema)
  is exactly what a real cluster runs;
* decode is REAL for the engine's own codecs (raw/raw_f32/png/dct/
  jpeg/webp images, ``rawvid`` concatenated-frame video, mp4 ``hvc1``
  all-intra HEVC via raster/native_hevc.py (libde265),
  ``pcm_f32``/``pcm_s16``/mp3 audio) and raises a clearly-marked
  ``NotImplementedError`` for wheel-bound codecs (h264/vp9/flac) —
  the Spark-side plumbing is identical either way.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codec

# ------------------------------------------------------------------ resize

def resize_array(a: np.ndarray, out_w: int, out_h: int,
                 method: str = "bilinear") -> np.ndarray:
    """Resize a (h,w) or (h,w,c) array. ``nearest`` = pixel-center
    nearest neighbor; ``bilinear`` = edge-clamped pixel-center bilinear
    (the OpenCV/PIL convention: src = (dst+0.5)*scale - 0.5)."""
    h, w = a.shape[:2]
    if method == "nearest":
        ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
        xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
        return a[ys][:, xs]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    wy = np.clip(ys - y0, 0.0, 1.0)
    wx = np.clip(xs - x0, 0.0, 1.0)
    y0c = np.clip(y0, 0, h - 1); y1c = np.clip(y0 + 1, 0, h - 1)
    x0c = np.clip(x0, 0, w - 1); x1c = np.clip(x0 + 1, 0, w - 1)
    f = a.astype(np.float64)
    if a.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]
    top = f[y0c][:, x0c] * (1 - wx) + f[y0c][:, x1c] * wx
    bot = f[y1c][:, x0c] * (1 - wx) + f[y1c][:, x1c] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(a.dtype, np.integer):
        return np.clip(np.floor(out + 0.5), 0, 255).astype(a.dtype)
    return out.astype(a.dtype)


def resize_images(df: DataFrame, out_w: int, out_h: int, *,
                  method: str = "bilinear", fmt_out: str | None = None) -> DataFrame:
    """Decode → resize → re-encode each image row; w/h/phash refreshed.
    Input schema must carry (bytes, w, h, fmt); all other columns pass
    through. Rows whose payload fails to decode are DROPPED (marked by
    absence, same policy as verify_images_*)."""
    schema = df.schema
    cols = [f.name for f in schema.fields]

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            nb, nw, nh, nf = [], [], [], []
            keep = np.ones(len(pdf), dtype=bool)
            has_ph = "phash" in pdf.columns
            nph = []
            arrs = codec.decode_many(list(pdf["bytes"]), list(pdf["w"]),
                                     list(pdf["h"]), list(pdf["fmt"]))
            for i, (arr, f0) in enumerate(zip(arrs, pdf["fmt"])):
                try:
                    if isinstance(arr, NotImplementedError):
                        raise arr
                    if isinstance(arr, Exception):
                        raise ValueError("decode failed") from arr
                    r = resize_array(arr, out_w, out_h, method)
                    fo = fmt_out or f0
                    nb.append(codec.encode(r, fo))
                    nw.append(out_w); nh.append(out_h); nf.append(fo)
                    if has_ph:
                        nph.append(codec.phash64(
                            r if r.ndim == 2 else r.mean(axis=2)))
                except NotImplementedError:
                    raise
                except Exception:
                    keep[i] = False
                    nb.append(None); nw.append(0); nh.append(0); nf.append(f0)
                    if has_ph:
                        nph.append(0)
            out = pdf.copy()
            out["bytes"] = pd.Series(nb, index=pdf.index, dtype=object)
            out["w"] = nw
            out["h"] = nh
            out["fmt"] = nf
            if has_ph:
                out["phash"] = np.asarray(nph, dtype=np.int64).astype("int64")
            out = out[keep]
            if len(out):
                yield out[cols]

    return df.mapInPandas(_run, schema=schema)


# ------------------------------------------------------------ augmentation

_AUG_OPS = ("hflip", "vflip", "rot90", "rot180", "rot270")


def augment_array(a: np.ndarray, op: str) -> np.ndarray:
    """Apply one augmentation to a (h,w) or (h,w,c) array.  ``rot90``
    is 90° CLOCKWISE (``rot270`` counter-clockwise); ``crop:WxH`` is a
    center crop clamped to the image dims."""
    if op == "hflip":
        return a[:, ::-1].copy()
    if op == "vflip":
        return a[::-1].copy()
    if op == "rot90":
        return np.rot90(a, k=-1, axes=(0, 1)).copy()
    if op == "rot180":
        return np.rot90(a, k=2, axes=(0, 1)).copy()
    if op == "rot270":
        return np.rot90(a, k=1, axes=(0, 1)).copy()
    if op.startswith("crop:"):
        cw, ch = (int(x) for x in op[5:].split("x"))
        h, w = a.shape[:2]
        cw, ch = min(cw, w), min(ch, h)
        x0, y0 = (w - cw) // 2, (h - ch) // 2
        return a[y0:y0 + ch, x0:x0 + cw].copy()
    raise ValueError(f"unknown augmentation {op!r} "
                     f"(use {_AUG_OPS} or 'crop:WxH')")


def augment_images(df: DataFrame, ops: tuple = ("hflip",), *,
                   fmt_out: str | None = None) -> DataFrame:
    """Decode → augment → re-encode: one output row per (input row,
    op), with ``aug_op`` appended and bytes/w/h (and phash, if
    present) refreshed.  Input schema must carry (bytes, w, h, fmt);
    all other columns pass through.  Rows whose payload fails to
    decode are DROPPED (same crawl contract as resize_images /
    verify_images_*).

    Scale plan: the standard train-time flip/rotate/crop augmentations
    materialized as a corpus op (dataset ships pre-augmented rows);
    decode-once per input row, each op re-encodes from the same
    array.  Arrow-batched mapInPandas — fan-out is len(ops)×, attribute
    columns replicate JVM-side only in the output batch."""
    for op in ops:
        if op not in _AUG_OPS and not op.startswith("crop:"):
            raise ValueError(f"unknown augmentation {op!r}")
    schema = df.schema
    cols = [f.name for f in schema.fields]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields]
        + ["aug_op string"])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            has_ph = "phash" in pdf.columns
            arrs = codec.decode_many(list(pdf["bytes"]), list(pdf["w"]),
                                     list(pdf["h"]), list(pdf["fmt"]))
            out_rows = []
            for i, (arr, f0) in enumerate(zip(arrs, pdf["fmt"])):
                if isinstance(arr, Exception):
                    continue
                base = pdf.iloc[i]
                for op in ops:
                    aug = augment_array(arr, op)
                    fo = fmt_out or f0
                    row = base.copy()
                    row["bytes"] = codec.encode(aug, fo)
                    row["h"], row["w"] = int(aug.shape[0]), int(aug.shape[1])
                    row["fmt"] = fo
                    if has_ph:
                        row["phash"] = np.int64(codec.phash64(
                            aug if aug.ndim == 2 else aug.mean(axis=2)))
                    row["aug_op"] = op
                    out_rows.append(row)
            if out_rows:
                yield pd.DataFrame(out_rows)[cols + ["aug_op"]]

    return df.mapInPandas(_run, schema=out_schema)


def exif_normalize_array(a: np.ndarray, orientation: int) -> np.ndarray:
    """Apply the display transform for an EXIF orientation tag (1-8) —
    the PIL ``exif_transpose`` semantics: the returned array is what a
    viewer shows.  Unknown/missing tags are treated as 1 (identity)."""
    o = int(orientation) if orientation else 1
    if o == 2:
        return a[:, ::-1].copy()
    if o == 3:
        return a[::-1, ::-1].copy()
    if o == 4:
        return a[::-1].copy()
    if o == 5:
        return np.swapaxes(a, 0, 1).copy()
    if o == 6:
        return np.rot90(a, k=-1, axes=(0, 1)).copy()
    if o == 7:
        return np.swapaxes(a[::-1, ::-1], 0, 1).copy()
    if o == 8:
        return np.rot90(a, k=1, axes=(0, 1)).copy()
    return a


def normalize_orientation(df: DataFrame, *,
                          fmt_out: str | None = None) -> DataFrame:
    """Bake EXIF orientation into the pixels — the normalization step a
    crawl pipeline runs before any geometry-sensitive op (phash,
    augmentation, tiling), since ~10% of camera JPEGs carry a non-1
    orientation tag that viewers honor but array ops don't.

    For jpeg rows: parse the APP1 orientation tag (raster/exif.py),
    decode, apply the display transform, re-encode (``fmt_out`` or the
    original format — the re-encode drops APP1, so the output is
    tag-free by construction); w/h (and phash, if present) refresh,
    and an ``exif_orientation`` column records the ORIGINAL tag.
    Non-jpeg or tag-less rows pass through untouched (orientation 1).
    Rows whose payload fails to decode are DROPPED (crawl contract, as
    resize_images / augment_images).  Arrow-batched mapInPandas."""
    from . import exif as _exif

    schema = df.schema
    cols = [f.name for f in schema.fields]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields]
        + ["exif_orientation int"])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            has_ph = "phash" in pdf.columns
            ors, keep = [], np.ones(len(pdf), dtype=bool)
            nb, nw, nh, nf, nph = [], [], [], [], []
            for i, (buf, w, h, f0) in enumerate(zip(
                    pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"])):
                o = 1
                if f0 == "jpeg":
                    try:
                        o = int(_exif.parse_exif(bytes(buf))
                                .get("orientation", 1) or 1)
                    except Exception:
                        o = 1
                if o == 1:
                    ors.append(1)
                    nb.append(buf); nw.append(int(w)); nh.append(int(h))
                    nf.append(f0)
                    nph.append(pdf["phash"].iloc[i] if has_ph else 0)
                    continue
                try:
                    arr = codec.decode(bytes(buf), int(w), int(h), f0)
                    fixed = exif_normalize_array(arr, o)
                    fo = fmt_out or f0
                    nb.append(codec.encode(fixed, fo))
                    nh.append(int(fixed.shape[0]))
                    nw.append(int(fixed.shape[1]))
                    nf.append(fo)
                    nph.append(np.int64(codec.phash64(
                        fixed if fixed.ndim == 2 else fixed.mean(axis=2)))
                        if has_ph else 0)
                    ors.append(o)
                except Exception:
                    keep[i] = False
                    ors.append(o)
                    nb.append(None); nw.append(0); nh.append(0); nf.append(f0)
                    nph.append(0)
            out = pdf.copy()
            out["bytes"] = pd.Series(nb, index=pdf.index, dtype=object)
            out["w"] = np.asarray(nw, dtype=np.int32)
            out["h"] = np.asarray(nh, dtype=np.int32)
            out["fmt"] = nf
            if has_ph:
                out["phash"] = np.asarray(nph, dtype=np.int64)
            out["exif_orientation"] = np.asarray(ors, dtype=np.int32)
            out = out[keep]
            if len(out):
                yield out[cols + ["exif_orientation"]]

    return df.mapInPandas(_run, schema=out_schema)


# ------------------------------------------------------------------ video

_REAL_VIDEO_FMTS = ("rawvid",)

VIDEO_FRAME_SCHEMA = ("video_id string, frame_index int, t double, "
                      "bytes binary, w int, h int, fmt string")


def decode_video(buf: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    """(n_frames, h, w) uint8 for the engine's ``rawvid`` container
    (concatenated grayscale frames). Compressed codecs are wheel-bound."""
    if fmt == "rawvid":
        return np.frombuffer(bytes(buf), dtype=np.uint8).reshape(n_frames, h, w)
    raise NotImplementedError(
        f"video codec {fmt!r} requires a decoder wheel (ffmpeg/pyav) absent "
        f"in this sandbox; supported here: {_REAL_VIDEO_FMTS}")


def sample_video_frames(df: DataFrame, *, every_n: int | None = None,
                        n_samples: int | None = None,
                        fps_col: str = "fps") -> DataFrame:
    """Explode video rows into sampled frame rows (one output row per
    kept frame, payload re-encoded as a ``raw``-fmt grayscale image so
    downstream image ops apply unchanged).

    Sampling is deterministic: ``every_n`` keeps frames 0, n, 2n, …;
    ``n_samples`` keeps k evenly-spaced frames (first frame always
    included). Exactly one of the two must be given. Input schema:
    (video_id, bytes, n_frames, w, h, fmt[, fps])."""
    if (every_n is None) == (n_samples is None):
        raise ValueError("pass exactly one of every_n / n_samples")
    has_fps = fps_col in df.columns

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt == "mp4":
                    # container path (raster/mp4.py): only the SELECTED
                    # samples are sliced out of mdat — an mp4 row never
                    # decodes frames it does not keep
                    from . import mp4 as _mp4

                    info = _mp4.probe(r.bytes)
                    v = next(t for t in info["tracks"] if t["kind"] == "vide")
                    if v["codec"] == "hvc1":
                        from . import native_hevc as _nh

                        if not _nh.available():
                            raise NotImplementedError(
                                "mp4 hvc1 decode needs libde265 (absent)")
                    elif v["codec"] != "rawg":
                        raise NotImplementedError(
                            f"mp4 codec {v['codec']!r} requires a decoder "
                            "wheel absent in this sandbox (container "
                            "probe/slice is supported — see video_probe)")
                    nf, w, h = v["n_samples"], v["w"], v["h"]
                    if every_n is not None:
                        idx = np.arange(0, nf, every_n)
                    else:
                        idx = np.unique(np.linspace(0, nf - 1,
                                                    min(n_samples, nf))
                                        .astype(np.int64))
                    payloads = _mp4.extract_samples(r.bytes, idx,
                                                    v["track_id"])
                    if v["codec"] == "hvc1":
                        # all-intra HEVC: only the kept samples are
                        # sliced out of mdat and decoded
                        hvcc = _mp4.sample_entry_config(
                            r.bytes, b"hvcC", v["track_id"])
                        payloads = [f.tobytes() for f in
                                    _nh.decode_samples_gray(
                                        payloads, hvcc, size=(h, w))]
                    fps = v["n_samples"] / v["duration_s"] \
                        if v["duration_s"] else 0.0
                    for fi, payload in zip(idx, payloads):
                        t = (fi / fps) if fps > 0 else float(fi)
                        rows.append((r.video_id, int(fi), float(t),
                                     payload, int(w), int(h), "raw_gray"))
                    continue
                nf = int(r.n_frames)
                if nf <= 0:
                    continue
                frames = decode_video(r.bytes, int(r.w), int(r.h), nf, r.fmt)
                if every_n is not None:
                    idx = np.arange(0, nf, every_n)
                else:
                    k = min(n_samples, nf)
                    idx = np.unique(np.linspace(0, nf - 1, k).astype(np.int64))
                fps = float(getattr(r, fps_col)) if has_fps else 0.0
                for fi in idx:
                    t = (fi / fps) if fps > 0 else float(fi)
                    rows.append((r.video_id, int(fi), float(t),
                                 frames[fi].tobytes(), int(r.w), int(r.h),
                                 "raw_gray"))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "video_id", "frame_index", "t", "bytes", "w", "h", "fmt"])

    return df.mapInPandas(_run, schema=VIDEO_FRAME_SCHEMA)


# ------------------------------------------------------------ scene cuts

def _decode_all_frames(buf: bytes, w: int, h: int, n_frames: int,
                       fmt: str) -> np.ndarray:
    """(n, h, w) uint8 for rawvid and mp4 (rawg / all-intra hvc1) —
    the same container/codec routing as sample_video_frames."""
    if fmt == "mp4":
        from . import mp4 as _mp4

        info = _mp4.probe(buf)
        v = next(t for t in info["tracks"] if t["kind"] == "vide")
        nf, vw, vh = v["n_samples"], v["w"], v["h"]
        idx = np.arange(nf)
        payloads = _mp4.extract_samples(buf, idx, v["track_id"])
        if v["codec"] == "hvc1":
            from . import native_hevc as _nh

            if not _nh.available():
                raise NotImplementedError(
                    "mp4 hvc1 decode needs libde265 (absent)")
            hvcc = _mp4.sample_entry_config(buf, b"hvcC", v["track_id"])
            frames = _nh.decode_samples_gray(payloads, hvcc, size=(vh, vw))
            return np.stack(frames)
        if v["codec"] != "rawg":
            raise NotImplementedError(
                f"mp4 codec {v['codec']!r} requires a decoder wheel "
                "absent in this sandbox")
        return np.stack([np.frombuffer(p, dtype=np.uint8).reshape(vh, vw)
                         for p in payloads])
    return decode_video(buf, w, h, n_frames, fmt)


def detect_scene_cuts(df: DataFrame, *, threshold: float = 0.1,
                      fps_col: str = "fps") -> DataFrame:
    """Shot-boundary detection: a cut at frame i when the normalized
    mean absolute difference |frame_i - frame_{i-1}| / 255 exceeds
    ``threshold`` — the standard histogram/energy-free baseline
    detector a sampling pipeline runs to pick one keyframe per shot.

    Output: one row per detected cut ``(video_id, cut_index, t,
    score)`` with ``cut_index`` the FIRST frame of the new shot and
    ``score`` the normalized MAD.  Input schema as sample_video_frames
    (rawvid + mp4 rawg/hvc1 are real; other codecs raise).

    Scale plan: each video decodes once inside its Arrow batch; the
    frame-delta reduction is one vectorized pass (no per-frame
    python); output is cuts only — orders of magnitude smaller than
    frames."""
    has_fps = fps_col in df.columns

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                frames = _decode_all_frames(
                    bytes(r.bytes), int(r.w), int(r.h),
                    int(r.n_frames), r.fmt).astype(np.float64)
                if len(frames) < 2:
                    continue
                mad = np.abs(np.diff(frames, axis=0)).mean(axis=(1, 2)) \
                    / 255.0
                fps = float(getattr(r, fps_col)) if has_fps else 0.0
                for j in np.flatnonzero(mad > threshold):
                    ci = int(j) + 1
                    t = ci / fps if fps > 0 else float(ci)
                    rows.append((r.video_id, ci, float(t), float(mad[j])))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "video_id", "cut_index", "t", "score"])

    return df.mapInPandas(
        _run, schema="video_id string, cut_index int, t double, "
                     "score double")


# ------------------------------------------------------- audio segmentation

def segment_audio(df: DataFrame, *, frame_ms: float = 25.0,
                  threshold: float = 0.02,
                  sr_col: str = "sample_rate") -> DataFrame:
    """Energy-based audio segmentation (VAD baseline): frame the signal
    at ``frame_ms``, mark frames whose RMS exceeds ``threshold``, and
    merge consecutive active frames into segments — the
    split-on-silence step a speech pipeline runs before transcription.

    Output: one row per segment ``(audio_id, seg_idx, start_s, end_s,
    n_frames, rms_mean)`` with end exclusive.  Decode routes through
    decode_audio (pcm/wav/aiff/flac/mp3 real).  Channel-mean taken
    first; the trailing partial frame is kept.

    Scale plan: decode-once per row, framing + RMS + gaps-and-islands
    all vectorized numpy inside the Arrow batch; output is segments,
    not samples."""

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    x = decode_audio(bytes(r.bytes), r.fmt)
                except NotImplementedError:
                    raise
                except Exception:
                    continue
                if x.ndim == 2:
                    x = x.mean(axis=1)
                sr = float(getattr(r, sr_col))
                flen = max(1, int(round(sr * frame_ms / 1000.0)))
                nfr = (len(x) + flen - 1) // flen
                if nfr == 0:
                    continue
                pad = np.zeros(nfr * flen, dtype=np.float64)
                pad[:len(x)] = x
                fr = pad.reshape(nfr, flen)
                # RMS over the true sample count of the last frame
                counts = np.full(nfr, flen, dtype=np.float64)
                counts[-1] = len(x) - (nfr - 1) * flen
                rms = np.sqrt((fr ** 2).sum(axis=1) / counts)
                act = rms > threshold
                if not act.any():
                    continue
                d = np.diff(act.astype(np.int8))
                starts = np.flatnonzero(d == 1) + 1
                ends = np.flatnonzero(d == -1) + 1
                if act[0]:
                    starts = np.concatenate([[0], starts])
                if act[-1]:
                    ends = np.concatenate([ends, [nfr]])
                for k, (s, e) in enumerate(zip(starts, ends)):
                    rows.append((
                        r.audio_id, int(k),
                        float(s * flen / sr),
                        float(min(int(e) * flen, len(x)) / sr),
                        int(e - s), float(rms[s:e].mean())))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "audio_id", "seg_idx", "start_s", "end_s", "n_frames",
                    "rms_mean"])

    return df.mapInPandas(
        _run, schema="audio_id string, seg_idx int, start_s double, "
                     "end_s double, n_frames int, rms_mean double")


# ------------------------------------------------------------ image quality

def quality_metrics(a: np.ndarray) -> tuple[float, float, float, float, float]:
    """Scalar quality signals for one decoded image: brightness (mean),
    contrast (population std), blur (population variance of the
    4-neighbor Laplacian over the interior — the classic
    variance-of-Laplacian focus measure; low = blurry/flat), Shannon
    entropy in bits over the 256-bin histogram, and dynamic range
    (max - min). Multichannel input is converted to its channel mean."""
    f = a.astype(np.float64)
    if f.ndim == 3:
        f = f.mean(axis=2)
    brightness = float(f.mean())
    contrast = float(f.std())
    h, w = f.shape
    if h >= 3 and w >= 3:
        lap = (f[:-2, 1:-1] + f[2:, 1:-1] + f[1:-1, :-2] + f[1:-1, 2:]
               - 4.0 * f[1:-1, 1:-1])
        lap_var = float(lap.var())
    else:
        lap_var = 0.0
    hist = np.bincount(np.clip(np.rint(f), 0, 255).astype(np.int64).ravel(),
                       minlength=256)
    q = hist[hist > 0] / f.size
    entropy_bits = float(-(q * np.log2(q)).sum())
    return (brightness, contrast, lap_var, entropy_bits,
            float(f.max() - f.min()))


def image_quality(df: DataFrame) -> DataFrame:
    """Per-image quality signals — the filter columns an image training
    pipeline scores before anything else (drop flat/blurry/synthetic-
    banner images). Input schema must carry (bytes, w, h, fmt); output
    keeps every non-payload column and appends brightness / contrast /
    lap_var / entropy_bits / dyn_range. Rows whose payload fails to
    decode are DROPPED (crawl contract, same policy as resize_images)."""
    keep_cols = [f.name for f in df.schema.fields if f.name != "bytes"]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in df.schema.fields if f.name != "bytes"]
        + ["brightness double", "contrast double", "lap_var double",
           "entropy_bits double", "dyn_range double"])

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            arrs = codec.decode_many(list(pdf["bytes"]), list(pdf["w"]),
                                     list(pdf["h"]), list(pdf["fmt"]))
            keep = np.ones(len(pdf), dtype=bool)
            mets = []
            for i, arr in enumerate(arrs):
                try:
                    if isinstance(arr, NotImplementedError):
                        raise arr
                    if isinstance(arr, Exception):
                        raise ValueError("decode failed") from arr
                    mets.append(quality_metrics(arr))
                except NotImplementedError:
                    raise
                except Exception:
                    keep[i] = False
                    mets.append((0.0,) * 5)
            out = pdf[keep_cols].copy()
            cols = ["brightness", "contrast", "lap_var", "entropy_bits",
                    "dyn_range"]
            for j, c in enumerate(cols):
                out[c] = [m[j] for m in mets]
            out = out[keep]
            if len(out):
                yield out

    return df.mapInPandas(_run, schema=out_schema)


# ------------------------------------------------------------------ audio

AUDIO_FEATURE_SCHEMA = ("audio_id string, duration_s double, rms double, "
                        "peak double, zcr double, clip_ratio double")


def decode_audio(buf: bytes, fmt: str) -> np.ndarray:
    """float64 mono samples in [-1, 1]. Real: pcm_f32 (little-endian
    float32), pcm_s16 (little-endian int16), mp3 (from-scratch MPEG
    Layer III, raster/mp3.py; streams selecting the unverifiable
    Huffman escape tables raise — see mp3.py docstring), wav / aiff
    (raster/wavaiff.py, stdlib-conformance-tested containers) and flac
    (raster/flac.py, from-scratch lossless codec with CRC/MD5
    enforcement). Multichannel is mixed down. ogg/aac remain
    wheel-bound."""
    if fmt == "pcm_f32":
        return np.frombuffer(bytes(buf), dtype="<f4").astype(np.float64)
    if fmt == "pcm_s16":
        return np.frombuffer(bytes(buf), dtype="<i2").astype(np.float64) / 32768.0
    if fmt == "mp3":
        from . import mp3
        pcm, _sr = mp3.decode(bytes(buf))
        return pcm.mean(axis=1) if pcm.ndim == 2 else pcm
    if fmt in ("wav", "aiff", "flac"):
        if fmt == "wav":
            from . import wavaiff
            pcm, _sr = wavaiff.decode_wav(bytes(buf))
        elif fmt == "aiff":
            from . import wavaiff
            pcm, _sr = wavaiff.decode_aiff(bytes(buf))
        else:
            from . import flac
            pcm, _sr = flac.decode_float(bytes(buf))
        return pcm.mean(axis=1) if pcm.ndim == 2 else pcm
    raise NotImplementedError(
        f"audio codec {fmt!r} requires a decoder wheel absent in this "
        "sandbox; supported here: pcm_f32, pcm_s16, mp3, wav, aiff, flac")


def audio_features(df: DataFrame, *, clip_level: float = 0.999) -> DataFrame:
    """Per-asset scalar features (duration, RMS, peak, zero-crossing
    rate, clipping ratio) — the quality-scoring columns an audio
    training pipeline filters on. Input: (audio_id, bytes, sample_rate,
    fmt)."""

    def _run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    x = decode_audio(r.bytes, r.fmt)
                except (ValueError, NotImplementedError):
                    # crawl contract: corrupt/unsupported rows are
                    # dropped, never kill the task (same as resize_images)
                    continue
                n = len(x)
                sr = float(r.sample_rate)
                if n == 0 or sr <= 0:
                    rows.append((r.audio_id, 0.0, 0.0, 0.0, 0.0, 0.0))
                    continue
                zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append((
                    r.audio_id,
                    n / sr,
                    float(np.sqrt(np.mean(x * x))),
                    float(np.max(np.abs(x))),
                    zc / max(n - 1, 1),
                    float(np.count_nonzero(np.abs(x) >= clip_level)) / n,
                ))
            if rows:
                yield pd.DataFrame(rows, columns=[
                    "audio_id", "duration_s", "rms", "peak", "zcr", "clip_ratio"])

    return df.mapInPandas(_run, schema=AUDIO_FEATURE_SCHEMA)
