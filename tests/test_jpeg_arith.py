"""Arithmetic-coded JPEG (SOF9/SOF10, T.81 Annex D QM coder).

Three independent evidence layers:
1. The probability-estimation table is pinned against the SYSTEM
   libjpeg's exported ``jpeg_aritab`` (both transcribe T.81 Table D.3).
2. The raw QM coder round-trips random decision streams.
3. Cross-conformance through a compiled libjpeg shim
   (tests/conformance/jpegshim.c): libjpeg-encoded arithmetic streams
   (sequential AND progressive, gray/color, 444/420, restart
   intervals) decode to the libjpeg coefficient dump EXACTLY, and
   libjpeg decodes OUR arithmetic encoder's streams exactly —
   entropy-level bit equality, no IDCT rounding in the loop.
"""

import ctypes
import ctypes.util
import shutil
import subprocess

import numpy as np
import pytest

from gis_tools_spark.raster import jpeg
from gis_tools_spark.raster.jpeg import _ZZ
from gis_tools_spark.raster.jpeg_arith import (
    _ARI_TAB, ArithDecoder, ArithEncoder, _Stats)


# ------------------------------------------------------------ shim fixture

@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    src = __file__.rsplit("/", 1)[0] + "/conformance/jpegshim.c"
    exe = str(tmp_path_factory.mktemp("shim") / "jpegshim")
    gcc = shutil.which("gcc") or shutil.which("cc")
    if gcc is None:
        pytest.skip("no C compiler for libjpeg conformance shim")
    r = subprocess.run([gcc, "-O2", "-o", exe, src, "-ljpeg"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"libjpeg shim build failed: {r.stderr.decode()[:200]}")
    return exe


def _shim_encode(exe, img, *, q=80, arith=1, prog=0, rst=0, subs=444):
    ch = img.shape[2] if img.ndim == 3 else 1
    hdr = (b"P6\n" if ch == 3 else b"P5\n") \
        + f"{img.shape[1]} {img.shape[0]}\n255\n".encode()
    r = subprocess.run([exe, "e", str(q), str(arith), str(prog),
                        str(rst), str(subs)],
                       input=hdr + img.tobytes(), capture_output=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


def _shim_coefs(exe, jpg):
    r = subprocess.run([exe, "c"], input=jpg, capture_output=True)
    assert r.returncode == 0, r.stderr
    out = r.stdout
    nl = out.index(b"\n")
    nc = int(out[:nl])
    pos = nl + 1
    res = []
    for _ in range(nc):
        nl2 = out.index(b"\n", pos)
        wb, hb = map(int, out[pos:nl2].split())
        pos = nl2 + 1
        n = wb * hb * 128
        res.append(np.frombuffer(out[pos:pos + n], dtype="<i2")
                   .astype(np.int64).reshape(hb, wb, 64))
        pos += n
    return res


def _ours_nat(jpg):
    """Our decoder's coefficients, natural order, MCU-padded grid."""
    comps, coefL, _, _, _ = jpeg.decode_coefficients(bytes(jpg))
    res = []
    for c, a in zip(comps, coefL):
        zz = np.asarray(a).reshape(c["bhf"], c["bwf"], 64)
        nat = np.zeros_like(zz)
        nat[:, :, _ZZ] = zz
        res.append(nat)
    return res


def _coefs_equal(exe, jpg):
    ours, ref = _ours_nat(jpg), _shim_coefs(exe, jpg)
    assert len(ours) == len(ref)
    for x, y in zip(ours, ref):
        hb, wb = y.shape[:2]   # libjpeg grid is not MCU-padded: crop ours
        if not np.array_equal(x[:hb, :wb], y):
            return False
    return True


# ----------------------------------------------------------- table pin

def test_ari_tab_matches_system_libjpeg():
    name = ctypes.util.find_library("jpeg")
    if name is None:
        pytest.skip("libjpeg not present")
    lib = ctypes.CDLL(name)
    try:
        tab = ctypes.cast(
            ctypes.addressof(ctypes.c_int64.in_dll(lib, "jpeg_aritab")),
            ctypes.POINTER(ctypes.c_int64))
    except ValueError:
        pytest.skip("jpeg_aritab not exported")
    for i in range(114):
        v = tab[i]
        qe, nmps, nlps, sw = (v >> 16 & 0xFFFF, v >> 8 & 0xFF,
                              v & 0x7F, v >> 7 & 1)
        assert _ARI_TAB[i] == (qe, nmps, nlps, sw), f"state {i}"


# ------------------------------------------------------------- QM core

def test_qm_coder_roundtrip_fuzz():
    rng = np.random.default_rng(11)
    for _ in range(60):
        nbits = int(rng.integers(1, 700))
        bits = rng.integers(0, 2, nbits).tolist()
        nbins = int(rng.integers(1, 9))
        bins = rng.integers(0, nbins, nbits).tolist()
        enc = ArithEncoder()
        st = _Stats(nbins)
        for b, bn in zip(bits, bins):
            enc.encode(st, bn, b)
        raw = enc.flush().replace(b"\xFF\x00", b"\xFF")  # destuff
        dec = ArithDecoder(raw)
        st2 = _Stats(nbins)
        assert [dec.decode(st2, bn) for bn in bins] == bits


def test_qm_decoder_zero_fill_tail():
    """Decoding must keep producing symbols after the data ends (the
    encoder discards trailing zero bytes)."""
    dec = ArithDecoder(b"")
    st = _Stats(1)
    out = [dec.decode(st, 0) for _ in range(64)]
    assert len(out) == 64  # no exception; deterministic all-MPS tail
    assert set(out) <= {0, 1}


# ------------------------------------------- internal encode/decode

@pytest.mark.parametrize("shape,sub,rst", [
    ((16, 16), "444", 0), ((32, 48, 3), "444", 0), ((32, 48, 3), "420", 0),
    ((40, 56, 3), "420", 3), ((8, 8), "444", 0), ((17, 23, 3), "420", 2)])
def test_arith_encode_decode_matches_huffman(shape, sub, rst):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape).astype(np.uint8)
    hb = jpeg.encode(img, 80, sub, rst)
    ab = jpeg.encode(img, 80, sub, rst, arithmetic=True)
    assert np.array_equal(jpeg.decode(hb), jpeg.decode(ab))


def test_progressive_arith_encode_raises():
    img = np.zeros((8, 8), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        jpeg.encode(img, 80, progressive=True, arithmetic=True)


def test_decode_batch_mixed_entropy_modes():
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
            for _ in range(6)]
    bufs = [jpeg.encode(im, 80, "420", arithmetic=(i % 2 == 1))
            for i, im in enumerate(imgs)]
    outs = jpeg.decode_batch(bufs)
    for o, b in zip(outs, bufs):
        assert isinstance(o, np.ndarray)
        assert np.array_equal(o, jpeg.decode(b))


# ------------------------------------------------- libjpeg conformance

@pytest.mark.parametrize("hh,ww,ch", [(24, 24, 1), (40, 64, 3),
                                      (33, 17, 3), (128, 96, 3)])
@pytest.mark.parametrize("prog", [0, 1])
@pytest.mark.parametrize("rst", [0, 2])
def test_libjpeg_arith_streams_decode_exactly(shim, hh, ww, ch, prog, rst):
    rng = np.random.default_rng(hh * ww + ch + prog + rst)
    img = rng.integers(0, 256,
                       (hh, ww, ch) if ch == 3 else (hh, ww)).astype(np.uint8)
    for subs in ((444,) if ch == 1 else (444, 420)):
        jpg = _shim_encode(shim, img, q=80, arith=1, prog=prog,
                           rst=rst, subs=subs)
        assert _coefs_equal(shim, jpg), (hh, ww, ch, prog, rst, subs)


@pytest.mark.parametrize("hh,ww,ch,rst", [(24, 24, 1, 0), (40, 64, 3, 0),
                                          (33, 17, 3, 2)])
def test_libjpeg_decodes_our_arith_streams(shim, hh, ww, ch, rst):
    rng = np.random.default_rng(hh + ww + ch)
    img = rng.integers(0, 256,
                       (hh, ww, ch) if ch == 3 else (hh, ww)).astype(np.uint8)
    ab = jpeg.encode(img, 80, "420" if ch == 3 else "444", rst,
                     arithmetic=True)
    assert _coefs_equal(shim, ab)


def test_libjpeg_huffman_also_conforms(shim):
    """Sanity: the shim harness itself agrees with our HUFFMAN decoder
    too (guards the harness against grid/order mistakes)."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    jpg = _shim_encode(shim, img, q=85, arith=0, prog=0, rst=0, subs=420)
    assert _coefs_equal(shim, jpg)
