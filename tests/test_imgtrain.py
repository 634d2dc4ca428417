"""Image-training batch-prep oracles: aspect-ratio bucketing vs a
brute-force numpy argmin, ViT token closed form, greedy pack replay,
augmentation pixel exactness, and stratified sampling invariants."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gis_tools_spark.operators.imgtrain import (
    aspect_bucket,
    pack_images,
    vit_token_count,
)
from gis_tools_spark.operators.mixing import stratified_sample
from gis_tools_spark.raster import codec
from gis_tools_spark.raster.media import augment_array, augment_images

SF = "/root/testdata/sf0.001"

BUCKETS = [(512, 512), (576, 448), (448, 576), (640, 384), (384, 640),
           (768, 320), (320, 768), (896, 256), (256, 896)]


@pytest.fixture(scope="module")
def dims(spark):
    # deterministic (w, h) grid off doc_id — same derivation the gate
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .selectExpr("doc_id",
                        "cast(64 + (doc_id * 7) % 961 as int) as w",
                        "cast(64 + (doc_id * 13) % 961 as int) as h"))


def _brute_bucket(w, h):
    costs = [max(w * bh, h * bw) / min(w * bh, h * bw)
             for bw, bh in BUCKETS]
    return int(np.argmin(costs))  # first min, like array_position


def test_aspect_bucket_matches_bruteforce(dims):
    rows = aspect_bucket(dims, BUCKETS).collect()
    assert len(rows) == 500
    for r in rows:
        bi = _brute_bucket(r.w, r.h)
        assert r.bucket_idx == bi, (r.w, r.h, r.bucket_idx, bi)
        bw, bh = BUCKETS[bi]
        assert (r.bucket_w, r.bucket_h) == (bw, bh)
        # resize covers the bucket; crop is centered and in-range
        assert r.resize_w >= bw and r.resize_h >= bh
        scale = max(bw / r.w, bh / r.h)
        assert r.resize_w == max(bw, int(np.floor(r.w * scale + 0.5)))
        assert r.crop_x == (r.resize_w - bw) // 2
        assert r.crop_x + bw <= r.resize_w
        assert r.crop_y + bh <= r.resize_h


def test_aspect_bucket_exact_match_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 512, 512), (2, 1024, 1024), (3, 288, 224)],
        "id long, w int, h int")
    out = {r.id: r for r in aspect_bucket(df, BUCKETS).collect()}
    # exact aspect → its own bucket, no resize slack beyond rounding
    assert out[1].bucket_idx == 0 and out[1].resize_w == 512
    assert out[2].bucket_idx == 0 and out[2].resize_w == 512
    # 288x224 matches 576x448 exactly (not the square)
    assert out[3].bucket_idx == 1
    assert (out[3].resize_w, out[3].resize_h) == (576, 448)
    # tie-break: a degenerate two-equal-bucket list takes the first
    out2 = aspect_bucket(df, [(512, 512), (256, 256)]).collect()
    assert all(r.bucket_idx == 0 for r in out2)


def test_vit_tokens_closed_form(dims):
    got = dims.select("doc_id", "w", "h",
                      vit_token_count(patch=14, extra=1)
                      .alias("n")).collect()
    for r in got:
        assert r.n == -(-r.w // 14) * (-(-r.h // 14)) + 1


def test_pack_images_greedy_replay(dims):
    B = 2000
    rows = pack_images(dims, B, patch=16, n_buckets=7).collect()
    assert len(rows) == 500
    by_bucket = {}
    for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
        by_bucket.setdefault(r.bucket, []).append(r)
    assert len(by_bucket) > 1
    for bucket, rs in by_bucket.items():
        fill, blk, pos = 0, -1, 0
        for r in rs:
            n = int(r.n_tokens)
            assert n == -(-r.w // 16) * (-(-r.h // 16)) + 1 \
                if hasattr(r, "w") else True
            if blk < 0 or fill + n > B:
                blk += 1
                fill, pos = n, 0
            else:
                fill += n
                pos += 1
            assert (r.block, r.block_pos) == (blk, pos), (bucket, r)
            assert r.oversize == (n > B)
        # block fill property: every block except oversize ones <= B
        fills = {}
        for r in rs:
            fills[r.block] = fills.get(r.block, 0) + int(r.n_tokens)
        for b, f in fills.items():
            members = [r for r in rs if r.block == b]
            if not any(m.oversize for m in members):
                assert f <= B
            else:
                assert len(members) == 1  # oversize rows sit alone


def test_pack_images_bucket_invariance_of_totals(dims):
    # changing n_buckets changes block boundaries but never drops rows
    a = pack_images(dims, 3000, n_buckets=4).count()
    b = pack_images(dims, 3000, n_buckets=32).count()
    assert a == b == 500


def test_augment_array_semantics():
    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert np.array_equal(augment_array(a, "hflip"), a[:, ::-1])
    assert np.array_equal(augment_array(a, "vflip"), a[::-1])
    r90 = augment_array(a, "rot90")
    assert r90.shape == (6, 4)
    # clockwise: top-left of source -> top-right of output
    assert r90[0, -1] == a[0, 0]
    assert np.array_equal(augment_array(r90, "rot270"), a)
    assert np.array_equal(augment_array(a, "rot180"), a[::-1, ::-1])
    c = augment_array(a, "crop:4x2")
    assert c.shape == (2, 4)
    assert np.array_equal(c, a[1:3, 1:5])
    with pytest.raises(ValueError):
        augment_array(a, "zoom")


def test_augment_images_roundtrip(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i, fmt in enumerate(["raw", "png", "webp", "raw"]):
        arr = rng.integers(0, 256, (16, 12, 3), dtype=np.uint8)
        rows.append((f"im{i}", codec.encode(arr, fmt), 12, 16, fmt,
                     f"cap{i}"))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "caption string")
    out = augment_images(df, ops=("hflip", "rot90", "crop:8x6")).collect()
    assert len(out) == 12
    src = {r[0]: r for r in rows}
    for r in out:
        orig = codec.decode(src[r.image_id][1], src[r.image_id][2],
                            src[r.image_id][3], src[r.image_id][4])
        exp = augment_array(orig, r.aug_op)
        got = codec.decode(r.bytes, r.w, r.h, r.fmt)
        assert (r.h, r.w) == exp.shape[:2]
        assert np.array_equal(got, exp), (r.image_id, r.aug_op)
        assert r.caption == f"cap{r.image_id[2:]}"  # passthrough intact


def test_augment_images_drops_corrupt(spark):
    df = spark.createDataFrame(
        [("ok", codec.encode(np.zeros((8, 8, 3), np.uint8), "png"),
          8, 8, "png"),
         ("bad", b"\x00\x01junk", 8, 8, "png")],
        "image_id string, bytes binary, w int, h int, fmt string")
    out = augment_images(df, ops=("hflip",)).collect()
    assert [r.image_id for r in out] == ["ok"]


def test_stratified_sample_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = stratified_sample(docs, 5, "lang", seed=3)
    counts = {r.lang: r.n for r in
              got.groupBy("lang").count().withColumnRenamed("count", "n")
              .collect()}
    full = {r.lang: r.n for r in
            docs.groupBy("lang").count().withColumnRenamed("count", "n")
            .collect()}
    for lang, n in counts.items():
        assert n == min(5, full[lang])
    # deterministic under repartition; k extends monotonically
    a = sorted(r.doc_id for r in got.collect())
    b = sorted(r.doc_id for r in
               stratified_sample(docs.repartition(17), 5, "lang",
                                 seed=3).collect())
    assert a == b
    big = sorted(r.doc_id for r in
                 stratified_sample(docs, 9, "lang", seed=3).collect())
    assert set(a) <= set(big)
    # different seed, different sample
    c = sorted(r.doc_id for r in
               stratified_sample(docs, 5, "lang", seed=4).collect())
    assert a != c
