"""EXIF GPS extraction tests (raster/exif.py): build->parse roundtrip,
sign/ref conventions, byte orders, the crawl contract, and the ingest
loop into pip_join (geotag bytes -> spatial join)."""

import struct

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark.fixtures import _gen_pixels, gen_zones
from gis_tools_spark.operators.sjoin import pip_join
from gis_tools_spark.raster import exif as E, jpeg


def _jpeg(seed=1):
    arr = _gen_pixels(np.random.default_rng(seed), 16, 16, "jpeg", sigma=1.5)
    return jpeg.encode(arr, 90)


def test_roundtrip_all_fields():
    tiff = E.build_exif(lon=-73.9857, lat=40.7484, alt=-12.5,
                        timestamp="2026:08:18 12:00:00", orientation=6,
                        camera="cam X")
    j = E.embed_exif(_jpeg(), tiff)
    out = E.parse_exif(j)
    assert out["lon"] == pytest.approx(-73.9857, abs=1e-5)
    assert out["lat"] == pytest.approx(40.7484, abs=1e-5)
    assert out["alt"] == pytest.approx(-12.5, abs=1e-4)
    assert out["orientation"] == 6
    assert out["timestamp"] == "2026:08:18 12:00:00"
    assert "cam X" in out["camera"]
    # the APP1 segment must not break the image itself
    assert jpeg.decode(j).shape == (16, 16, 3)


@pytest.mark.parametrize("lon,lat", [(0.0, 0.0), (179.99, -89.5),
                                     (-0.0004, 51.5), (2.3522, 48.8566)])
def test_sign_and_ref_conventions(lon, lat):
    j = E.embed_exif(_jpeg(), E.build_exif(lon=lon, lat=lat))
    out = E.parse_exif(j)
    assert out["lon"] == pytest.approx(lon, abs=2e-5)
    assert out["lat"] == pytest.approx(lat, abs=2e-5)


def test_big_endian_and_no_exif():
    assert E.parse_exif(_jpeg()) == {}
    ifd = (struct.pack(">H", 1)
           + struct.pack(">HHI", E.TAG_ORIENTATION, 3, 1)
           + struct.pack(">HH", 3, 0) + struct.pack(">I", 0))
    tiff = b"MM" + struct.pack(">HI", 42, 8) + ifd
    assert E.parse_exif(E.embed_exif(_jpeg(), tiff)) == {"orientation": 3}
    with pytest.raises(E.ExifError):
        E.parse_exif(b"not a jpeg")


def test_image_exif_spark_and_pip_join(spark):
    zones = spark.createDataFrame(
        gen_zones(16)[["gid", "nom", "secteur", "surf", "geometry_wkb"]])
    zb = gen_zones(16)
    rows = []
    for i in range(30):
        gid = i % 16
        z = zb.iloc[gid]
        lon = (z["zminx"] + z["zmaxx"]) / 2 if "zminx" in zb.columns else None
        rows.append((f"img{i:04d}", gid))
    # place points at zone centroids via the closed-form zone layout
    from gis_tools_spark.geom import wkb as W
    def _inside(ring, x, y):
        j, inside = len(ring) - 1, False
        for k in range(len(ring)):
            xi, yi = ring[k]
            xj, yj = ring[j]
            if (yi > y) != (yj > y) and \
                    x < (xj - xi) * (y - yi) / (yj - yi) + xi:
                inside = not inside
            j = k
        return inside

    def _interior_point(ring):
        # vertex mean is not guaranteed interior for concave rings:
        # grid-search the bbox with a ray-cast check
        cx, cy = float(ring[:, 0].mean()), float(ring[:, 1].mean())
        if _inside(ring, cx, cy):
            return cx, cy
        for fx in np.linspace(0.15, 0.85, 8):
            for fy in np.linspace(0.15, 0.85, 8):
                x = ring[:, 0].min() + fx * np.ptp(ring[:, 0])
                y = ring[:, 1].min() + fy * np.ptp(ring[:, 1])
                if _inside(ring, x, y):
                    return float(x), float(y)
        raise AssertionError("no interior point found")

    pdf_rows = []
    for i in range(30):
        row = zb.iloc[i % 16]
        gid = int(row["gid"])                    # gid is 1-based
        g = W.decode(bytes(row["geometry_wkb"]))
        ring = np.asarray(g["rings"][0] if "rings" in g
                          else g["polygons"][0][0])
        lon, lat = _interior_point(ring)
        if i % 5 == 0:
            blob = _jpeg(i)                       # no GPS
        else:
            blob = E.embed_exif(_jpeg(i), E.build_exif(lon=lon, lat=lat))
        pdf_rows.append((f"img{i:04d}", blob, gid))
    pdf = pd.DataFrame(pdf_rows, columns=["image_id", "bytes", "true_gid"])
    df = spark.createDataFrame(pdf)
    ex = E.image_exif(df)
    got = ex.toPandas().set_index("image_id")
    assert got["ok"].all()
    assert (~got["has_gps"]).sum() == 6
    # corrupt row contract: not a JPEG at all -> ok=false;
    # a JPEG whose marker stream just has no EXIF -> ok=true, no gps
    bad = pd.DataFrame({"image_id": ["x", "y"],
                        "bytes": [b"not a jpeg", b"\xff\xd8garbage"]})
    outb = (E.image_exif(spark.createDataFrame(bad)).toPandas()
            .set_index("image_id"))
    assert bool(outb.loc["x", "ok"]) is False
    assert bool(outb.loc["y", "ok"]) is True
    assert bool(outb.loc["y", "has_gps"]) is False
    # the ingest loop: EXIF coords -> pip_join recovers the true zone
    pts = ex.where("has_gps").select("image_id", "lon", "lat")
    joined = pip_join(pts, zones, strategy="broadcast").toPandas()
    truth = pdf.set_index("image_id")["true_gid"]
    # fixture zones overlap, so a centroid may land in >1 zone; every
    # geotagged image must appear and its TRUE zone must be among hits
    hits = joined.groupby("image_id")["gid"].agg(set)
    assert len(hits) == 24
    for iid, gids in hits.items():
        assert truth[iid] in gids
