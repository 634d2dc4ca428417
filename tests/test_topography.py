"""Horizon computation vs brute-force oracle."""

import numpy as np
import pandas as pd
import pytest

from gis_tools_spark import fixtures
from gis_tools_spark.operators.topography import EARTH_R, dozier_horizon_1d, get_horizon
from gis_tools_spark.raster import codec
from gis_tools_spark.raster.zonal import pixel_centers


def test_dozier_1d_matches_bruteforce():
    rng = np.random.default_rng(3)
    elev = rng.uniform(0, 100, 50)
    spacing = 30.0
    got = dozier_horizon_1d(elev, spacing)
    for i in range(len(elev) - 1):
        angs = [(elev[j] - elev[i]) / ((j - i) * spacing) for j in range(i + 1, len(elev))]
        want = max(0.0, np.degrees(np.arctan(max(angs))))
        assert got[i] == pytest.approx(want, abs=1e-9), i


def test_get_horizon_matches_bruteforce(spark):
    ras_pd = fixtures.gen_rasters(2, 2, 32)
    obs = pd.DataFrame({"pid": [1, 2], "lon": [7.0, 8.0], "lat": [42.0, 43.0]})
    radius, nsec = 0.8, 12
    got = get_horizon(spark.createDataFrame(obs),
                      spark.createDataFrame(ras_pd),
                      radius_deg=radius, n_sectors=nsec).toPandas()
    # brute-force oracle over the mosaic
    for _, o in obs.iterrows():
        ox, oy = o["lon"], o["lat"]
        best = {}
        own = None
        # own elevation = value at observer pixel of the covering tile
        for _, r in ras_pd.iterrows():
            xs, ys = pixel_centers(r["gt_x0"], r["gt_rx"], r["gt_y0"], r["gt_ry"], r["w"], r["h"])
            if not (r["gt_x0"] <= ox <= r["gt_x0"] + r["gt_rx"] * r["w"]
                    and r["gt_y0"] - r["gt_ry"] * r["h"] <= oy <= r["gt_y0"]):
                continue
            arr = codec.decode_raw_f32(r["bytes"], r["w"], r["h"]).astype(float)
            ci = int(np.argmin(np.abs(xs - ox)))
            ri = int(np.argmin(np.abs(ys - oy)))
            v = arr[ri, ci]
            own = 0.0 if v == codec.NO_DATA_F32 else float(v)
        for _, r in ras_pd.iterrows():
            arr = codec.decode_raw_f32(r["bytes"], r["w"], r["h"]).astype(float)
            xs, ys = pixel_centers(r["gt_x0"], r["gt_rx"], r["gt_y0"], r["gt_ry"], r["w"], r["h"])
            gx, gy = np.meshgrid(xs, ys)
            dx = (gx - ox) * np.cos(np.deg2rad(oy)) * np.pi / 180 * EARTH_R
            dy = (gy - oy) * np.pi / 180 * EARTH_R
            dist = np.hypot(dx, dy)
            goodm = (arr != codec.NO_DATA_F32) & (dist > 1.0) & (dist <= radius * np.pi / 180 * EARTH_R)
            az = (np.degrees(np.arctan2(dx[goodm], dy[goodm])) + 360.0) % 360.0
            ang = np.degrees(np.arctan2(arr[goodm] - own, dist[goodm]))
            sec = np.minimum((az / (360.0 / nsec)).astype(int), nsec - 1)
            for s, a in zip(sec, ang):
                best[s] = max(best.get(s, -np.inf), a)
        sub = got[got.pid == o["pid"]].set_index("sector")["horizon_deg"]
        assert set(sub.index) == set(best)
        for s, a in best.items():
            assert sub[s] == pytest.approx(a, abs=1e-9), (o["pid"], s)


def test_viewshed_spike_and_flat(spark):
    """Flat plane: everything visible. A tall spike: pixels strictly
    behind it (same sector, farther) become invisible; sanity vs a
    literal numpy replay of the sector rule."""
    import pandas as pd

    from gis_tools_spark.operators.topography import viewshed
    from gis_tools_spark.raster import codec as CD
    from tests.test_stitch import _mosaic

    def flat(gx, gy):
        return np.full(np.broadcast(gx, gy).shape, 5.0)

    glob, pdf, rx, ry = _mosaic(1, 1, 32, flat)
    out = viewshed(spark.createDataFrame(pdf), (16, 16),
                   observer_height=2.0).toPandas()
    assert len(out) == 32 * 32 - 1
    assert out.visible.all()

    spike = glob.copy()
    spike[16, 20] = 500.0        # due east of the observer
    pdf2 = pdf.copy()
    pdf2.at[0, "bytes"] = CD.encode_raw_f32(spike)
    out2 = viewshed(spark.createDataFrame(pdf2), (16, 16),
                    observer_height=2.0).toPandas()
    got = {(int(r.gix), int(r.giy)): bool(r.visible)
           for _, r in out2.iterrows()}
    assert got[(20, 16)]                    # the spike itself
    assert not got[(25, 16)] and not got[(31, 16)]   # shadowed due east
    assert got[(12, 16)] and got[(16, 25)]  # other directions unaffected

    # full replay of the sector rule in numpy
    oz = spike[16, 16] + 2.0
    rows = []
    for gy in range(32):
        for gx in range(32):
            dx, dy = gx - 16, gy - 16
            d2 = dx * dx + dy * dy
            if d2 == 0:
                continue
            ax, ay = abs(dx), abs(dy)
            octant = (4 if dy < 0 else 0) + (2 if dx < 0 else 0) \
                + (1 if ay > ax else 0)
            sub = 1 if 2 * min(ax, ay) >= max(ax, ay) else 0
            rows.append((octant * 2 + sub, d2,
                         (spike[gy, gx] - oz) / np.sqrt(d2), gx, gy))
    vis = {}
    for sec in set(r[0] for r in rows):
        sr = sorted([r for r in rows if r[0] == sec], key=lambda r: r[1])
        best = -np.inf
        i = 0
        while i < len(sr):
            j = i
            while j < len(sr) and sr[j][1] == sr[i][1]:
                vis[(sr[j][3], sr[j][4])] = sr[j][2] > best or best == -np.inf
                j += 1
            best = max([best] + [r[2] for r in sr[i:j]])
            i = j
    for key, v in vis.items():
        assert got[key] == v, key
