"""ripleys_k / quadrat_test vs brute-force references."""

import numpy as np
import pandas as pd

from gis_tools_spark.operators.pointpattern import quadrat_test, ripleys_k


def _brute_k(pdf, radii, area):
    x = np.floor(pdf["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    y = np.floor(pdf["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    n = len(x)
    d2 = ((x[:, None] - x[None, :]) ** 2
          + (y[:, None] - y[None, :]) ** 2)
    np.fill_diagonal(d2, -1)
    out = []
    for r in sorted(radii):
        ri = int(round(r * 1e6))
        c = int(((d2 > 0) & (d2 <= ri * ri)).sum())
        out.append((c, area * c / (n * (n - 1))))
    return out


def test_matches_bruteforce(spark):
    rng = np.random.RandomState(4)
    pdf = pd.DataFrame({"lon": rng.uniform(0, 1, 400),
                        "lat": rng.uniform(0, 1, 400)})
    radii = [0.03, 0.07, 0.15, 0.5]
    got = (ripleys_k(spark.createDataFrame(pdf), radii=radii, area=1.0)
           .orderBy("r_idx").collect())
    want = _brute_k(pdf, radii, 1.0)
    for g, (c, k) in zip(got, want):
        assert g["n_pairs_le"] == c
        assert abs(g["k_hat"] - k) < 1e-12
        assert abs(g["l_hat"] - np.sqrt(k / np.pi)) < 1e-12


def test_csr_l_near_r_and_cluster_exceeds(spark):
    rng = np.random.RandomState(7)
    csr = pd.DataFrame({"lon": rng.uniform(0, 1, 2500),
                        "lat": rng.uniform(0, 1, 2500)})
    centers = rng.uniform(0.2, 0.8, (12, 2))
    cl = centers[rng.randint(0, 12, 2500)] + rng.normal(0, 0.01, (2500, 2))
    clus = pd.DataFrame({"lon": cl[:, 0], "lat": cl[:, 1]})
    r = [0.05]
    k_csr = ripleys_k(spark.createDataFrame(csr), radii=r,
                      area=1.0).head()["k_hat"]
    k_cl = ripleys_k(spark.createDataFrame(clus), radii=r,
                     area=1.0).head()["k_hat"]
    expected = np.pi * 0.05 ** 2
    assert abs(k_csr - expected) / expected < 0.25   # CSR ≈ πr² (edge bias)
    assert k_cl > 3 * k_csr                          # clustering detected


def test_coincident_points_excluded(spark):
    pdf = pd.DataFrame({"lon": [0.5] * 10 + [0.6],
                        "lat": [0.5] * 10 + [0.6]})
    out = ripleys_k(spark.createDataFrame(pdf), radii=[0.01, 1.0],
                    area=1.0).orderBy("r_idx").collect()
    assert out[0]["n_pairs_le"] == 0              # coincident ⇒ d2=0 out
    assert out[1]["n_pairs_le"] == 2 * 10         # each dup ↔ the far point


def test_quadrat_matches_bruteforce(spark):
    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({"lon": rng.uniform(2, 9, 1200),
                        "lat": rng.uniform(41, 44, 1200)})
    res = 9
    row = quadrat_test(spark.createDataFrame(pdf), res=res).head()
    n_g = 1 << res
    gx = np.clip(np.floor((pdf["lon"] + 180) / 360 * n_g), 0, n_g - 1) \
        .astype(np.int64)
    gy = np.clip(np.floor((pdf["lat"] + 90) / 180 * n_g), 0, n_g - 1) \
        .astype(np.int64)
    m = (gx.max() - gx.min() + 1) * (gy.max() - gy.min() + 1)
    counts = pd.Series(zip(gx, gy)).value_counts()
    ss = int((counts ** 2).sum())
    n = len(pdf)
    assert row["n_points"] == n and row["n_cells"] == m
    assert row["sum_sq"] == ss
    assert abs(row["chi2"] - (m * ss / n - n)) < 1e-9
    # χ² equals the literal per-cell sum including empties
    e = n / m
    chi_direct = ((counts - e) ** 2 / e).sum() + (m - len(counts)) * e
    assert abs(row["chi2"] - chi_direct) < 1e-6


def test_uniform_vs_clustered_chi2(spark):
    rng = np.random.RandomState(11)
    uni = pd.DataFrame({"lon": rng.uniform(0, 40, 4000),
                        "lat": rng.uniform(0, 20, 4000)})
    cl = pd.DataFrame({"lon": 20 + rng.normal(0, 0.3, 4000),
                       "lat": 10 + rng.normal(0, 0.3, 4000)})
    a = quadrat_test(spark.createDataFrame(uni), res=7).head()
    b = quadrat_test(spark.createDataFrame(cl), res=7).head()
    # normalized by dof: clustered far exceeds uniform
    assert b["chi2"] / max(b["dof"], 1) > 10 * a["chi2"] / max(a["dof"], 1)


def test_cross_k_bruteforce(spark):
    from gis_tools_spark.operators.pointpattern import cross_k

    rng = np.random.RandomState(12)
    a = pd.DataFrame({"lon": rng.uniform(0, 1, 150),
                      "lat": rng.uniform(0, 1, 150)})
    b = pd.DataFrame({"lon": rng.uniform(0, 1, 200),
                      "lat": rng.uniform(0, 1, 200)})
    radii = [0.05, 0.2]
    got = cross_k(spark.createDataFrame(a), spark.createDataFrame(b),
                  radii=radii, area=1.0).orderBy("r_idx").collect()
    ax = np.floor(a["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    ay = np.floor(a["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    bx = np.floor(b["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    by = np.floor(b["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    d2 = ((ax[:, None] - bx[None, :]) ** 2
          + (ay[:, None] - by[None, :]) ** 2)
    for g, r in zip(got, sorted(radii)):
        ri = int(round(r * 1e6))
        c = int((d2 <= ri * ri).sum())
        assert g["n_pairs_le"] == c
        assert abs(g["k_hat"] - c / (150 * 200)) < 1e-12


def test_cross_k_attraction_vs_independence(spark):
    from gis_tools_spark.operators.pointpattern import cross_k

    rng = np.random.RandomState(13)
    a = pd.DataFrame({"lon": rng.uniform(0, 1, 300),
                      "lat": rng.uniform(0, 1, 300)})
    # B clustered tightly around A points -> attraction
    pick = rng.randint(0, 300, 600)
    b_near = pd.DataFrame({
        "lon": a["lon"].to_numpy()[pick] + rng.normal(0, 0.002, 600),
        "lat": a["lat"].to_numpy()[pick] + rng.normal(0, 0.002, 600)})
    b_ind = pd.DataFrame({"lon": rng.uniform(0, 1, 600),
                          "lat": rng.uniform(0, 1, 600)})
    r = [0.02]
    k_near = cross_k(spark.createDataFrame(a),
                     spark.createDataFrame(b_near),
                     radii=r, area=1.0).head()["k_hat"]
    k_ind = cross_k(spark.createDataFrame(a),
                    spark.createDataFrame(b_ind),
                    radii=r, area=1.0).head()["k_hat"]
    csr = np.pi * 0.02 ** 2
    assert k_near > 3 * csr        # strong attraction
    assert abs(k_ind - csr) / csr < 0.5


def test_g_function_bruteforce(spark):
    from gis_tools_spark.operators.pointpattern import g_function

    rng = np.random.RandomState(21)
    pdf = pd.DataFrame({"lon": rng.uniform(0, 1, 250),
                        "lat": rng.uniform(0, 1, 250)})
    radii = [0.02, 0.05, 0.3]
    got = (g_function(spark.createDataFrame(pdf), radii=radii)
           .orderBy("r_idx").collect())
    x = np.floor(pdf["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    y = np.floor(pdf["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    d2 = ((x[:, None] - x[None, :]) ** 2
          + (y[:, None] - y[None, :]) ** 2).astype(float)
    np.fill_diagonal(d2, np.inf)
    nn = d2.min(1)
    for g, r in zip(got, sorted(radii)):
        ri = int(round(r * 1e6))
        assert g["n_le"] == int((nn <= ri * ri).sum())
        assert abs(g["g_hat"] - (nn <= ri * ri).mean()) < 1e-12
    # max radius 0.3 on a unit square: nothing censored
    assert got[0]["n_censored"] == 0


def test_g_function_censoring_and_csr(spark):
    from gis_tools_spark.operators.pointpattern import g_function

    # two far-apart points: NN distance 1.0 > rmax=0.1 -> both censored
    pdf = pd.DataFrame({"lon": [0.0, 1.0], "lat": [0.0, 0.0]})
    got = g_function(spark.createDataFrame(pdf), radii=[0.1]).head()
    assert got["n_censored"] == 2 and got["n_le"] == 0
    # CSR: G(r) ~ 1 - exp(-lambda*pi*r^2)
    rng = np.random.RandomState(22)
    csr = pd.DataFrame({"lon": rng.uniform(0, 1, 2000),
                        "lat": rng.uniform(0, 1, 2000)})
    r = 0.012
    got = g_function(spark.createDataFrame(csr), radii=[r]).head()
    want = 1 - np.exp(-2000 * np.pi * r * r)
    assert abs(got["g_hat"] - want) < 0.07


def test_f_function_bruteforce_and_csr_duality(spark):
    from gis_tools_spark.operators.pointpattern import f_function

    rng = np.random.RandomState(31)
    pts = pd.DataFrame({"lon": rng.uniform(0, 1, 400),
                        "lat": rng.uniform(0, 1, 400)})
    smp = pd.DataFrame({"lon": rng.uniform(0, 1, 300),
                        "lat": rng.uniform(0, 1, 300)})
    radii = [0.02, 0.05, 0.4]
    got = (f_function(spark.createDataFrame(pts),
                      spark.createDataFrame(smp), radii=radii)
           .orderBy("r_idx").collect())
    px = np.floor(pts["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    py = np.floor(pts["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    sx = np.floor(smp["lon"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    sy = np.floor(smp["lat"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    d2 = ((sx[:, None] - px[None, :]) ** 2
          + (sy[:, None] - py[None, :]) ** 2)
    nn = d2.min(1)
    for g, r in zip(got, sorted(radii)):
        ri = int(round(r * 1e6))
        assert g["n_le"] == int((nn <= ri * ri).sum())
    assert got[-1]["n_censored"] == 0
    # clustered data pushes F BELOW the CSR curve (more empty space)
    centers = rng.uniform(0.2, 0.8, (8, 2))
    cl = centers[rng.randint(0, 8, 400)] + rng.normal(0, 0.01, (400, 2))
    clus = pd.DataFrame({"lon": cl[:, 0], "lat": cl[:, 1]})
    r = [0.03]
    f_csr = f_function(spark.createDataFrame(pts),
                       spark.createDataFrame(smp), radii=r) \
        .head()["f_hat"]
    f_cl = f_function(spark.createDataFrame(clus),
                      spark.createDataFrame(smp), radii=r) \
        .head()["f_hat"]
    assert f_cl < 0.7 * f_csr
