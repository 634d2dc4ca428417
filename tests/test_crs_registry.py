"""Declarative CRS constructor (round-2 verdict / next-round #6):
register_crs parameter dicts must reproduce published coordinates and
close round-trips for three registry-only EPSG additions."""

import numpy as np
import pytest

from gis_tools_spark.functions import crs


def _roundtrip(code, lon, lat, tol=1e-8):
    x, y = crs.transform_xy(np.asarray([lon]), np.asarray([lat]), "4326", code)
    lon2, lat2 = crs.transform_xy(x, y, code, "4326")
    assert lon2[0] == pytest.approx(lon, abs=tol)
    assert lat2[0] == pytest.approx(lat, abs=tol)
    return float(x[0]), float(y[0])


def test_27700_osgb_worked_example():
    """OS 'A guide to coordinate systems in Great Britain' worked
    example (projection math on Airy 1830, datum-free):
    52°39'27.2531"N 1°43'4.5177"E -> E 651409.903 N 313177.270."""
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    x, y = _roundtrip("27700", lon, lat)
    assert x == pytest.approx(651409.903, abs=5e-3)
    assert y == pytest.approx(313177.270, abs=5e-3)


def test_27700_scale_on_central_meridian():
    """TM scale along lon_0 must equal k_0 (projection invariant)."""
    p = crs.EPSG_REGISTRY["27700"]
    lat = np.array([53.0])
    dphi = 1e-6
    _, y1 = p.fwd(np.array([-2.0]), lat)
    _, y2 = p.fwd(np.array([-2.0]), lat + dphi)
    # meridian radius of curvature on Airy at 53N
    a, rf = crs.ELLIPSOIDS["airy"]
    e2 = 1 - (1 - 1 / rf) ** 2
    s = np.sin(np.deg2rad(53.0))
    M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
    scale = (y2[0] - y1[0]) / (np.deg2rad(dphi) * M)
    assert scale == pytest.approx(0.9996012717, abs=1e-7)


def test_25832_matches_utm32_kernel():
    """The declarative tmerc(lat_0=0, lon_0=9, k_0=.9996, fe=5e5) must
    agree with the dedicated UTM kernel (validated round 2) to sub-mm
    (GRS80 vs WGS84 differ by <1e-4 mm)."""
    lon = np.array([8.1, 9.7, 11.3])
    lat = np.array([47.3, 52.9, 58.2])
    x1, y1 = crs.transform_xy(lon.copy(), lat.copy(), "4326", "25832")
    x2, y2 = crs.transform_xy(lon.copy(), lat.copy(), "4326", "utm:32")
    np.testing.assert_allclose(x1, x2, atol=1e-4)
    np.testing.assert_allclose(y1, y2, atol=1e-4)


def test_3310_california_albers_properties():
    # natural origin maps to the false origin
    x, y = crs.transform_xy(np.array([-120.0]), np.array([0.0]), "4326", "3310")
    assert x[0] == pytest.approx(0.0, abs=1e-6)
    assert y[0] == pytest.approx(-4_000_000.0, abs=1e-6)
    _roundtrip("3310", -118.24, 34.05)
    # equal-area: |jacobian| of fwd == 1 (on the authalic sphere scale)
    p = crs.EPSG_REGISTRY["3310"]
    for lon, lat in [(-122.4, 37.8), (-116.5, 33.8), (-120.0, 40.0)]:
        d = 1e-6
        x0, y0 = p.fwd(np.array([lon]), np.array([lat]))
        xl, yl = p.fwd(np.array([lon + d]), np.array([lat]))
        xp, yp = p.fwd(np.array([lon]), np.array([lat + d]))
        a, rf = crs.ELLIPSOIDS["GRS80"]
        e2 = 1 - (1 - 1 / rf) ** 2
        s = np.sin(np.deg2rad(lat))
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        N = a / np.sqrt(1 - e2 * s * s)
        jac = abs((xl[0] - x0[0]) * (yp[0] - y0[0])
                  - (xp[0] - x0[0]) * (yl[0] - y0[0]))
        truth = (np.deg2rad(d) * M) * (np.deg2rad(d) * N * np.cos(np.deg2rad(lat)))
        assert jac / truth == pytest.approx(1.0, abs=1e-5)


def test_3395_world_mercator():
    # equator: x = a * lon_rad, y = 0
    x, y = crs.transform_xy(np.array([45.0]), np.array([0.0]), "4326", "3395")
    assert x[0] == pytest.approx(6_378_137.0 * np.pi / 4, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-9)
    # ellipsoidal Mercator y at 52N differs from spherical 3857 by ~20km
    xs, ys = crs.transform_xy(np.array([0.0]), np.array([52.0]), "4326", "3857")
    xe, ye = crs.transform_xy(np.array([0.0]), np.array([52.0]), "4326", "3395")
    assert 15_000 < ys[0] - ye[0] < 35_000
    _roundtrip("3395", 13.4, 52.5)


def test_register_crs_rejects_unknown_family():
    # cass/omerc joined in round 4 — NZ Map Grid's polynomial form has not
    with pytest.raises(NotImplementedError):
        crs.register_crs(99999, dict(proj="nzmg", lat_0=-41, lon_0=173))
    with pytest.raises(NotImplementedError):
        crs.register_crs(99998, dict(proj="lcc", lat_0=49, lon_0=-95,
                                     lat_1=49, lat_2=77, ellps="airy"))


def test_polar_stereographic_3031_invariants():
    """EPSG 3031 (Antarctic Polar Stereographic): pole at origin,
    true scale at the 71S standard parallel, exact round-trips."""
    import numpy as np
    from gis_tools_spark.functions.crs import transform_xy

    x, y = transform_xy(np.array([0.0]), np.array([-90.0]), "4326", "3031")
    assert abs(float(x[0])) < 1e-6 and abs(float(y[0])) < 1e-6
    rng = np.random.default_rng(0)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-89.9, -55, 500)
    X, Y = transform_xy(lon, lat, "4326", "3031")
    lo, la = transform_xy(X, Y, "3031", "4326")
    assert np.abs((lo - lon + 180) % 360 - 180).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    # scale factor = 1 at lat_ts (numeric derivative along the meridian)
    eps = 1e-6
    x1, y1 = transform_xy(np.array([10.0]), np.array([-71.0 - eps]), "4326", "3031")
    x2, y2 = transform_xy(np.array([10.0]), np.array([-71.0 + eps]), "4326", "3031")
    a, e2 = 6378137.0, 0.00669437999014
    phi = np.radians(71.0)
    M = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    k = float(np.hypot(x2 - x1, y2 - y1)[0]) / (2 * eps * np.pi / 180 * M)
    assert abs(k - 1.0) < 1e-6


def test_polar_stereographic_published_sample():
    """IOGP Guidance Note 7-2 variant-B worked example (WGS84 /
    Australian Antarctic, EPSG 3032): 75S 120E -> E 7255380.79,
    N 7053389.56 (FE=FN=6000000, lat_ts=-71, lon_0=70E)."""
    import numpy as np
    from gis_tools_spark.functions.crs import register_crs, transform_xy

    register_crs(3032, dict(proj="stere", lat_0=-90.0, lat_ts=-71.0,
                            lon_0=70.0, x_0=6_000_000.0, y_0=6_000_000.0,
                            ellps="WGS84"))
    x, y = transform_xy(np.array([120.0]), np.array([-75.0]), "4326", "3032")
    assert abs(float(x[0]) - 7255380.79) < 0.01
    assert abs(float(y[0]) - 7053389.56) < 0.01
    lo, la = transform_xy(np.array([7255380.79]), np.array([7053389.56]),
                          "3032", "4326")
    assert abs(float(lo[0]) - 120.0) < 1e-6
    assert abs(float(la[0]) + 75.0) < 1e-6


def test_polar_stereographic_north_3413():
    import numpy as np
    import pytest
    from gis_tools_spark.functions.crs import register_crs, transform_xy

    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(55, 89.9, 500)
    X, Y = transform_xy(lon, lat, "4326", "3413")
    lo, la = transform_xy(X, Y, "3413", "4326")
    assert np.abs((lo - lon + 180) % 360 - 180).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9
    # non-polar stereographic aspects are explicitly unsupported
    with pytest.raises(NotImplementedError):
        register_crs(99999, dict(proj="stere", lat_0=52.0, lon_0=5.0))


def test_swiss_oblique_mercator_2056_21781():
    import numpy as np
    from gis_tools_spark.functions.crs import EPSG_REGISTRY, transform_xy

    bern_lon = 7 + 26 / 60 + 22.50 / 3600
    bern_lat = 46 + 57 / 60 + 8.66 / 3600
    e95, n95 = transform_xy(np.array([bern_lon]), np.array([bern_lat]),
                            "4326", "2056")
    # projection center maps to the false origin exactly by construction
    assert abs(float(e95[0]) - 2_600_000.0) < 1e-6
    assert abs(float(n95[0]) - 1_200_000.0) < 1e-6
    # LV03 is the same projection shifted by exactly (2_000_000, 1_000_000)
    e03, n03 = transform_xy(np.array([bern_lon]), np.array([bern_lat]),
                            "4326", "21781")
    assert abs(float(e95[0] - e03[0]) - 2_000_000.0) < 1e-6
    assert abs(float(n95[0] - n03[0]) - 1_000_000.0) < 1e-6

    # roundtrip over a Switzerland-wide grid: sub-mm
    rng = np.random.default_rng(4)
    lon = rng.uniform(5.9, 10.5, 400)
    lat = rng.uniform(45.8, 47.8, 400)
    X, Y = transform_xy(lon.copy(), lat.copy(), "4326", "2056")
    lo, la = transform_xy(X, Y, "2056", "4326")
    assert np.abs(lo - lon).max() < 1e-9
    assert np.abs(la - lat).max() < 1e-9

    # due north at the center moves only the northing (axis alignment)
    p = EPSG_REGISTRY["2056"]
    e2, n2 = p.fwd(bern_lon, bern_lat + 0.01)
    assert abs(float(e2) - 2_600_000.0) < 0.02
    assert float(n2) > 1_200_000.0 + 1000

    # conformality: the numeric Jacobian is a similarity transform
    # (equal singular values) everywhere on the grid — a strong
    # independent invariant of the double-projection formulas
    d = 1e-6
    for lo0, la0 in [(6.5, 46.0), (9.9, 47.5), (8.2, 46.7)]:
        ex, nx = p.fwd(lo0 + d, la0)
        ey, ny = p.fwd(lo0, la0 + d)
        e0, n0 = p.fwd(lo0, la0)
        J = np.array([[float(ex - e0), float(ey - e0)],
                      [float(nx - n0), float(ny - n0)]]) / d
        # normalize the graticule by TRUE ground distances on the
        # Bessel ellipsoid: dλ → ν·cosφ, dφ → ρ (meridional radius)
        a_b, rf_b = 6_377_397.155, 299.1528128
        e2b = 1 - (1 - 1 / rf_b) ** 2
        s2 = np.sin(np.deg2rad(la0)) ** 2
        nu = a_b / np.sqrt(1 - e2b * s2)
        rho = a_b * (1 - e2b) / (1 - e2b * s2) ** 1.5
        J[:, 0] /= nu * np.cos(np.deg2rad(la0))
        J[:, 1] /= rho
        sv = np.linalg.svd(J, compute_uv=False)
        assert sv[0] / sv[1] < 1.00001


def test_krovak_epsg_worked_example():
    """EPSG Guidance Note 7-2 Krovak example: φ=50°12'32.4416"N,
    λ=16°50'59.1790"E (Greenwich) → Southing 1050538.63, Westing
    568991.00 on Bessel; EPSG 5514 (Krovak East North) negates both."""
    from gis_tools_spark.functions.crs import EPSG_REGISTRY, transform_xy

    lon = 16 + 50 / 60 + 59.1790 / 3600
    lat = 50 + 12 / 60 + 32.4416 / 3600
    x, y = transform_xy(np.array([lon]), np.array([lat]), "4326", "5514")
    assert abs(float(x[0]) - (-568991.00)) < 0.05
    assert abs(float(y[0]) - (-1050538.63)) < 0.05
    lo, la = transform_xy(x, y, "5514", "4326")
    assert abs(float(lo[0]) - lon) < 1e-9
    assert abs(float(la[0]) - lat) < 1e-9

    # Czechia-wide roundtrip grid
    rng = np.random.default_rng(5)
    lons = rng.uniform(12.1, 18.9, 400)
    lats = rng.uniform(48.5, 51.1, 400)
    X, Y = transform_xy(lons.copy(), lats.copy(), "4326", "5514")
    lo, la = transform_xy(X, Y, "5514", "4326")
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9
    # Prague sanity: easting ≈ -743k, northing ≈ -1044k
    px, py = transform_xy(np.array([14.42]), np.array([50.088]),
                          "4326", "5514")
    assert -747_000 < float(px[0]) < -740_000
    assert -1_047_000 < float(py[0]) < -1_041_000

    # conformality of the oblique cone (similarity Jacobian on Bessel)
    p = EPSG_REGISTRY["5514"]
    d = 1e-6
    for lo0, la0 in [(13.0, 49.0), (17.5, 50.5), (15.0, 48.8)]:
        ex, nx = p.fwd(np.array([lo0 + d]), np.array([la0]))
        ey, ny = p.fwd(np.array([lo0]), np.array([la0 + d]))
        e0, n0 = p.fwd(np.array([lo0]), np.array([la0]))
        J = np.array([[float(ex - e0), float(ey - e0)],
                      [float(nx - n0), float(ny - n0)]]) / d
        a_b, rf_b = 6_377_397.155, 299.1528128
        e2b = 1 - (1 - 1 / rf_b) ** 2
        s2 = np.sin(np.deg2rad(la0)) ** 2
        nu = a_b / np.sqrt(1 - e2b * s2)
        rho = a_b * (1 - e2b) / (1 - e2b * s2) ** 1.5
        J[:, 0] /= nu * np.cos(np.deg2rad(la0))
        J[:, 1] /= rho
        sv = np.linalg.svd(J, compute_uv=False)
        assert sv[0] / sv[1] < 1.00001


def test_omerc_epsg_worked_example():
    """EPSG GN7-2 Hotine Oblique Mercator variant B example (Timbalai
    1948 / RSO Borneo, EPSG 29873): φ=5°23'14.1129"N λ=115°48'19.8196"E
    → E=679245.73, N=596562.78 on Everest 1830 (1967)."""
    from gis_tools_spark.functions.crs import EPSG_REGISTRY, transform_xy

    lon = 115 + 48 / 60 + 19.8196 / 3600
    lat = 5 + 23 / 60 + 14.1129 / 3600
    x, y = transform_xy(np.array([lon]), np.array([lat]), "4326", "29873")
    assert abs(float(x[0]) - 679245.73) < 0.05
    assert abs(float(y[0]) - 596562.78) < 0.05
    lo, la = transform_xy(x, y, "29873", "4326")
    assert abs(float(lo[0]) - lon) < 1e-9
    assert abs(float(la[0]) - lat) < 1e-9

    # variant A ('no_uoff', GDM2000 Peninsular RSO 3375): roundtrip +
    # scale sanity at the projection centre (k≈k_0=0.99984)
    rng = np.random.default_rng(6)
    lons = rng.uniform(100.0, 104.5, 300)
    lats = rng.uniform(1.2, 6.7, 300)
    X, Y = transform_xy(lons.copy(), lats.copy(), "4326", "3375")
    lo, la = transform_xy(X, Y, "3375", "4326")
    assert np.abs(lo - lons).max() < 1e-9
    assert np.abs(la - lats).max() < 1e-9
    p = EPSG_REGISTRY["3375"]
    d = 1e-6
    e0, n0 = p.fwd(np.array([102.25]), np.array([4.0]))
    ex, nx = p.fwd(np.array([102.25 + d]), np.array([4.0]))
    a_g, rf_g = 6_378_137.0, 298.257222101
    e2g = 1 - (1 - 1 / rf_g) ** 2
    nu = a_g / np.sqrt(1 - e2g * np.sin(np.deg2rad(4.0)) ** 2)
    k = np.hypot(float(ex - e0), float(nx - n0)) / d \
        / (nu * np.cos(np.deg2rad(4.0)) * np.pi / 180 * 1)
    # numeric scale per degree → per radian normalization
    k = np.hypot(float(ex - e0), float(nx - n0)) / (
        np.deg2rad(d) * nu * np.cos(np.deg2rad(4.0)))
    assert abs(k - 0.99984) < 1e-4


def test_cassini_epsg_worked_example():
    """EPSG guidance note 7-2, method 9806 (Trinidad 1903 / Trinidad
    Grid, Clarke 1858 in Clarke's links): the published worked example
    point reproduces to the published 0.01-link precision."""
    from gis_tools_spark.functions.crs import EPSG_REGISTRY
    p = EPSG_REGISTRY["30200"]
    x, y = p.fwd(np.array([-62.0]), np.array([10.0]))
    assert abs(x[0] - 66644.94) < 0.02
    assert abs(y[0] - 82536.22) < 0.02
    lon, lat = p.inv(x, y)
    assert abs(lon[0] + 62.0) < 1e-9 and abs(lat[0] - 10.0) < 1e-9


def test_eqc_matches_numeric_meridian_arc():
    """EPSG 4087 (World Equidistant Cylindrical): x is exactly
    a*lambda on the equator-referenced grid, and y equals the meridian
    arc computed by NUMERIC INTEGRATION of the exact integrand — an
    oracle independent of the Snyder series in the implementation."""
    from gis_tools_spark.functions.crs import EPSG_REGISTRY
    p = EPSG_REGISTRY["4087"]
    a, f_inv = 6378137.0, 298.257223563
    e2 = 1 - (1 - 1 / f_inv) ** 2
    for lat in (0.0, 23.5, 55.0, -78.0):
        phi = np.deg2rad(lat)
        t = np.linspace(0.0, phi, 200001)
        m_num = np.trapz(a * (1 - e2) / (1 - e2 * np.sin(t) ** 2) ** 1.5, t)
        x, y = p.fwd(np.array([10.0]), np.array([lat]))
        assert abs(x[0] - a * np.deg2rad(10.0)) < 1e-6
        assert abs(y[0] - m_num) < 0.002          # series vs integration
        lon2, lat2 = p.inv(x, y)
        assert abs(lon2[0] - 10.0) < 1e-9 and abs(lat2[0] - lat) < 1e-7


# ------------------------------------------------- sinusoidal / mollweide

def test_modis_sinusoidal_closed_form():
    """MODIS land grid: spherical sinusoidal on R=6371007.181 —
    x = R*lam*cos(phi), y = R*phi exactly; the grid's published extent
    (half the sphere circumference, +/-20015109.354 m) follows."""
    R = 6_371_007.181
    lon = np.array([-180.0, -65.3, 0.0, 103.7, 180.0])
    lat = np.array([0.0, 12.5, 48.0, -33.25, 0.0])
    x, y = crs.transform_xy(lon.copy(), lat.copy(), "4326", "modis_sinu")
    np.testing.assert_allclose(
        x, R * np.deg2rad(lon) * np.cos(np.deg2rad(lat)), rtol=1e-12)
    np.testing.assert_allclose(y, R * np.deg2rad(lat), rtol=1e-12)
    assert x[0] == pytest.approx(-20015109.354, abs=1e-2)
    lon2, lat2 = crs.transform_xy(x, y, "modis_sinu", "4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def _numeric_jacobian(p, lon, lat, d=1e-6):
    x0, y0 = p.fwd(np.array([lon]), np.array([lat]))
    xl, yl = p.fwd(np.array([lon + d]), np.array([lat]))
    xp, yp = p.fwd(np.array([lon]), np.array([lat + d]))
    dd = np.deg2rad(d)
    return ((xl[0] - x0[0]) / dd * (yp[0] - y0[0]) / dd
            - (xp[0] - x0[0]) / dd * (yl[0] - y0[0]) / dd)


def test_54008_sinusoidal_equal_area_on_ellipsoid():
    """Ellipsoidal sinusoidal is exactly equal-area: the numeric
    Jacobian must equal the ellipsoid area element
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2."""
    p = crs.EPSG_REGISTRY["54008"]
    a, rf = crs.ELLIPSOIDS["WGS84"]
    e2 = 1 - (1 - 1 / rf) ** 2
    for lon, lat in [(0.0, 0.0), (45.0, 30.0), (-120.0, 67.5), (9.0, -48.0)]:
        s = np.sin(np.deg2rad(lat))
        want = a * a * (1 - e2) * np.cos(np.deg2rad(lat)) / (1 - e2 * s * s) ** 2
        got = _numeric_jacobian(p, lon, lat)
        assert got == pytest.approx(want, rel=1e-5)
    _roundtrip("54008", 103.7, -33.25)
    _roundtrip("54008", -179.0, 81.0)


def test_54009_mollweide_invariants():
    """Mollweide closed-form anchors: y(+/-90) = +/- sqrt(2) R with
    x = 0; the equator maps to x = (2 sqrt(2)/pi) R lam, y = 0; the
    whole map is equal-area at the sphere's area element R^2 cos(phi)."""
    p = crs.EPSG_REGISTRY["54009"]
    Rs = crs.ELLIPSOIDS["WGS84"][0]  # PROJ moll zeroes eccentricity
    x, y = p.fwd(np.array([0.0, 0.0, 77.0]), np.array([90.0, -90.0, 0.0]))
    assert y[0] == pytest.approx(np.sqrt(2) * Rs, abs=1e-3)
    assert y[1] == pytest.approx(-np.sqrt(2) * Rs, abs=1e-3)
    assert abs(x[0]) < 1e-3 and abs(x[1]) < 1e-3
    assert x[2] == pytest.approx(
        2 * np.sqrt(2) / np.pi * Rs * np.deg2rad(77.0), rel=1e-12)
    assert y[2] == pytest.approx(0.0, abs=1e-6)
    for lon, lat in [(0.0, 0.0), (45.0, 30.0), (-120.0, 67.5), (9.0, -48.0)]:
        want = Rs * Rs * np.cos(np.deg2rad(lat))
        got = _numeric_jacobian(p, lon, lat)
        assert got == pytest.approx(want, rel=1e-4)
    _roundtrip("54009", 103.7, -33.25, tol=1e-7)
    _roundtrip("54009", -179.0, 81.0, tol=1e-7)


def test_mollweide_newton_converges_near_pole():
    p = crs.EPSG_REGISTRY["54009"]
    lon = np.array([10.0, 10.0, 10.0])
    lat = np.array([89.999, 89.9999999, 90.0])
    x, y = p.fwd(lon, lat)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    assert y[2] == pytest.approx(np.sqrt(2) * crs.ELLIPSOIDS["WGS84"][0],
                                 abs=1e-3)
