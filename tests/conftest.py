from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from gis_tools_spark import get_spark

    s = get_spark(app_name="gis_tools_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def zones_pd():
    from gis_tools_spark import fixtures

    return fixtures.gen_zones(16)


@pytest.fixture(scope="session")
def points_pd(zones_pd):
    from gis_tools_spark import fixtures

    return fixtures.gen_points(1500, zones=zones_pd)
