from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from wistia_data_pipeline_project_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, driver_memory="6g")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
