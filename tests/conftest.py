from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from deepee_spark.session import get_spark

    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture()
def catalog(tmp_path):
    from deepee_spark.sources.tables import StageCatalog

    return StageCatalog(str(tmp_path / "catalog"))
