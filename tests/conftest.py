from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from tcdb_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("spark_warehouse"))
    s = get_spark(
        "tcdb-tests",
        cpus=8,
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield s
