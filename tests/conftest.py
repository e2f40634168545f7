from __future__ import annotations

import pytest

from fs_schema_validator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        master="local[4]",
        app_name="fsv-spark-tests",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/fsv-spark-warehouse"},
    )
    yield s
    s.stop()
