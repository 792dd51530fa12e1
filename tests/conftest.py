import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rados_timestore_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark(app_name="rts-tests", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture()
def store(spark, tmp_path):
    from rados_timestore_spark.store import TimeStore

    return TimeStore(spark, str(tmp_path / "warehouse"))


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
