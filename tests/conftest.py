import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "8g")


@pytest.fixture(scope="session")
def spark():
    from aligned_spark.session import get_spark

    s = get_spark(app_name="aligned_spark_tests")
    yield s


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
