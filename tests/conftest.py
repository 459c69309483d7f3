import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from geokitten_spark.session import get_spark

    s = get_spark(
        app_name="geokitten-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


SF_DIR = os.environ.get("GK_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"
