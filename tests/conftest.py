import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from letsearch_spark.session import get_spark

    # Env knobs (default = the long-standing values) so suite-latency
    # experiments can A/B the session shape without editing this file.
    cores = os.environ.get("SPARK_GRAFT_TEST_CORES", "4")
    shuffle = int(os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "8"))
    extra = {}
    aqe = os.environ.get("SPARK_GRAFT_TEST_AQE")
    if aqe is not None:
        extra["spark.sql.adaptive.enabled"] = aqe
    s = get_spark(
        "letsearch-spark-tests",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle,
        extra_conf=extra,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
