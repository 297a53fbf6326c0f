import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS_DIR = os.path.join(REPO_ROOT, "tests")
for p in (REPO_ROOT, TESTS_DIR):
    if p not in sys.path:
        sys.path.insert(0, p)


@pytest.fixture(scope="session")
def spark():
    from bisque_spark.session import get_spark

    s = get_spark(app_name="bisque_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
