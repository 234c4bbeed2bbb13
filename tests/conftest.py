import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from causalre_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="causalre_tests", cores=8,
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
