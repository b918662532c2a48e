import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commons_codec_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small local session: tests verify correctness, not throughput.
    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=4)
    yield s
