import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import pytest


@pytest.fixture(scope="session")
def spark():
    from weblog_pipeline.session import build_session

    s = build_session(app_name="weblog-tests", parallelism=4, shuffle_partitions=8)
    yield s
    s.stop()
