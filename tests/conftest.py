import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


def get_session():
    """Module-level accessor for hypothesis tests (fixtures inside @given
    trip hypothesis's health checks); getOrCreate makes it share the
    fixture's session."""
    from i3dm_export_spark.session import get_spark

    return get_spark(app_name="i3dm_export_spark_tests", shuffle_partitions=8)


@pytest.fixture(scope="session")
def spark():
    s = get_session()
    yield s
    s.stop()
