import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests run fine at local[8]


@pytest.fixture(scope="session")
def spark():
    from log_analysis_spark.session import get_spark

    s = get_spark("tests", master="local[8]")
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="las_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
