import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from clj_orc_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="clj-orc-spark-tests")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s
    s.stop()


@pytest.fixture()
def tmp_dir():
    d = tempfile.mkdtemp(prefix="clj-orc-spark-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def token_table_dir():
    """Shared 5k-row deterministic token table + reference ORC copy."""
    from clj_orc_spark.datagen import write_token_table

    d = os.path.join(tempfile.gettempdir(), "clj-orc-spark-fixture-5k")
    write_token_table(d, 5_000, seed=42)
    return d
