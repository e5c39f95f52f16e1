import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def pytest_sessionstart(session):
    """Adopt driver-written round evidence before any test runs
    (round-10 verdict ask 1): the driver writes
    ``BENCH_r{N}.json`` / ``CORRECTNESS_r{N}.json`` AFTER the round's
    last commit, so the first pytest of the next round used to fail
    ``test_artifact_tracking`` until a human ran ``git add``. Staging
    them here makes the fix structural — the tracking test checks
    ``git ls-files``, which includes staged-but-uncommitted files."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        import gatelib

        staged = gatelib.stage_round_artifacts()
        if staged:
            print(f"[conftest] staged driver round artifacts: {staged}")
    except Exception:  # noqa: BLE001 — staging must never block tests
        pass


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from transformers_spark.session import get_spark

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(
        app_name="transformers-spark-tests",
        warehouse_dir=warehouse,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.host": "127.0.0.1",
            "spark.sql.shuffle.partitions": "8",
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    """Unpersist operator-persisted intermediates after each test so
    cached gram/vocab frames don't accumulate executor memory across
    the ~90-query oracle parametrization (one shared session)."""
    yield
    from transformers_spark import cache

    cache.release()
