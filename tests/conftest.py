from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
# Oracle-parity scale factor; override with ORACLE_SF=0.001 for a robustness
# sweep at a different scale (ties/empty-result fragility shows up there).
SF_ORACLE = f"/root/testdata/sf{os.environ.get('ORACLE_SF', '0.01')}"


@pytest.fixture(scope="session")
def spark():
    from ds_ga1004_bigdata_project_spark.session import get_session

    s = get_session(
        app_name="engine-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.session.timeZone": "UTC",
                    "spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True)
def _stable_shuffle_width(request):
    """Tripwire for session-conf leakage between tests: any test that leaves
    ``spark.sql.shuffle.partitions`` different from how it found it (directly,
    or indirectly via a ``getOrCreate`` that merges builder confs into the
    live session) silently re-partitions every later seeded-sample path. The
    q54 snapshot pin caught one such leak; restore + flag it at the source."""
    if "spark" not in request.fixturenames:
        yield
        return
    s = request.getfixturevalue("spark")
    before = s.conf.get("spark.sql.shuffle.partitions")
    yield
    after = s.conf.get("spark.sql.shuffle.partitions")
    if after != before:
        s.conf.set("spark.sql.shuffle.partitions", before)
        pytest.fail(
            f"test leaked spark.sql.shuffle.partitions ({before} -> {after}); "
            f"restore session conf before returning")


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    yield con
    con.close()
