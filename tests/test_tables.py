"""Source-loading correctness, esp. the nanosecond-timestamp gotcha."""

import duckdb
from pyspark.sql import functions as F

from spype_spark.tables import BROADCAST_DIMS, TABLES, load_table, load_tables


def test_events_ts_matches_duckdb_to_the_microsecond(spark, sf_dir):
    """ts div 1000 (integer division) must equal DuckDB's native ns→µs
    truncation exactly — a double-precision division here silently
    corrupts ~±1 µs on 1.7e18-ns values."""
    got = {
        r.event_id: r.ts
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "ts")
        .limit(200)
        .collect()
    }
    con = duckdb.connect()
    want = dict(
        con.sql(
            f"SELECT event_id, CAST(ts AS TIMESTAMP) FROM "
            f"read_parquet('{sf_dir}/events.parquet') LIMIT 200"
        ).fetchall()
    )
    for eid, ts in got.items():
        assert ts == want[eid], f"event {eid}: {ts} != {want[eid]}"


def test_all_tables_load_with_expected_rows(spark, sf_dir):
    dfs = load_tables(spark, sf_dir)
    assert set(dfs) == set(TABLES)
    counts = {n: dfs[n].count() for n in ("region", "nation", "lineitem")}
    assert counts["region"] == 5 and counts["nation"] == 25
    assert counts["lineitem"] == 6000


def test_events_loads_on_unconfigured_session(spark, sf_dir):
    """The nanos conf must apply at runtime — the driver's session is
    built without it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    df = load_table(spark, sf_dir, "events")  # re-sets the conf itself
    assert df.schema["ts"].dataType.simpleString().startswith("timestamp")
    assert df.count() == 1000


def test_broadcast_dims_are_small(spark, sf_dir):
    for name in BROADCAST_DIMS:
        assert load_table(spark, sf_dir, name).count() <= 20_000