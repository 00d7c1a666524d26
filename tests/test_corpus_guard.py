"""Corpus-assumption guards — fail LOUDLY when the test corpus drifts.

The round-4 corpus regeneration silently switched ``events.ts`` from
TIMESTAMP(NANOS) to timestamp[us] and broke 19 contracts *quietly*
(NULLed timestamps, 0-row streams). The loader is now encoding-robust
(tables.normalize_events_ts), but other fixture assumptions remain
baked into query/kernel code. This module pins every one of them
against the actual parquet files, so the NEXT regeneration turns into
a red test naming the drifted assumption instead of silently-wrong
query output.

Driver-side metadata/scalar reads only — no Spark jobs, runs in ms.
"""

import glob

import duckdb
import pyarrow.parquet as pq
import pytest

SF_DIRS = sorted(glob.glob("/root/testdata/sf*"))

#: column → arrow type prefix, per table; the subset of the corpus
#: schema that code outside plain DataFrame algebra depends on.
PINNED_COLS = {
    "events": {
        # normalize_events_ts branches on these encodings; anything
        # else (e.g. string, int32 epoch-seconds) needs a new branch
        "ts": ("timestamp[us]", "timestamp[ns]", "int64"),
        "props": ("string",),  # parsed as JSON by q_source_json_props
    },
    "embeddings": {
        # ann.py/llm.py unroll dot products to a fixed term count
        "embedding": ("list<element: float", "list<item: float"),
    },
    "documents": {"text": ("string",), "doc_id": ("int64",)},
    "lineitem": {"l_shipdate": ("timestamp[us]",)},
    "orders": {"o_orderdate": ("timestamp[us]",)},
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pinned_column_encodings(sf_dir):
    for table, cols in PINNED_COLS.items():
        schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        for col, allowed in cols.items():
            assert col in schema.names, f"{sf_dir}/{table}: lost column {col}"
            actual = str(schema.field(col).type)
            assert actual.startswith(allowed), (
                f"{sf_dir}/{table}.{col} regenerated as {actual!r} "
                f"(expected one of {allowed}) — audit every reader of "
                f"this column before trusting green query output"
            )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_int64_means_nanoseconds(sf_dir):
    """normalize_events_ts treats an int64 ``ts`` as NANOSECOND epochs.

    The type pin above accepts int64 without distinguishing ns from µs
    epoch longs; a regeneration to int64-microseconds would pass it and
    silently shift every timestamp 1000× — exactly the drift this file
    exists to catch. Pin the unit by value range: the corpus spans
    2024-2025, so ns epochs are ~1.7e18 while µs epochs are ~1.7e15.
    """
    typ = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    if typ != "int64":
        return  # native timestamp[us/ns] — unit carried by the type
    lo, hi = duckdb.connect().execute(
        "SELECT min(ts), max(ts) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()
    assert lo > 10**17, (
        f"{sf_dir}: events.ts is int64 with min={lo} — too small for "
        "nanosecond epochs; normalize_events_ts would divide by 1000 "
        "and shift every timestamp. Add a unit branch to tables.py "
        "before trusting any events contract."
    )
    assert hi < 10**19, (
        f"{sf_dir}: events.ts int64 max={hi} exceeds plausible "
        "nanosecond epochs — audit the encoding"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embedding_dim_is_exactly_emb_dim(sf_dir):
    """ann.py's unrolled dot product emits EMB_DIM element_at terms.

    If the corpus dim ever GROWS, the unrolled sum silently truncates
    (wrong similarities, no error — the worst failure mode); if it
    shrinks, ANSI element_at throws. Either way this test names the
    cause first.
    """
    from spype_spark.ann import EMB_DIM

    lo, hi = duckdb.connect().execute(
        "SELECT min(len(embedding)), max(len(embedding)) "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchone()
    assert lo == hi == EMB_DIM, (
        f"{sf_dir}: embedding dim [{lo},{hi}] != EMB_DIM={EMB_DIM} — "
        "update EMB_DIM (ann.py, queries/llm.py) and re-check every "
        "ANN/dedup-cosine contract"
    )


#: Full corpus snapshot (generated from the live corpus,
#: 2026-08-13 round 6): sf -> table -> (row_count, {col: type}).
#: A driver regeneration that changes ANY of these fails the
#: drift test below by name, instead of NULLing columns quietly.
CORPUS_SNAPSHOT = {
    "sf0.001": {
        "customer": (150, {"c_custkey": "int64", "c_name": "string", "c_nationkey": "int32", "c_acctbal": "double", "c_mktsegment": "string"}),
        "documents": (500, {"doc_id": "int64", "text": "string", "lang": "string", "source": "string", "n_chars": "int64"}),
        "embeddings": (500, {"vec_id": "int64", "embedding": "list<element: float>", "label": "int32"}),
        "events": (1000, {"event_id": "int64", "ts": "timestamp[us]", "user_id": "int64", "event_type": "string", "value": "double", "props": "string"}),
        "lineitem": (6000, {"l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64", "l_linenumber": "int32", "l_quantity": "double", "l_extendedprice": "double", "l_discount": "double", "l_tax": "double", "l_returnflag": "string", "l_linestatus": "string", "l_shipdate": "timestamp[us]"}),
        "nation": (25, {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"}),
        "orders": (1500, {"o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string", "o_totalprice": "double", "o_orderdate": "timestamp[us]", "o_orderpriority": "string"}),
        "part": (200, {"p_partkey": "int64", "p_name": "string", "p_brand": "string", "p_type": "string", "p_size": "int32", "p_retailprice": "double"}),
        "region": (5, {"r_regionkey": "int32", "r_name": "string"}),
        "supplier": (10, {"s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32", "s_acctbal": "double"}),
    },
    "sf0.01": {
        "customer": (1500, {"c_custkey": "int64", "c_name": "string", "c_nationkey": "int32", "c_acctbal": "double", "c_mktsegment": "string"}),
        "documents": (500, {"doc_id": "int64", "text": "string", "lang": "string", "source": "string", "n_chars": "int64"}),
        "embeddings": (500, {"vec_id": "int64", "embedding": "list<element: float>", "label": "int32"}),
        "events": (10000, {"event_id": "int64", "ts": "timestamp[us]", "user_id": "int64", "event_type": "string", "value": "double", "props": "string"}),
        "lineitem": (60000, {"l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64", "l_linenumber": "int32", "l_quantity": "double", "l_extendedprice": "double", "l_discount": "double", "l_tax": "double", "l_returnflag": "string", "l_linestatus": "string", "l_shipdate": "timestamp[us]"}),
        "nation": (25, {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"}),
        "orders": (15000, {"o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string", "o_totalprice": "double", "o_orderdate": "timestamp[us]", "o_orderpriority": "string"}),
        "part": (2000, {"p_partkey": "int64", "p_name": "string", "p_brand": "string", "p_type": "string", "p_size": "int32", "p_retailprice": "double"}),
        "region": (5, {"r_regionkey": "int32", "r_name": "string"}),
        "supplier": (100, {"s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32", "s_acctbal": "double"}),
    },
    "sf0.1": {
        "customer": (15000, {"c_custkey": "int64", "c_name": "string", "c_nationkey": "int32", "c_acctbal": "double", "c_mktsegment": "string"}),
        "documents": (5000, {"doc_id": "int64", "text": "string", "lang": "string", "source": "string", "n_chars": "int64"}),
        "embeddings": (2000, {"vec_id": "int64", "embedding": "list<element: float>", "label": "int32"}),
        "events": (100000, {"event_id": "int64", "ts": "timestamp[us]", "user_id": "int64", "event_type": "string", "value": "double", "props": "string"}),
        "lineitem": (600000, {"l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64", "l_linenumber": "int32", "l_quantity": "double", "l_extendedprice": "double", "l_discount": "double", "l_tax": "double", "l_returnflag": "string", "l_linestatus": "string", "l_shipdate": "timestamp[us]"}),
        "nation": (25, {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"}),
        "orders": (150000, {"o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string", "o_totalprice": "double", "o_orderdate": "timestamp[us]", "o_orderpriority": "string"}),
        "part": (20000, {"p_partkey": "int64", "p_name": "string", "p_brand": "string", "p_type": "string", "p_size": "int32", "p_retailprice": "double"}),
        "region": (5, {"r_regionkey": "int32", "r_name": "string"}),
        "supplier": (1000, {"s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32", "s_acctbal": "double"}),
    },
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_corpus_snapshot_unchanged(sf_dir):
    """FULL drift tripwire: any row-count, column, or dtype change in
    ANY of the 10 tables at ANY SF fails here, naming the drift.

    On a legitimate regeneration: audit every reader of the changed
    columns (grep the failing table name through spype_spark/), THEN
    regenerate this snapshot (the generator one-liner lives in the
    round-6 PROGRESS notes) and re-run the full differential check —
    green rows recorded before the regen prove nothing after it.
    """
    sf = sf_dir.rstrip("/").split("/")[-1]
    expected = CORPUS_SNAPSHOT.get(sf)
    if expected is None:
        pytest.fail(f"new SF dir {sf} — extend CORPUS_SNAPSHOT")
    for table, (n_rows, cols) in expected.items():
        md = pq.read_metadata(f"{sf_dir}/{table}.parquet")
        schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
        assert md.num_rows == n_rows, (
            f"{sf}/{table}: {md.num_rows} rows != pinned {n_rows}"
        )
        actual = {n: str(schema.field(n).type) for n in schema.names}
        assert actual == cols, (
            f"{sf}/{table} schema drifted: {actual} != pinned {cols}"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_corpus_tables_present(sf_dir):
    from spype_spark.tables import TABLES

    for t in TABLES:
        files = glob.glob(f"{sf_dir}/{t}.parquet")
        assert files, f"{sf_dir}: corpus table {t} missing"
