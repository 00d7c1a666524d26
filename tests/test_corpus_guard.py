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


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_corpus_tables_present(sf_dir):
    from spype_spark.tables import TABLES

    for t in TABLES:
        files = glob.glob(f"{sf_dir}/{t}.parquet")
        assert files, f"{sf_dir}: corpus table {t} missing"
