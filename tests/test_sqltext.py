"""SQL text facade (spype_spark/sqltext.py): the maintenance
statements (MERGE INTO / UPDATE / DELETE FROM / RESTORE / OPTIMIZE /
VACUUM) must drive the SAME kernels as the Python verbs — asserted by
running each statement and its Python-API twin on identical inputs and
comparing full contents."""

import pytest
from pyspark.sql import functions as F

import spype_spark
from spype_spark import lakehouse as lake
from spype_spark import sqltext


def _mk(spark, tmp_path, name):
    p = str(tmp_path / name)
    lake.write_table(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "F", 20.0), (3, "c", 30.0), (4, "F", 40.0)],
            "k long, s string, v double",
        ),
        p,
    )
    return p


def _rows(spark, p):
    return sorted(tuple(r) for r in lake.read_table(spark, p).collect())


def test_sql_merge_matches_python_kernel(spark, tmp_path):
    """The full-clause MERGE statement ≡ lake.merge with the same
    clauses (q_lake_merge_full's kernel driven through SQL text)."""
    p_sql, p_py = _mk(spark, tmp_path, "s"), _mk(spark, tmp_path, "p")
    src = spark.createDataFrame(
        [(1, "A", 99.0), (3, "c", 5.0), (7, "n", 70.0)],
        "k long, s string, v double",
    )
    src.createOrReplaceTempView("sqltext_updates")
    spype_spark.sql(spark, f"""
        MERGE INTO '{p_sql}' AS t USING sqltext_updates AS s
        ON t.k = s.k
        WHEN MATCHED AND s.v > t.v THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE AND t.s = 'F' THEN DELETE
    """)
    lake.merge(
        spark, p_py, src, ["k"],
        when_matched="update",
        matched_condition=lambda u, t: u["v"] > t["v"],
        when_not_matched="insert",
        when_not_matched_by_source="delete",
        by_source_condition=lambda t: t["s"] == "F",
    )
    got = _rows(spark, p_sql)
    assert got == _rows(spark, p_py)
    assert got == [(1, "A", 99.0), (3, "c", 30.0), (7, "n", 70.0)]
    spark.catalog.dropTempView("sqltext_updates")


def test_sql_update_delete_match_python_kernels(spark, tmp_path):
    """UPDATE/DELETE statements ≡ update_where/delete_where
    (q_lake_update's kernel driven through SQL text)."""
    p_sql, p_py = _mk(spark, tmp_path, "s"), _mk(spark, tmp_path, "p")
    spype_spark.sql(
        spark, f"UPDATE '{p_sql}' SET v = v * 2, s = upper(s) WHERE s = 'F'"
    )
    lake.update_where(
        spark, p_py, F.col("s") == "F",
        {"v": F.col("v") * 2, "s": F.upper(F.col("s"))},
    )
    assert _rows(spark, p_sql) == _rows(spark, p_py)
    spype_spark.sql(spark, f"DELETE FROM '{p_sql}' WHERE v >= 40.0")
    lake.delete_where(spark, p_py, F.col("v") >= 40.0)
    got = _rows(spark, p_sql)
    assert got == _rows(spark, p_py)
    assert got == [(1, "a", 10.0), (3, "c", 30.0)]


def test_sql_restore_optimize_vacuum(spark, tmp_path):
    p = _mk(spark, tmp_path, "t")
    v0 = _rows(spark, p)
    spype_spark.sql(spark, f"DELETE FROM '{p}' WHERE k > 1")
    spype_spark.sql(spark, f"RESTORE TABLE '{p}' TO VERSION AS OF 0")
    assert _rows(spark, p) == v0
    lake.append_table(
        spark, p,
        spark.createDataFrame([(9, "z", 90.0)], "k long, s string, v double"),
    )
    n_before = len(lake.data_files(p, lake.latest_version(p)))
    spype_spark.sql(spark, f"OPTIMIZE '{p}' MIN FILE BYTES 99999999")
    assert len(lake.data_files(p, lake.latest_version(p))) < n_before
    dropped = spype_spark.sql(spark, f"VACUUM '{p}' KEEP 1 RETAIN 0 HOURS")
    assert dropped and lake.versions(p) == [lake.latest_version(p)]


def test_sql_catalog_mode_runs_through_transactions(spark, tmp_path):
    """Bare table names resolve through catalog= and mutate via a
    single-verb TRANSACTION — the record log stays authoritative."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "cat"))
    with cat.transaction(spark) as txn:
        txn.write(
            spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"),
            "t",
        )
    before = cat.latest_txn()
    spype_spark.sql(spark, "UPDATE t SET v = v + 1 WHERE k = 2", catalog=cat)
    assert cat.latest_txn() == before + 1, "one record per statement"
    assert {(r.k, r.v) for r in cat.read(spark, "t").collect()} == {
        (1, 10.0), (2, 21.0)
    }
    with pytest.raises(ValueError, match="catalog="):
        spype_spark.sql(spark, "DELETE FROM t WHERE k = 1")


def test_sql_rejects_garbage_clauses(spark, tmp_path):
    p = _mk(spark, tmp_path, "t")
    spark.createDataFrame([(1, "x", 1.0)], "k long, s string, v double") \
        .createOrReplaceTempView("sqltext_u2")
    with pytest.raises(ValueError, match="unparseable MERGE clause"):
        sqltext.sql(spark, f"""
            MERGE INTO '{p}' AS t USING sqltext_u2 AS s ON t.k = s.k
            WHEN MATCHED THEN UPDATE SET * AND FROB THE KNOB
        """)
    with pytest.raises(ValueError, match="conjunction"):
        sqltext.sql(spark, f"""
            MERGE INTO '{p}' AS t USING sqltext_u2 AS s ON t.k > s.k
            WHEN MATCHED THEN DELETE
        """)
    spark.catalog.dropTempView("sqltext_u2")


def test_sql_conditional_not_matched_insert(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT * gates inserts per
    source row (Delta's conditional whenNotMatchedInsertAll) — SQL
    statement and Python kernel agree."""
    p_sql, p_py = _mk(spark, tmp_path, "s"), _mk(spark, tmp_path, "p")
    src = spark.createDataFrame(
        [(7, "hi", 70.0), (8, "lo", 1.0)], "k long, s string, v double"
    )
    src.createOrReplaceTempView("sqltext_u3")
    spype_spark.sql(spark, f"""
        MERGE INTO '{p_sql}' AS t USING sqltext_u3 AS s ON t.k = s.k
        WHEN NOT MATCHED AND s.v > 10.0 THEN INSERT *
    """)
    lake.merge(
        spark, p_py, src, ["k"],
        when_matched=None,
        when_not_matched="insert",
        not_matched_condition=lambda u: u["v"] > 10.0,
    )
    got = _rows(spark, p_sql)
    assert got == _rows(spark, p_py)
    assert (7, "hi", 70.0) in got and all(r[0] != 8 for r in got)
    spark.catalog.dropTempView("sqltext_u3")


def test_sql_optimize_catalog_table_via_txn(spark, tmp_path):
    """Plain OPTIMIZE of a bare-name table runs the selective
    bin-packer through a catalog transaction (one record)."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "ocat"))
    with cat.transaction(spark) as txn:
        txn.write(
            spark.createDataFrame(
                [(k, float(k)) for k in range(2000)], "k long, v double"
            ).coalesce(1),
            "t",
        )
    for lo in (2000, 2020):
        with cat.transaction(spark) as txn:
            txn.append(
                spark.createDataFrame(
                    [(k, float(k)) for k in range(lo, lo + 20)],
                    "k long, v double",
                ).coalesce(1),
                "t",
            )
    before = cat.latest_txn()
    pt = cat.table_path("t")
    n0 = len(lake.data_files(pt, cat.state()["t"]))
    spype_spark.sql(spark, "OPTIMIZE t MIN FILE BYTES 20000", catalog=cat)
    assert cat.latest_txn() == before + 1
    assert len(lake.data_files(pt, cat.state()["t"])) < n0
    assert cat.read(spark, "t").count() == 2040


def test_sql_restore_catalog(spark, tmp_path):
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "rcat"))
    with cat.transaction(spark) as txn:
        txn.write(spark.createDataFrame([(1, 10.0)], "k long, v double"), "t")
    with cat.transaction(spark) as txn:
        txn.delete_where("t", F.col("k") == 1)
    assert cat.read(spark, "t").count() == 0
    t = spype_spark.sql(spark, "RESTORE CATALOG TO TXN AS OF 0", catalog=cat)
    assert t == 2
    assert {(r.k, r.v) for r in cat.read(spark, "t").collect()} == {(1, 10.0)}
    with pytest.raises(ValueError, match="catalog="):
        spype_spark.sql(spark, "RESTORE CATALOG TO TXN AS OF 0")


def test_sql_select_time_travel_and_insert(spark, tmp_path):
    """Round-11 read side: CREATE TABLE … AS SELECT, INSERT INTO
    VALUES/SELECT, SELECT with VERSION AS OF — equivalent to the
    Python surface on every step."""
    p = str(tmp_path / "rt")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p}' AS
        SELECT id AS k, CAST(id * 2.0 AS DOUBLE) AS v FROM range(50)
    """)
    assert lake.latest_version(p) == 0
    spype_spark.sql(spark, f"INSERT INTO '{p}' VALUES (100, 1.5), (101, 2.5)")
    assert lake.latest_version(p) == 1
    # VALUES literals are cast positionally to the table schema
    assert dict(lake.read_table(spark, p).dtypes) == {
        "k": "bigint", "v": "double"
    }
    spype_spark.sql(
        spark,
        f"INSERT INTO '{p}' SELECT k + 1000, v FROM '{p}' VERSION AS OF 0 "
        f"WHERE k < 3",
    )
    head = spype_spark.sql(spark, f"SELECT count(*) AS n FROM '{p}'")
    assert head.collect()[0].n == 55
    v0 = spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM '{p}' VERSION AS OF 0"
    )
    assert v0.collect()[0].n == 50
    # join head against its own history; alias after the travel clause
    j = spype_spark.sql(spark, f"""
        SELECT count(*) AS n
        FROM '{p}' h JOIN '{p}' VERSION AS OF 0 v ON h.k = v.k
    """)
    assert j.collect()[0].n == 50
    # wrong arity is rejected, nothing committed
    import pytest as _pt

    with _pt.raises(ValueError, match="values for"):
        spype_spark.sql(spark, f"INSERT INTO '{p}' VALUES (1)")
    assert lake.latest_version(p) == 2


def test_sql_create_partitioned_transforms(spark, tmp_path):
    """CREATE TABLE … PARTITIONED BY (days(d), bucket(4, k)) parses to
    the hidden-partition transform tuples; identity columns mix in."""
    p = str(tmp_path / "ct")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p}' PARTITIONED BY (days(d), bucket(4, k)) AS
        SELECT id AS k, date_add(date'2024-01-01', CAST(id % 3 AS INT)) AS d
        FROM range(30)
    """)
    m = lake._m_load(p, 0)
    kinds = {(t["transform"], t["source"]) for t in m["transforms"]}
    assert kinds == {("days", "d"), ("bucket", "k")}
    # hidden columns never reach a reader
    assert set(lake.read_table(spark, p).columns) == {"k", "d"}
    # identity + transform mix
    p2 = str(tmp_path / "ct2")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p2}' PARTITIONED BY (s, truncate(10, k)) AS
        SELECT id AS k, CAST(id % 2 AS STRING) AS s FROM range(20)
    """)
    m2 = lake._m_load(p2, 0)
    assert m2["partition_by"][0] == "s"
    assert m2["transforms"][0]["transform"] == "truncate"
    with pytest.raises(ValueError, match="unparseable PARTITIONED BY"):
        spype_spark.sql(
            spark,
            f"CREATE TABLE '{tmp_path / 'bad'}' PARTITIONED BY (year(d)) "
            f"AS SELECT 1 AS d",
        )


def test_sql_catalog_reads_and_txn_as_of(spark, tmp_path):
    """Bare catalog names in FROM/JOIN resolve through Catalog.read;
    TXN AS OF pins cross-table time travel; non-catalog names stay
    Spark's (temp views win only when absent from the catalog)."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "rcat2"))
    spype_spark.sql(
        spark,
        "CREATE TABLE t AS SELECT id AS k, id * 10 AS v FROM range(10)",
        catalog=cat,
    )
    first = cat.latest_txn()
    spype_spark.sql(spark, "INSERT INTO t VALUES (100, 1000)", catalog=cat)
    assert spype_spark.sql(
        spark, "SELECT count(*) AS n FROM t", catalog=cat
    ).collect()[0].n == 11
    assert spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM t TXN AS OF {first}", catalog=cat
    ).collect()[0].n == 10
    # user alias is preserved; original name re-attached when absent
    assert spype_spark.sql(
        spark, "SELECT x.k FROM t AS x WHERE x.k = 3", catalog=cat
    ).collect()[0].k == 3
    assert spype_spark.sql(
        spark, "SELECT t.k FROM t WHERE t.k = 3", catalog=cat
    ).collect()[0].k == 3
    # a name NOT in the catalog still resolves as a Spark temp view
    spark.createDataFrame([(1,)], "z long").createOrReplaceTempView(
        "sqltext_plain_view"
    )
    assert spype_spark.sql(
        spark, "SELECT count(*) AS n FROM sqltext_plain_view", catalog=cat
    ).collect()[0].n == 1
    spark.catalog.dropTempView("sqltext_plain_view")


def test_sql_merge_using_time_travel_subquery(spark, tmp_path):
    """MERGE's USING subquery resolves lakehouse refs too — merging a
    table with its own VERSION AS OF 0 snapshot restores mutated rows
    (the SQL spelling of an audit-revert)."""
    p = str(tmp_path / "mtt")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p}' AS SELECT id AS k, id * 1.0 AS v FROM range(10)
    """)
    spype_spark.sql(spark, f"UPDATE '{p}' SET v = -1.0 WHERE k >= 5")
    spype_spark.sql(spark, f"""
        MERGE INTO '{p}' AS t USING (
            SELECT k, v FROM '{p}' VERSION AS OF 0 WHERE k >= 5
        ) AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *
    """)
    got = {(r.k, r.v) for r in lake.read_table(spark, p).collect()}
    assert got == {(k, float(k)) for k in range(10)}


def test_sql_describe_history_and_show_tables(spark, tmp_path):
    from spype_spark.catalog import Catalog

    p = str(tmp_path / "dh")
    spype_spark.sql(spark, f"CREATE TABLE '{p}' AS SELECT id AS k FROM range(5)")
    spype_spark.sql(spark, f"INSERT INTO '{p}' VALUES (9)")
    h = spype_spark.sql(spark, f"DESCRIBE HISTORY '{p}'")
    assert {r.version for r in h.collect()} == {0, 1}
    cat = Catalog(str(tmp_path / "shcat"))
    spype_spark.sql(
        spark, "CREATE TABLE t1 AS SELECT 1 AS x", catalog=cat
    )
    spype_spark.sql(
        spark, "CREATE TABLE t2 AS SELECT 2 AS x", catalog=cat
    )
    rows = spype_spark.sql(spark, "SHOW TABLES", catalog=cat).collect()
    assert {(r.name, r.version) for r in rows} == {("t1", 0), ("t2", 0)}
    hc = spype_spark.sql(spark, "DESCRIBE HISTORY t1", catalog=cat)
    assert [r.version for r in hc.collect()] == [0]


def test_sql_read_refs_ignore_string_literals(spark, tmp_path):
    """'FROM x' text INSIDE a string literal must not be rewritten —
    the ref resolver checks quote parity before touching a match."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "qcat"))
    spype_spark.sql(
        spark, "CREATE TABLE t AS SELECT id AS k FROM range(3)", catalog=cat
    )
    r = spype_spark.sql(
        spark,
        "SELECT k, 'copied FROM t yesterday' AS note FROM t WHERE k = 1",
        catalog=cat,
    ).collect()
    assert r == [(1, "copied FROM t yesterday")] or (
        r[0].k == 1 and r[0].note == "copied FROM t yesterday"
    )


def test_sql_cte_shadows_catalog_table(spark, tmp_path):
    """A CTE that shares a name with a catalog table SHADOWS it (SQL
    scoping; ADVICE r11) — except inside its own definition body,
    where the name still means the catalog table."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "ctecat"))
    spype_spark.sql(
        spark, "CREATE TABLE t AS SELECT id AS k FROM range(10)", catalog=cat
    )
    # inner FROM t = the 10-row catalog table; outer FROM t = the CTE
    n = spype_spark.sql(
        spark,
        "WITH t AS (SELECT k FROM t WHERE k < 3) SELECT count(*) AS n FROM t",
        catalog=cat,
    ).collect()[0].n
    assert n == 3
    # a DIFFERENTLY-named CTE referencing the catalog table still works,
    # and a later CTE sees the earlier CTE, not the catalog table
    spype_spark.sql(
        spark, "CREATE TABLE u AS SELECT id AS k FROM range(7)", catalog=cat
    )
    n2 = spype_spark.sql(
        spark,
        "WITH u AS (SELECT k FROM u WHERE k < 5), "
        "w AS (SELECT k FROM u WHERE k < 2) "
        "SELECT count(*) AS n FROM w",
        catalog=cat,
    ).collect()[0].n
    assert n2 == 2


def test_sql_nested_cte_shadow_is_scoped_to_its_subquery(spark, tmp_path):
    """A CTE defined INSIDE a nested subquery shadows only within that
    subquery (ADVICE r12): an outer-query ref to the same-named
    catalog table must still be rewritten — previously it was skipped
    and failed analysis with TABLE_OR_VIEW_NOT_FOUND."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "nestcat"))
    spype_spark.sql(
        spark, "CREATE TABLE t AS SELECT id AS k FROM range(10)", catalog=cat
    )
    # the subquery's CTE t = 3 rows; the OUTER FROM t = the 10-row
    # catalog table; the join key domain proves both resolved right
    n = spype_spark.sql(
        spark,
        "SELECT count(*) AS n FROM ("
        "WITH t AS (SELECT k FROM t WHERE k < 3) SELECT k FROM t"
        ") s JOIN t ON s.k = t.k",
        catalog=cat,
    ).collect()[0].n
    assert n == 3
    # shadow still applies INSIDE the subquery after the definition,
    # and the outer table is intact afterwards
    total = spype_spark.sql(
        spark, "SELECT count(*) AS n FROM t", catalog=cat
    ).collect()[0].n
    assert total == 10


def test_sql_string_escapes_dont_break_ref_parity(spark, tmp_path):
    """Backslash-escaped quotes inside literals (ADVICE r11) must not
    flip the in-string parity: 'FROM t' inside such a literal stays
    text, and a REAL ref after the literal is still resolved."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "esccat"))
    spype_spark.sql(
        spark, "CREATE TABLE t AS SELECT id AS k FROM range(4)", catalog=cat
    )
    r = spype_spark.sql(
        spark,
        r"SELECT k, 'see \' FROM t' AS note FROM t WHERE k = 2",
        catalog=cat,
    ).collect()
    assert len(r) == 1 and r[0].k == 2
    assert r[0].note == "see ' FROM t"
    # the '' escape keeps working too
    r2 = spype_spark.sql(
        spark,
        "SELECT k, 'it''s FROM t' AS note FROM t WHERE k = 3",
        catalog=cat,
    ).collect()
    assert len(r2) == 1 and r2[0].k == 3 and r2[0].note == "it's FROM t"


def test_sql_view_names_are_collision_proof():
    """Generated temp-view names carry an atomic counter AND a uuid
    suffix (ADVICE r11: a raced plain counter could mint duplicate
    names and clobber a concurrent statement's view)."""
    a, b = sqltext._fresh_view(), sqltext._fresh_view()
    assert a != b and a.startswith("__spype_sql_") and len(a.split("_")[-1]) == 8


def test_catalog_changes_after_vacuum_raises_descriptive(spark, tmp_path):
    """Full-history replay over a vacuumed log floor raises the same
    descriptive cannot-resume error as the stream guard, not a raw
    FileNotFoundError from a missing record file (ADVICE r11)."""
    import pytest as _pytest

    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "vaccat"))
    df = spark.createDataFrame([(1, 10)], "k long, v long")
    with cat.transaction(spark) as txn:
        txn.write(df, "t")
    for i in range(3):
        with cat.transaction(spark) as txn:
            txn.append(spark.createDataFrame([(i + 2, 1)], "k long, v long"), "t")
    cat.vacuum(keep_last=2, grace_seconds=0.0)
    with _pytest.raises(FileNotFoundError, match="cannot be replayed"):
        cat.changes(spark, {"t": ["k"]})  # txn_from=None = full history
    # the surviving window still replays fine
    ts = cat.txns()
    feeds = cat.changes(spark, {"t": ["k"]}, txn_from=ts[0])
    assert feeds["t"].count() > 0
    # and the stream's full-history path (-1) gets the same error
    stream = cat.read_changes_stream(
        spark, {"t": ["k"]}, str(tmp_path / "vchk"), from_txn=-1
    )
    with _pytest.raises(FileNotFoundError, match="cannot be replayed"):
        stream.drain()


def test_sql_alter_rename_drop_match_python_kernels(spark, tmp_path):
    """ALTER TABLE RENAME COLUMN / DROP COLUMN(S) ≡ the metadata-only
    Python verbs, for path tables and catalog tables."""
    p_sql, p_py = _mk(spark, tmp_path, "ar_s"), _mk(spark, tmp_path, "ar_p")
    spype_spark.sql(
        spark, f"ALTER TABLE '{p_sql}' RENAME COLUMN v TO price, s TO status"
    )
    lake.rename_columns(spark, p_py, {"v": "price", "s": "status"})
    assert (
        lake.read_table(spark, p_sql).columns
        == lake.read_table(spark, p_py).columns
        == ["k", "status", "price"]
    )
    assert _rows(spark, p_sql) == _rows(spark, p_py)
    spype_spark.sql(spark, f"ALTER TABLE '{p_sql}' DROP COLUMN status")
    lake.drop_columns(spark, p_py, ["status"])
    assert (
        lake.read_table(spark, p_sql).columns
        == lake.read_table(spark, p_py).columns
        == ["k", "price"]
    )
    # catalog-table form runs through a transaction
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "ddlcat"))
    spype_spark.sql(
        spark, "CREATE TABLE t AS SELECT id AS k, id * 2 AS twice, "
        "id * 3 AS thrice FROM range(5)", catalog=cat,
    )
    spype_spark.sql(spark, "ALTER TABLE t RENAME COLUMN twice TO dbl", catalog=cat)
    spype_spark.sql(spark, "ALTER TABLE t DROP COLUMNS (thrice)", catalog=cat)
    got = spype_spark.sql(spark, "SELECT * FROM t", catalog=cat)
    assert got.columns == ["k", "dbl"] and got.count() == 5


def test_sql_alter_widen_and_partition_spec(spark, tmp_path):
    """ALTER COLUMN … TYPE (widening) and SET PARTITION SPEC are
    metadata-only commits driven from SQL text."""
    p = str(tmp_path / "aw")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p}' AS
        SELECT CAST(id AS INT) AS k, CAST(id * 10 AS FLOAT) AS v FROM range(20)
    """)
    v = spype_spark.sql(spark, f"ALTER TABLE '{p}' ALTER COLUMN k TYPE bigint")
    assert v == 1
    assert dict(lake.read_table(spark, p).dtypes)["k"] == "bigint"
    v = spype_spark.sql(
        spark, f"ALTER TABLE '{p}' SET PARTITION SPEC (bucket(4, k))"
    )
    assert v == 2
    m = lake._m_load(p, 2)
    assert [t["transform"] for t in m["transforms"] if not t.get("retired")] == [
        "bucket"
    ]
    # widen on a catalog table has no staged verb — loud, not silent
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wcat"))
    spype_spark.sql(spark, "CREATE TABLE t AS SELECT 1 AS x", catalog=cat)
    with pytest.raises(ValueError, match="widen_types"):
        spype_spark.sql(spark, "ALTER TABLE t ALTER COLUMN x TYPE bigint",
                        catalog=cat)


def test_sql_branch_statements_single_table_wap(spark, tmp_path):
    """CREATE/PUBLISH/DROP BRANCH statements drive the lake-level WAP
    verbs: stage rows on the branch, audit invisibly, publish."""
    p = _mk(spark, tmp_path, "br")
    broot = spype_spark.sql(
        spark, f"ALTER TABLE '{p}' CREATE BRANCH wap AS OF VERSION 0"
    )
    assert broot == lake.branch_path(p, "wap")
    spype_spark.sql(spark, f"INSERT INTO '{broot}' VALUES (9, 'z', 90.0)")
    # audit: branch sees the row, the table does not
    assert lake.read_table(spark, broot).count() == 5
    assert lake.read_table(spark, p).count() == 4
    spype_spark.sql(spark, f"ALTER TABLE '{p}' PUBLISH BRANCH wap")
    assert lake.read_table(spark, p).count() == 5
    spype_spark.sql(spark, f"ALTER TABLE '{p}' DROP BRANCH wap")
    assert "wap" not in lake.list_branches(p)
    with pytest.raises(ValueError, match="CREATE BRANCH"):
        spype_spark.sql(
            spark, f"ALTER TABLE '{p}' PUBLISH BRANCH wap AS OF VERSION 1"
        )


def test_sql_catalog_branch_statements(spark, tmp_path):
    """CREATE/PUBLISH/DROP CATALOG BRANCH drive the catalog-level WAP
    unit; a bare-name ALTER TABLE … BRANCH is rejected loudly."""
    from spype_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "cbcat"))
    spype_spark.sql(
        spark, "CREATE TABLE t AS SELECT id AS k FROM range(4)", catalog=cat
    )
    with pytest.raises(ValueError, match="CATALOG BRANCH"):
        spype_spark.sql(spark, "ALTER TABLE t CREATE BRANCH b", catalog=cat)
    rec = spype_spark.sql(spark, "CREATE CATALOG BRANCH audit", catalog=cat)
    assert rec["fork_txn"] == cat.latest_txn()
    with cat.transaction(spark, branch="audit") as txn:
        txn.append(spark.createDataFrame([(99,)], "k long"), "t")
    # invisible pre-publish
    assert spype_spark.sql(
        spark, "SELECT count(*) AS n FROM t", catalog=cat
    ).collect()[0].n == 4
    spype_spark.sql(spark, "PUBLISH CATALOG BRANCH audit", catalog=cat)
    assert spype_spark.sql(
        spark, "SELECT count(*) AS n FROM t", catalog=cat
    ).collect()[0].n == 5
    spype_spark.sql(spark, "CREATE CATALOG BRANCH tmp", catalog=cat)
    spype_spark.sql(spark, "DROP CATALOG BRANCH tmp", catalog=cat)
    assert "tmp" not in cat.branches()


def test_sql_from_delta_foreign_table(spark, tmp_path):
    """FROM DELTA '<path>' reads a foreign Delta table through
    delta_interop.read_delta — with VERSION AS OF time travel — and
    joins against native refs in the same statement."""
    from pyspark.sql import functions as F

    from spype_spark import delta_interop as dl

    dpath = str(tmp_path / "fdelta")
    df = spark.range(0, 8).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    dl.write_delta(spark, df, dpath)
    dl.write_delta(
        spark,
        spark.range(8, 12).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        dpath,
        mode="append",
    )
    assert spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM DELTA '{dpath}'"
    ).collect()[0].n == 12
    assert spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM DELTA '{dpath}' VERSION AS OF 0"
    ).collect()[0].n == 8
    # joins a native lakehouse path ref in the same statement
    npath = str(tmp_path / "nat")
    spype_spark.sql(
        spark, f"CREATE TABLE '{npath}' AS SELECT id AS k FROM range(6)"
    )
    r = spype_spark.sql(spark, f"""
        SELECT count(*) AS n
        FROM DELTA '{dpath}' d JOIN '{npath}' t ON d.k = t.k
    """).collect()[0].n
    assert r == 6


def test_sql_import_delta_statement(spark, tmp_path):
    """IMPORT DELTA '<src>' [VERSION AS OF n] INTO '<dst>'
    [MATERIALIZED] drives delta_interop.import_delta from SQL text;
    the imported table is immediately addressable by native refs."""
    from pyspark.sql import functions as F

    from spype_spark import delta_interop as dl

    dpath = str(tmp_path / "idelta")
    npath = str(tmp_path / "inative")
    dl.write_delta(
        spark,
        spark.range(0, 9).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
        dpath,
    )
    assert spype_spark.sql(
        spark, f"IMPORT DELTA '{dpath}' INTO '{npath}'"
    ) == 0
    assert spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM '{npath}'"
    ).collect()[0].n == 9


def test_sql_foreign_maintenance_verbs(spark, tmp_path):
    """Round-13 foreign-format statements: DELETE FROM DELTA (deletion
    vectors), ALTER DELTA/ICEBERG RENAME COLUMN, IMPORT ICEBERG."""
    import spype_spark
    from spype_spark import delta_interop as dl
    from spype_spark import iceberg_interop as ice

    base = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # DELETE FROM DELTA — merge-on-read, no data file rewritten
    dpath = str(tmp_path / "d")
    dl.write_delta(spark, base, dpath)
    v = spype_spark.sql(
        spark, f"DELETE FROM DELTA '{dpath}' WHERE k % 3 = 1"
    )
    assert v == 1
    got = spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM DELTA '{dpath}'"
    ).collect()[0].n
    assert got == 20
    # ALTER DELTA RENAME COLUMN — column mapping, old files readable
    spype_spark.sql(spark, f"ALTER DELTA '{dpath}' RENAME COLUMN v TO value")
    r = spype_spark.sql(
        spark, f"SELECT sum(value) AS s FROM DELTA '{dpath}'"
    ).collect()[0].s
    assert r == sum(2 * k for k in range(30) if k % 3 != 1)
    # ALTER ICEBERG RENAME COLUMN — field-id resolution
    ipath = str(tmp_path / "i")
    ice.write_iceberg(spark, base, ipath)
    spype_spark.sql(spark, f"ALTER ICEBERG '{ipath}' RENAME COLUMN v TO val")
    r2 = spype_spark.sql(
        spark, f"SELECT sum(val) AS s FROM ICEBERG '{ipath}'"
    ).collect()[0].s
    assert r2 == sum(2 * k for k in range(30))
    # IMPORT ICEBERG INTO native
    npath = str(tmp_path / "n")
    assert spype_spark.sql(
        spark, f"IMPORT ICEBERG '{ipath}' INTO '{npath}'"
    ) == 0
    assert spype_spark.sql(
        spark, f"SELECT count(*) AS n FROM '{npath}'"
    ).collect()[0].n == 30
    # a catalog table literally named delta-ish must NOT be shadowed:
    # DELETE FROM DELTA requires the quoted-path form
    with pytest.raises(Exception):
        spype_spark.sql(spark, "DELETE FROM DELTA missing_quotes WHERE 1=1")


def test_sql_from_changes_and_avro(spark, tmp_path):
    """Round-13 continuation statements: FROM DELTA CHANGES (CDF over
    a foreign log), FROM ICEBERG CHANGES (incremental snapshot read),
    FROM AVRO (jar-free container directory scan)."""
    from pyspark.sql import functions as F

    from spype_spark import avro_table as at
    from spype_spark import delta_interop as dl
    from spype_spark import iceberg_interop as ice

    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    # Delta CDF
    dpath = str(tmp_path / "d")
    dl.write_delta(spark, df, dpath)
    dl.delta_delete_rows(spark, dpath, F.col("k") < 3)
    got = spype_spark.sql(
        spark,
        f"SELECT _change_type, count(*) AS n FROM DELTA CHANGES "
        f"'{dpath}' GROUP BY _change_type ORDER BY _change_type",
    ).collect()
    assert [(r._change_type, r.n) for r in got] == [
        ("delete", 3),
        ("insert", 10),
    ]
    got = spype_spark.sql(
        spark,
        f"SELECT count(*) AS n FROM DELTA CHANGES '{dpath}' "
        f"FROM VERSION 1 TO VERSION 1",
    ).collect()
    assert got[0].n == 3
    # Iceberg incremental
    ipath = str(tmp_path / "i")
    s0 = ice.write_iceberg(spark, df, ipath)
    ice.write_iceberg(
        spark,
        spark.range(10, 14).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        ipath,
        mode="append",
    )
    got = spype_spark.sql(
        spark,
        f"SELECT count(*) AS n FROM ICEBERG CHANGES '{ipath}' "
        f"FROM SNAPSHOT {s0}",
    ).collect()
    assert got[0].n == 4
    # Avro directory
    apath = str(tmp_path / "a")
    at.write_avro_table(df, apath)
    got = spype_spark.sql(
        spark,
        f"SELECT count(*) AS n, sum(v) AS s FROM AVRO '{apath}'",
    ).collect()
    assert (got[0].n, got[0].s) == (10, 450)


def test_sql_create_bloom_keys(spark, tmp_path):
    """CREATE TABLE … BLOOM KEYS (k) opts the table into per-file
    Bloom filters through the SQL facade — path tables and catalog
    tables both; the clause composes with PARTITIONED BY; malformed
    items stay loud."""
    import pytest as _pt

    p = str(tmp_path / "bt")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p}' BLOOM KEYS (k) AS
        SELECT md5(CAST(id AS STRING)) AS k, id AS v FROM range(300)
    """)
    m = lake._m_load(p, 0)
    assert m["bloom_keys"] == ["k"]
    assert all(
        "bloom" in e for e in lake._m_entries(p, m) if e.get("rows")
    )
    # composes with PARTITIONED BY
    p2 = str(tmp_path / "bt2")
    spype_spark.sql(spark, f"""
        CREATE TABLE '{p2}' PARTITIONED BY (s) BLOOM KEYS (k) AS
        SELECT md5(CAST(id AS STRING)) AS k,
               CAST(id % 2 AS STRING) AS s, id AS v
        FROM range(100)
    """)
    m2 = lake._m_load(p2, 0)
    assert m2["bloom_keys"] == ["k"] and m2["partition_by"] == ["s"]
    with _pt.raises(ValueError, match="BLOOM KEYS"):
        spype_spark.sql(
            spark,
            f"CREATE TABLE '{str(tmp_path / 'bad')}' "
            f"BLOOM KEYS (a b) AS SELECT 1 AS x",
        )
