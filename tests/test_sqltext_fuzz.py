"""Randomized statement-sequence vs direct-verb equivalence fuzzing
for the SQL facade (VERDICT r12 task 9).

Each seeded sequence builds TWO twin manifest tables from the same
frame, then applies the same random mutation/DDL program to both —
one through ``spype_spark.sql`` statement text (INSERT INTO VALUES,
UPDATE, DELETE FROM, MERGE INTO, ALTER TABLE RENAME COLUMN / ALTER
COLUMN TYPE, RESTORE TABLE, OPTIMIZE), the other through the direct
lakehouse verbs — and requires the end states to match EXACTLY
(schema simpleString + sorted rows + version count). This is the
class of fuzzing that would have caught the r11 CTE-shadowing bug
and the r12 nested-CTE scoping bug before ADVICE did: any
parse/dispatch divergence between the statement text and the verb it
claims to wrap breaks equality.

Sequence count: ``SPYPE_SQLFUZZ_SEQ`` env (default 100 — the VERDICT
floor). Tables are tiny (16 rows, 1 partition) so each sequence is a
handful of small manifest commits.
"""

import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import spype_spark
from spype_spark import lakehouse as lake

N_SEQ = int(os.environ.get("SPYPE_SQLFUZZ_SEQ", "100"))
_CHUNKS = 10


def _base_df(spark, n=16):
    return (
        spark.range(n)
        .select(
            F.col("id").cast("int").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("s"),
        )
        .coalesce(1)
    )


def _apply(spark, rng, sql_path, verb_path, names, widened):
    """Pick one random op; apply to sql_path via statement text and to
    verb_path via the direct verb. Returns updated (names, widened)."""
    k, v, s = names["k"], names["v"], names["s"]
    ops = ["insert", "update", "delete", "merge", "restore", "optimize"]
    if rng.random() < 0.35:
        ops.append("rename")
    if not widened and rng.random() < 0.4:
        ops.append("widen")
    op = rng.choice(ops)

    if op == "insert":
        rows = [
            (100 + rng.randrange(50), rng.randrange(1000), f"s{rng.randrange(3)}")
            for _ in range(rng.randrange(1, 4))
        ]
        vals = ", ".join(f"({a}, {b}, '{c}')" for a, b, c in rows)
        spype_spark.sql(spark, f"INSERT INTO '{sql_path}' VALUES {vals}")
        schema = lake.read_table(spark, verb_path).schema
        lake.append_table(
            spark, verb_path,
            spark.createDataFrame(rows, schema).coalesce(1),
        )
    elif op == "update":
        m, r, add = rng.randrange(2, 5), rng.randrange(0, 2), rng.randrange(1, 9)
        spype_spark.sql(
            spark,
            f"UPDATE '{sql_path}' SET {v} = {v} + {add} "
            f"WHERE {k} % {m} = {r}",
        )
        lake.update_where(
            spark, verb_path, F.expr(f"{k} % {m} = {r}"),
            {v: F.expr(f"{v} + {add}")},
        )
    elif op == "delete":
        m, r = rng.randrange(3, 6), rng.randrange(0, 3)
        spype_spark.sql(
            spark, f"DELETE FROM '{sql_path}' WHERE {k} % {m} = {r}"
        )
        lake.delete_where(spark, verb_path, F.expr(f"{k} % {m} = {r}"))
    elif op == "merge":
        rows = [
            (rng.randrange(0, 30), rng.randrange(1000), f"s{rng.randrange(3)}")
            for _ in range(rng.randrange(1, 4))
        ]
        # dedup keys: merge sources must be key-unique
        rows = list({r[0]: r for r in rows}.values())
        schema = lake.read_table(spark, verb_path).schema
        src = spark.createDataFrame(rows, schema).coalesce(1)
        view = f"spype_fuzz_src_{rng.randrange(1 << 30)}"
        src.createOrReplaceTempView(view)
        spype_spark.sql(spark, f"""
            MERGE INTO '{sql_path}' AS t USING {view} AS sr
            ON t.{k} = sr.{k}
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *
        """)
        lake.merge_upsert(spark, verb_path, src, keys=[k])
        spark.catalog.dropTempView(view)
    elif op == "rename":
        which = rng.choice(["v", "s"])
        old = names[which]
        new = f"{which}{rng.randrange(10, 99)}"
        spype_spark.sql(
            spark, f"ALTER TABLE '{sql_path}' RENAME COLUMN {old} TO {new}"
        )
        lake.rename_columns(spark, verb_path, {old: new})
        names[which] = new
    elif op == "widen":
        spype_spark.sql(
            spark, f"ALTER TABLE '{sql_path}' ALTER COLUMN {k} TYPE bigint"
        )
        lake.widen_types(spark, verb_path, {k: "bigint"})
        widened = True
    elif op == "restore":
        cur = lake.latest_version(sql_path)
        if cur >= 1:
            tgt = rng.randrange(0, cur)
            spype_spark.sql(
                spark,
                f"RESTORE TABLE '{sql_path}' TO VERSION AS OF {tgt}",
            )
            lake.restore_table(spark, verb_path, tgt)
            # restore jumps the CONTENT back but rename/widen history
            # is part of the restored schema: re-derive current names
            cols = lake.read_table(spark, verb_path).columns
            for slot in ("k", "v", "s"):
                if names[slot] not in cols:
                    cand = [
                        c for c in cols
                        if c.startswith(slot) and c not in names.values()
                    ]
                    if cand:
                        names[slot] = cand[0]
            widened = (
                dict(lake.read_table(spark, verb_path).dtypes)[names["k"]]
                == "bigint"
            )
    elif op == "optimize":
        # plain OPTIMIZE dispatches to SELECTIVE bin-packing (Delta's
        # semantics, min_file_bytes=128M/target 1G) — mirror exactly;
        # on tiny fixtures both sides may legitimately no-op
        spype_spark.sql(spark, f"OPTIMIZE '{sql_path}'")
        lake.compact(
            spark, verb_path,
            min_file_bytes=128 * 1024 * 1024,
            target_file_bytes=1024 * 1024 * 1024,
        )
    return names, widened


def _run_sequence(spark, seed):
    rng = random.Random(10_000 + seed)
    tmp = tempfile.mkdtemp(prefix="spype_sqlfuzz_")
    try:
        sql_path, verb_path = f"{tmp}/t_sql", f"{tmp}/t_verb"
        base = _base_df(spark)
        lake.write_table(base, sql_path)
        lake.write_table(base, verb_path)
        names, widened = {"k": "k", "v": "v", "s": "s"}, False
        for _ in range(rng.randrange(3, 6)):
            names, widened = _apply(
                spark, rng, sql_path, verb_path, names, widened
            )
        a, b = lake.read_table(spark, sql_path), lake.read_table(
            spark, verb_path
        )
        assert a.schema.simpleString() == b.schema.simpleString(), (
            f"seed {seed}: schema diverged"
        )
        ra = sorted(tuple(r) for r in a.collect())
        rb = sorted(tuple(r) for r in b.collect())
        assert ra == rb, f"seed {seed}: rows diverged ({len(ra)} vs {len(rb)})"
        assert lake.latest_version(sql_path) == lake.latest_version(
            verb_path
        ), f"seed {seed}: version histories diverged"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
@pytest.mark.parametrize("chunk", range(_CHUNKS))
def test_sql_statement_sequences_match_verbs(spark, chunk):
    per = -(-N_SEQ // _CHUNKS)
    for seed in range(chunk * per, min((chunk + 1) * per, N_SEQ)):
        _run_sequence(spark, seed)
