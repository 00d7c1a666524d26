"""SQL text facade for the lakehouse verbs.

A real user's first contact with a table format is ``spark.sql("MERGE
INTO …")``, not a Python API. Spark itself only parses these statements
for catalogs that implement its DSv2 maintenance interfaces, so this
module provides the same surface as a STATEMENT-LEVEL dispatcher: it
recognizes the lakehouse maintenance statements (MERGE INTO / UPDATE /
DELETE FROM / RESTORE TABLE / OPTIMIZE / VACUUM), maps them onto the
existing verbs in :mod:`spype_spark.lakehouse` — which already carry
the COW pruning, manifest planning, and conflict semantics — and hands
EVERYTHING else to ``spark.sql`` untouched. No expression parsing is
re-invented: every condition, assignment right-hand side, and subquery
inside a recognized statement is delegated to Spark's own parser via
``F.expr`` / ``spark.sql``, so the full Spark SQL expression language
works in all of them.

Table references:

- ``'<path>'`` — a quoted filesystem/object-store path to a lakehouse
  table (the Delta ``delta.`/path/``` spelling, simplified);
- a bare identifier — resolved through the ``catalog=`` keyword
  (:class:`spype_spark.catalog.Catalog`); the mutation then runs in a
  single-verb catalog TRANSACTION so the record log stays the source
  of truth (mutating a catalog table behind the log's back would
  corrupt snapshot isolation).

Example::

    from spype_spark import sqltext
    sqltext.sql(spark, \"\"\"
        MERGE INTO '/data/orders' AS t
        USING (SELECT * FROM updates_view) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.o_totalprice > t.o_totalprice
            THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    \"\"\")
"""

from __future__ import annotations

import itertools as _itertools
import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark import lakehouse as lake

__all__ = ["sql"]

# a table ref: '<path>' or a bare identifier
_TREF = r"(?:'(?P<{0}_path>[^']+)'|(?P<{0}_name>[A-Za-z_][A-Za-z0-9_.]*))"
_WS = r"\s+"


def _tref(stmt_match: re.Match, slot: str, catalog) -> str:
    p = stmt_match.group(f"{slot}_path")
    if p is not None:
        return p
    name = stmt_match.group(f"{slot}_name")
    if catalog is None:
        raise ValueError(
            f"bare table name {name!r} needs catalog=; quote a path "
            f"('…/table') to address a table directly"
        )
    return name  # catalog-resolved by the caller


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0 (assignment lists,
    ZORDER column lists). Quotes and parens inside expressions pass
    through to Spark's parser untouched."""
    out, depth, q, cur = [], 0, None, []
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [p.strip() for p in out if p.strip()]


# ---------------------------------------------------------------------------
# MERGE INTO
# ---------------------------------------------------------------------------

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+" + _TREF.format("tgt")
    + r"(?:\s+AS)?\s+(?P<talias>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"USING\s+(?:\((?P<subq>.*?)\)|(?P<view>[A-Za-z_][A-Za-z0-9_.]*))"
    r"(?:\s+AS)?\s+(?P<salias>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"ON\s+(?P<on>.*?)"
    r"(?P<clauses>\s+WHEN\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)

_WHEN_RE = re.compile(
    r"WHEN\s+(?P<kind>MATCHED|NOT\s+MATCHED\s+BY\s+SOURCE|NOT\s+MATCHED)"
    r"(?:\s+AND\s+(?P<cond>.*?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*)\s*",
    re.IGNORECASE | re.DOTALL,
)


def _alias_rewrite(expr: str, talias: str, salias: str | None) -> str:
    """Re-point clause-condition alias references at the join's struct
    columns (``__t`` = target row, ``__u`` = source row) so Spark's own
    parser evaluates them in :func:`lakehouse._merged_frame_full`'s
    frame."""
    expr = re.sub(rf"\b{re.escape(talias)}\.", "__t.", expr)
    if salias:
        expr = re.sub(rf"\b{re.escape(salias)}\.", "__u.", expr)
    return expr


def _parse_on_keys(on: str, talias: str, salias: str) -> list[str]:
    """The merge kernel joins on KEY EQUALITY — accept a conjunction of
    ``t.k = s.k`` terms (either order) and reject anything fancier
    (non-equi merge conditions belong in clause ANDs)."""
    keys = []
    for term in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
        m = re.match(
            r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", term.strip()
        )
        if not m:
            raise ValueError(
                f"MERGE ON must be a conjunction of alias.col = "
                f"alias.col equalities, got {term.strip()!r}"
            )
        a1, c1, a2, c2 = m.groups()
        if {a1, a2} != {talias, salias} or c1 != c2:
            raise ValueError(
                f"MERGE ON term {term.strip()!r} must equate the SAME "
                f"column across the two aliases ({talias}, {salias})"
            )
        keys.append(c1)
    return keys


def _parse_merge(spark: SparkSession, stmt: str, catalog=None):
    m = _MERGE_RE.match(stmt)
    if not m:
        raise ValueError("unparseable MERGE INTO statement")
    talias, salias = m.group("talias"), m.group("salias")
    source = (
        # the USING subquery may itself reference lakehouse tables
        # ('path' VERSION AS OF n / catalog names) — resolve them the
        # same way a SELECT statement would
        _sql_resolved(spark, m.group("subq"), catalog)
        if m.group("subq") is not None
        else spark.table(m.group("view"))
    )
    keys = _parse_on_keys(m.group("on"), talias, salias)
    kw = dict(
        when_matched=None,
        matched_condition=None,
        when_not_matched=None,
        when_not_matched_by_source=None,
        by_source_condition=None,
        not_matched_condition=None,
    )
    clauses = m.group("clauses")
    covered = [False] * len(clauses)
    for w in _WHEN_RE.finditer(clauses):
        covered[w.start():w.end()] = [True] * (w.end() - w.start())
        kind = re.sub(r"\s+", " ", w.group("kind")).upper()
        action = re.sub(r"\s+", " ", w.group("action")).upper()
        cond = w.group("cond")
        if kind == "MATCHED":
            kw["when_matched"] = (
                "update" if action.startswith("UPDATE") else "delete"
            )
            if action.startswith("INSERT"):
                raise ValueError("WHEN MATCHED takes UPDATE SET * or DELETE")
            if cond:
                txt = _alias_rewrite(cond, talias, salias)
                kw["matched_condition"] = (
                    lambda u, t, _x=txt: F.expr(_x)
                )
        elif kind == "NOT MATCHED":
            if action != "INSERT *":
                raise ValueError("WHEN NOT MATCHED takes INSERT *")
            kw["when_not_matched"] = "insert"
            if cond:
                txt = _alias_rewrite(cond, talias, salias)
                kw["not_matched_condition"] = (
                    lambda u, _x=txt: F.expr(_x)
                )
        else:  # NOT MATCHED BY SOURCE
            if action != "DELETE":
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE takes DELETE"
                )
            kw["when_not_matched_by_source"] = "delete"
            if cond:
                txt = _alias_rewrite(cond, talias, None)
                kw["by_source_condition"] = lambda t, _x=txt: F.expr(_x)
    # anything the WHEN scanner didn't consume is a syntax error, not
    # a silently-ignored clause
    leftover = "".join(
        ch for i, ch in enumerate(clauses) if not covered[i]
    ).strip()
    if leftover:
        raise ValueError(f"unparseable MERGE clause near {leftover!r}")
    if kw["when_matched"] is None and kw["when_not_matched"] is None and (
        kw["when_not_matched_by_source"] is None
    ):
        raise ValueError("MERGE needs at least one WHEN clause")
    return m, source, keys, kw


# ---------------------------------------------------------------------------
# The other maintenance statements
# ---------------------------------------------------------------------------

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+" + _TREF.format("tgt")
    + r"\s+SET\s+(?P<sets>.*?)(?:\s+WHERE\s+(?P<where>.*?))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+" + _TREF.format("tgt")
    + r"\s+WHERE\s+(?P<where>.*?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+TO\s+(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"(?:(?P<ver>\d+)|'(?P<ts>[^']+)')\s*$",
    re.IGNORECASE,
)
_RESTORE_CAT_RE = re.compile(
    r"^\s*RESTORE\s+CATALOG\s+TO\s+TXN\s+AS\s+OF\s+(?P<txn>\d+)\s*$",
    re.IGNORECASE,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+" + _TREF.format("tgt")
    + r"(?:\s+ZORDER\s+BY\s*\((?P<zcols>[^)]*)\))?"
    r"(?:\s+MIN\s+FILE\s+BYTES\s+(?P<minb>\d+))?"
    r"(?:\s+TARGET\s+FILE\s+BYTES\s+(?P<tgtb>\d+))?\s*$",
    re.IGNORECASE,
)
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+" + _TREF.format("tgt")
    + r"(?:\s+KEEP\s+(?P<keep>\d+))?"
    r"(?:\s+RETAIN\s+(?P<hours>\d+(?:\.\d+)?)\s+HOURS)?\s*$",
    re.IGNORECASE,
)

# ---------------------------------------------------------------------------
# ALTER TABLE DDL + branch statements — statement dispatch onto the
# existing metadata-only verbs (rename_columns / drop_columns /
# widen_types / set_partition_spec / create_branch / publish_branch).
# ---------------------------------------------------------------------------

_ALTER_RENAME_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+RENAME\s+COLUMN\s+(?P<renames>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_DROP_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+DROP\s+COLUMNS?\s*"
    r"(?:\((?P<cols_p>[^)]*)\)|(?P<cols>\w+(?:\s*,\s*\w+)*))\s*$",
    re.IGNORECASE,
)
_ALTER_WIDEN_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+ALTER\s+COLUMN\s+(?P<col>\w+)\s+TYPE\s+(?P<typ>\w+)\s*$",
    re.IGNORECASE,
)
_ALTER_BLOOM_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+(?:SET\s+BLOOM\s+KEYS\s*\((?P<bspec>[^)]*)\)"
    r"|(?P<drop>DROP\s+BLOOM\s+KEYS))\s*$",
    re.IGNORECASE,
)
_ALTER_SPEC_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+SET\s+PARTITION\s+SPEC\s*\((?P<pspec>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_BRANCH_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+" + _TREF.format("tgt")
    + r"\s+(?P<verb>CREATE|PUBLISH|DROP)\s+BRANCH\s+"
    r"(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+AS\s+OF\s+VERSION\s+(?P<ver>\d+))?\s*$",
    re.IGNORECASE,
)
_CATALOG_BRANCH_RE = re.compile(
    r"^\s*(?P<verb>CREATE|PUBLISH|DROP)\s+CATALOG\s+BRANCH\s+"
    r"(?P<name>[A-Za-z_]\w*)"
    r"(?:\s+TXN\s+AS\s+OF\s+(?P<txn>\d+))?\s*$",
    re.IGNORECASE,
)
_IMPORT_DELTA_RE = re.compile(
    r"^\s*IMPORT\s+DELTA\s+'(?P<src>[^']+)'"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+))?"
    r"\s+INTO\s+'(?P<dst>[^']+)'"
    r"(?:\s+(?P<mat>MATERIALIZED))?\s*$",
    re.IGNORECASE,
)
_IMPORT_ICEBERG_RE = re.compile(
    r"^\s*IMPORT\s+ICEBERG\s+'(?P<src>[^']+)'"
    r"(?:\s+SNAPSHOT\s+AS\s+OF\s+(?P<snap>\d+))?"
    r"\s+INTO\s+'(?P<dst>[^']+)'"
    r"(?:\s+(?P<mat>MATERIALIZED))?\s*$",
    re.IGNORECASE,
)
# FOREIGN-table maintenance verbs (round 13): checked BEFORE the
# native _DELETE_RE — `DELETE FROM DELTA '<p>'` would otherwise parse
# as a delete of a catalog table literally named DELTA.
_DELETE_DELTA_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+DELTA\s+'(?P<path>[^']+)'"
    r"\s+WHERE\s+(?P<where>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_FOREIGN_RENAME_RE = re.compile(
    r"^\s*ALTER\s+(?P<fmt>DELTA|ICEBERG)\s+'(?P<path>[^']+)'"
    r"\s+RENAME\s+COLUMN\s+(?P<renames>.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# REPLICATE <fmt> '<src>' INTO '<dst>' KEYS (k[, …]) [CHECKPOINT '<dir>']
# — one statement = one incremental sync of the source table's change
# feed into a native table; repeated invocations resume from the
# (default: beside-the-table) streaming checkpoint. LAKE (r15) is the
# native→native mirror — the facade's format symmetry with the
# foreign CDC sources.
_REPLICATE_RE = re.compile(
    r"^\s*REPLICATE\s+(?P<fmt>DELTA|ICEBERG|LAKE)\s+'(?P<src>[^']+)'"
    r"\s+INTO\s+'(?P<dst>[^']+)'"
    r"\s+KEYS\s*\((?P<keys>[^)]+)\)"
    r"(?:\s+CHECKPOINT\s+'(?P<ck>[^']+)')?\s*$",
    re.IGNORECASE,
)


def _parse_renames(txt: str) -> dict:
    renames = {}
    for part in _split_top(txt):
        rm = re.match(r"^\s*(\w+)\s+TO\s+(\w+)\s*$", part, re.IGNORECASE)
        if not rm:
            raise ValueError(
                f"unparseable RENAME COLUMN item {part!r} "
                f"(want: old TO new[, old2 TO new2 …])"
            )
        renames[rm.group(1)] = rm.group(2)
    return renames


def _sql_foreign(spark: SparkSession, stmt: str):
    """Maintenance verbs against FOREIGN table formats (round 13) —
    the statements a Delta/Iceberg user runs before (or instead of)
    migrating: ``DELETE FROM DELTA '<path>' WHERE …`` (deletion
    vectors — merge-on-read, no data file rewritten), ``ALTER DELTA
    '<path>' RENAME COLUMN a TO b[, …]`` (column mapping, name mode),
    ``ALTER ICEBERG '<path>' RENAME COLUMN …`` (field-id schema
    evolution), ``IMPORT ICEBERG '<src>' [SNAPSHOT AS OF id] INTO
    '<dst>' [MATERIALIZED]``. Returns ``_NO_MATCH`` when ``stmt`` is
    none of them."""
    m = _DELETE_DELTA_RE.match(stmt)
    if m:
        from spype_spark import delta_interop

        return delta_interop.delta_delete_rows(
            spark, m.group("path"), F.expr(m.group("where"))
        )
    m = _ALTER_FOREIGN_RENAME_RE.match(stmt)
    if m:
        renames = _parse_renames(m.group("renames"))
        if m.group("fmt").upper() == "DELTA":
            from spype_spark import delta_interop

            return delta_interop.delta_rename_column(
                spark, m.group("path"), renames
            )
        from spype_spark import iceberg_interop

        return iceberg_interop.rename_iceberg_columns(
            spark, m.group("path"), renames
        )
    m = _IMPORT_ICEBERG_RE.match(stmt)
    if m:
        from spype_spark import iceberg_interop

        return iceberg_interop.import_iceberg(
            spark,
            m.group("src"),
            m.group("dst"),
            snapshot_id=(
                int(m.group("snap")) if m.group("snap") is not None else None
            ),
            materialize=bool(m.group("mat")),
        )
    m = _REPLICATE_RE.match(stmt)
    if m:
        import os as _os

        from spype_spark import lakehouse as _lake
        from spype_spark import replicate as _repl

        keys = [k.strip() for k in m.group("keys").split(",") if k.strip()]
        if not keys:
            raise ValueError("REPLICATE needs at least one KEYS column")
        dst = m.group("dst")
        ck = m.group("ck") or _os.path.join(
            _os.path.dirname(_os.path.abspath(dst)) or ".",
            f"_replication_ckpt_{_os.path.basename(_os.path.abspath(dst))}",
        )
        fn = {
            "DELTA": _repl.replicate_delta_to_lake,
            "ICEBERG": _repl.replicate_iceberg_to_lake,
            "LAKE": _repl.replicate_lake_to_lake,
        }[m.group("fmt").upper()]
        q = fn(spark, m.group("src"), dst, ck, keys)
        q.awaitTermination()
        return _lake.latest_version(dst)
    return _NO_MATCH


def _sql_alter(spark: SparkSession, stmt: str, catalog):
    """Dispatch the ALTER TABLE / branch statements. Returns the verb's
    native return (new version / branch root / None), or the sentinel
    ``_NO_MATCH`` when ``stmt`` is not one of them."""
    m = _ALTER_RENAME_RE.match(stmt)
    if m:
        renames = _parse_renames(m.group("renames"))
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.rename_columns(spark, ref, renames)
        with catalog.transaction(spark) as txn:
            return txn.rename_columns(ref, renames)
    m = _ALTER_DROP_RE.match(stmt)
    if m:
        cols = _split_top(m.group("cols_p") or m.group("cols"))
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.drop_columns(spark, ref, cols)
        with catalog.transaction(spark) as txn:
            return txn.drop_columns(ref, cols)
    m = _ALTER_BLOOM_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is None:
            raise ValueError(
                "SET/DROP BLOOM KEYS applies to path tables "
                "('/path'); catalog tables opt in at CREATE"
            )
        if m.group("drop"):
            return lake.set_bloom_keys(spark, ref, [])
        bkeys = [
            c.strip() for c in m.group("bspec").split(",") if c.strip()
        ]
        bad = [c for c in bkeys if not re.match(r"^\w+$", c)]
        if bad:
            raise ValueError(f"unparseable BLOOM KEYS item(s) {bad}")
        return lake.set_bloom_keys(spark, ref, bkeys)
    m = _ALTER_WIDEN_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is None:
            raise ValueError(
                "ALTER COLUMN … TYPE on a catalog table has no staged "
                "verb yet (widen_types is path-level); quote the "
                "table's path"
            )
        return lake.widen_types(
            spark, ref, {m.group("col"): m.group("typ").lower()}
        )
    m = _ALTER_SPEC_RE.match(stmt)
    if m:
        pby = _parse_partition_spec(m.group("pspec"))
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.set_partition_spec(spark, ref, pby)
        with catalog.transaction(spark) as txn:
            return txn.set_partition_spec(ref, pby)
    m = _ALTER_BRANCH_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is None:
            raise ValueError(
                "branching ONE catalog table behind the record log "
                "would corrupt snapshot isolation; use CREATE/PUBLISH/"
                "DROP CATALOG BRANCH (the catalog-level WAP unit) or "
                "quote a path-addressed table"
            )
        verb = m.group("verb").upper()
        if verb == "CREATE":
            at = int(m.group("ver")) if m.group("ver") is not None else None
            return lake.create_branch(ref, m.group("name"), at_version=at)
        if m.group("ver") is not None:
            raise ValueError("AS OF VERSION only applies to CREATE BRANCH")
        if verb == "PUBLISH":
            return lake.publish_branch(ref, m.group("name"))
        return lake.drop_branch(ref, m.group("name"))
    m = _IMPORT_DELTA_RE.match(stmt)
    if m:
        from spype_spark import delta_interop

        return delta_interop.import_delta(
            spark,
            m.group("src"),
            m.group("dst"),
            version=int(m.group("ver")) if m.group("ver") is not None else None,
            materialize=bool(m.group("mat")),
        )
    m = _CATALOG_BRANCH_RE.match(stmt)
    if m:
        if catalog is None:
            raise ValueError("CATALOG BRANCH statements need catalog=")
        verb = m.group("verb").upper()
        if verb == "CREATE":
            txn = int(m.group("txn")) if m.group("txn") is not None else None
            return catalog.create_branch(m.group("name"), txn=txn)
        if m.group("txn") is not None:
            raise ValueError("TXN AS OF only applies to CREATE CATALOG BRANCH")
        if verb == "PUBLISH":
            return catalog.publish_branch(spark, m.group("name"))
        return catalog.drop_branch(m.group("name"))
    return _NO_MATCH


_NO_MATCH = object()

# ---------------------------------------------------------------------------
# Read side: SELECT passthrough with lakehouse table refs, INSERT INTO,
# CREATE TABLE … [PARTITIONED BY (…)] AS SELECT.
# ---------------------------------------------------------------------------

# a lakehouse ref in FROM/JOIN position: '<path>' with optional time
# travel. Anchoring on FROM/JOIN keeps ordinary string literals in the
# query out of reach ('GERMANY' never follows FROM/JOIN in valid SQL).
_READ_REF_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+'(?P<path>[^']+)'"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?",
    re.IGNORECASE,
)
# a FOREIGN Delta table in FROM/JOIN position: DELTA '<path>' — read
# through delta_interop.read_delta (a Delta user's first query against
# this engine is a SELECT over their existing table)
_READ_DELTA_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+DELTA\s+'(?P<path>[^']+)'"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+))?",
    re.IGNORECASE,
)
# FROM ICEBERG '<path>' [SNAPSHOT AS OF <id>] — a FOREIGN Iceberg
# table through iceberg_interop.read_iceberg (round 13, parity with
# FROM DELTA)
_READ_ICEBERG_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+ICEBERG\s+'(?P<path>[^']+)'"
    r"(?:\s+SNAPSHOT\s+AS\s+OF\s+(?P<snap>\d+))?",
    re.IGNORECASE,
)
# FROM DELTA CHANGES '<path>' [FROM VERSION a] [TO VERSION b] — the
# Change Data Feed of a foreign Delta log (delta_interop.delta_changes)
_READ_DELTA_CHANGES_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+DELTA\s+CHANGES\s+'(?P<path>[^']+)'"
    r"(?:\s+FROM\s+VERSION\s+(?P<fromv>\d+))?"
    r"(?:\s+TO\s+VERSION\s+(?P<tov>\d+))?",
    re.IGNORECASE,
)
# FROM ICEBERG CHANGES '<path>' [FROM SNAPSHOT a] [TO SNAPSHOT b] —
# incremental read over a snapshot chain (iceberg_changes; FROM is
# exclusive per Iceberg's own incremental-scan convention)
_READ_ICEBERG_CHANGES_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+ICEBERG\s+CHANGES\s+'(?P<path>[^']+)'"
    r"(?:\s+FROM\s+SNAPSHOT\s+(?P<froms>\d+))?"
    r"(?:\s+TO\s+SNAPSHOT\s+(?P<tos>\d+))?",
    re.IGNORECASE,
)
# FROM LAKE CHANGES '<path>' [KEYS (k1, k2)] [FROM VERSION a]
# [TO VERSION b] — the NATIVE change feed (round 14): the batch window
# of the spype_lake readChangeFeed format; KEYS names the diff keys
# rewrite commits need (omitted = append/MoR-delete-only history)
_READ_LAKE_CHANGES_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+LAKE\s+CHANGES\s+'(?P<path>[^']+)'"
    r"(?:\s+KEYS\s*\((?P<keys>[^)]+)\))?"
    r"(?:\s+FROM\s+VERSION\s+(?P<fromv>\d+))?"
    r"(?:\s+TO\s+VERSION\s+(?P<tov>\d+))?",
    re.IGNORECASE,
)
# FROM AVRO '<dir>' — a directory of Avro container files through the
# distributed jar-free source (avro_table.read_avro_table)
_READ_AVRO_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+AVRO\s+'(?P<path>[^']+)'",
    re.IGNORECASE,
)
# a bare identifier in FROM/JOIN position with optional TXN AS OF —
# resolved through catalog= when the name is in the catalog state
# (names that aren't stay untouched for Spark's own resolver: temp
# views, catalog.db.table refs, etc.)
_READ_NAME_RE = re.compile(
    r"(?P<kw>\b(?:FROM|JOIN)\b)\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)\b"
    r"(?!\s*\.|\s*\()"
    r"(?:\s+TXN\s+AS\s+OF\s+(?P<txn>\d+))?",
    re.IGNORECASE,
)

_DESCRIBE_RE = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+" + _TREF.format("tgt") + r"\s*$",
    re.IGNORECASE,
)
_SHOW_TABLES_RE = re.compile(r"^\s*SHOW\s+TABLES\s*$", re.IGNORECASE)

_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+" + _TREF.format("tgt")
    + r"\s+(?P<body>(?:SELECT|WITH|VALUES|TABLE)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)

_CREATE_RE = re.compile(
    # pspec is lazy + anchored on ") AS" so transform calls'
    # nested parens (bucket(8, k)) stay inside the spec
    r"^\s*CREATE\s+TABLE\s+" + _TREF.format("tgt")
    + r"(?:\s+PARTITIONED\s+BY\s*\((?P<pspec>.*?)\))?"
    r"(?:\s+BLOOM\s+KEYS\s*\((?P<bspec>[^)]*)\))?"
    r"\s+AS\s+(?P<body>(?:SELECT|WITH|TABLE)\b.*)$",
    re.IGNORECASE | re.DOTALL,
)

_TRANSFORM_RE = re.compile(
    r"^(?P<fn>days|hours)\s*\(\s*(?P<col>\w+)\s*\)$"
    r"|^(?P<fn2>bucket|truncate)\s*\(\s*(?P<param>\d+)\s*,"
    r"\s*(?P<col2>\w+)\s*\)$",
    re.IGNORECASE,
)


def _parse_partition_spec(pspec: str):
    """``PARTITIONED BY`` list → the ``write_table(partition_by=)``
    spec: bare identifiers stay identity columns; ``days(c)`` /
    ``hours(c)`` / ``bucket(n, c)`` / ``truncate(w, c)`` become the
    Iceberg-style hidden-partition transform tuples
    (:func:`lakehouse._norm_partition_spec`)."""
    out = []
    for item in _split_top(pspec):
        m = _TRANSFORM_RE.match(item.strip())
        if m is None:
            if not re.match(r"^\w+$", item.strip()):
                raise ValueError(f"unparseable PARTITIONED BY item {item!r}")
            out.append(item.strip())
        elif m.group("fn"):
            out.append((m.group("fn").lower(), m.group("col")))
        else:
            out.append(
                (
                    m.group("fn2").lower(),
                    int(m.group("param")),
                    m.group("col2"),
                )
            )
    return out


# Generated-view names must be collision-proof: ``itertools.count`` is
# a single atomic bytecode step in CPython (no read-modify-write race
# between concurrent sql() calls on one SparkSession), and the uuid
# suffix keeps names unique even across interpreter forks that might
# share a session (ADVICE r11: a raced counter + createOrReplaceTempView
# silently clobbers the other statement's view before analysis).
_VIEW_SEQ = _itertools.count(1)


def _fresh_view() -> str:
    return f"__spype_sql_{next(_VIEW_SEQ)}_{uuid.uuid4().hex[:8]}"

# words that may follow a table ref and are NOT a user alias — used to
# decide whether a rewritten bare-name ref needs `AS <original name>`
# re-attached (an explicit user alias survives the rewrite verbatim,
# since only the ref text itself is replaced)
_NOT_ALIAS = frozenset(
    """AS JOIN ON WHERE GROUP ORDER LIMIT LEFT RIGHT FULL INNER CROSS
    UNION EXCEPT INTERSECT HAVING NATURAL SEMI ANTI LATERAL WINDOW
    QUALIFY USING VERSION TIMESTAMP TXN SELECT WHEN THEN""".split()
)


def _has_user_alias(m: re.Match) -> bool:
    """Does an (unconsumed) alias token follow this table ref?"""
    rest = m.string[m.end():]
    am = re.match(r"\s+(?:AS\s+)?([A-Za-z_]\w*)", rest)
    return am is not None and am.group(1).upper() not in _NOT_ALIAS


def _inside_string(stmt: str, pos: int) -> bool:
    """Is ``pos`` inside a single-quoted SQL string literal? A real
    scan, not quote-parity counting: Spark's default string literals
    escape a quote BOTH as ``''`` and as ``\\'`` (ADVICE r11 — a raw
    count flips parity on ``'see \\' FROM t'`` and rewrites the FROM
    inside the literal while skipping real refs after it)."""
    inside = False
    i = 0
    while i < pos:
        ch = stmt[i]
        if inside:
            if ch == "\\":
                i += 2  # backslash escape consumes the next char
                continue
            if ch == "'":
                if i + 1 < len(stmt) and stmt[i + 1] == "'":
                    i += 2  # '' escape — still inside
                    continue
                inside = False
        elif ch == "'":
            inside = True
        i += 1
    return inside


# a CTE (or WINDOW-clause) definition header: ``<name> AS (``. In SQL
# text an identifier directly followed by ``AS (`` occurs only in these
# definition positions — never in FROM/JOIN refs (``t AS x(a, b)`` puts
# the paren after the ALIAS, not after AS) — so collecting them is a
# sound CTE-name census without a full parser.
_CTE_DEF_RE = re.compile(r"\b([A-Za-z_]\w*)\s+AS\s*\(", re.IGNORECASE)


def _paren_pairs(stmt: str) -> dict[int, int]:
    """Index of matching parens (open position → close position),
    skipping string literals (both ``''`` and ``\\'`` escapes)."""
    pairs: dict[int, int] = {}
    stack: list[int] = []
    i, n = 0, len(stmt)
    while i < n:
        ch = stmt[i]
        if ch == "'":  # skip the whole literal
            i += 1
            while i < n:
                if stmt[i] == "\\":
                    i += 2
                    continue
                if stmt[i] == "'":
                    if i + 1 < n and stmt[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            stack.append(i)
        elif ch == ")":
            if stack:
                pairs[stack.pop()] = i
        i += 1
    return pairs


def _cte_spans(stmt: str) -> dict[str, list[tuple[int, int]]]:
    """For each ``WITH <name> AS (…)`` definition in the statement
    (top-level and nested), the (start, end) span where the name is
    SHADOWED — i.e. where a same-named bare ref means the CTE, not the
    catalog table, so the rewriter must leave it alone.

    SQL scoping (Spark/Delta behavior): a CTE shadows a same-named
    catalog table from the end of its own definition body to the end
    of its ENCLOSING query block — the parenthesized subquery whose
    WITH list defines it, or the whole statement for a top-level WITH.
    It does NOT shadow inside its own non-recursive body (the name
    still means the outer relation there), before its definition
    (no forward references), or OUTSIDE the enclosing subquery
    (ADVICE r12: a CTE defined inside a nested subquery used to
    shadow the whole statement, so an outer-query ref to the
    same-named catalog table was skipped and failed Spark analysis
    with TABLE_OR_VIEW_NOT_FOUND)."""
    spans: dict[str, list[tuple[int, int]]] = {}
    n = len(stmt)
    pairs = _paren_pairs(stmt)
    # sorted open positions let us find the innermost enclosing block
    # of each definition with a linear scan per match
    opens = sorted(pairs)
    for m in _CTE_DEF_RE.finditer(stmt):
        if _inside_string(stmt, m.start()):
            continue
        open_i = m.end() - 1  # the '(' the regex anchored on
        body_end = pairs.get(open_i, n)
        # innermost paren pair strictly containing the definition name
        # (not the body paren itself) = the enclosing query block;
        # containing pairs are nested, so the smallest close wins
        block_end = n
        for o in opens:
            if o >= m.start():
                break
            c = pairs[o]
            if c > m.start():
                block_end = min(block_end, c)
        # shadow runs from just past the body's ')' to the block end
        if body_end < block_end:
            spans.setdefault(m.group(1), []).append((body_end + 1, block_end))
    return spans


def _sql_resolved(spark: SparkSession, stmt: str, catalog) -> DataFrame:
    """``spark.sql`` over a statement with lakehouse refs resolved —
    and the per-statement temp views dropped again immediately: Spark
    analyzes the query eagerly, so the returned frame's plan holds the
    resolved relations and the views are pure parser plumbing (leaving
    them registered would leak one catalog entry per statement)."""
    views: list[str] = []
    df = spark.sql(_resolve_reads(spark, stmt, catalog, views))
    for v in views:
        spark.catalog.dropTempView(v)
    return df


def _resolve_reads(
    spark: SparkSession, stmt: str, catalog, views: list[str] | None = None
) -> str:
    """Rewrite lakehouse table refs inside a SELECT-shaped statement to
    generated temp views backed by the Python read surface —
    ``'<path>' [VERSION AS OF n | TIMESTAMP AS OF 'ts']`` through
    :func:`lakehouse.read_table` and, when ``catalog=`` is given, bare
    catalog-state names ``name [TXN AS OF n]`` through
    :meth:`Catalog.read` — then hand the rewritten text to Spark's own
    parser. Views are per-statement throwaways; Spark resolves them at
    analysis time, so they never collide across statements. Created
    view names are appended to ``views`` (if given) so the caller can
    drop them after analysis (:func:`_sql_resolved`)."""
    import datetime as _dt

    def _track(view: str) -> None:
        if views is not None:
            views.append(view)

    def _path_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)  # 'FROM' text inside a string literal
        ver = int(m.group("ver")) if m.group("ver") is not None else None
        ts = None
        if m.group("ts") is not None:
            t = _dt.datetime.fromisoformat(m.group("ts"))
            if t.tzinfo is None:
                t = t.replace(tzinfo=_dt.timezone.utc)
            ts = t.timestamp()
        df = lake.read_table(spark, m.group("path"), version=ver, timestamp=ts)
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    def _delta_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)
        from spype_spark import delta_interop

        ver = int(m.group("ver")) if m.group("ver") is not None else None
        df = delta_interop.read_delta(spark, m.group("path"), version=ver)
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    def _iceberg_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)
        from spype_spark import iceberg_interop

        snap = int(m.group("snap")) if m.group("snap") is not None else None
        df = iceberg_interop.read_iceberg(
            spark, m.group("path"), snapshot_id=snap
        )
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    def _delta_changes_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)
        from spype_spark import delta_interop

        df = delta_interop.delta_changes(
            spark,
            m.group("path"),
            starting_version=(
                int(m.group("fromv")) if m.group("fromv") is not None else 0
            ),
            ending_version=(
                int(m.group("tov")) if m.group("tov") is not None else None
            ),
        )
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    def _lake_changes_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)
        from spype_spark.lake_sink import register_lake_sink

        register_lake_sink(spark)
        r = (
            spark.read.format("spype_lake")
            .option("path", m.group("path"))
            .option("readChangeFeed", "true")
            .option(
                "startingVersion",
                m.group("fromv") if m.group("fromv") is not None else "0",
            )
        )
        if m.group("keys"):
            cols = ",".join(
                c.strip() for c in m.group("keys").split(",") if c.strip()
            )
            r = r.option("keys", cols)
        if m.group("tov") is not None:
            r = r.option("endingVersion", m.group("tov"))
        view = _fresh_view()
        r.load().createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    def _iceberg_changes_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)
        from spype_spark import iceberg_interop

        df = iceberg_interop.iceberg_changes(
            spark,
            m.group("path"),
            from_snapshot_id=(
                int(m.group("froms")) if m.group("froms") is not None else None
            ),
            to_snapshot_id=(
                int(m.group("tos")) if m.group("tos") is not None else None
            ),
        )
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    def _avro_ref(m: re.Match) -> str:
        if _inside_string(m.string, m.start()):
            return m.group(0)
        from spype_spark import avro_table

        df = avro_table.read_avro_table(spark, m.group("path"))
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        return f"{m.group('kw')} {view}"

    # DELTA/ICEBERG refs first: the plain-path regex would otherwise
    # match the quoted path and mis-route it to the native reader
    # (and the CHANGES forms before the plain foreign forms — their
    # keyword precedes the quote the plain regexes anchor on)
    stmt = _READ_LAKE_CHANGES_RE.sub(_lake_changes_ref, stmt)
    stmt = _READ_ICEBERG_CHANGES_RE.sub(_iceberg_changes_ref, stmt)
    stmt = _READ_DELTA_CHANGES_RE.sub(_delta_changes_ref, stmt)
    stmt = _READ_AVRO_RE.sub(_avro_ref, stmt)
    stmt = _READ_ICEBERG_RE.sub(_iceberg_ref, stmt)
    stmt = _READ_DELTA_RE.sub(_delta_ref, stmt)
    stmt = _READ_REF_RE.sub(_path_ref, stmt)
    if catalog is None:
        return stmt
    names = set(catalog.state())
    # computed on the post-path-rewrite text so spans line up with the
    # match positions _name_ref sees
    cte = _cte_spans(stmt)

    def _name_ref(m: re.Match) -> str:
        name = m.group("name")
        if name not in names or _inside_string(m.string, m.start()):
            return m.group(0)  # not a catalog table — Spark's problem
        if any(s <= m.start() < e for s, e in cte.get(name, ())):
            # shadowed by a CTE here (after its definition, inside its
            # enclosing query block) — leave the ref for Spark
            return m.group(0)
        txn = int(m.group("txn")) if m.group("txn") is not None else None
        df = catalog.read(spark, m.group("name"), txn=txn)
        view = _fresh_view()
        df.createOrReplaceTempView(view)
        _track(view)
        if _has_user_alias(m):
            return f"{m.group('kw')} {view}"  # their alias follows
        # keep the original name addressable (t.col refs in the query)
        return f"{m.group('kw')} {view} AS {m.group('name')}"

    return _READ_NAME_RE.sub(_name_ref, stmt)


def sql(spark: SparkSession, stmt: str, catalog=None):
    """Execute one SQL statement. Lakehouse maintenance statements
    (MERGE INTO / UPDATE / DELETE FROM / RESTORE TABLE / OPTIMIZE /
    VACUUM) dispatch onto :mod:`spype_spark.lakehouse` verbs — for a
    path-quoted table directly, for a bare name through a single-verb
    transaction on ``catalog`` (keeping the record log authoritative).

    Read/DDL side: ``SELECT``/``WITH`` statements pass through Spark's
    own parser with lakehouse table refs resolved first —
    ``FROM '<path>' [VERSION AS OF n | TIMESTAMP AS OF 'ts']`` via
    :func:`lakehouse.read_table`, ``FROM DELTA '<path>' [VERSION AS
    OF n]`` (a FOREIGN Delta table) via
    :func:`delta_interop.read_delta`, ``FROM ICEBERG '<path>'
    [SNAPSHOT AS OF id]`` (a FOREIGN Iceberg table) via
    :func:`iceberg_interop.read_iceberg`, ``FROM DELTA CHANGES
    '<path>' [FROM VERSION a] [TO VERSION b]`` via
    :func:`delta_interop.delta_changes`, ``FROM ICEBERG CHANGES
    '<path>' [FROM SNAPSHOT a] [TO SNAPSHOT b]`` via
    :func:`iceberg_interop.iceberg_changes`, ``FROM AVRO '<dir>'``
    via :func:`avro_table.read_avro_table`, and bare catalog-state names
    ``[TXN AS OF n]`` via :meth:`Catalog.read` (see
    :func:`_resolve_reads`). ``INSERT INTO t <select|values>`` appends
    through :func:`lakehouse.append_table` / ``txn.append`` (VALUES
    rows are cast positionally to the table schema, SQL insert
    semantics). ``CREATE TABLE t [PARTITIONED BY (days(ts),
    bucket(8, k), …)] [BLOOM KEYS (k, …)] AS SELECT …`` creates via
    :func:`lakehouse.write_table` / ``txn.write`` with identity
    columns, Iceberg-style hidden-partition transforms, and the
    per-file Bloom-filter opt-in for hash-shaped keys
    (:mod:`spype_spark.bloom`).

    Migration: ``IMPORT DELTA '<src>' [VERSION AS OF n] INTO '<dst>'
    [MATERIALIZED]`` → :func:`delta_interop.import_delta` (zero-copy
    by-reference for unpartitioned tables; partitioned or MATERIALIZED
    imports rewrite once). ``REPLICATE DELTA|ICEBERG|LAKE '<src>' INTO
    '<dst>' KEYS (k[, …]) [CHECKPOINT '<dir>']`` → one incremental
    streaming sync of the source change feed into a native table
    (:mod:`spype_spark.replicate`; ``LAKE`` is the native→native
    mirror, r15); repeat the statement to sync again — the checkpoint
    (default: beside the target) carries the offset.

    DDL side: ``ALTER TABLE t RENAME COLUMN a TO b[, …]`` / ``DROP
    COLUMN(S) …`` / ``ALTER COLUMN c TYPE t`` (type widening, path
    tables) / ``SET PARTITION SPEC (days(ts), bucket(8, k), …)`` —
    all metadata-only commits on the existing verbs — plus branch
    statements: ``ALTER TABLE '<path>' CREATE BRANCH b [AS OF VERSION
    n] | PUBLISH BRANCH b | DROP BRANCH b`` (single-table WAP) and
    ``CREATE CATALOG BRANCH b [TXN AS OF n]`` / ``PUBLISH CATALOG
    BRANCH b`` / ``DROP CATALOG BRANCH b`` (multi-table WAP through
    ``catalog=``).

    FOREIGN-format maintenance (round 13, :func:`_sql_foreign`):
    ``DELETE FROM DELTA '<path>' WHERE …`` (deletion vectors), ``ALTER
    DELTA|ICEBERG '<path>' RENAME COLUMN a TO b[, …]`` (column mapping
    / field-id schema evolution), ``IMPORT ICEBERG '<src>' [SNAPSHOT
    AS OF id] INTO '<dst>' [MATERIALIZED]``.

    Everything else is ``spark.sql(stmt)`` verbatim (returns its
    DataFrame). Maintenance statements return the new table version
    (or the verb's native return)."""
    fr = _sql_foreign(spark, stmt)
    if fr is not _NO_MATCH:
        return fr
    m = _MERGE_RE.match(stmt)
    if m:
        m, source, keys, kw = _parse_merge(spark, stmt, catalog)
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.merge(spark, ref, source, keys, **kw)
        with catalog.transaction(spark) as txn:
            return txn.merge(ref, source, keys, **kw)
    m = _UPDATE_RE.match(stmt)
    if m:
        assigns = {}
        for part in _split_top(m.group("sets")):
            am = re.match(r"^\s*(\w+)\s*=\s*(.+)$", part, re.DOTALL)
            if not am:
                raise ValueError(f"unparseable SET assignment {part!r}")
            assigns[am.group(1)] = F.expr(am.group(2))
        cond = (
            F.expr(m.group("where"))
            if m.group("where") is not None
            else F.lit(True)
        )
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.update_where(spark, ref, cond, assigns)
        with catalog.transaction(spark) as txn:
            return txn.update_where(ref, cond, assigns)
    m = _DELETE_RE.match(stmt)
    if m:
        cond = F.expr(m.group("where"))
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.delete_where(spark, ref, cond)
        with catalog.transaction(spark) as txn:
            return txn.delete_where(ref, cond)
    m = _RESTORE_CAT_RE.match(stmt)
    if m:
        if catalog is None:
            raise ValueError("RESTORE CATALOG needs catalog=")
        return catalog.restore(int(m.group("txn")))
    m = _RESTORE_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is None:
            raise ValueError(
                "RESTORE of a catalog table is the catalog log's job "
                "(read(txn=)); RESTORE TABLE takes a quoted path"
            )
        if m.group("kind").upper() == "VERSION":
            return lake.restore_table(spark, ref, int(m.group("ver")))
        import datetime as _dt

        ts = _dt.datetime.fromisoformat(m.group("ts"))
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return lake.restore_table(
            spark, ref, lake.version_at(ref, ts.timestamp())
        )
    m = _OPTIMIZE_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        zcols = m.group("zcols")
        if zcols is not None:
            from spype_spark.layout import morton2

            cols = _split_top(zcols)
            if len(cols) != 2:
                raise ValueError(
                    "OPTIMIZE … ZORDER BY takes exactly two columns "
                    "(the Morton-interleave clustering key)"
                )
            code = morton2(cols[0], cols[1])
            if m.group("tgt_path") is not None:
                return lake.compact(spark, ref, zorder_code=code)
            with catalog.transaction(spark) as txn:
                return txn.compact(ref, zorder_code=code)
        # plain OPTIMIZE = selective bin-packing, Delta's semantics
        minb = int(m.group("minb") or 128 * 1024 * 1024)
        tgtb = int(m.group("tgtb") or 1024 * 1024 * 1024)
        if m.group("tgt_path") is None:
            with catalog.transaction(spark) as txn:
                return txn.compact(
                    ref, min_file_bytes=minb, target_file_bytes=tgtb
                )
        return lake.compact(
            spark, ref, min_file_bytes=minb, target_file_bytes=tgtb
        )
    m = _VACUUM_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is None:
            raise ValueError(
                "VACUUM of one catalog table is undefined (retention "
                "is catalog-wide: Catalog.vacuum); quote a table path"
            )
        keep = int(m.group("keep") or 1)
        grace = (
            float(m.group("hours")) * 3600.0
            if m.group("hours") is not None
            else None
        )
        return lake.vacuum(ref, keep_last=keep, grace_seconds=grace)
    alt = _sql_alter(spark, stmt, catalog)
    if alt is not _NO_MATCH:
        return alt
    m = _DESCRIBE_RE.match(stmt)
    if m:
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.history(spark, ref)
        return lake.history(spark, catalog.table_path(ref))
    m = _SHOW_TABLES_RE.match(stmt)
    if m and catalog is not None:
        rows = sorted(catalog.state().items())
        return spark.createDataFrame(
            rows or [], "name string, version int"
        )
    m = _INSERT_RE.match(stmt)
    if m:
        df = _sql_resolved(spark, m.group("body"), catalog)
        ref = _tref(m, "tgt", catalog)
        tgt = (
            lake.read_table(spark, ref)
            if m.group("tgt_path") is not None
            else catalog.read(spark, ref)
        )
        tf = tgt.schema.fields
        if len(df.columns) != len(tf):
            raise ValueError(
                f"INSERT INTO {ref!r}: {len(df.columns)} values for "
                f"{len(tf)} columns"
            )
        # positional, cast to the table schema — SQL INSERT semantics
        # (VALUES literals arrive as col1..colN with literal types)
        df = df.select(
            *[
                F.col(c).cast(f.dataType).alias(f.name)
                for c, f in zip(df.columns, tf)
            ]
        )
        if m.group("tgt_path") is not None:
            return lake.append_table(spark, ref, df)
        with catalog.transaction(spark) as txn:
            return txn.append(df, ref)
    m = _CREATE_RE.match(stmt)
    if m:
        df = _sql_resolved(spark, m.group("body"), catalog)
        pby = (
            _parse_partition_spec(m.group("pspec"))
            if m.group("pspec") is not None
            else None
        )
        bkeys = None
        if m.group("bspec") is not None:
            bkeys = [c.strip() for c in m.group("bspec").split(",") if c.strip()]
            bad = [c for c in bkeys if not re.match(r"^\w+$", c)]
            if bad:
                raise ValueError(f"unparseable BLOOM KEYS item(s) {bad}")
        ref = _tref(m, "tgt", catalog)
        if m.group("tgt_path") is not None:
            return lake.write_table(
                df, ref, partition_by=pby, bloom_keys=bkeys
            )
        with catalog.transaction(spark) as txn:
            return txn.write(df, ref, partition_by=pby, bloom_keys=bkeys)
    if re.match(r"^\s*(SELECT|WITH)\b", stmt, re.IGNORECASE):
        return _sql_resolved(spark, stmt, catalog)
    # not a maintenance/read statement — Spark's own SQL surface
    return spark.sql(stmt)
