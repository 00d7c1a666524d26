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

import re

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


def _parse_merge(spark: SparkSession, stmt: str):
    m = _MERGE_RE.match(stmt)
    if not m:
        raise ValueError("unparseable MERGE INTO statement")
    talias, salias = m.group("talias"), m.group("salias")
    source = (
        spark.sql(m.group("subq"))
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


def sql(spark: SparkSession, stmt: str, catalog=None):
    """Execute one SQL statement. Lakehouse maintenance statements
    (MERGE INTO / UPDATE / DELETE FROM / RESTORE TABLE / OPTIMIZE /
    VACUUM) dispatch onto :mod:`spype_spark.lakehouse` verbs — for a
    path-quoted table directly, for a bare name through a single-verb
    transaction on ``catalog`` (keeping the record log authoritative).
    Everything else is ``spark.sql(stmt)`` verbatim (returns its
    DataFrame). Maintenance statements return the new table version
    (or the verb's native return)."""
    m = _MERGE_RE.match(stmt)
    if m:
        m, source, keys, kw = _parse_merge(spark, stmt)
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
    # not a maintenance statement — Spark's own SQL surface
    return spark.sql(stmt)
