"""Distributed Avro DataFrame source and sink — no spark-avro jar.

Apache Avro container files are the third row-oriented interchange
format a data platform meets (after CSV and JSON): Kafka archive
dumps, Debezium CDC exports, and Hive-era tables all ship as ``.avro``
directories. Spark's own connector lives in an external jar
(``spark-avro``) that this environment does not have — so this module
re-expresses the scan and sink on primitives Spark always has,
powered by the repo's pure-Python container codec
(:mod:`spype_spark.avro_io`, registered for by-value pickling so
executors need no installed package):

- **Source** (:func:`read_avro_table`): one ``binaryFile`` scan over
  the directory (each container file = one row of bytes — Avro files
  are not splittable below block level anyway without the sync-marker
  scan, and per-file parallelism is the granularity every engine uses
  for container inputs), then ``mapInPandas`` decodes each file on the
  EXECUTORS into Arrow batches with an explicit Spark schema derived
  driver-side from ONE container header (a metadata-class read). At
  100 TB the unit of parallelism is the file — the same shape as
  spark-avro's own DataSource, minus the jar.
- **Sink** (:func:`write_avro_table`): ``mapInPandas`` over the
  DataFrame's partitions encodes each partition into one container
  file written from the executor (shared storage in a real cluster,
  local FS here), returning a one-row-per-partition manifest the
  driver materializes — a metadata-sized collect, never data.

Type profile (loud errors outside it): boolean, int, bigint, float,
double, string, binary, date (Avro logical ``date`` on int days) and
timestamp (``timestamp-micros`` on long), plus nullability via
union-with-null — and, recursively, NESTED types: Avro ``record`` ↔
Spark struct, ``array`` ↔ array, ``map`` (string keys, the only kind
Avro has) ↔ map, with per-level nullability via union-with-null and
logical types at any depth. Still loudly out of profile: RECURSIVE
named-type references (Spark's type system is strictly tree-shaped —
no engine maps those to a relational column), non-nullable multi-type
unions, enum/fixed, and codecs beyond null/deflate.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_avro_table", "write_avro_table"]

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _avro_schema_of(df: DataFrame, name: str = "row") -> dict:
    """Avro record schema for a DataFrame's (flat) schema."""
    fields = []
    for f in df.schema.fields:
        tn = f.dataType.typeName()
        base = _SPARK_TO_AVRO.get(tn)
        if base is None:
            raise ValueError(
                f"write_avro_table: column {f.name!r} type {tn!r} is "
                f"outside the flat-relational Avro profile"
            )
        fields.append(
            {"name": f.name, "type": ["null", base] if f.nullable else base}
        )
    return {"type": "record", "name": name, "fields": fields}


def _spark_field_of(avro_field: dict) -> tuple[str, str]:
    """(name, spark DDL type) for one Avro record field."""
    t = avro_field["type"]
    if isinstance(t, list):  # union: strip the null branch
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise ValueError(
                f"read_avro_table: field {avro_field['name']!r} union "
                f"{t!r} is not a simple nullable type"
            )
        t = branches[0]
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return avro_field["name"], "date"
        if lt in ("timestamp-micros", "timestamp-millis"):
            return avro_field["name"], "timestamp"
        if lt == "local-timestamp-micros":
            return avro_field["name"], "timestamp_ntz"
        t = t.get("type")
    if not isinstance(t, str) or t not in _AVRO_TO_SPARK:
        raise ValueError(
            f"read_avro_table: field {avro_field['name']!r} type {t!r} "
            f"is outside the flat-relational Avro profile"
        )
    return avro_field["name"], _AVRO_TO_SPARK[t]


def _logical_types(schema: dict) -> dict[str, str]:
    """{field name: logicalType} for date/timestamp interpretation."""
    out = {}
    for f in schema.get("fields", []):
        t = f["type"]
        if isinstance(t, list):
            t = next((b for b in t if b != "null"), "null")
        if isinstance(t, dict) and t.get("logicalType"):
            out[f["name"]] = t["logicalType"]
    return out


def read_avro_table(spark: SparkSession, directory: str) -> DataFrame:
    """Read a directory of Avro container files as a DataFrame.

    The Spark schema comes from ONE file's embedded writer schema
    (driver-side header read — metadata-class); the data path is a
    single declarative plan: ``binaryFile`` scan → ``mapInPandas``
    decode on executors. Files are the unit of parallelism (the same
    granularity spark-avro uses for container inputs). Mixed-schema
    directories fail loudly on the first mismatching file rather than
    silently coercing."""
    import pandas as pd

    from spype_spark.avro_io import read_avro_bytes, read_avro_schema

    first = None
    for n in sorted(os.listdir(directory)):
        if n.endswith(".avro"):
            first = os.path.join(directory, n)
            break
    if first is None:
        raise ValueError(f"read_avro_table: no .avro files in {directory}")
    schema = read_avro_schema(first)
    if schema.get("type") != "record":
        raise ValueError(
            f"read_avro_table: top-level Avro type "
            f"{schema.get('type')!r} is not a record"
        )
    ddl = ", ".join(
        f"`{n}` {t}" for n, t in (_spark_field_of(f) for f in schema["fields"])
    )
    names = [f["name"] for f in schema["fields"]]
    logicals = _logical_types(schema)
    canonical = sorted(
        (f["name"], str(f["type"])) for f in schema["fields"]
    )

    def decode(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                sch, recs = read_avro_bytes(
                    bytes(row["content"]), source=row["path"]
                )
                got = sorted(
                    (f["name"], str(f["type"])) for f in sch["fields"]
                )
                if got != canonical:
                    raise ValueError(
                        f"read_avro_table: {row['path']} writer schema "
                        f"differs from {first}"
                    )
                cols = {}
                for n in names:
                    vals = [r.get(n) for r in recs]
                    lt = logicals.get(n)
                    if lt == "date":
                        cols[n] = pd.to_datetime(
                            pd.Series(vals, dtype="float64"), unit="D"
                        ).dt.date
                    elif lt in (
                        "timestamp-micros",
                        "local-timestamp-micros",
                    ):
                        cols[n] = pd.to_datetime(
                            pd.Series(vals, dtype="float64"), unit="us"
                        )
                    elif lt == "timestamp-millis":
                        cols[n] = pd.to_datetime(
                            pd.Series(vals, dtype="float64"), unit="ms"
                        )
                    else:
                        cols[n] = pd.Series(vals, dtype="object")
                yield pd.DataFrame(cols, columns=names)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(directory)
        .select("path", "content")
    )
    return files.mapInPandas(decode, schema=ddl)


def write_avro_table(
    df: DataFrame, directory: str, codec: str = "deflate"
) -> list[dict]:
    """Write a DataFrame as a directory of Avro container files — one
    file per Spark partition, encoded and written ON the executors
    (shared storage in a real cluster). Returns the manifest
    ``[{path, rows}]`` — one row per partition, the only thing that
    visits the driver. Empty partitions write nothing (no empty
    containers to confuse downstream globs); an all-empty frame still
    creates the directory with one empty container so the directory
    round-trips."""
    from spype_spark.avro_io import write_avro

    schema = _avro_schema_of(df)
    logicals = _logical_types(schema)
    names = [f["name"] for f in schema["fields"]]
    os.makedirs(directory, exist_ok=True)

    def encode(batches):
        import pandas as pd

        rows: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict(orient="records"):
                out = {}
                for n in names:
                    v = rec.get(n)
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        out[n] = None
                    elif pd.isna(v) if not isinstance(v, (bytes, str)) else False:
                        out[n] = None
                    elif logicals.get(n) == "date":
                        out[n] = (
                            pd.Timestamp(v) - pd.Timestamp("1970-01-01")
                        ).days
                    elif logicals.get(n) in (
                        "timestamp-micros",
                        "local-timestamp-micros",
                    ):
                        out[n] = int(pd.Timestamp(v).value // 1_000)
                    elif isinstance(v, (bool,)):
                        out[n] = bool(v)
                    elif isinstance(v, bytes):
                        out[n] = v
                    elif isinstance(v, str):
                        out[n] = v
                    elif isinstance(v, float):
                        out[n] = float(v)
                    else:
                        out[n] = int(v)
                rows.append(out)
        if rows:
            fp = os.path.join(directory, f"part-{uuid.uuid4().hex}.avro")
            write_avro(fp, schema, rows, codec=codec)
            yield pd.DataFrame({"path": [fp], "rows": [len(rows)]})

    enc = df.mapInPandas(encode, schema="path string, rows long")
    # metadata-sized collect: one manifest row per partition
    manifest = [r.asDict() for r in enc.collect()]
    if not manifest:
        fp = os.path.join(directory, f"part-{uuid.uuid4().hex}.avro")
        write_avro(fp, schema, [], codec=codec)
        manifest = [{"path": fp, "rows": 0}]
    return manifest
