"""Distributed Avro DataFrame source/sink (spype_spark/avro_table.py).

The codec layer is covered in test_iceberg_interop; these tests cover
the TABLE layer: executor-side encode/decode through mapInPandas,
schema derivation from one container header, null round-trips,
temporal logical types, and the loud out-of-profile gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spype_spark import avro_table as at


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_avro_table_round_trip(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        (F.col("id") % 2 == 0).alias("b"),
    )
    d = str(tmp_path / "t")
    manifest = at.write_avro_table(df.repartition(4), d)
    assert sum(m["rows"] for m in manifest) == 100
    assert len(manifest) <= 4
    back = at.read_avro_table(spark, d)
    assert back.columns == ["k", "x", "s", "b"]
    assert _rows(back) == _rows(df)


def test_avro_table_nulls_and_temporals(spark, tmp_path):
    df = spark.sql(
        """
        SELECT id AS k,
               IF(id % 3 = 0, NULL, id * 2)                    AS v,
               IF(id % 4 = 0, NULL,
                  DATE'2024-01-01' + CAST(id AS INT))          AS d,
               TIMESTAMP'2024-06-01 12:00:00' + make_interval(0,0,0,0,0,0,id)
                                                               AS ts
        FROM range(50)
        """
    )
    d = str(tmp_path / "t")
    at.write_avro_table(df.repartition(3), d)
    back = at.read_avro_table(spark, d)
    assert back.schema.simpleString() == df.schema.simpleString()
    assert _rows(back) == _rows(df)
    assert back.filter("v IS NULL").count() == df.filter("v IS NULL").count()


def test_avro_table_empty_frame_round_trips(spark, tmp_path):
    df = spark.range(0).select(F.col("id").alias("k"))
    d = str(tmp_path / "e")
    man = at.write_avro_table(df, d)
    assert man and man[0]["rows"] == 0
    back = at.read_avro_table(spark, d)
    assert back.count() == 0
    assert back.columns == ["k"]


def test_avro_table_out_of_profile_is_loud(spark, tmp_path):
    # day-time intervals have no Avro mapping (decimals graduated
    # r15 to the spec's bytes-decimal logical type; nested types r14)
    iv = spark.range(3).select(
        F.make_dt_interval(F.lit(0), F.col("id").cast("int")).alias("iv")
    )
    with pytest.raises(ValueError, match="profile"):
        at.write_avro_table(iv, str(tmp_path / "n"))
    with pytest.raises(ValueError, match="no .avro files"):
        at.read_avro_table(spark, str(tmp_path))


def test_avro_table_nested_round_trip(spark, tmp_path):
    """record/array/map round-trip exactly, including a logical type
    (timestamp) INSIDE a struct inside an array."""
    d = str(tmp_path / "nested")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        F.struct(
            (F.col("id") * 2).alias("a"),
            F.concat(F.lit("s"), F.col("id")).alias("b"),
        ).alias("rec"),
        F.array(F.col("id") * 1.5, F.col("id") * 2.5).alias("arr"),
        F.create_map(
            F.lit("x"), F.col("id"), F.lit("y"), F.col("id") + 1
        ).alias("m"),
        F.array(
            F.struct(
                F.timestamp_seconds(F.col("id") * 1000)
                .cast("timestamp_ntz")
                .alias("ts")
            )
        ).alias("evs"),
    )
    at.write_avro_table(df.repartition(3), d)
    back = at.read_avro_table(spark, d)
    flat = lambda x: x.select(  # noqa: E731
        "k",
        "rec.a",
        "rec.b",
        F.col("arr")[0],
        F.col("arr")[1],
        F.col("m")["x"],
        F.col("m")["y"],
        F.col("evs")[0]["ts"],
    )
    a = sorted(str(r) for r in flat(df).collect())
    b = sorted(str(r) for r in flat(back).collect())
    assert a == b and len(a) == 20


def test_avro_table_nested_nulls(spark, tmp_path):
    """NULL containers and NULL leaves inside containers survive."""
    d = str(tmp_path / "nn")
    df = spark.range(6).select(
        F.col("id").alias("k"),
        F.when(
            F.col("id") % 2 == 0,
            F.struct(
                F.col("id").alias("a"),
                F.when(F.col("id") % 4 == 0, F.lit("hit")).alias("s"),
            ),
        ).alias("rec"),
        F.when(
            F.col("id") % 3 == 0, F.array(F.col("id"), F.lit(None))
        ).alias("arr"),
    )
    at.write_avro_table(df.coalesce(1), d)
    back = at.read_avro_table(spark, d)
    a = sorted(str(r) for r in df.collect())
    b = sorted(str(r) for r in back.collect())
    assert a == b


def test_avro_table_recursive_schema_is_loud(spark, tmp_path):
    """A recursive named-type reference has no tree-shaped Spark type
    — the reader must refuse, never loop or mis-map."""
    from spype_spark.avro_io import write_avro

    d = tmp_path / "rec"
    d.mkdir()
    schema = {
        "type": "record",
        "name": "node",
        "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "node"]},
        ],
    }
    write_avro(
        str(d / "a.avro"),
        schema,
        [{"v": 1, "next": {"v": 2, "next": None}}],
    )
    with pytest.raises(ValueError, match="recursive"):
        at.read_avro_table(spark, str(d))


def test_avro_table_non_string_map_keys_are_loud(spark, tmp_path):
    df = spark.range(3).select(
        F.create_map(F.col("id"), F.col("id")).alias("m")
    )
    with pytest.raises(ValueError, match="string-keyed"):
        at.write_avro_table(df, str(tmp_path / "m"))


def test_avro_table_unresolvable_schema_directory_is_loud(spark, tmp_path):
    """Disjoint non-nullable fields with no defaults cannot resolve
    under the Avro rules (r15): still a loud error, never coercion."""
    d = str(tmp_path / "mix")
    a = spark.range(5).select(F.col("id").alias("k"))
    b = spark.range(5).select(F.col("id").alias("other"))
    at.write_avro_table(a.coalesce(1), d)
    at.write_avro_table(b.coalesce(1), d)
    with pytest.raises(Exception, match="lacks field|does not resolve"):
        at.read_avro_table(spark, d).collect()


def test_avro_table_reader_schema_resolution(spark, tmp_path):
    """r15: mixed-schema directories resolve per the Avro spec —
    writer-only fields skip, reader-only fields fill from default /
    null, int→long promotes; incompatible types stay loud."""
    from spype_spark.avro_io import write_avro

    d = tmp_path / "evo"
    d.mkdir()
    reader = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": "long", "default": 7},
        ],
    }
    older = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "int"},  # promotes to long
            {"name": "extra", "type": "double"},  # reader skips it
        ],
    }
    write_avro(
        str(d / "a.avro"),
        reader,
        [{"k": 1, "s": "x", "d": 10}, {"k": 2, "s": None, "d": 20}],
    )
    write_avro(
        str(d / "b.avro"),
        older,
        [{"k": 3, "extra": 1.5}, {"k": 4, "extra": 2.5}],
    )
    got = sorted(
        (r["k"], r["s"], r["d"])
        for r in at.read_avro_table(spark, str(d)).collect()
    )
    assert got == [
        (1, "x", 10),
        (2, None, 20),
        (3, None, 7),  # s null-fills, d takes its reader default
        (4, None, 7),
    ], f"schema resolution wrong: {got}"
    # incompatible promotion (writer double -> reader long) is loud
    bad = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "double"}],
    }
    write_avro(str(d / "c.avro"), bad, [{"k": 9.5}])
    with pytest.raises(Exception, match="does not resolve"):
        at.read_avro_table(spark, str(d)).collect()


def test_avro_snappy_codec_round_trip(spark, tmp_path):
    """Snappy-coded containers (the wild's default Avro codec) decode
    through the pure-stdlib raw-block decoder with per-block CRC32
    verification; the table layer round-trips with codec="snappy"."""
    from spype_spark.avro_io import (
        snappy_compress_literal,
        snappy_decompress,
    )

    # full decoder handles back-references (a real compressor's
    # output), including the overlapping-copy RLE idiom
    blk = bytes([12, (4 - 1) << 2]) + b"abcd" + bytes([((8 - 4) << 2) | 1, 4])
    assert snappy_decompress(blk) == b"abcdabcdabcd"
    for n in (0, 59, 61, 70000):
        data = bytes(range(256)) * (n // 256 + 1)
        data = data[:n]
        assert snappy_decompress(snappy_compress_literal(data)) == data

    d = str(tmp_path / "sn")
    df = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    at.write_avro_table(df.coalesce(1), d, codec="snappy")
    back = at.read_avro_table(spark, d)
    assert sorted(str(r) for r in back.collect()) == sorted(
        str(r) for r in df.collect()
    )


def test_snappy_real_compressor_roundtrip_and_shrinks():
    """r15: snappy_compress emits real back-references — every input
    round-trips through the stdlib decoder, and repetitive payloads
    shrink well below the literal-only baseline."""
    import random

    from spype_spark.avro_io import (
        snappy_compress,
        snappy_compress_literal,
        snappy_decompress,
    )

    rng = random.Random(42)
    cases = [
        b"",
        b"a",
        b"abc",
        b"abcd" * 4000,  # pure RLE-ish repetition
        bytes(range(256)) * 300,  # long-period repetition
        bytes(rng.randrange(256) for _ in range(70000)),  # incompressible
        (b"the quick brown fox jumps over the lazy dog. " * 2000),
        bytes(rng.randrange(4) for _ in range(50000)),  # low entropy
        b"\x00" * 100000,  # degenerate run
    ]
    # seeded structured fuzz: random repeats of random chunks
    for _ in range(20):
        chunks = [
            bytes(rng.randrange(256) for _ in range(rng.randrange(1, 40)))
            for _ in range(rng.randrange(1, 12))
        ]
        cases.append(
            b"".join(
                chunks[rng.randrange(len(chunks))] for _ in range(400)
            )
        )
    for data in cases:
        comp = snappy_compress(data)
        assert snappy_decompress(comp) == data, (
            f"roundtrip failed at len={len(data)}"
        )
    rep = b"abcd" * 4000
    assert len(snappy_compress(rep)) < len(rep) // 20, (
        "repetitive input must compress >20x"
    )
    assert len(snappy_compress(rep)) < len(
        snappy_compress_literal(rep)
    ), "real compressor must beat the literal baseline"
    # incompressible input stays near 1.0x (skip heuristic, no blowup)
    rnd = cases[5]
    assert len(snappy_compress(rnd)) < len(rnd) * 1.05
    # cross-check against an independent reference when available
    try:
        import snappy as _pysnappy  # pragma: no cover
    except ImportError:
        _pysnappy = None
    if _pysnappy is not None:  # pragma: no cover
        for data in cases:
            assert _pysnappy.decompress(snappy_compress(data)) == data


def test_avro_snappy_export_shrinks_on_disk(spark, tmp_path):
    """An exported snappy container with repetitive rows is now
    measurably smaller than the same rows under codec='null' (the r14
    literal-only writer produced 1.0x blocks + per-block overhead)."""
    import glob
    import os

    from spype_spark.avro_io import write_avro

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    rows = [
        {"k": i, "s": "constant-padding-string-" * 8} for i in range(2000)
    ]
    d = tmp_path / "sz"
    d.mkdir()
    write_avro(str(d / "null.avro"), schema, rows, codec="null")
    write_avro(str(d / "snap.avro"), schema, rows, codec="snappy")
    n0 = os.path.getsize(glob.glob(str(d / "null.avro"))[0])
    n1 = os.path.getsize(glob.glob(str(d / "snap.avro"))[0])
    assert n1 < n0 // 5, f"snappy file {n1} vs null {n0}: must shrink >5x"
    # and it reads back identically through the container reader
    from spype_spark.avro_io import read_avro

    _, back = read_avro(str(d / "snap.avro"))
    assert back == rows


def test_avro_bzip2_and_xz_codecs_roundtrip(spark, tmp_path):
    """r15: bzip2 and xz Avro codecs via stdlib bz2/lzma — container
    write → read round-trips at both the raw and the table layer;
    zstandard stays the one loud codec gate."""
    from spype_spark.avro_io import read_avro, write_avro

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    rows = [{"k": i, "s": f"v{i}" if i % 3 else None} for i in range(500)]
    for codec in ("bzip2", "xz"):
        fp = str(tmp_path / f"c_{codec}.avro")
        write_avro(fp, schema, rows, codec=codec)
        _, back = read_avro(fp)
        assert back == rows, codec
    d = str(tmp_path / "tbl")
    df = spark.range(40).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
    )
    at.write_avro_table(df.coalesce(1), d, codec="xz")
    back = at.read_avro_table(spark, d)
    assert sorted(str(r) for r in back.collect()) == sorted(
        str(r) for r in df.collect()
    )
    with pytest.raises(ValueError, match="zstandard|unsupported"):
        write_avro(
            str(tmp_path / "z.avro"), schema, rows, codec="zstandard"
        )


def test_avro_snappy_crc_gate_is_loud(spark, tmp_path):
    import glob

    from spype_spark.avro_io import read_avro, write_avro

    d = tmp_path / "crc"
    d.mkdir()
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    write_avro(
        str(d / "a.avro"), schema, [{"k": i} for i in range(100)],
        codec="snappy",
    )
    fp = glob.glob(str(d / "a.avro"))[0]
    raw = bytearray(open(fp, "rb").read())
    raw[-20] ^= 0xFF  # flip a payload byte inside the block
    open(fp, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC32|snappy|sync"):
        read_avro(fp)


def test_avro_decimal_round_trip(spark, tmp_path):
    """DecimalType ↔ the Avro decimal logical type on bytes (spec:
    big-endian two's-complement unscaled int at the field's scale) —
    positive, negative, zero, and NULL, flat AND nested."""
    import decimal

    import pyspark.sql.types as T

    sch = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("d", T.DecimalType(12, 2), True),
            T.StructField(
                "s",
                T.StructType(
                    [T.StructField("inner", T.DecimalType(8, 3), True)]
                ),
                True,
            ),
            T.StructField("a", T.ArrayType(T.DecimalType(6, 1), True), True),
        ]
    )
    D = decimal.Decimal
    rows = [
        (1, D("12345.67"), (D("1.234"),), [D("9.5"), None]),
        (2, D("-0.01"), (None,), None),
        (3, None, None, [D("-99999.9")]),
        (4, D("0.00"), (D("-7.001"),), []),
    ]
    d = str(tmp_path / "dec")
    at.write_avro_table(spark.createDataFrame(rows, sch), d)
    back = at.read_avro_table(spark, d)
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "bigint",
        "decimal(12,2)",
        "struct<inner:decimal(8,3)>",
        "array<decimal(6,1)>",
    ]
    got = sorted(back.collect(), key=lambda r: r.k)
    assert [(r.k, r.d, r.s, r.a) for r in got] == [
        (1, D("12345.67"), type(got[0].s)(inner=D("1.234")), [D("9.5"), None]),
        (2, D("-0.01"), type(got[0].s)(inner=None), None),
        (3, None, None, [D("-99999.9")]),
        (4, D("0.00"), type(got[0].s)(inner=D("-7.001")), []),
    ]


def test_avro_enum_fixed_round_trip(spark, tmp_path):
    """enum ↔ string and fixed ↔ binary via the field_types override
    (the spark-avro avroSchema opt-in shape): symbols survive the
    index encoding, fixed bytes survive verbatim, NULLs survive the
    union-with-null wrapper."""
    from pyspark.sql import functions as F

    df = spark.range(7).select(
        F.col("id").alias("k"),
        F.when(
            F.col("id") % 3 != 2,
            F.element_at(
                F.array(F.lit("RED"), F.lit("GREEN")),
                (F.col("id") % 2 + 1).cast("int"),
            ),
        ).alias("color"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("dg"),
    )
    d = str(tmp_path / "ef")
    at.write_avro_table(
        df,
        d,
        field_types={
            "color": {
                "type": "enum",
                "name": "color_e",
                "symbols": ["RED", "GREEN"],
            },
            "dg": {"type": "fixed", "name": "md5_16", "size": 16},
        },
    )
    # the writer schema on disk really says enum/fixed
    import json as _json

    from spype_spark.avro_io import read_avro_schema

    import glob as _glob

    wsch = read_avro_schema(sorted(_glob.glob(d + "/*.avro"))[0])
    kinds = {
        f["name"]: (
            f["type"][1] if isinstance(f["type"], list) else f["type"]
        )
        for f in wsch["fields"]
    }
    assert kinds["color"]["type"] == "enum"
    assert kinds["color"]["symbols"] == ["RED", "GREEN"]
    assert kinds["dg"]["type"] == "fixed" and kinds["dg"]["size"] == 16
    back = at.read_avro_table(spark, d)
    assert dict(back.dtypes)["color"] == "string"
    assert dict(back.dtypes)["dg"] == "binary"
    exp = {r.k: (r.color, bytes(r.dg)) for r in df.collect()}
    got = {r.k: (r.color, bytes(r.dg)) for r in back.collect()}
    assert got == exp


def test_avro_enum_fixed_gates_are_loud(spark, tmp_path):
    """Out-of-vocabulary enum values, wrong-size fixed bytes, a
    field_types override on a type-mismatched or unknown column, and
    a decimal that overflows its declared scale all fail loudly."""
    from py4j.protocol import Py4JJavaError
    from pyspark.sql import functions as F
    from pyspark.errors.exceptions.captured import PythonException

    loud = (ValueError, Py4JJavaError, PythonException, Exception)

    oov = spark.createDataFrame([("BLUE",)], "c string")
    with pytest.raises(loud, match="BLUE|union|enum"):
        at.write_avro_table(
            oov,
            str(tmp_path / "a"),
            field_types={
                "c": {"type": "enum", "name": "e", "symbols": ["RED"]}
            },
        )
    short = spark.createDataFrame([(b"abc",)], "b binary")
    with pytest.raises(loud, match="fixed size mismatch"):
        at.write_avro_table(
            short,
            str(tmp_path / "b"),
            field_types={"b": {"type": "fixed", "name": "f", "size": 16}},
        )
    s = spark.createDataFrame([("x",)], "c string")
    with pytest.raises(ValueError, match="needs a binary"):
        at.write_avro_table(
            s,
            str(tmp_path / "c"),
            field_types={"c": {"type": "fixed", "name": "f", "size": 4}},
        )
    with pytest.raises(ValueError, match="unknown column"):
        at.write_avro_table(
            s,
            str(tmp_path / "d"),
            field_types={"zz": {"type": "enum", "name": "e", "symbols": ["A"]}},
        )
    from spype_spark.avro_table import _enc_decimal

    with pytest.raises(ValueError, match="does not fit scale"):
        _enc_decimal("1.234", 2)


def test_compiled_writer_bytes_match_walker():
    """The r15 schema-compiled encoder must produce byte-identical
    output to the interpreted ``_write_datum`` walker on every type
    class (unions, nesting, logical types, enum/fixed, defaults) —
    the container write path switched to it for speed only."""
    from spype_spark.avro_io import (
        _compile_writer,
        _register_names,
        _write_datum,
    )

    schema = {
        "type": "record",
        "name": "gnarly",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "flag", "type": "boolean"},
            {"name": "ratio", "type": ["null", "double"]},
            {"name": "f32", "type": "float"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "raw", "type": ["null", "bytes"]},
            {"name": "st", "type": ["null", {
                "type": "enum", "name": "st_e", "symbols": ["A", "B"]}]},
            {"name": "dg", "type": ["null", {
                "type": "fixed", "name": "dg_f", "size": 4}]},
            {"name": "dec", "type": ["null", {
                "type": "bytes", "logicalType": "decimal",
                "precision": 12, "scale": 2}]},
            {"name": "arr", "type": ["null", {
                "type": "array", "items": ["null", "double"]}]},
            {"name": "mp", "type": ["null", {
                "type": "map", "values": ["null", "string"]}]},
            {"name": "rec", "type": ["null", {
                "type": "record", "name": "inner", "fields": [
                    {"name": "a", "type": ["null", "long"]},
                    {"name": "b", "type": "string",
                     "default": "dflt"},
                ]}]},
        ],
    }
    rows = [
        {"id": 1, "flag": True, "ratio": 2.5, "f32": 1.25, "name": "x",
         "raw": b"\x00\x01", "st": "B", "dg": b"abcd",
         "dec": b"\x04\xd2", "arr": [1.0, None, -3.5],
         "mp": {"k1": "v1", "k2": None},
         "rec": {"a": 7, "b": "bb"}},
        {"id": None, "flag": False, "ratio": None, "f32": -0.0,
         "name": None, "raw": None, "st": None, "dg": None, "dec": None,
         "arr": [], "mp": {}, "rec": {"a": None}},  # rec.b via default
        {"id": -(2**62), "flag": True, "ratio": float("inf"),
         "f32": 3.0, "name": "émoji ✓", "raw": b"", "st": "A",
         "dg": b"zzzz", "dec": b"\xff", "arr": None, "mp": None,
         "rec": None},
    ]
    named_w: dict = {}
    _register_names(schema, named_w)
    walker = bytearray()
    for r in rows:
        _write_datum(walker, schema, r, named_w)
    named_c: dict = {}
    _register_names(schema, named_c)
    enc = _compile_writer(schema, named_c)
    compiled = bytearray()
    for r in rows:
        enc(compiled, r)
    assert bytes(compiled) == bytes(walker)

    # error parity: missing union branch, fixed size, missing field
    import pytest as _pt

    bad_fixed = dict(rows[0], dg=b"toolong!")
    b1 = bytearray()
    with _pt.raises(ValueError, match="fixed size mismatch"):
        enc(b1, bad_fixed)
    no_field = {k: v for k, v in rows[0].items() if k != "flag"}
    b2 = bytearray()
    with _pt.raises(ValueError, match="missing field 'flag'"):
        enc(b2, no_field)


def test_compiled_reader_values_match_walker():
    """The r15 schema-compiled decoder must produce identical values
    to the interpreted ``_read_datum`` walker — the container read
    path switched to it for speed only. Round-trips the same gnarly
    schema as the writer parity test and decodes the bytes both ways."""
    import io as _io

    from spype_spark.avro_io import (
        _compile_reader,
        _compile_writer,
        _read_datum,
        _register_names,
    )

    schema = {
        "type": "record",
        "name": "gnarly2",
        "fields": [
            {"name": "id", "type": ["null", "long"]},
            {"name": "flag", "type": "boolean"},
            {"name": "ratio", "type": ["null", "double"]},
            {"name": "f32", "type": "float"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "raw", "type": ["null", "bytes"]},
            {"name": "st", "type": ["null", {
                "type": "enum", "name": "st_e2", "symbols": ["A", "B"]}]},
            {"name": "dg", "type": ["null", {
                "type": "fixed", "name": "dg_f2", "size": 4}]},
            {"name": "arr", "type": ["null", {
                "type": "array", "items": ["null", "double"]}]},
            {"name": "mp", "type": ["null", {
                "type": "map", "values": ["null", "string"]}]},
            {"name": "rec", "type": ["null", {
                "type": "record", "name": "inner2", "fields": [
                    {"name": "a", "type": ["null", "long"]},
                ]}]},
        ],
    }
    rows = [
        {"id": 1, "flag": True, "ratio": 2.5, "f32": 1.25, "name": "x",
         "raw": b"\x00\x01", "st": "B", "dg": b"abcd",
         "arr": [1.0, None, -3.5], "mp": {"k1": "v1", "k2": None},
         "rec": {"a": 7}},
        {"id": None, "flag": False, "ratio": None, "f32": -0.5,
         "name": "émoji ✓", "raw": None, "st": None, "dg": None,
         "arr": [], "mp": {}, "rec": None},
        {"id": -(2**62), "flag": True, "ratio": -0.0, "f32": 2.0,
         "name": None, "raw": b"", "st": "A", "dg": b"zzzz",
         "arr": None, "mp": None, "rec": {"a": None}},
    ]
    named: dict = {}
    _register_names(schema, named)
    body = bytearray()
    enc = _compile_writer(schema, named)
    for r in rows:
        enc(body, r)
    data = bytes(body)

    named_r: dict = {}
    _register_names(schema, named_r)
    buf = _io.BytesIO(data)
    walked = [_read_datum(buf, schema, named_r) for _ in rows]

    named_c: dict = {}
    _register_names(schema, named_c)
    dec = _compile_reader(schema, named_c)
    pos = 0
    compiled = []
    for _ in rows:
        v, pos = dec(data, pos)
        compiled.append(v)
    assert compiled == walked
    assert pos == len(data)  # identical byte consumption

    # error parity: truncated input surfaces the walker's message
    import pytest as _pt

    with _pt.raises(ValueError, match="truncated Avro"):
        dec(data[: len(data) // 2], pos=len(data) // 2 - 1)
