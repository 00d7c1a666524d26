"""Shared Arrow batch shaping for the Python DataSource family.

Every executor-side reader in :mod:`cdf_source` / :mod:`iceberg_cdc` /
:mod:`lake_sink` ends the same way: produce columns in the DECLARED
Spark schema's order and exact Arrow types — source column where one
exists, constant where the partition/kind metadata supplies one, NULL
where the file predates the column — then emit record batches. One
implementation here so a cast or chunking fix reaches all of them.
Registered for by-value pickling like the rest of the worker-side
family."""

from __future__ import annotations


def shape_batches(target, n, resolve):
    """Yield record batches of ``n`` rows shaped to the Arrow schema
    ``target``. ``resolve(name)`` returns ``("col", array)`` for a
    source column, ``("const", value)`` for a per-partition constant,
    or ``None`` for a NULL fill; every column is cast to the target
    field type (``safe=False`` — parquet ns→µs timestamps and footer
    physical types are the callers' known lossless cases)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = []
    for field in target:
        r = resolve(field.name)
        if r is None:
            col = pa.nulls(n, type=field.type)
        elif r[0] == "col":
            col = r[1]
        else:
            col = pa.repeat(pa.scalar(r[1], type=field.type), n)
        if col.type != field.type:
            col = pc.cast(col, field.type, safe=False)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        cols.append(col)
    yield from pa.Table.from_arrays(cols, schema=target).to_batches()


try:  # pragma: no cover
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
