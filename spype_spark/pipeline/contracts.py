"""Schema contracts — wiring-time and runtime validation (A8 / A14).

spype's distinctive feature is failing at *composition* time when two
tasks cannot legally connect (annotation compatibility,
spype/types.py::compatible_callables †). The DataFrame analog: a Task
declares the columns it ``requires`` and ``produces`` (optionally
typed); wiring an edge checks produces ⊇ requires before any Spark job
exists. Catalyst's analyzer re-verifies the real schemas at action time
for free — this layer just moves the failure to graph-build time, where
spype puts it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: contract form: {"col": "type-ddl" | None} — None means "any type".
Contract = dict[str, "str | None"]


class ContractError(Exception):
    """A DataFrame violated a Task's declared schema contract at runtime."""


class IncompatibleTasksError(Exception):
    """Two tasks cannot be wired: upstream output misses downstream needs.

    The analog of spype's wiring-time incompatibility error
    (spype/exceptions.py †, raised from compatible_callables checks).
    """


def normalize(contract) -> Contract | None:
    if contract is None:
        return None
    if isinstance(contract, dict):
        return {k: (v.lower() if isinstance(v, str) else None) for k, v in contract.items()}
    return {c: None for c in contract}


def check_edge(upstream: "object", downstream: "object") -> None:
    """Validate produces(upstream) ⊇ requires(downstream) at wiring time.

    Skips silently when either side declares nothing (spype likewise
    only checks annotated callables). Raises IncompatibleTasksError
    with the missing/mistyped columns listed.
    """
    produces = getattr(upstream, "produces", None)
    requires = getattr(downstream, "requires", None)
    if not produces or not requires:
        return
    missing = [c for c in requires if c not in produces]
    mistyped = [
        f"{c} (need {requires[c]}, got {produces[c]})"
        for c in requires
        if c in produces
        and requires[c] is not None
        and produces[c] is not None
        and requires[c] != produces[c]
    ]
    if missing or mistyped:
        raise IncompatibleTasksError(
            f"cannot wire {upstream!r} -> {downstream!r}: "
            + (f"missing columns {missing}" if missing else "")
            + (" and " if missing and mistyped else "")
            + (f"type conflicts {mistyped}" if mistyped else "")
        )


def expect_schema(df: DataFrame, required: Contract | list[str]) -> DataFrame:
    """Runtime schema assertion (A8): hard-fail before composing further.

    Compares against df.schema (driver-side metadata — free, no job).
    """
    required = normalize(required)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in required if c not in actual]
    mistyped = [
        f"{c} (need {t}, got {actual[c]})"
        for c, t in required.items()
        if c in actual and t is not None and actual[c] != t
    ]
    if missing or mistyped:
        raise ContractError(
            f"schema contract violated: missing={missing} mistyped={mistyped}"
        )
    return df


def expect(
    df: DataFrame,
    cond: Column,
    name: str = "expect",
    quarantine: bool = False,
    observation: "object | None" = None,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Runtime value validation (A8): split rows into valid / violating.

    Returns the valid rows with an ``observe`` metric counting
    violations (Spark's analog of spype's per-datum validation hooks,
    at zero extra passes). Pass a ``pyspark.sql.Observation`` as
    ``observation`` to read the counters after the first action::

        obs = Observation("orders_contract")
        valid = expect(df, cond, observation=obs)
        valid.write.parquet(...)          # any action
        obs.get["violations"], obs.get["rows"]

    With ``quarantine=True`` also returns the violating rows as a
    second DataFrame (dead-letter branch, A7 failure routing).
    """
    # NULL predicate = violation: a bare filter(cond) would drop
    # NULL-evaluating rows from the valid set while filter(~cond) ALSO
    # drops them from quarantine and when(~cond) counts them as 0 — a
    # validation primitive silently discarding rows. Normalize first.
    cond_n = F.coalesce(cond, F.lit(False))
    metrics = (
        F.sum(F.when(~cond_n, 1).otherwise(0)).alias("violations"),
        F.count(F.lit(1)).alias("rows"),
    )
    if observation is not None:
        observed = df.observe(observation, *metrics)
    else:
        observed = df.observe(name, *metrics)
    valid = observed.filter(cond_n)
    if quarantine:
        return valid, df.filter(~cond_n)
    return valid
