"""spype_spark — a PySpark-native analytics & pipeline engine.

Brand-new engine with the query and data-processing capabilities of the
reference library d-chambers/spype (a pure-Python DAG pipeline algebra;
see SURVEY.md §0-§2), rebuilt Spark-first:

- the unit of flow is a Spark ``DataFrame`` (lazy Catalyst logical plan),
  not a Python object; execution happens only at sinks/actions;
- spype's pipeline algebra (Task / Pype / ``|`` / fan / merge / iff /
  callbacks / wiring-time signature validation) is reimplemented over
  DataFrames in :mod:`spype_spark.pipeline` with *schema* contracts
  validated when edges are wired (SURVEY.md §2.A);
- the relational / LLM-data / streaming query surface mandated by the
  driver contract (SURVEY.md §2.B) lives in :mod:`spype_spark.queries`,
  every entry oracle-checked against DuckDB.

Every operator is designed for a 1000-executor / 100 TB deployment and
merely *tested* on local[32]; see docstrings and SCALE.md for the
per-operator scale rationale.
"""

from spype_spark import functions  # composable library surface  # noqa: F401
from spype_spark.pipeline import (  # spype-style top-level surface
    IncompatibleTasksError,
    Pype,
    Task,
    expect,
    expect_schema,
    task,
)
from spype_spark.registry import REGISTRY, query
from spype_spark.session import get_spark
from spype_spark.sqltext import sql  # lakehouse-verb SQL statement facade
from spype_spark.tables import load_table, load_tables

__all__ = [
    "REGISTRY",
    "functions",
    "query",
    "get_spark",
    "sql",
    "load_table",
    "load_tables",
    # pipeline algebra (the reference's import surface: task/Task/Pype)
    "task",
    "Task",
    "Pype",
    "expect",
    "expect_schema",
    "IncompatibleTasksError",
]
__version__ = "0.1.0"
