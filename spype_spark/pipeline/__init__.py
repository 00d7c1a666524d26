"""Pipeline algebra — spype's surface, re-expressed over DataFrames.

The reference library (spype, SURVEY.md §2.A) composes plain-Python
callables into DAGs with ``|`` (chain), tuples (fan-out), ``&``
(fan-in), ``iff`` gates, lifecycle callbacks, and *wiring-time*
signature compatibility checking, executed eagerly one object at a
time.

This package keeps the algebra and inverts the execution model
(SURVEY.md §1.2): the unit of flow is a Spark ``DataFrame``; a Task is
a named, contract-annotated ``DataFrame -> DataFrame`` transformation;
composition is validated when edges are wired (schema contracts — the
Spark analog of spype's annotation checks); and nothing executes until
a sink action triggers Catalyst planning of the whole composed lineage.

Reference parity map (spype symbols †, reconstructed per SURVEY §0):
  spype.Task / @task            → Task / @task           (A1, A2)
  Task.__or__ chaining          → Task.__or__ / Pype.__or__  (A3)
  t | (a, b) fan-out            → same                   (A4)
  multi-tail | merger fan-in    → `&` / positional merge (A5)
  wrap.iff(pred)                → Task.iff(Column pred)  (A6)
  on_start/success/failure/...  → same, fixture-injected (A7)
  runtime type validation       → contracts.expect_schema/expect (A8)
  fixtures (DI by param name)   → RunContext injection   (A9)
  Pype.__call__ eager push      → Pype.apply (lazy compose) (A10)
  task.partial(**kw)            → Task.partial           (A11)
  Pype.copy                     → Pype.copy              (A12)
  Pype.plot                     → Pype.explain           (A13)
  compatible_callables check    → contracts.check_edge   (A14)
"""

from spype_spark.pipeline.contracts import (
    ContractError,
    IncompatibleTasksError,
    check_edge,
    expect,
    expect_schema,
)
from spype_spark.pipeline.dsl import Pype, RunContext, Task, task

__all__ = [
    "Task",
    "task",
    "Pype",
    "RunContext",
    "ContractError",
    "IncompatibleTasksError",
    "check_edge",
    "expect",
    "expect_schema",
]
