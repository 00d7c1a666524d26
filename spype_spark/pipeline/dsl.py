"""Task / Pype DSL — the DAG algebra (A1-A7, A9-A13).

Execution model inversion (SURVEY.md §3): spype's ``pype(obj)`` eagerly
pushes one object through the graph; here ``Pype.apply(df)`` *composes*
DataFrame lineage through the graph and returns the terminal
DataFrame(s) — still unexecuted. Catalyst sees the whole fused plan and
optimizes across task boundaries (filter pushdown through earlier
tasks, column pruning of unused intermediates), which a task-at-a-time
executor can never do. Actions happen only when the caller writes or
collects a terminal.

Lifecycle callbacks fire around *composition* of each task (plan-build
time). For action-time observability, tasks can embed ``observe()``
metrics via contracts.expect — the streaming/battch listener story is
deliberately kept out of the core algebra.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame

from spype_spark.pipeline.contracts import check_edge, normalize


@dataclass
class RunContext:
    """Fixture carrier (A9): injected into tasks/callbacks by param name.

    spype injects ``meta``/``pype``/``task``/``e`` into callables that
    ask for them by signature introspection; we do the same with
    ``ctx`` (this object), ``task``, ``pype``, ``e`` (exception, in
    on_failure), and ``df`` (the task's input, in callbacks).
    """

    params: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)


def _inject(fn: Callable, available: dict[str, Any]) -> dict[str, Any]:
    """Build kwargs for fn from available fixtures (by parameter name)."""
    sig = inspect.signature(fn)
    return {name: available[name] for name in sig.parameters if name in available}


class Task:
    """A named DataFrame -> DataFrame transformation with schema contracts.

    Parity: spype/core/task.py::Task † (A1). ``fn`` takes the input
    DataFrame(s) plus optional declared params and the ``ctx`` fixture.
    ``requires``/``produces`` are column contracts checked at wiring
    time (A14) and optionally at runtime.
    """

    def __init__(
        self,
        fn: Callable[..., DataFrame],
        name: str | None = None,
        requires=None,
        produces=None,
        n_inputs: int = 1,
    ):
        self.fn = fn
        self.name = name or fn.__name__
        self.requires = normalize(requires)
        self.produces = normalize(produces)
        self.n_inputs = n_inputs
        self.params: dict[str, Any] = {}
        self.gate: Column | None = None
        self._callbacks: dict[str, list[Callable]] = {
            "on_start": [],
            "on_success": [],
            "on_failure": [],
            "on_finish": [],
        }

    # -- composition operators (A3, A4, A5) --------------------------------
    def __or__(self, other) -> "Pype":
        return Pype.from_node(self) | other

    def __and__(self, other) -> "Pype":
        return Pype.from_node(self) & other

    def __ror__(self, other) -> "Pype":
        if isinstance(other, tuple):
            p = Pype()
            ids = [p._add_node(_as_task(t)) for t in other]
            p.tails = ids
            return p | self
        return NotImplemented

    # -- configuration ------------------------------------------------------
    def partial(self, **params) -> "Task":
        """Bind constant params at wiring time (A11). Returns a copy."""
        t = self.copy()
        t.params.update(params)
        return t

    def iff(self, pred: Column) -> "Task":
        """Gate this task's input rows on a predicate (A6). Returns a copy.

        Row-level semantics: the task sees only rows satisfying pred —
        spype's per-datum conditional edge, vectorized to a filter.
        """
        t = self.copy()
        t.gate = pred
        return t

    def on_start(self, cb) -> "Task":
        self._callbacks["on_start"].append(cb)
        return self

    def on_success(self, cb) -> "Task":
        self._callbacks["on_success"].append(cb)
        return self

    def on_failure(self, cb) -> "Task":
        self._callbacks["on_failure"].append(cb)
        return self

    def on_finish(self, cb) -> "Task":
        self._callbacks["on_finish"].append(cb)
        return self

    def copy(self) -> "Task":
        t = Task(self.fn, self.name, None, None, self.n_inputs)
        t.requires = dict(self.requires) if self.requires else None
        t.produces = dict(self.produces) if self.produces else None
        t.params = dict(self.params)
        t.gate = self.gate
        t._callbacks = {k: list(v) for k, v in self._callbacks.items()}
        return t

    # -- application --------------------------------------------------------
    def apply(self, *dfs: DataFrame, ctx: RunContext | None = None) -> DataFrame:
        """Compose this task onto input lineage (fires callbacks, A7)."""
        ctx = ctx or RunContext()
        inputs = list(dfs)
        if self.gate is not None:
            inputs[0] = inputs[0].filter(self.gate)
        fixtures = {"ctx": ctx, "task": self, "df": inputs[0]}
        for cb in self._callbacks["on_start"]:
            cb(**_inject(cb, fixtures))
        try:
            kwargs = dict(self.params)
            if "ctx" in inspect.signature(self.fn).parameters:
                kwargs["ctx"] = ctx
            out = self.fn(*inputs, **kwargs)
        except Exception as e:
            fallback = None
            fixtures["e"] = e
            for cb in self._callbacks["on_failure"]:
                fallback = cb(**_inject(cb, fixtures)) or fallback
            for cb in self._callbacks["on_finish"]:
                cb(**_inject(cb, fixtures))
            if fallback is not None:  # a failure hook supplied a recovery df
                return fallback
            raise
        fixtures["df"] = out
        for cb in self._callbacks["on_success"]:
            cb(**_inject(cb, fixtures))
        for cb in self._callbacks["on_finish"]:
            cb(**_inject(cb, fixtures))
        return out

    def __call__(self, *dfs: DataFrame, **kw) -> DataFrame:
        return self.apply(*dfs, **kw)

    def __repr__(self) -> str:
        return f"Task({self.name})"


def task(
    fn: Callable | None = None, *, name=None, requires=None, produces=None, n_inputs=1
):
    """Decorator lifting a function into a Task (A2: spype's @task †)."""

    def deco(f):
        return Task(f, name=name, requires=requires, produces=produces,
                    n_inputs=n_inputs)

    return deco(fn) if fn is not None else deco


def _as_task(x) -> Task:
    if isinstance(x, Task):
        return x
    if callable(x):
        return Task(x)
    raise TypeError(f"cannot use {x!r} as a pipeline task")


class Pype:
    """A DAG of Tasks with schema-checked wiring (spype/core/pype.py †).

    Structure: ``nodes`` (id → Task), ``edges`` (src → [(dst, port)]),
    ``tails`` (current open outputs, in order). Composing never mutates
    shared state — operators return extended copies (A12 semantics).
    """

    def __init__(self):
        self.nodes: dict[int, Task] = {}
        self.edges: dict[int, list[tuple[int, int]]] = {}
        self.tails: list[int] = []
        self._next = 0
        self._hooks: dict[str, list[Callable]] = {}

    # -- construction -------------------------------------------------------
    @classmethod
    def from_node(cls, t: Task) -> "Pype":
        p = cls()
        nid = p._add_node(t)
        p.tails = [nid]
        return p

    def _add_node(self, t: Task) -> int:
        nid = self._next
        self._next = nid + 1
        self.nodes[nid] = t
        self.edges[nid] = []
        return nid

    def copy(self) -> "Pype":
        p = Pype()
        p.nodes = dict(self.nodes)
        p.edges = {k: list(v) for k, v in self.edges.items()}
        p.tails = list(self.tails)
        p._next = self._next
        p._hooks = {k: list(v) for k, v in self._hooks.items()}
        return p

    def __or__(self, other) -> "Pype":
        """Chain (A3) / fan-out to a tuple (A4) / fan-in from tails (A5)."""
        p = self.copy()
        if isinstance(other, tuple):
            if len(p.tails) != 1:
                raise ValueError("fan-out requires exactly one open tail")
            src = p.tails[0]
            new_tails = []
            for t in other:
                t = _as_task(t)
                check_edge(p.nodes[src], t)
                nid = p._add_node(t)
                p.edges[src].append((nid, 0))
                new_tails.append(nid)
            p.tails = new_tails
            return p
        t = _as_task(other)
        if len(p.tails) > 1 and t.n_inputs != len(p.tails):
            raise ValueError(
                f"fan-in into {t.name}: task accepts {t.n_inputs} inputs "
                f"but pype has {len(p.tails)} open tails"
            )
        nid = p._add_node(t)
        for port, src in enumerate(p.tails):
            check_edge(p.nodes[src], t)
            p.edges[src].append((nid, port))
        p.tails = [nid]
        return p

    def __and__(self, other) -> "Pype":
        """Run two pypes side by side, keeping both tails open (A5)."""
        other = other if isinstance(other, Pype) else Pype.from_node(_as_task(other))
        p = self.copy()
        offset = p._next
        for nid, t in other.nodes.items():
            p.nodes[nid + offset] = t
            p.edges[nid + offset] = [(d + offset, port) for d, port in other.edges[nid]]
        p._next += other._next
        p.tails = p.tails + [t + offset for t in other.tails]
        return p

    # -- composition over DataFrames ---------------------------------------
    def apply(self, *sources: DataFrame, ctx: RunContext | None = None):
        """Compose the DAG over source DataFrame(s) → terminal DataFrame(s).

        Sources feed the root node(s) (nodes with no incoming edge) in
        declaration order. Returns a single DataFrame if one terminal,
        else a dict {task_name: DataFrame}. Lazy: no job runs here
        (A10 inverted — spype executed eagerly, we only build lineage).
        """
        ctx = ctx or RunContext()
        incoming: dict[int, int] = {nid: 0 for nid in self.nodes}
        for src in self.edges:
            for dst, _ in self.edges[src]:
                incoming[dst] += 1
        roots = [nid for nid in sorted(self.nodes) if incoming[nid] == 0]
        if len(sources) == 1 and len(roots) > 1:
            sources = tuple(sources[0] for _ in roots)  # fan same source
        if len(sources) != len(roots):
            raise ValueError(
                f"pype has {len(roots)} root task(s) but {len(sources)} "
                "source DataFrame(s) given"
            )
        # Kahn walk, accumulating per-node positional inputs.
        pending: dict[int, dict[int, DataFrame]] = {nid: {} for nid in self.nodes}
        for nid, src_df in zip(roots, sources):
            pending[nid][0] = src_df
        need: dict[int, int] = {
            nid: max(1, incoming[nid]) for nid in self.nodes
        }
        results: dict[int, DataFrame] = {}
        ready = list(roots)
        while ready:
            nid = ready.pop(0)
            t = self.nodes[nid]
            inputs = [pending[nid][p] for p in sorted(pending[nid])]
            out = t.apply(*inputs, ctx=ctx)
            results[nid] = out
            for dst, port in self.edges[nid]:
                pending[dst][port] = out
                if len(pending[dst]) == need[dst]:
                    ready.append(dst)
        terminals = [nid for nid in self.nodes if not self.edges[nid]]
        if len(terminals) == 1:
            return results[terminals[0]]
        return {self.nodes[nid].name: results[nid] for nid in terminals}

    def __call__(self, *sources: DataFrame, **kw):
        return self.apply(*sources, **kw)

    # -- pype-level lifecycle (A7 at action time) ---------------------------
    def on_success(self, cb) -> "Pype":
        self._hooks.setdefault("on_success", []).append(cb)
        return self

    def on_failure(self, cb) -> "Pype":
        self._hooks.setdefault("on_failure", []).append(cb)
        return self

    def on_finish(self, cb) -> "Pype":
        self._hooks.setdefault("on_finish", []).append(cb)
        return self

    def run(
        self,
        *sources: DataFrame,
        action="collect",
        ctx: RunContext | None = None,
    ):
        """Compose AND execute: trigger the given action on each terminal.

        ``action`` is ``"collect"``/``"count"`` or a callable
        ``(DataFrame) -> Any`` (e.g. a writer). Task callbacks fire at
        compose time (plan-build); the pype-level on_success /
        on_failure / on_finish hooks registered on this Pype fire
        around the *action* — the Spark analog of spype's run-time
        hooks, now at the point where jobs actually execute. A failure
        hook receives the exception as ``e``; exceptions propagate
        after hooks run.
        """
        ctx = ctx or RunContext()
        composed = self.apply(*sources, ctx=ctx)
        outs = composed if isinstance(composed, dict) else {"__terminal": composed}
        act = (
            action
            if callable(action)
            else {"collect": lambda d: d.collect(), "count": lambda d: d.count()}[
                action
            ]
        )
        fixtures = {"ctx": ctx, "pype": self}
        results = {}
        try:
            for name, df in outs.items():
                results[name] = act(df)
        except Exception as e:
            fixtures["e"] = e
            for cb in self._hooks.get("on_failure", []):
                cb(**_inject(cb, fixtures))
            for cb in self._hooks.get("on_finish", []):
                cb(**_inject(cb, fixtures))
            raise
        fixtures["results"] = results
        for cb in self._hooks.get("on_success", []):
            cb(**_inject(cb, fixtures))
        for cb in self._hooks.get("on_finish", []):
            cb(**_inject(cb, fixtures))
        return results["__terminal"] if "__terminal" in results else results

    # -- introspection (A13) -----------------------------------------------
    def explain(self, df: DataFrame | None = None) -> str:
        """ASCII DAG rendering; pass a composed terminal to also print
        the Catalyst plan (spype's Pype.plot analog)."""
        lines = ["Pype DAG:"]
        for nid in sorted(self.nodes):
            dsts = ", ".join(
                f"{self.nodes[d].name}#{d}" for d, _ in self.edges[nid]
            ) or "(terminal)"
            gate = " [gated]" if self.nodes[nid].gate is not None else ""
            lines.append(f"  {self.nodes[nid].name}#{nid}{gate} -> {dsts}")
        text = "\n".join(lines)
        if df is not None:
            text += "\n" + df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        return text

    def to_dot(self) -> str:
        """Graphviz DOT rendering of the DAG (spype's Pype.plot analog,
        emitted as text so no graphviz dependency is required)."""
        lines = ["digraph pype {", "  rankdir=LR;"]
        for nid, t in sorted(self.nodes.items()):
            shape = "diamond" if t.gate is not None else "box"
            lines.append(f'  n{nid} [label="{t.name}" shape={shape}];')
        for src, dsts in self.edges.items():
            for dst, port in dsts:
                label = f' [label="port {port}"]' if len(
                    [1 for _, ds in self.edges.items() for d, _ in ds if d == dst]
                ) > 1 else ""
                lines.append(f"  n{src} -> n{dst}{label};")
        lines.append("}")
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"Pype({len(self.nodes)} tasks, tails={self.tails})"
