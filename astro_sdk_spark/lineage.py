"""Lightweight lineage log — parity for the reference's per-operator
input/output dataset emission (``python-sdk/src/astro/sql/operators/
base_decorator.py:274-356`` emits OpenLineage facets; ``airflow/datasets.py``
registers Airflow Datasets for data-aware scheduling).

With no scheduler in scope, lineage collapses to an in-process, append-only
event log: ``(op, inputs, outputs, sql)`` per operator call. Events cost one
list append — nothing touches the data plane — and can be exported as JSON
for an external catalog.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field


@dataclass
class LineageEvent:
    op: str
    inputs: list[str] = field(default_factory=list)
    outputs: list[str] = field(default_factory=list)
    sql: str | None = None
    ts: float = field(default_factory=time.time)


class LineageLog:
    def __init__(self) -> None:
        self._events: list[LineageEvent] = []
        self.enabled = True

    def emit(
        self,
        op: str,
        inputs: list[str] | None = None,
        outputs: list[str] | None = None,
        sql: str | None = None,
    ) -> None:
        if self.enabled:
            self._events.append(
                LineageEvent(op, list(inputs or []), list(outputs or []), sql)
            )

    def events(self) -> list[LineageEvent]:
        return list(self._events)

    def clear(self) -> None:
        self._events.clear()

    def to_json(self) -> str:
        return json.dumps([asdict(e) for e in self._events], indent=2)


#: process-wide default log (one engine process ≈ one DAG run here)
LINEAGE = LineageLog()


def emit(op: str, inputs=None, outputs=None, sql=None) -> None:
    LINEAGE.emit(op, inputs, outputs, sql)


def _name_of(obj) -> str:
    if hasattr(obj, "qualified_name"):
        return f"table:{obj.qualified_name}"
    if hasattr(obj, "path"):
        return f"file:{obj.path}"
    return f"obj:{type(obj).__name__}"
