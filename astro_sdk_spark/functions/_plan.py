"""Plan-shape helpers shared by the similarity/dedup operators.

``nd_guard`` exists for one measured reason: Catalyst pushes any
deterministic filter that references both sides of a join INTO the join
as a join condition, where the expression tree evaluates in interpreted
mode per matched row — for the array/HOF/levenshtein verify expressions
these operators filter on, that is a 10–100× cliff at volume
(jaccard_join's verify measured 1.9 s as a whole-stage-codegen project
vs minutes as a sort-merge-join condition on the same 3.74 M pairs).
Routing the expensive expression through a projection with a
nondeterministic no-op keeps every downstream filter ABOVE that
projection (Catalyst only pushes filters past projects whose fields are
all deterministic), so the expression runs once, codegen'd.

The guard must be ``monotonically_increasing_id() >= 0`` specifically:

- rand()-based always-true comparisons (``rand() >= -1``) get
  range-FOLDED away by the optimizer (measured on Spark 4);
- an unused nondeterministic column gets column-PRUNED, which
  re-enables the pushdown silently (also measured).

``monotonically_increasing_id()`` is non-negative by construction, so
the WHEN never takes its null branch and results are byte-identical.
If a future Spark learns to fold this too, correctness is unaffected —
only the plan shape regresses (re-check with ``explain("formatted")``:
no expensive expression should appear on a ``Join condition:`` line).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["nd_guard"]


def nd_guard(col: Column) -> Column:
    """Wrap an expensive verify expression so filters on it cannot be
    pushed into a join condition (see module docstring)."""
    return F.when(F.monotonically_increasing_id() >= F.lit(0), col)
