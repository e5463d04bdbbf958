"""Fan-out router: event-name predicates -> sink assignment + multi-sink write.

The reference emits to a single downstream consumer (connector.go:133); the
north rule generalizes this to a conditional multi-sink fan-out keyed by
event-name predicates. Design: ONE pass — a precomputed `sink` column via a
codegen'd `when` ladder, then a single partitioned write with
partitionBy(sink) — instead of N filtered scans of the same input.

Empty-output suppression (O19, connector.go:131-141): a sink with zero
routed rows simply produces no partition directory / no aggregate group;
writers additionally skip the job when the frame is all-empty.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT_SINK, DEFAULT_ROUTES, SinkRoute


def route_predicate(route: SinkRoute, name: Column) -> Column:
    if route.kind == "contains_any":
        pred = name.contains(route.values[0])
        for v in route.values[1:]:
            pred = pred | name.contains(v)
        return pred
    if route.kind == "prefix_any":
        pred = name.startswith(route.values[0])
        for v in route.values[1:]:
            pred = pred | name.startswith(v)
        return pred
    return name.isin(list(route.values))


def sink_column(
    routes: tuple[SinkRoute, ...] = DEFAULT_ROUTES,
    name: Column | None = None,
    default_sink: str = DEFAULT_SINK,
) -> Column:
    """First-match-wins `when` ladder assigning each record its sink."""
    name = F.col("event_name") if name is None else name
    ladder: Column | None = None
    for r in routes:
        cond = route_predicate(r, name)
        ladder = (
            F.when(cond, F.lit(r.sink)) if ladder is None else ladder.when(cond, F.lit(r.sink))
        )
    if ladder is None:
        return F.lit(default_sink)
    return ladder.otherwise(F.lit(default_sink))


def with_sink(
    records: DataFrame,
    routes: tuple[SinkRoute, ...] = DEFAULT_ROUTES,
    default_sink: str = DEFAULT_SINK,
) -> DataFrame:
    return records.withColumn("sink", sink_column(routes, default_sink=default_sink))
