"""Semantic layer: the reference's MetricFlow models/metrics re-expressed
as a Spark SQL rendering registry (reference models/semantic/
semantic_models.yml; SURVEY §3.3).

6 semantic models (entities / dimensions / measures over marts,
semantic_models.yml:3-309) and 10 metrics (semantic_models.yml:310-383).
`query_metrics()` is the MetricFlow-equivalent entry point: it renders
each requested metric to an aggregate Spark SQL statement over the mart
(registered as a temp view), groups by the requested dimensions, and
joins per-model results — measures are plain count/sum/avg/sum_boolean
aggregates, so every metric stays inside whole-stage codegen; a metric
query is one shuffle per base mart regardless of metric count.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from kwwhat_spark.models.base import Pipeline


@dataclass(frozen=True)
class Dimension:
    name: str
    expr: str | None = None  # SQL over the mart's columns; default = name
    kind: str = "categorical"  # or "time"
    grain: str = "day"

    def sql(self) -> str:
        base = self.expr or self.name
        if self.kind == "time":
            return f"date_trunc('{self.grain}', {base})"
        return f"({base})"


@dataclass(frozen=True)
class Measure:
    name: str
    agg: str  # count | sum | average | sum_boolean
    expr: str

    def sql(self) -> str:
        if self.agg == "count":
            return f"count({self.expr})"
        if self.agg == "sum":
            return f"sum({self.expr})"
        if self.agg == "average":
            return f"avg({self.expr})"
        if self.agg == "sum_boolean":
            return f"sum(case when {self.expr} then 1 else 0 end)"
        raise ValueError(f"unknown agg {self.agg}")


@dataclass(frozen=True)
class SemanticModel:
    name: str
    model: str  # mart name (Pipeline ref)
    entities: dict[str, str] = field(default_factory=dict)  # name -> expr
    dimensions: dict[str, Dimension] = field(default_factory=dict)
    measures: dict[str, Measure] = field(default_factory=dict)


@dataclass(frozen=True)
class Metric:
    name: str
    type: str  # simple | ratio
    measure: str | None = None  # simple
    numerator: str | None = None  # ratio (metric names)
    denominator: str | None = None
    label: str = ""


def _dims(*ds: Dimension) -> dict[str, Dimension]:
    return {d.name: d for d in ds}


def _measures(*ms: Measure) -> dict[str, Measure]:
    return {m.name: m for m in ms}


_SUCCESS_FIRST = "is_successful and charge_attempt_count = 1"
_SUCCESS_TROUBLED = "is_successful and charge_attempt_count > 1"

# semantic_models.yml:3-46 (chargers, ports, connectors).
SEMANTIC_MODELS: dict[str, SemanticModel] = {
    sm.name: sm
    for sm in [
        SemanticModel(
            name="chargers",
            model="dim_chargers",
            entities={"charger": "charger_id"},
            dimensions=_dims(
                Dimension("is_commissioned"), Dimension("location_id")
            ),
        ),
        SemanticModel(
            name="ports",
            model="dim_ports",
            entities={"port": "port_key"},
            dimensions=_dims(Dimension("charger_id"), Dimension("location_id")),
        ),
        SemanticModel(
            name="connectors",
            model="dim_connectors",
            entities={"connector": "connector_key"},
            dimensions=_dims(
                Dimension("connector_type"),
                Dimension("latest_status"),
                Dimension("charger_id"),
                Dimension("location_id"),
            ),
        ),
        # semantic_models.yml:48-148 (visits).
        SemanticModel(
            name="visits",
            model="fact_visits",
            entities={
                "visit": "visit_id",
                "charge_attempt": "last_charge_attempt_id",
                "driver": "driver_key",
                "location": "location_key",
                "port": "last_port_key",
            },
            dimensions=_dims(
                Dimension("visit_end_ts", kind="time"),
                Dimension("visit_start_ts", kind="time"),
                Dimension("first_charger_id"),
                Dimension("last_charger_id"),
                Dimension(
                    "is_first_attempt_success",
                    expr=f"case when {_SUCCESS_FIRST} then true else false end",
                ),
                Dimension(
                    "is_troubled_success",
                    expr=f"case when {_SUCCESS_TROUBLED} then true else false end",
                ),
                Dimension("is_successful"),
                Dimension(
                    "is_failed",
                    expr="case when is_successful then false else true end",
                ),
            ),
            measures=_measures(
                Measure("visits_count", "count", "visit_id"),
                Measure(
                    "energy_per_visit_kwh_average",
                    "average",
                    "total_energy_transferred_kwh",
                ),
                Measure("charge_attempts_count", "sum", "charge_attempt_count"),
                Measure(
                    "successful_visits_count",
                    "count",
                    "case when is_successful then visit_id end",
                ),
                Measure("visit_success_count", "sum_boolean", "is_successful"),
                Measure(
                    "visit_duration_minutes_average",
                    "average",
                    "visit_duration_minutes",
                ),
                Measure(
                    "troubled_success_visits_count",
                    "count",
                    f"case when {_SUCCESS_TROUBLED} then visit_id end",
                ),
                Measure(
                    "troubled_success_count",
                    "sum_boolean",
                    f"case when {_SUCCESS_TROUBLED} then true else false end",
                ),
                Measure("charge_attempt_success_count", "sum_boolean", "is_successful"),
                Measure(
                    "first_attempt_success_visits_count",
                    "count",
                    f"case when {_SUCCESS_FIRST} then visit_id end",
                ),
                Measure(
                    "first_attempt_success_count",
                    "sum_boolean",
                    f"case when {_SUCCESS_FIRST} then true else false end",
                ),
                Measure(
                    "troubled_first_attempt_visits_count",
                    "count",
                    f"case when {_SUCCESS_TROUBLED} then visit_id end",
                ),
                Measure(
                    "failed_visits_count",
                    "count",
                    "case when is_successful then null else visit_id end",
                ),
            ),
        ),
        # semantic_models.yml:150-232 (charge_attempts).
        SemanticModel(
            name="charge_attempts",
            model="fact_charge_attempts",
            entities={
                "charge_attempt": "charge_attempt_id",
                "charger": "charger_id",
                "port": "port_key",
                "location": "location_key",
            },
            dimensions=_dims(
                Dimension("charge_attempt_start_ts", kind="time"),
                Dimension("charge_attempt_stop_ts", kind="time"),
                Dimension("is_successful"),
                Dimension("next_status"),
                Dimension("transaction_stop_reason"),
                Dimension("charger_id"),
                Dimension("connector_id"),
                Dimension("status"),
            ),
            measures=_measures(
                Measure("attempts_count", "count", "charge_attempt_id"),
                Measure(
                    "successful_attempts_count",
                    "count",
                    "case when is_successful then charge_attempt_id end",
                ),
                Measure("attempt_success_rate", "sum_boolean", "is_successful"),
                Measure("energy_transferred_kwh_sum", "sum", "energy_transferred_kwh"),
                Measure(
                    "average_energy_per_attempt_kwh", "average", "energy_transferred_kwh"
                ),
                Measure(
                    "average_energy_per_successful_attempt",
                    "average",
                    "case when is_successful then energy_transferred_kwh end",
                ),
                Measure(
                    "failed_attempts_count",
                    "count",
                    "case when is_successful then null else charge_attempt_id end",
                ),
                Measure(
                    "attempts_with_transaction_count",
                    "count",
                    "case when transaction_id is not null then charge_attempt_id end",
                ),
                Measure(
                    "transaction_success_rate",
                    "average",
                    "case when transaction_id is not null"
                    " then cast(is_successful as integer) else null end",
                ),
            ),
        ),
        # semantic_models.yml:234-270 (drivers).
        SemanticModel(
            name="drivers",
            model="dim_drivers",
            entities={"driver": "driver_key"},
            dimensions=_dims(
                Dimension("id_tag"),
                Dimension("is_known_driver"),
                Dimension("first_authorization_status"),
                Dimension("latest_authorization_status"),
                Dimension("first_seen_ts", kind="time"),
                Dimension("last_seen_ts", kind="time"),
            ),
            measures=_measures(
                Measure("drivers_count", "count", "driver_key"),
                Measure("known_drivers_count", "sum_boolean", "is_known_driver"),
            ),
        ),
        # semantic_models.yml:272-298 (uptime).
        SemanticModel(
            name="uptime",
            model="fact_uptime",
            entities={
                "uptime_record": "uptime_id",
                "charger": "charger_id",
                "port": "port_key",
                "location": "location_key",
            },
            dimensions=_dims(
                Dimension("date_id", kind="time"),
                Dimension("charger_id"),
                Dimension("port_id"),
            ),
            measures=_measures(Measure("uptime_average", "average", "uptime")),
        ),
        # semantic_models.yml:299-309 (locations).
        SemanticModel(
            name="locations",
            model="dim_locations",
            entities={"location": "location_key"},
            dimensions=_dims(Dimension("location_id")),
        ),
    ]
}

# semantic_models.yml:310-383.
METRICS: dict[str, Metric] = {
    m.name: m
    for m in [
        Metric("total_visits", "simple", measure="visits_count", label="Visits count"),
        Metric(
            "total_charge_attempts",
            "simple",
            measure="charge_attempts_count",
            label="Total charge attempts",
        ),
        Metric(
            "average_attempts_per_visit",
            "ratio",
            numerator="total_charge_attempts",
            denominator="total_visits",
            label="Average attempts per visit",
        ),
        Metric(
            "first_attempt_success",
            "simple",
            measure="first_attempt_success_count",
            label="First attempt success count",
        ),
        Metric(
            "troubled_success",
            "simple",
            measure="troubled_success_count",
            label="Troubled success count",
        ),
        Metric(
            "failed_visits",
            "simple",
            measure="failed_visits_count",
            label="Failed visits count",
        ),
        Metric(
            "first_attempt_success_rate",
            "ratio",
            numerator="first_attempt_success",
            denominator="total_visits",
            label="First attempt success rate",
        ),
        Metric(
            "troubled_success_rate",
            "ratio",
            numerator="troubled_success",
            denominator="total_visits",
            label="Troubled success rate",
        ),
        Metric(
            "failed_rate",
            "ratio",
            numerator="failed_visits",
            denominator="total_visits",
            label="Failed rate",
        ),
        Metric(
            "average_uptime", "simple", measure="uptime_average", label="Average uptime"
        ),
    ]
}


def _measure_model(measure_name: str) -> SemanticModel:
    for sm in SEMANTIC_MODELS.values():
        if measure_name in sm.measures:
            return sm
    raise KeyError(f"measure {measure_name} not declared in any semantic model")


def _base_measures(metric: Metric) -> list[str]:
    if metric.type == "simple":
        return [metric.measure]
    out = []
    for sub in (metric.numerator, metric.denominator):
        out.extend(_base_measures(METRICS[sub]))
    return out


def query_metrics(
    pipe: Pipeline,
    metrics: list[str],
    group_by: list[str] | None = None,
    where: str | None = None,
) -> DataFrame:
    """MetricFlow-equivalent metric query: returns one row per group_by
    combination with one column per requested metric.

    group_by names must be dimensions declared on every semantic model the
    requested metrics touch (MetricFlow would join through entities; the
    reference's marts are denormalized enough that shared dimension names
    cover its documented metric queries). `where` is a SQL predicate over
    the base mart's columns, applied before aggregation.
    """
    group_by = group_by or []
    wanted = [METRICS[m] for m in metrics]

    # Group base measures by their semantic model.
    by_model: dict[str, list[str]] = {}
    for metric in wanted:
        for meas in _base_measures(metric):
            sm = _measure_model(meas)
            by_model.setdefault(sm.name, [])
            if meas not in by_model[sm.name]:
                by_model[sm.name].append(meas)

    spark = pipe.spark
    partials: list[DataFrame] = []
    for sm_name, measure_names in by_model.items():
        sm = SEMANTIC_MODELS[sm_name]
        view = f"__metric_{sm.model}"
        pipe.ref(sm.model).createOrReplaceTempView(view)
        dim_sql = []
        for d in group_by:
            if d not in sm.dimensions:
                raise KeyError(f"dimension {d} not on semantic model {sm_name}")
            dim_sql.append(f"{sm.dimensions[d].sql()} as {d}")
        meas_sql = [f"{sm.measures[m].sql()} as {m}" for m in measure_names]
        sql = f"select {', '.join(dim_sql + meas_sql)} from {view}"
        if where:
            sql += f" where {where}"
        if group_by:
            sql += f" group by {', '.join(str(i + 1) for i in range(len(group_by)))}"
        partials.append(spark.sql(sql))

    result = partials[0]
    for other in partials[1:]:
        result = (
            result.join(other, on=group_by, how="full_outer") if group_by
            else result.crossJoin(other)
        )

    # Derive metric columns from base-measure columns.
    exprs = [f"`{c}`" for c in group_by]
    for metric in wanted:
        exprs.append(f"{_metric_expr(metric)} as {metric.name}")
    return result.selectExpr(*exprs)


def _metric_expr(metric: Metric) -> str:
    if metric.type == "simple":
        return f"cast(`{metric.measure}` as double)"
    num = _metric_expr(METRICS[metric.numerator])
    den = _metric_expr(METRICS[metric.denominator])
    return f"({num} / nullif({den}, 0))"
