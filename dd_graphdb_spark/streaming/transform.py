"""Stream transform pipeline, filter rules, changeset conversion, alerts.

Reference surface (all declared in the reference; the transform/alert
files are not compiled into its workspace — SURVEY.md §0.1 — so this
implements the *declared intent*):

- FilterRule {field, operator: Equals/NotEquals/Contains/Exists/
  NotExists, action: Keep/Drop/Modify}   (stream_transform.rs:196-315)
- StreamTransformPipeline: ordered stages, an event stops at the first
  stage that drops it; dropped events count as filtered
  (stream_transform.rs:110-193)
- convert_to_changesets: group a batch of events by source into
  ChangeSets                              (stream_processing.rs:670-711)
- AlertRule {rule_type: Threshold/Rate, conditions, priority, cooldown}
  with cooldown suppression               (realtime_analytics.rs:73-160,
  evaluate_* :440-522, is_in_cooldown :524-533)

Spark shape:
- filter rules and Modify actions lower to when()/filter() column
  expressions — whole-stage codegen, identical on batch and streaming
  frames;
- changeset conversion is a groupBy over the micro-batch (each source's
  rows become one changeset, id = stream_{batch}_{source});
- threshold alerts: a JVM-side filter narrows the stream to candidate
  rows (rare), then a per-rule Arrow applyInPandas pass applies the
  greedy cooldown chain (fire, then suppress until cooldown elapses —
  inherently sequential per rule, but only over already-filtered
  candidates);
- rate alerts: windowed counts vs threshold — pure aggregation.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Filter rules (stream_transform.rs:196-315)
# --------------------------------------------------------------------------
@dataclass
class FilterRule:
    rule_id: str
    field: str
    operator: str  # equals | not_equals | contains | exists | not_exists
    value: object = None
    action: str = "keep"  # keep | drop | modify
    modifications: dict = dc_field(default_factory=dict)  # for modify

    def matches(self) -> Column:
        c = F.col(self.field)
        if self.operator == "equals":
            return c.eqNullSafe(F.lit(self.value))
        if self.operator == "not_equals":
            return ~c.eqNullSafe(F.lit(self.value))
        if self.operator == "contains":
            return c.cast("string").contains(str(self.value))
        if self.operator == "exists":
            return c.isNotNull()
        if self.operator == "not_exists":
            return c.isNull()
        raise ValueError(f"unknown operator {self.operator}")


def apply_filter_rules(df: DataFrame, rules: list[FilterRule]) -> DataFrame:
    """Apply rules in order: Drop removes matching rows, Modify rewrites
    matched rows' fields, Keep is a no-op marker (matching events simply
    continue). Rows surviving every rule flow on."""
    for r in rules:
        m = r.matches()
        if r.action == "drop":
            df = df.filter(~m)
        elif r.action == "modify":
            for col_name, new_val in r.modifications.items():
                base = F.col(col_name) if col_name in df.columns else F.lit(None)
                df = df.withColumn(col_name, F.when(m, F.lit(new_val)).otherwise(base))
        elif r.action != "keep":
            raise ValueError(f"unknown action {r.action}")
    return df


# --------------------------------------------------------------------------
# Transform pipeline (stream_transform.rs:110-193)
# --------------------------------------------------------------------------
class TransformPipeline:
    """Ordered stages; each stage is (name, df -> df). ``apply`` runs all
    stages; ``apply_with_dead_letter`` additionally returns the rows the
    pipeline dropped (the reference's dead-letter configuration).
    """

    def __init__(self):
        self.stages: list[tuple[str, Callable[[DataFrame], DataFrame]]] = []

    def add_stage(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> "TransformPipeline":
        self.stages.append((name, fn))
        return self

    def add_filter_stage(self, name: str, rules: list[FilterRule]) -> "TransformPipeline":
        return self.add_stage(name, lambda df, _r=rules: apply_filter_rules(df, _r))

    def apply(self, df: DataFrame) -> DataFrame:
        for _, fn in self.stages:
            df = fn(df)
        return df

    def apply_with_dead_letter(self, df: DataFrame, key_cols: list[str]) -> tuple[DataFrame, DataFrame]:
        """Returns (transformed, dead_letter): dead-letter = input rows
        whose keys did not survive the pipeline (anti-join — stays
        distributed)."""
        out = self.apply(df)
        dead = df.join(out.select(*key_cols).distinct(), key_cols, "left_anti")
        return out, dead

    def stats(self, df: DataFrame, key_cols: list[str]) -> dict[str, int]:
        """PipelineStats parity (events_processed/transformed/filtered).
        Batch-frame helper — runs two counts."""
        n_in = df.count()
        n_out = self.apply(df).count()
        return {
            "events_processed": n_in,
            "events_transformed": n_out,
            "events_filtered": n_in - n_out,
        }


# --------------------------------------------------------------------------
# Event → changeset conversion (stream_processing.rs:670-711)
# --------------------------------------------------------------------------
def convert_to_changesets(
    batch_df: DataFrame, source_col: str = "source", batch_id: int = 0
) -> DataFrame:
    """Tag every event with its changeset id: one changeset per source
    per micro-batch (id = stream_{batch}_{source}). The reference
    collects each group into a ChangeSet struct; distributed, the tag IS
    the grouping — downstream per-changeset work is a groupBy."""
    return batch_df.withColumn(
        "changeset_id",
        F.concat(F.lit(f"stream_{batch_id}_"), F.col(source_col).cast("string")),
    )


def changeset_summary(batch_df: DataFrame, source_col: str = "source", batch_id: int = 0) -> DataFrame:
    """One row per changeset: id, source, change count."""
    return (
        convert_to_changesets(batch_df, source_col, batch_id)
        .groupBy("changeset_id", F.col(source_col).alias("source"))
        .agg(F.count("*").alias("n_changes"))
    )


# --------------------------------------------------------------------------
# Alert rules (realtime_analytics.rs:73-160, 344-558)
# --------------------------------------------------------------------------
@dataclass
class AlertRule:
    rule_id: str
    rule_type: str  # threshold | rate
    metric: str  # column holding the metric value
    operator: str  # gt | ge | lt | le | eq | ne  (ComparisonOperator)
    threshold: float
    priority: str = "medium"  # critical | high | medium | low | info
    cooldown_s: int = 0  # suppress re-fire within cooldown of last fire
    window: str = "1 hour"  # rate rules: count window


_OPS = {
    "gt": lambda c, t: c > t,
    "ge": lambda c, t: c >= t,
    "lt": lambda c, t: c < t,
    "le": lambda c, t: c <= t,
    "eq": lambda c, t: c == t,
    "ne": lambda c, t: c != t,
}


class AlertEngine:
    """Evaluate alert rules over an event frame (batch or per
    micro-batch via foreachBatch).

    - threshold rules (evaluate_threshold_rule, :459-483): candidate
      rows = metric ⟨op⟩ threshold (JVM filter); the greedy cooldown
      chain (fire, suppress until cooldown passes — is_in_cooldown,
      :524-533) runs per rule in one Arrow batch over the candidates.
    - rate rules (evaluate_rate_rule, :485-509): events-per-window
      count compared to the threshold; fires once per breaching window
      (windows are natural cooldown buckets).
    Output: (rule_id, priority, ts, metric_value).
    """

    def __init__(self, rules: list[AlertRule]):
        self.rules = rules

    def evaluate(self, df: DataFrame, ts_col: str = "ts", order_col: str = "event_id") -> DataFrame:
        spark = df.sparkSession
        out_schema = "rule_id string, priority string, ts timestamp, metric_value double"
        alerts = spark.createDataFrame([], out_schema)
        for rule in self.rules:
            if rule.rule_type == "threshold":
                alerts = alerts.unionByName(self._threshold(df, rule, ts_col, order_col))
            elif rule.rule_type == "rate":
                alerts = alerts.unionByName(self._rate(df, rule, ts_col))
            else:
                raise ValueError(f"unsupported rule type {rule.rule_type}")
        return alerts

    def _threshold(self, df: DataFrame, rule: AlertRule, ts_col: str, order_col: str) -> DataFrame:
        cand = df.filter(_OPS[rule.operator](F.col(rule.metric), F.lit(rule.threshold))).select(
            F.lit(rule.rule_id).alias("rule_id"),
            F.col(ts_col).alias("ts"),
            F.col(order_col).alias("_ord"),
            F.col(rule.metric).cast("double").alias("metric_value"),
        )
        if rule.cooldown_s <= 0:
            return cand.select(
                "rule_id", F.lit(rule.priority).alias("priority"), "ts", "metric_value"
            )

        import pandas as pd

        cooldown_s, priority = rule.cooldown_s, rule.priority

        def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
            # the cooldown gate is a data-dependent sequential scan (each
            # fire moves the window) — itertuples keeps it cheap
            pdf = pdf.sort_values(["ts", "_ord"])
            fires = []
            last = None
            for row in pdf.itertuples(index=False):
                if last is None or (row.ts - last).total_seconds() >= cooldown_s:
                    fires.append((row.rule_id, priority, row.ts, row.metric_value))
                    last = row.ts
            return pd.DataFrame(fires, columns=["rule_id", "priority", "ts", "metric_value"])

        return cand.groupBy("rule_id").applyInPandas(
            greedy, "rule_id string, priority string, ts timestamp, metric_value double"
        )

    def _rate(self, df: DataFrame, rule: AlertRule, ts_col: str) -> DataFrame:
        counts = df.groupBy(F.window(ts_col, rule.window).alias("w")).agg(
            F.count("*").cast("double").alias("metric_value")
        )
        breach = counts.filter(_OPS[rule.operator](F.col("metric_value"), F.lit(rule.threshold)))
        return breach.select(
            F.lit(rule.rule_id).alias("rule_id"),
            F.lit(rule.priority).alias("priority"),
            F.col("w.start").alias("ts"),
            "metric_value",
        )
