"""Declarative data-quality constraints (Deequ/dbt-test shape): evaluate
a rule set against a table in ONE aggregate pass and emit a compact
(rule, metric, passed) report relation.

The 100 TB-relevant property is single-scan evaluation: every rule that
reduces to an aggregate over the table (null fraction, uniqueness count,
accepted values, min/max bounds) is folded into one groupBy().agg() —
adding a rule adds a column to the partial aggregate, never a rescan.
Referential-integrity rules need a second relation by nature; they run
as one anti-join count each, with the dimension side broadcast when
small. No collects besides the ≤|rules|-row report the caller reads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def not_null(col: str) -> dict:
    return {"rule": f"not_null({col})", "kind": "agg",
            "metric": F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))}


def unique(*cols: str) -> dict:
    # duplicates = rows - distinct keys; exact, partial-aggregated
    return {"rule": f"unique({','.join(cols)})", "kind": "agg",
            "metric": F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])}


def accepted_values(col: str, values: list) -> dict:
    return {"rule": f"accepted_values({col})", "kind": "agg",
            "metric": F.sum(F.when(~F.col(col).isin(values), 1).otherwise(0))}


def in_range(col: str, lo, hi) -> dict:
    return {"rule": f"in_range({col})", "kind": "agg",
            "metric": F.sum(F.when(~F.col(col).between(lo, hi), 1).otherwise(0))}


def references(col: str, dim: DataFrame, dim_col: str) -> dict:
    return {"rule": f"references({col})", "kind": "fk",
            "col": col, "dim": dim, "dim_col": dim_col}


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` and return (rule, violations, passed).

    Every metric counts VIOLATIONS (0 = clean), so `passed` is uniform
    and report rows are integer-exact for cross-engine comparison. The
    agg-kind rules share one scan; each fk rule is an anti-join count
    (dim broadcast under the usual threshold)."""
    agg_rules = [r for r in rules if r["kind"] == "agg"]
    reports = []
    if agg_rules:
        row = df.agg(
            *[r["metric"].cast("long").alias(f"__m{i}") for i, r in enumerate(agg_rules)]
        )
        # unpivot via explode of literal-labeled structs — rule labels
        # ride as F.lit values, never interpolated into SQL text, so a
        # quote/backslash in a column name can't break the plan
        kv = F.array(
            *[
                F.struct(
                    F.lit(r["rule"]).alias("rule"),
                    F.col(f"__m{i}").alias("violations"),
                )
                for i, r in enumerate(agg_rules)
            ]
        )
        stacked = row.select(F.explode(kv).alias("kv")).select(
            "kv.rule", "kv.violations"
        )
        reports.append(stacked)
    for r in rules:
        if r["kind"] != "fk":
            continue
        viol = (
            df.select(F.col(r["col"]).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .join(
                F.broadcast(r["dim"].select(F.col(r["dim_col"]).alias("__k"))),
                "__k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
            .select(F.lit(r["rule"]).alias("rule"), "violations")
        )
        reports.append(viol)
    if not reports:  # empty rule set: empty report, not an IndexError
        return df.sparkSession.createDataFrame(
            [], "rule string, violations bigint, passed boolean"
        )
    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.withColumn("passed", F.col("violations") == 0)
