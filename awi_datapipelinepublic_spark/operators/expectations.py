"""Declarative data-quality expectations — the validation gate a
production pipeline runs between ingest and merge (the reference's
only guard is the quarantine-on-exception path, plans/runner.py; this
is the proactive version: assert the contract, count the violations,
decide before loading).

A rule set compiles to ONE aggregation pass over the table: every
rule becomes a ``sum(violation_predicate)`` column in a single
``agg``, so the whole suite costs one scan + one partial-agg combine
regardless of rule count — no per-rule jobs, no shuffle of row data
(only the fixed-width counter row). Uniqueness is the one exception
that genuinely needs grouping; it is expressed as
``count - count_distinct`` inside the same agg (Expand-based, still
one pass). The wide one-row result is unpivoted to long form
(rule, violations, total, passed) with a literal stack — no second
scan.

Row-level triage (WHICH rows violated) is `violating_rows`, a plain
filter union kept separate so the cheap counting path never pays for
row materialization.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

# Rule names are interpolated into a stack() SQL expression and used as
# aggregate aliases — restrict them to plain identifiers up front so a
# quote/backtick in a name fails with a clear error instead of a
# mangled query, and so the reserved __total alias can't be shadowed.
_RULE_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_rules(rules: list[dict]) -> None:
    if not rules:
        raise ValueError("expectations: rules must be a non-empty list")
    seen: set[str] = set()
    for r in rules:
        name = r.get("name")
        if not isinstance(name, str) or not _RULE_NAME.match(name) or name == "__total":
            raise ValueError(
                f"expectations: invalid rule name {name!r} — names must match "
                "[A-Za-z_][A-Za-z0-9_]* (they become SQL identifiers) and not be '__total'"
            )
        if name in seen:
            raise ValueError(f"expectations: duplicate rule name {name!r}")
        seen.add(name)


def _violation_predicate(rule: dict) -> Column:
    """Column predicate that is TRUE for a row violating ``rule``.

    Kinds: not_null, in_set(values), range(lo, hi — inclusive, either
    optional), regex(pattern — violation = non-match on non-null rows),
    expr(sql — violation = NOT(sql) on any row). NULLs: not_null is the
    null check; every other kind treats NULL as not-applicable (a NULL
    can't fail a range/set/regex — pair with a not_null rule to forbid
    it), matching SQL's own three-valued semantics so the DuckDB
    twin of each predicate counts identically.
    """
    kind = rule["kind"]
    col = F.col(rule["column"]) if "column" in rule else None
    if kind == "not_null":
        return col.isNull()
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(*rule["values"])
    if kind == "range":
        lo, hi = rule.get("lo"), rule.get("hi")
        pred = F.lit(False)
        if lo is not None:
            pred = pred | (col < F.lit(lo))
        if hi is not None:
            pred = pred | (col > F.lit(hi))
        return col.isNotNull() & pred
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(rule["pattern"])
    if kind == "expr":
        return ~F.expr(rule["sql"])
    raise ValueError(f"unknown expectation kind: {kind}")


def validate_expectations(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Run a rule set, return (rule, violations, total, passed) — one
    row per rule, computed in a single scan (see module docstring).

    Each rule dict: ``name`` (output key), ``kind`` + kind-specific
    params; ``kind='unique'`` takes ``column`` and counts rows beyond
    the first per value (NULLs ignored, like a SQL UNIQUE constraint).
    """
    _check_rules(rules)
    aggs = [F.count(F.lit(1)).alias("__total")]
    for r in rules:
        if r["kind"] == "unique":
            c = r["column"]
            aggs.append(
                (F.count(c) - F.count_distinct(F.col(c))).alias(r["name"])
            )
        else:
            aggs.append(
                F.sum(_violation_predicate(r).cast("long")).alias(r["name"])
            )
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{r['name']}', `{r['name']}`" for r in rules)
    return (
        wide.select(
            F.expr(f"stack({len(rules)}, {pairs}) as (rule, violations)"),
            F.col("__total").alias("total"),
        )
        .select(
            "rule",
            # Canonicalization-proof output contract: violations is an
            # explicit BIGINT and passed an INT 0/1 (not BOOLEAN) so the
            # report hashes identically across engines / render paths.
            F.col("violations").cast("long").alias("violations"),
            "total",
            (F.col("violations") == 0).cast("int").alias("passed"),
        )
    )


def violating_rows(df: DataFrame, rules: list[dict], id_cols: list[str]) -> DataFrame:
    """Row-level violation report: (rule, *id_cols) for every
    (row, rule) miss. One scan: each row is tested against an array of
    (rule, predicate) structs and explodes only its failures — no
    per-rule union of scans. ``unique``/aggregate rules are counting
    rules, not row predicates — use :func:`validate_expectations`.
    """
    preds = [r for r in rules if r["kind"] != "unique"]
    hits = F.filter(
        F.array(
            *[
                F.when(_violation_predicate(r), F.lit(r["name"]))
                for r in preds
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.select(F.explode(hits).alias("rule"), *id_cols)
