"""Spatial operators: grid-bucketed radius join.

The spatial twin of the LSH-banding plan (operators/dedup.py): an
all-pairs "points within radius r" query is O(n²) as a theta-join, but
bucketing points into an r-sized grid turns it into an equi-join —
every qualifying pair lies in the same or an adjacent cell, so one
side explodes to its 3×3 neighborhood keys and the join is bounded by
cell occupancy instead of n². The exact distance check then prunes the
corner-cell false positives.

Determinism contract: candidate generation and the distance predicate
use only IEEE +,-,×,/ and floor — bit-identical across engines (unlike
transcendentals) — so the whole operator is DuckDB-oracle
hash-verifiable with no rounding tolerance on the predicate.

At 100 TB the plan is: one shuffle keyed on cell for each side (9×
row growth on the exploded side carries only id + two doubles), then
in-cell pairing. Degenerate hotspots (everyone in one cell) are the
same mega-bucket failure class as LSH; pick r near the query radius —
a grid much coarser than r degrades toward all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def grid_radius_join(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 5.0,
) -> DataFrame:
    """All pairs of points within ``radius`` (Euclidean), via grid
    bucketing. Returns (id_a, id_b, dist_sq) with id_a < id_b; dist_sq
    is exact double arithmetic (no sqrt — the comparison against
    radius² avoids the one non-exact operation).

    Cell side = radius, so a qualifying pair is never more than one
    cell apart on either axis; the left side explodes to its 3×3
    neighbor keys and each unordered pair is produced exactly once
    (found only from its lower-id endpoint's perspective).
    """
    r = float(radius)
    cx = F.floor(F.col(x_col) / r).cast("long")
    cy = F.floor(F.col(y_col) / r).cast("long")
    base = points.select(
        F.col(id_col).alias("pid"), F.col(x_col).alias("px"),
        F.col(y_col).alias("py"), cx.alias("cx"), cy.alias("cy"),
    )
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    left = base.select(
        F.col("pid").alias("id_a"), F.col("px").alias("xa"), F.col("py").alias("ya"),
        F.explode(offsets).alias("o"),
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
    ).select(
        "id_a", "xa", "ya",
        (F.col("bcx") + F.col("o.dx")).alias("cx"),
        (F.col("bcy") + F.col("o.dy")).alias("cy"),
    )
    right = base.select(
        F.col("pid").alias("id_b"), F.col("px").alias("xb"),
        F.col("py").alias("yb"), "cx", "cy",
    )
    # explicit multiplications, NOT pow(x, 2): pow routes through the
    # transcendental path (1-ulp license) in both engines; x·x is IEEE
    # exact-deterministic
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(d2 <= F.lit(r * r))
        .select("id_a", "id_b", d2.alias("dist_sq"))
    )


def skyline2d(
    df: DataFrame,
    min_col: str,
    max_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """2-D Pareto frontier (skyline): the coordinate pairs not
    DOMINATED by any other row, where b dominates a iff
    b.min_col ≤ a.min_col ∧ b.max_col ≥ a.max_col with at least one
    strict — the price/quality efficient frontier (cheapest part per
    size class, best quality-per-token document, fastest-per-dollar
    config).

    Plan — NO global sort, NO all-pairs join. The naive skyline is a
    single-partition window over a total order (the win_row_number
    parity trap) or an O(n²) NOT EXISTS; instead:

    1. collapse to distinct (min_col, max_col) pairs with a count
       (one partial-agg shuffle — dominance is coordinate-level);
    2. bucket min_col into ``n_buckets`` fixed-width ranges from the
       global min/max (a 1-row broadcast scalar);
    3. WITHIN a bucket: one window per bucket ordered by
       (min_col asc, max_col desc); a pair is bucket-dominated iff the
       running max of max_col over STRICTLY PRECEDING rows ≥ its own
       max_col (after the distinct-pair collapse every preceding row
       is ≤ in min_col with one coordinate strict, so ≥ is exactly
       dominance). Bucket partitions are occupancy-bounded, never a
       global sort;
    4. ACROSS buckets: per-bucket max of max_col (an n_buckets-row
       table) + a running max over the strictly earlier buckets —
       rows there have strictly smaller min_col, so prefix_max ≥ mine
       is dominance. The n_buckets-row window is constant-sized.

    Survivors are pairs dominated by neither pass. The two passes
    together are exhaustive: any dominator is either in my bucket
    (pass 3 catches it transitively via the running max) or an earlier
    one (pass 4). Exact — uses only comparisons, no floats beyond the
    bucket-width division, and bucketing only PARTITIONS the data (a
    pair's skyline membership is bucket-assignment-independent).

    At 100 TB: one groupBy shuffle on the pair, one on the bucket key;
    the frontier itself is output-sized. Degenerate case (all rows one
    bucket) degrades to one sorted partition of DISTINCT pairs —
    bounded by value cardinality, not fact volume.
    """
    pairs = (
        df.select(F.col(min_col).alias("x"), F.col(max_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    bounds = pairs.agg(
        F.min("x").alias("__lo"), F.max("x").alias("__hi")
    )
    b = (
        pairs.crossJoin(F.broadcast(bounds))
        # width in DOUBLE; identical expression in the oracle replays
        # the same bucket ids (IEEE determinism on exact inputs)
        .withColumn(
            "__bkt",
            F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
                F.least(
                    F.floor(
                        (F.col("x") - F.col("__lo")).cast("double")
                        / ((F.col("__hi") - F.col("__lo")).cast("double") / F.lit(float(n_buckets)))
                    ).cast("int"),
                    F.lit(int(n_buckets) - 1),
                )
            ),
        )
        .drop("__lo", "__hi")
        # consumed twice (per-pair flagging + per-bucket max) — one
        # eager materialization of the distinct-pair table (bounded by
        # value cardinality, not fact volume; the pair_lift stance)
        # instead of four source scans
        .localCheckpoint()
    )
    in_bucket = Window.partitionBy("__bkt").orderBy(
        F.col("x").asc(), F.col("y").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    flagged = b.withColumn("__runmax", F.max("y").over(in_bucket))
    bucket_max = b.groupBy("__bkt").agg(F.max("y").alias("__bmax"))
    prior = (
        Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    )  # n_buckets rows — constant-sized single partition, not data-sized
    bucket_prior = bucket_max.withColumn("__priormax", F.max("__bmax").over(prior))
    return (
        flagged.join(F.broadcast(bucket_prior.select("__bkt", "__priormax")), "__bkt")
        .filter(
            (F.col("__runmax").isNull() | (F.col("__runmax") < F.col("y")))
            & (F.col("__priormax").isNull() | (F.col("__priormax") < F.col("y")))
        )
        .select("x", "y", "n_rows")
    )
