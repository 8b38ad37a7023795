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

from pyspark.sql import DataFrame, functions as F


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
