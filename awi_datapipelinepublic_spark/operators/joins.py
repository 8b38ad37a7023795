"""Join helpers: broadcast dimension enrichment, fact-fact equi-join.

Every reference join is a single-key left outer equi-join against a
small lookup dimension (settings.yaml:57-60, 114-117) plus one
fact-to-fact VIN enrichment (settings.yaml:135-137). Semantics we
preserve (SURVEY.md §2.C): left-join fan-out on duplicate dimension
keys, NULL keys never match, unmatched rows get NULL payload (patched
by COALESCE downstream).

Scale: dimensions are explicitly ``F.broadcast`` — a map-side hash
join with zero shuffle of the fact table, regardless of fact size.
Fact-fact joins are left to AQE (sort-merge with skew splitting); we
never force-broadcast an unbounded side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    payload: dict[str, str],
    default: dict[str, str] | None = None,
) -> DataFrame:
    """fact ⟕ broadcast(dim), selecting payload columns (renamed per the
    mapping), with optional COALESCE defaults for unmatched rows —
    the reference's lookup-join + COALESCE('No ...') idiom
    (settings.yaml:28-31, 57-60).
    """
    dim_sel = dim.select(F.col(dim_key).alias("__dk"), *[F.col(s).alias(d) for s, d in payload.items()])
    out = fact.join(F.broadcast(dim_sel), fact[fact_key] == F.col("__dk"), "left").drop("__dk")
    if default:
        for name, dv in default.items():
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(dv)))
    return out


def fact_fact_left(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str
) -> DataFrame:
    """Fact-to-fact left equi-join (TRANSACTIONS ⟕ optiom on VIN,
    settings.yaml:135-137). No broadcast hint — both sides unbounded;
    AQE picks sort-merge and handles skew. If the key is known-skewed
    (a sentinel VIN like 'UNKNOWN'), pre-salt or null it out upstream.
    """
    return left.join(right, left[left_key] == right[right_key], "left")


def range_join_binned(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int,
) -> DataFrame:
    """Interval (range) join: fact rows whose ``ts_col`` falls in
    ``[lo_col, hi_col)`` of an intervals table — with no equi-key.

    A naive theta join is a nested-loop (O(n·m) comparisons, and Spark
    can only broadcast-nested-loop it). The scale path used here is
    *binning*: explode each interval into the fixed-width time bins it
    overlaps, bin the fact timestamps the same way, equi-join on the
    bin id, then apply the exact range predicate as a residual filter.
    Each fact row lands in exactly one bin and each interval lists each
    bin once, so no post-join dedup is needed. Cost becomes
    O(n + m·avg_bins) shuffled through a hash join, which survives a
    100× scale-up where the nested loop does not. Pick ``bin_seconds``
    near the typical interval length: shorter bins replicate intervals,
    longer bins inflate the residual-filter candidate set.
    """
    w = int(bin_seconds)
    lo_bin = F.floor(F.unix_timestamp(F.col(lo_col)) / w)
    hi_bin = F.floor(F.unix_timestamp(F.col(hi_col)) / w)
    binned_iv = intervals.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    binned_fact = fact.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(ts_col)) / w)
    )
    return (
        binned_fact.join(binned_iv, "__bin")
        .filter((F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) < F.col(hi_col)))
        .drop("__bin")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the skewed (left) side, replicate
    the right side ``salt`` ways.

    For a hot key holding p% of the left table, a plain shuffle join
    puts p% of the data in one task; salting splits it across ``salt``
    tasks at the cost of replicating the right side ×salt. Use when a
    specific key set is known-skewed and AQE's skew-join splitting
    isn't available (e.g. the join feeds a window) — otherwise prefer
    AQE, which does this adaptively without the replication cost.
    Supports inner and left joins (the engine's vocabulary).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salted_r = right.join(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_l.join(
        salted_r,
        (salted_l[left_key] == salted_r[right_key]) & (salted_l["__salt"] == salted_r["__salt"]),
        how,
    )
    return out.drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts ≤ left_ts (``direction="backward"``, default) or the
    earliest with right_ts ≥ left_ts (``"forward"``) for the same key
    — the time-series enrichment primitive Spark lacks natively, with
    pandas merge_asof's direction/tolerance surface.

    Implemented as union + one partitioned window — NOT a range
    self-join: tag both sides, sort within (key) by (ts, side)
    (ts DESC for forward), and carry the last seen right payload with
    last_value(ignorenulls) over rows-unbounded-preceding. One shuffle
    on the key, linear in |left|+|right|, no quadratic candidate
    blow-up — this shape survives 100 TB where a theta-join would not.
    Ties (right_ts == left_ts) match in both directions (right sorts
    before left at equal ts), mirroring DuckDB/kdb asof semantics.

    ``tolerance_seconds`` nulls the payload when the matched right row
    is farther than the bound: the matched right ts is carried through
    the same window, so tolerance costs one extra carried column and a
    conditional projection — no second pass. DETERMINISM NOTE: when
    several right rows share one (key, ts), which payload wins depends
    on partition order (same caveat as pandas); dedupe the right side
    per (key, ts) first if that matters.
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    tagged_l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}") for p in right_payload],
    )
    tagged_r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(p).alias(f"__p_{p}") for p in right_payload],
    )
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carry = right_payload if tolerance_seconds is None else [*right_payload, "__mts"]
    tagged = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    if tolerance_seconds is not None:
        tagged = tagged.withColumn(
            "__p___mts", F.when(F.col("__side") == 0, F.col("__ts"))
        )
    carried = tagged.select(
        "*",
        *[F.last(f"__p_{p}", ignorenulls=True).over(w).alias(p) for p in carry],
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col("__mts").cast("double")
        )
        ok = F.col("__mts").isNotNull() & (gap <= F.lit(float(tolerance_seconds)))
        out = out.select(
            *lcols,
            *[F.when(ok, F.col(p)).alias(p) for p in right_payload],
        )
        return out
    return out.select(*lcols, *right_payload)


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    name_col: str,
    id_col: str,
    block_chars: int,
    max_dist: int = 1,
) -> DataFrame:
    """Entity-resolution join: candidate pairs form ONLY inside a
    blocking key (here a name prefix), then exact edit distance
    filters within the block — the standard blocked record-linkage
    plan. Without blocking a fuzzy join is an O(n²) cross product; a
    block key turns it into an equi-join whose cost is bounded by the
    largest block (pick/combine keys so blocks stay small; run
    multiple passes with different keys to recover cross-block
    matches — each pass is this same operator).

    levenshtein() runs JVM-side post-join on block-bounded pairs
    only. Output: (id_a, id_b, dist), id_a < id_b.
    """
    blk = lambda side: side.select(  # noqa: E731
        F.col(id_col), F.col(name_col), F.substring(F.col(name_col), 1, block_chars).alias("__blk")
    )
    a, b = blk(left).alias("a"), blk(right).alias("b")
    return (
        a.join(b, (F.col("a.__blk") == F.col("b.__blk")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .withColumn("dist", F.levenshtein(F.col(f"a.{name_col}"), F.col(f"b.{name_col}")).cast("long"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "dist",
        )
    )


def digest_prefilter_join(
    big: DataFrame,
    selective: DataFrame,
    big_key: str,
    sel_key: str,
) -> DataFrame:
    """Inner equi-join where the big side is pre-filtered MAP-SIDE by a
    broadcast of the selective side's distinct 8-byte key digests
    (xxhash64) before any shuffle — the 100 TB trick when the
    selective side's key set fits in a broadcast only after
    compaction (wide string/composite keys shrink ~10-50x to a long).

    Digest collisions admit false POSITIVES only — a non-matching big
    row that survives the prefilter is dropped by the real equi-join —
    so the result is EXACTLY the plain join's (the oracle replays the
    plain join); collisions cost a little extra shuffle, never a
    wrong row. Rows that cannot match never enter the exchange, which
    is the point: at 100 TB the join shuffle, not the scan, is the
    bottleneck, and a selective dimension prunes most of it.

    Spark's own runtime filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects the
    sketch form of this plan automatically when statistics warrant;
    the explicit operator guarantees the reduction in pipelines that
    disable AQE or join through shapes the optimizer won't risk, and
    pins the plan shape we want either way (plan-asserted in
    tests/test_plans.py).
    """
    digests = (
        selective.select(F.xxhash64(F.col(sel_key)).alias("__kd")).distinct()
    )
    pre = big.join(
        F.broadcast(digests),
        F.xxhash64(F.col(big_key)) == F.col("__kd"),
        "left_semi",
    )
    return pre.join(selective, pre[big_key] == selective[sel_key], "inner")


def bloom_filter_words(
    keys: DataFrame, key_col: str, m_bits: int = 1 << 16, k_hashes: int = 3
) -> list[int]:
    """Build a Bloom filter over ``keys[key_col]`` as a dense list of
    ``m_bits/64`` little-endian 64-bit words, computed distributively:
    each key explodes into its ``k_hashes`` (word-index, bit-mask)
    pairs, one hash-partitioned groupBy ``bit_or``s the masks per
    word, and only the NONZERO words travel to the driver (≤ m/64
    rows — 8 KB per 2^16 bits regardless of key cardinality, which is
    the whole advantage over an exact digest set when the selective
    side has hundreds of millions of keys).

    Hash family: ``xxhash64(key, i)`` for i in 0..k-1 — the same
    JVM-side seeded family Spark's own runtime bloom filter uses;
    positions are ``pmod(hash, m)``.
    """
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    hits = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)).alias(
                        "p"
                    )
                    for i in range(k_hashes)
                ]
            )
        ).alias("p")
    ).select(
        (F.col("p") / 64).cast("long").alias("w"),
        # pyspark's shiftleft wrapper only takes a literal shift —
        # the SQL form accepts a column
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
    )
    packed = hits.groupBy("w").agg(F.expr("bit_or(m)").alias("mask")).collect()
    words = [0] * (m_bits // 64)
    for r in packed:
        words[r["w"]] = r["mask"]
    return words


def bloom_prefilter_join(
    big: DataFrame,
    selective: DataFrame,
    big_key: str,
    sel_key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Inner equi-join where the big side is pre-filtered MAP-SIDE by
    a Bloom filter of the selective side's keys before any shuffle —
    the sketch companion of :func:`digest_prefilter_join` for when
    even the distinct 8-byte digest set is too large to broadcast:
    the filter is a FIXED ``m_bits/8``-byte bitset (8 KB at the 2^16
    default) no matter how many keys the selective side holds.

    Bloom filters admit false POSITIVES only — never negatives — so
    every matching big row survives the prefilter and every surviving
    non-match is dropped by the real equi-join that follows: the
    result is EXACTLY the plain join's, and the oracle replays the
    plain join. What the filter buys is shuffle volume: rows that
    cannot match never enter the exchange. With k=3 and m sized at
    ~10 bits/key the pass-through rate for non-matching rows is ~1-2%
    (pinned by tests/test_plans.py's selectivity assertion).

    The probe is a pure codegen conjunction — k (element_at(words,
    pmod(xxhash64(key, i), m)/64) & (1 << pos%64)) != 0 terms against
    the literal word array — no Python, no join, no broadcast
    exchange needed for the filter itself. This is exactly the plan
    Spark's runtime row-level filtering
    (spark.sql.optimizer.runtime.bloomFilter.enabled) injects when
    stats warrant; the explicit operator guarantees it in pipelines
    where the optimizer won't risk it, mirroring the reference's
    selective-dimension joins (settings.yaml merge queries) at the
    scale where the dimension no longer broadcasts.
    """
    words = bloom_filter_words(selective.select(sel_key), sel_key, m_bits, k_hashes)
    wlit = F.lit(words)
    probe = None
    for i in range(k_hashes):
        p = F.pmod(F.xxhash64(F.col(big_key), F.lit(i)), F.lit(m_bits))
        shifted = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(xxhash64(`{big_key}`, {i}), {m_bits}) % 64 AS INT))"
        )
        term = (
            F.element_at(wlit, (p / 64).cast("int") + 1).bitwiseAND(shifted) != 0
        )
        probe = term if probe is None else (probe & term)
    pre = big.filter(probe)
    return pre.join(selective, pre[big_key] == selective[sel_key], "inner")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
    key_cols: list | None = None,
) -> DataFrame:
    """Interval-INTERVAL overlap join: pairs whose half-open ranges
    [lo, hi) intersect — the session-vs-incident / uptime-vs-deploy /
    genomics shape that :func:`range_join_binned` (point-in-interval)
    can't express.

    Same scale path — binning turns the theta join into an equi-join:
    both sides explode into the fixed-width bins they cover, equi-join
    on the bin id, apply the exact overlap predicate
    (l_lo < r_hi AND r_lo < l_hi) as a residual filter. Unlike the
    point form, a pair can co-occupy MANY bins; attributing each pair
    to the single bin holding max(l_lo, r_lo) — the overlap's start —
    keeps the output duplicate-free without a distinct (both engines
    compute the same attribution bin, so it's also hash-stable).
    Cost is O((n+m)·avg_bins) through a hash join; pick ``bin_width``
    near the typical interval length. ``key_cols`` (same names on
    both sides) join alongside the bin — the per-machine / per-user
    keyed form, which also shards hot bins across keys.

    Coordinates MUST be integral (seconds / positions — cast
    timestamps upstream): the last covered bin is floor((hi-1)/w),
    which is only the bin containing the interval's last covered
    point when coordinates are integers. A fractional hi (e.g. left
    [0, 10.5) vs right [10.2, 10.4) at width 10) would end the left
    side's bin list one bin early and silently miss true overlaps, so
    non-integral lo/hi column types raise. Empty and inverted
    intervals (hi <= lo, which cover no points under the half-open
    contract and would otherwise produce descending sequence() bin
    arrays) are filtered from both sides before the explode.
    """
    w = int(bin_width)
    _INTEGRAL = ("byte", "short", "int", "integer", "bigint", "long")

    def _is_integral(dt) -> bool:
        # DECIMAL(p, 0) is exactly integral too — the scale type this
        # codebase recommends for big exact sums — so the floor
        # arithmetic is safe; only scale > 0 can carry fractions.
        from pyspark.sql.types import DecimalType

        if isinstance(dt, DecimalType):
            return dt.scale == 0
        return dt.simpleString() in _INTEGRAL

    for df, lo, hi, side in ((left, left_lo, left_hi, "left"), (right, right_lo, right_hi, "right")):
        for c in (lo, hi):
            t = df.schema[c].dataType.simpleString()
            if not _is_integral(df.schema[c].dataType):
                raise TypeError(
                    f"interval_overlap_join: {side}.{c} is {t}; coordinates must be "
                    "integral (the floor((hi-1)/w) last-bin arithmetic misses overlaps "
                    "for fractional endpoints) — pre-scale to integer units upstream"
                )
    left = left.filter(F.col(left_hi) > F.col(left_lo))
    right = right.filter(F.col(right_hi) > F.col(right_lo))

    # .cast("long") after each floor: for DECIMAL(p, 0) coordinates
    # floor() stays DECIMAL, which sequence() rejects; long bins also
    # keep the equi-join key one fixed-width type on both sides.
    def _bin(c):
        return F.floor(c / w).cast("long")

    lbins = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(left_lo)), _bin(F.col(left_hi) - 1)
            )
        ),
    )
    rbins = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(right_lo)), _bin(F.col(right_hi) - 1)
            )
        ),
    )
    overlap_start_bin = _bin(
        F.greatest(F.col(left_lo), F.col(right_lo))
    )
    return (
        lbins.join(rbins, ["__bin"] + list(key_cols or []))
        .filter(
            (F.col(left_lo) < F.col(right_hi))
            & (F.col(right_lo) < F.col(left_hi))
            & (F.col("__bin") == overlap_start_bin)
        )
        .drop("__bin")
    )


def fuzzy_join_edit1(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    self_join: bool = True,
) -> DataFrame:
    """Edit-distance-≤1 string join (typo-tolerant entity resolution /
    spelling-variant linking) as an EQUI-join via symmetric-delete
    blocking (the SymSpell construction): every string blocks on
    itself plus each of its single-character-deletion variants. Two
    strings within one edit (insert / delete / substitute) always
    share a block key — equal strings share the identity key, an
    insertion's longer side deletes down to the shorter, and a
    substitution at position i shares the delete-at-i variant — so
    the exact ``levenshtein ≤ 1`` predicate only runs as a residual
    filter inside blocks, never across the full cross product.

    Scale: keys per string = len+1, so candidate volume is
    Σ|block|² over near-uniform md5-free blocks — linear-ish in rows
    for natural key distributions vs. the O(n·m) theta join DuckDB's
    IEJoin would brute-force. Both sides dedupe to distinct strings
    before blocking (the join is string-level; re-attach row payloads
    downstream by equi-joining on the string).

    Block-size bound (the r12 ADVICE skew question): a block key k's
    members are exactly k itself plus the strings that DELETE down to
    k, i.e. single-character insertions into k — at most
    1 + (len(k)+1)·|alphabet| DISTINCT strings (the table is distinct
    before blocking). For ASCII names of length ~20 that is ≤ ~2,000
    members per block — a structural bound, not a distributional
    assumption — so the per-task collect_list array and the in-bucket
    pair expansion are alphabet-bounded, never corpus-sized. Corpora
    over enormous alphabets (e.g. full-Unicode identifiers) weaken the
    bound multiplicatively in the DISTINCT characters actually present
    at one position; that is the documented input contract.

    ``self_join`` (default True) declares the UNORDERED-DISTINCT-PAIR
    contract: the output is each distinct {a, b} pair of the two
    sides' UNION exactly once, oriented name_a < name_b, with
    identity pairs (dist=0) excluded — the semantics a near-dup
    self-scan wants. For two genuinely different tables pass
    ``self_join=False``: every (left, right) match keeps its
    (name_a, name_b) orientation and exact-equal (dist=0) matches are
    INCLUDED — with the default filter those would be silently
    dropped whenever the left string sorts after the right one.
    """

    # Candidate generation is IN-BUCKET PAIR EXPANSION (the
    # minhash_lsh_candidates / triangle_count baskets pattern), not a
    # self-join of the block table: both sides' distinct strings merge
    # into one (name, side-bits) table (bit 1 = left, bit 2 = right),
    # each block's names collect into one sorted array (block sizes
    # are deletion-variant fan-in — small for natural keys), and the
    # ordered pairs explode inside a codegen projection. One groupBy
    # shuffle of the block rows replaces the join that materialized
    # every candidate through a hash probe of a DATA-sized broadcast
    # (223k-row build side at sf0.1 — and at 10⁹ names that join
    # degrades to a sort-merge, i.e. a second full shuffle; guide
    # §2.4/§3.1). Measured 6.1 → 4.4 s at sf0.1 together with the
    # banded levenshtein below.
    la = (
        left.select(F.col(left_col).alias("__nm"))
        .filter(F.col("__nm").isNotNull())
        .distinct()
        .withColumn("__bits", F.lit(1))
    )
    rb = (
        right.select(F.col(right_col).alias("__nm"))
        .filter(F.col("__nm").isNotNull())
        .distinct()
        .withColumn("__bits", F.lit(2))
    )
    names = la.unionAll(rb).groupBy("__nm").agg(F.sum("__bits").alias("__bits"))
    variants = F.expr(
        "CASE WHEN length(__nm) = 0 THEN array(__nm) "
        "ELSE array_union(array(__nm), transform(sequence(1, length(__nm)), "
        "i -> concat(substring(__nm, 1, i - 1), substring(__nm, i + 1)))) END"
    )
    buckets = (
        names.withColumn("__blk", F.explode(variants))
        .groupBy("__blk")
        .agg(F.array_sort(F.collect_list(F.struct("__nm", "__bits"))).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    # Ordered (a < b) member pairs; each carries both sides' bits so
    # the original join's orientation semantics replay exactly:
    # l⋈r produced (name_a ∈ left, name_b ∈ right).
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ms, (a, i) -> "
                "transform(slice(ms, i + 2, size(ms) - i - 1), "
                "b -> struct(a.__nm AS na, a.__bits AS ba, b.__nm AS nb, b.__bits AS bb))))"
            )
        ).alias("p")
    ).select("p.na", "p.ba", "p.nb", "p.bb")
    # Residual distance BEFORE the pair distinct, with the BANDED
    # levenshtein: stage decomposition at sf0.1 put ~2.2 s of the
    # query's ~6 s in full levenshtein evals over the candidate pairs.
    # The 3-arg levenshtein (Spark 3.5+) computes only the |threshold|
    # diagonal band with early exit — exact for dist ≤ 1, -1 beyond —
    # and filtering first means only true ≤1-edit pairs reach the
    # distinct's exchange (guide §2.3 shuffle fewer bytes). The banded
    # distance equals the full one on every surviving row.
    near = pairs.withColumn(
        "dist", F.levenshtein("na", "nb", 1).cast("int")
    ).filter(F.col("dist") >= 0)
    if self_join:
        # (a ∈ left ∧ b ∈ right), a < b — the join's orientation filter.
        out = near.filter(
            (F.col("ba").bitwiseAND(1) > 0) & (F.col("bb").bitwiseAND(2) > 0)
        ).select(F.col("na").alias("name_a"), F.col("nb").alias("name_b"), "dist")
        return out.distinct()
    # Two-table mode keeps every (left, right) orientation, and a string
    # present on BOTH sides is its own dist-0 match (the identity block
    # produced it in the join form).
    fwd = near.filter(
        (F.col("ba").bitwiseAND(1) > 0) & (F.col("bb").bitwiseAND(2) > 0)
    ).select(F.col("na").alias("name_a"), F.col("nb").alias("name_b"), "dist")
    rev = near.filter(
        (F.col("bb").bitwiseAND(1) > 0) & (F.col("ba").bitwiseAND(2) > 0)
    ).select(F.col("nb").alias("name_a"), F.col("na").alias("name_b"), "dist")
    ident = names.filter(F.col("__bits") == 3).select(
        F.col("__nm").alias("name_a"),
        F.col("__nm").alias("name_b"),
        F.lit(0).cast("int").alias("dist"),
    )
    return fwd.unionAll(rev).unionAll(ident).distinct()
