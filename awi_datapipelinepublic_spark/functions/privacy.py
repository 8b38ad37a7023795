"""PII redaction expressions for training-data preparation.

A corpus destined for model training must have obvious personal
identifiers scrubbed before anything else touches it. These are pure
Column regexp expressions (JVM-side, codegen-resident, no shuffle, no
Python) — redaction at 100 TB is a projection over the scan, exactly
as cheap as any other clean-stage transform (extends the reference's
clean stage, config.py:127-146, to the document domain).

Pattern notes:
- Patterns are kept RE2-compatible (no lookaround, no backreferences)
  so the same literal pattern runs on Spark (java.util.regex), the
  DuckDB oracle (RE2), and any downstream engine.
- Order matters and is fixed: EMAIL first (an email contains dot-runs
  an IP pattern could nibble), then IP, then SSN (a dashed SSN would
  otherwise half-match the phone pattern), then PHONE.
- This is the heuristic regex tier. A production stack layers an NER
  model behind the same column contract (mapInPandas, Arrow-batched)
  for names/addresses; the plumbing is operators/multimodal.py's
  decode pattern with a text payload.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
# Optional country code, optional parens on the area code, common
# separators. Anchored at a word boundary on the right only — the left
# edge may be '+' which is not a word character.
PHONE_RE = r"(\+\d{1,2}[ .-]?)?(\(\d{3}\)|\b\d{3})[ .-]?\d{3}[ .-]?\d{4}\b"

REDACTIONS = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def redact_pii(c: Column | str) -> Column:
    """Replace every email / IPv4 / SSN / phone occurrence with a typed
    placeholder token. One chained regexp_replace projection."""
    out = _col(c)
    for pattern, token in REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def k_anonymity(
    df,
    quasi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
):
    """k-anonymity audit over quasi-identifier columns.

    Every row whose quasi-identifier combination is shared by fewer
    than ``k`` rows is re-identifiable by linkage; this returns the
    per-combination audit a release gate needs: group size, an
    ``at_risk`` flag (k-violation), and — when ``sensitive_col`` is
    given — the distinct sensitive-value count (the l-diversity side:
    a k-anonymous group with one sensitive value still leaks it).

    Output: quasi_cols..., n_rows BIGINT, at_risk INT 0/1
    [, l_diversity BIGINT]. Flags are INT, not BOOLEAN, per the
    canonicalization-proof output contract (VERDICT r4 finding 1).

    Scale: one hash-partitioned groupBy on the quasi keys with full
    map-side partial aggregation; output is bounded by group
    cardinality, never row count. Extends the reference's clean-stage
    hygiene (config.py:127-146) to the privacy-audit domain alongside
    redact_pii.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l_diversity"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    return out.withColumn(
        "at_risk", F.when(F.col("n_rows") < k, 1).otherwise(0).cast("int")
    )


def pii_counts(c: Column | str) -> Column:
    """Struct of per-category match counts (emails, ips, ssns, phones)
    — the audit-side twin of redact_pii, for corpus-level PII
    prevalence stats without materializing redacted text. Counted on
    the progressively-redacted text with the same pattern order, so a
    span is attributed to exactly one category (an SSN is never also
    counted as a phone)."""
    out = _col(c)
    counts = []
    names = ("emails", "ips", "ssns", "phones")
    for (pattern, token), name in zip(REDACTIONS, names):
        counts.append(F.regexp_count(out, F.lit(pattern)).cast("long").alias(name))
        out = F.regexp_replace(out, pattern, token)
    return F.struct(*counts)


def dp_noisy_count(
    df,
    group_cols: list[str],
    epsilon: float = 1.0,
    seed: int = 42,
    out_col: str = "noisy_count",
):
    """Laplace-mechanism noisy group counts — the release-side
    companion of :func:`k_anonymity`: publish per-group counts with
    Laplace(1/ε) noise (a count query has sensitivity 1) instead of
    the exact counts, the standard ε-differential-privacy mechanism
    (Dwork et al. 2006).

    The noise draw is the inverse-CDF transform of a uniform derived
    from ``md5(seed, group key)``: noise = −(1/ε)·sign(u−½)·ln(1−2|u−½|).
    A FIXED seed makes the release replayable — the cross-engine
    hash-verifiability contract this repo uses everywhere (the same
    md5-uniform family as sampling.py) — which is the right shape for
    a pinned, audited release. True ε-DP requires the draw to be
    secret and fresh per release: pass a new secret ``seed`` per
    publication and this is the textbook mechanism; reusing a seed
    across releases of CHANGED data leaks the delta, which is
    documented here rather than hidden.

    Domain caveat (also required for true ε-DP): this emits only
    groups PRESENT in the data, so group presence/absence is released
    exactly — a standard DP violation when the group domain is
    data-dependent. A true release needs a fixed/public group domain
    (outer-join the noisy counts onto the known key universe, noising
    absent groups' zero counts too) or a noisy-threshold ("stability")
    filter that drops small groups; neither is applied here because
    the gate's contract is replayable audited output over observed
    keys.

    Scale: one hash-partitioned groupBy with map-side combine, then a
    pure projection — the noise math never touches row data. Output:
    group_cols..., noisy_count DOUBLE (6dp), never the exact count.
    """
    g = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    tag = F.concat_ws(
        "\x1f",
        F.lit(f"dp-{seed}"),
        *[F.col(c).cast("string") for c in group_cols],
    )
    v = F.conv(F.substring(F.md5(tag), 1, 8), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    noise = (
        -F.lit(1.0 / epsilon)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return g.select(
        *group_cols,
        F.round(F.col("__n") + noise, 6).alias(out_col),
    )


def t_closeness(
    df,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.3,
    round_dp: int = 6,
):
    """t-closeness audit (Li et al. 2007) — the distributional
    companion of :func:`k_anonymity`: a QI group whose SENSITIVE-value
    distribution diverges from the global one leaks information even
    when k-anonymous and l-diverse. For categorical sensitive
    attributes the standard distance is total variation
    (½ Σ |p_group − p_global|); groups with distance > t are flagged.

    Scale design: one groupBy(QI, sensitive) count (map-side combine),
    the global sensitive distribution aggregated once and broadcast
    back, then a per-group sum over sensitive-cardinality rows —
    exchanges are bounded by group × sensitive-value cardinality,
    never row count. The distance is computed on exact long
    cross-products (|cnt·N − gcnt·n| summed, divided once by 2·n·N) so
    it replays bit-identically cross-engine. Output: quasi_cols...,
    n_rows BIGINT, tv_distance DOUBLE round_dp, above_t INT 0/1.
    """
    cell = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    # Everything below derives from the (QI × sensitive)-cardinality
    # cell table: materialize it once (GC-owned localCheckpoint) so
    # the fact is scanned exactly once; group/global/total counts
    # re-aggregate cell partials exactly (algebraic sums).
    cell = cell.localCheckpoint()
    group = cell.groupBy(*quasi_cols).agg(F.sum("__c").alias("__n"))
    glob = cell.groupBy(sensitive_col).agg(F.sum("__c").alias("__g"))
    total = cell.agg(F.sum("__c").alias("__tot"))
    # missing sensitive values in a group contribute |0·N − g·n|; a
    # full outer per group is avoided by summing the PRESENT terms and
    # adding the absent mass: Σ_absent g·n = (N − Σ_present g)·n
    joined = (
        cell.join(F.broadcast(glob), sensitive_col)
        .join(group, quasi_cols)
        .crossJoin(F.broadcast(total))
    )
    per_group = joined.groupBy(*quasi_cols).agg(
        F.first("__n").alias("n_rows"),
        F.first("__tot").alias("__Nt"),
        F.sum(F.abs(F.col("__c") * F.col("__tot") - F.col("__g") * F.col("__n"))).alias(
            "__present"
        ),
        F.sum(F.col("__g")).alias("__gsum"),
    )
    tv = (
        F.col("__present")
        + (F.col("__Nt") - F.col("__gsum")) * F.col("n_rows")
    ) / (F.lit(2.0) * F.col("n_rows") * F.col("__Nt"))
    return per_group.select(
        *quasi_cols,
        "n_rows",
        F.round(tv, round_dp).alias("tv_distance"),
    ).withColumn("above_t", (F.col("tv_distance") > t).cast("int"))


def l_diversity(
    df,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
):
    """l-diversity audit: per quasi-identifier group, the distinct
    sensitive-value count AND the modal sensitive value's share — the
    release gate :func:`k_anonymity` points at. A k-anonymous group
    with one (or one dominant) sensitive value still discloses it;
    distinct-l is the classic test, the modal count is the
    probabilistic variant's numerator (entropy-free, so exact).

    Plan: two chained groupBys on a shared key prefix — (quasi,
    sensitive) partial-agg, then quasi — ONE shuffle keyed on the
    quasi columns; output bounded by group cardinality. The modal
    count uses max(struct(count)) — value-only, no tie-break needed
    since only the count is reported.

    Output: quasi_cols..., n_rows BIGINT, n_sensitive BIGINT (the
    distinct count), top_sensitive_n BIGINT (modal value's rows),
    at_risk INT 0/1 (n_sensitive < l).
    """
    per_sv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    g = per_sv.groupBy(*quasi_cols).agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
        F.max("__c").cast("bigint").alias("top_sensitive_n"),
    )
    return g.withColumn(
        "at_risk", F.when(F.col("n_sensitive") < l, 1).otherwise(0).cast("int")
    )
