"""Deduplication operators over the documents table.

Beyond-reference scale ops (the reference dedups nothing; its merge
discards whole time windows instead). Four tiers, cheapest first:

- exact: fingerprint groupBy — one shuffle on a 32-char key.
- simhash: 64-bit locality-sensitive fingerprint — one projection,
  then exact-match (or hamming-ball) grouping.
- minhash + LSH banding: shingle → k minhashes → b bands; candidate
  pairs only form inside a band bucket, so the join is
  |bucket|-bounded instead of |corpus|² — the standard web-dedup plan.
- n-gram Jaccard: exact verify step for candidate pairs (or, at small
  scale, a direct explode + self-join).

Everything is built-in expressions (md5-derived portable hashes,
transform, aggregate, explode, groupBy) — JVM-side end to end; at
100 TB each stage is one scan + one hash-partition shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from awi_datapipelinepublic_spark.functions.text import (
    doc_fingerprint,
    normalize_text,
)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per exact (normalized) content.

    groupBy(md5) → min(id): one shuffle keyed on the fingerprint; the
    partial aggregation combines map-side, so duplicate-heavy corpora
    shrink before the shuffle.
    """
    return (
        df.withColumn("fingerprint", doc_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


# --- Portable MinHash hash family -----------------------------------
# ONE md5 per shingle → 32-bit base hash h, then per-seed universal
# hashing ``(a_i·h + b_i) mod p`` over the Mersenne prime p = 2^61-1 —
# the standard MinHash permutation family (Spark MLlib's MinHashLSH
# and datasketch use exactly this form). md5 is bit-identical in every
# engine (unlike xxhash64, whose seeds cannot be replayed in DuckDB),
# so the whole signature replays exactly in the oracle; the affine
# transforms are plain codegen-resident long arithmetic, so the
# per-shingle cost is ONE digest + 32 multiply-mods instead of the 16
# digests + 32 hex conversions of the previous one-md5-per-seed-pair
# form (measured 4× slower end-to-end at sf0.1).
#
# NOT a Kirsch–Mitzenmacher combination (h1 + i·h2 with sequential i):
# that form makes per-seed argmins correlated — one differing shingle
# with a tiny h1 dominates MANY seeds at once, and a measured
# jaccard-0.988 pair missed all 8 bands (P ≈ 6e-11 under the s-curve's
# independence assumption). Here each seed has its own ~31-bit random
# multiplier, so a_i·h mod p is an independent-looking permutation per
# seed (2-universal family); the recall tests pin the s-curve behavior.
#
# Overflow safety under ANSI mode (driver sessions): a_i < 2^31 and
# h < 2^32 keep a_i·h < 2^63; the mod is applied before adding
# b_i < p, so every intermediate fits a signed 64-bit long in both
# engines. Constants derive from md5 of fixed tags — no RNG, no
# cross-version reproducibility concerns.
MINHASH_P = (1 << 61) - 1


def _hash_const(tag: str, lo: int, span: int) -> int:
    import hashlib

    v = int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big")
    return lo + (v % span)


MINHASH_A = [_hash_const(f"minhash-a{i}", 1 << 30, (1 << 31) - (1 << 30)) for i in range(64)]
MINHASH_B = [_hash_const(f"minhash-b{i}", 0, MINHASH_P) for i in range(64)]


def _base_hash32(col, hash_family: str = "md5"):
    """Uniform 32-bit base hash. The 2^32 universe is ample for
    per-document argmin estimation (a cross-shingle collision needs
    ~2^16 distinct shingles in ONE comparison to matter; documents
    carry a few hundred).

    Families:
    - "md5" (default): first 8 hex digits of md5 — bit-identical in
      DuckDB, the cross-engine verifiability contract every gate uses.
    - "xxhash64": low 32 bits of Spark's native xxhash64 — the
      PRODUCTION fast path (no digest string, no hex conversion;
      measured ~1.15× faster end-to-end on the sf0.1 LSH pipeline —
      the Arrow shingle UDF, not the hash, dominates that pipeline).
      Same statistical quality, NOT replayable in the oracle — use
      when nothing needs to re-verify signatures outside Spark.
    Both stay < 2^32, preserving the affine transform's signed-64
    overflow-safety contract (a_i < 2^31 → a_i·h < 2^63).
    """
    if hash_family == "md5":
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    if hash_family == "xxhash64":
        return F.xxhash64(col).bitwiseAND(F.lit(0xFFFFFFFF))
    raise ValueError(f"unknown hash_family {hash_family!r} (md5 | xxhash64)")


def _affine_hash(h, seed: int):
    """(a_seed·h mod p + b_seed) mod p — per-seed permutation."""
    return ((h * F.lit(MINHASH_A[seed])) % F.lit(MINHASH_P) + F.lit(MINHASH_B[seed])) % F.lit(
        MINHASH_P
    )


def _shingle_set_udf(k: int):
    """Arrow-batched tokenize → distinct word-k-shingles per document.

    Semantics identical to tokens(normalize_text(·)) + shingles_of +
    array_distinct (functions/text.py), but ~2.5× faster end-to-end:
    the expression form runs regexp_replace per doc plus an interpreted
    transform/slice/array_join per shingle (HOFs are outside
    whole-stage codegen), while here one Python loop over an Arrow
    batch does plain string slicing. Self-contained nested def —
    cloudpickled by value, no repo-module reference on the workers.
    """
    import pandas as pd  # noqa: F811 — keep the closure self-contained
    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def sh(texts: pd.Series) -> pd.Series:
        import re

        ws = re.compile(r"\s+")
        out = []
        for t in texts:
            toks = ws.sub(" ", (t or "").lower()).strip().split(" ")
            n = len(toks)
            if n >= k:
                out.append(list({" ".join(toks[i : i + k]) for i in range(n - k + 1)}))
            else:
                out.append([" ".join(toks)])
        return pd.Series(out)

    return sh


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    k: int = 5,
    hash_family: str = "md5",
) -> DataFrame:
    """(id, signature array<bigint>): per-seed min over shingle hashes.

    min(h_i(shingle)) per seed i ≈ a random permutation's first
    element — the classic MinHash estimator. The hash family is ONE
    md5-derived 32-bit base hash per shingle + per-seed affine
    transforms over the Mersenne prime (see the family block above):
    fully portable, so the whole signature replays bit-for-bit in the
    DuckDB oracle — the driver's former rows-only check is
    hash-verified — while the per-shingle cost stays one digest + 32
    codegen multiply-mods.

    Plan shape: explode distinct shingles (Arrow-batched shingle UDF —
    see _shingle_set_udf for why not the expression form) → one JVM
    md5 + 32 affine columns per shingle row → groupBy(id).min×32
    → array. The grouped min aggregates combine map-side, so the
    shuffle carries one 32-long row per document regardless of
    document length. (A pure-projection variant — array_min over
    transform lambdas — computes the same thing with zero shuffle but
    Catalyst's project-collapsing re-inlines the tokenize expression
    into every lambda, going quadratic; the explode/agg form is both
    safe from that and the standard distributed-minhash shape.)

    ``hash_family="xxhash64"`` swaps the base hash for Spark's native
    xxhash64 (see _base_hash32) — the production fast path when
    cross-engine replay is not needed; the affine family and every
    downstream stage are unchanged.
    """
    from awi_datapipelinepublic_spark.functions.parallel import spread_small_input

    sh_rows = spread_small_input(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_shingle_set_udf(k)(F.col(text_col))).alias("__sh")
    )
    hashed = sh_rows.select(
        F.col(id_col), _base_hash32(F.col("__sh"), hash_family).alias("__bh")
    ).select(
        F.col(id_col),
        *[_affine_hash(F.col("__bh"), s).alias(f"__h{s}") for s in range(num_hashes)],
    )
    sig = hashed.groupBy(id_col).agg(
        *[F.min(f"__h{s}").alias(f"__h{s}") for s in range(num_hashes)]
    )
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"__h{s}") for s in range(num_hashes)]).alias("signature")
    )


def minhash_band_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    hash_family: str = "md5",
) -> DataFrame:
    """(id, band_no, band_key) LSH band rows — the unit both the batch
    candidate generator (:func:`minhash_lsh_candidates`) and the
    incremental path (:func:`dedup_incremental`) share. The band key
    is the comma-joined signature slice itself (exact, and — with the
    md5-portable signature — byte-identical in the DuckDB oracle).
    Persist this table bucketed by (band_no, band_key) to make it a
    corpus dedup INDEX that incremental batches probe shuffle-free.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signature(
        df.select(id_col, text_col), text_col, id_col, num_hashes, k, hash_family
    )
    band_cols = F.array(
        *[
            F.concat_ws(
                ",", F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band).cast("array<string>")
            )
            for b in range(bands)
        ]
    )
    return (
        sigs.withColumn("band_keys", band_cols)
        .select(id_col, F.posexplode("band_keys").alias("band_no", "band_key"))
    )


def dedup_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
) -> DataFrame:
    """Near-dedup a NEW batch against a persisted corpus band index —
    the shape a production pipeline actually runs daily, where
    re-deduplicating the whole corpus per batch is a non-starter.

    ``index`` is a (doc_id, band_no, band_key) table built by
    :func:`minhash_band_keys` over the existing corpus. A new document
    is dropped if (a) any of its band keys already exists in the index
    — it is a near-duplicate of the corpus — or (b) it shares a band
    key with a smaller-id document in the same batch (keep-first
    within batch, decided independently of (a) so the outcome is
    deterministic). Returns the surviving new ids; append their band
    rows to the index to absorb the batch.

    100 TB shape: the corpus-side probe is a LEFT SEMI join — it stops
    at the first key match, so a degenerate band key shared by 10⁹
    index rows contributes one lookup, never a pair expansion. With
    the index stored bucketed by (band_no, band_key), only the (tiny)
    batch's band rows shuffle; the index is probed in place. The
    within-batch pass is a groupBy-min over batch band rows — batch-
    bounded. Nothing ever recomputes corpus signatures.
    """
    # The band rows feed THREE subtrees (corpus probe, within-batch
    # mins, victim join); without a persist each subtree re-runs the
    # whole signature pipeline — shingle UDF included — per consumer.
    # The batch is small by definition (it's the daily delta, not the
    # corpus), so caching it is bounded. MEMORY_ONLY so LRU eviction
    # actually frees the space — the default level would spill evicted
    # blocks to local disk, accumulating unboundedly in a long-lived
    # session that runs this per daily batch.
    from pyspark.storagelevel import StorageLevel

    nb = minhash_band_keys(new_docs, text_col, id_col, num_hashes, bands, k).persist(
        StorageLevel.MEMORY_ONLY
    )
    hit_corpus = (
        nb.join(index.select("band_no", "band_key"), ["band_no", "band_key"], "left_semi")
        .select(id_col)
        .distinct()
    )
    # within-batch keep-first as ONE pass: min/count over a bucket-key
    # window instead of a groupBy + join-back on the same key (r13;
    # the minhash_lsh_candidates window precedent — the join-back
    # re-read nb and paid a join for values the window computes in the
    # exchange the rows already need)
    from pyspark.sql import Window

    wb = Window.partitionBy("band_no", "band_key")
    batch_victims = (
        nb.withColumn("__mn", F.min(id_col).over(wb))
        .withColumn("__c", F.count(F.lit(1)).over(wb))
        .filter((F.col("__c") > 1) & (F.col(id_col) > F.col("__mn")))
        .select(id_col)
        .distinct()
    )
    dropped = hit_corpus.union(batch_victims).distinct()
    return new_docs.select(id_col).join(dropped, id_col, "left_anti")


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    max_bucket: int = 2000,
    hash_family: str = "md5",
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Signature is split into ``bands`` bands of num_hashes/bands rows;
    documents sharing any band hash become a candidate pair. Plan:
    projection → explode(bands) (×b row growth on ids only, not text)
    → shuffle on band bucket → within-bucket pairing. Pair output is
    deduplicated across bands. Returns (id_a, id_b) with id_a < id_b.

    The band key is the band's signature slice itself (comma-joined),
    not a hash of it: exact (no collision-induced phantom pairs) and —
    with the md5-portable signature — byte-identical in the DuckDB
    oracle.

    ``max_bucket`` drops buckets larger than the cap (production
    web-dedup practice): an over-full bucket means the band carries no
    discriminating information for those documents — degenerate
    content (empty docs, boilerplate) collapsing to one signature
    would otherwise put an n² pair expansion and the whole id list in
    a single task. Exact duplicates that a dropped bucket would have
    paired are the cheap case: run :func:`exact_dedup` first (the full
    pipeline's documented contract).
    """
    banded = minhash_band_keys(df, text_col, id_col, num_hashes, bands, k, hash_family)
    # Pair generation via groupBy + in-bucket expansion, NOT a self-join:
    # a self-join recomputes the whole signature pipeline for both sides
    # and shuffles it twice; grouping shuffles the (id, band) rows once
    # and expands pairs inside each bucket. Bucket sizes are the LSH
    # design parameter — a bucket of n yields n·(n−1)/2 pairs either
    # way, so the expansion is not a new quadratic risk, just the same
    # output without the duplicated upstream work; max_bucket bounds
    # the degenerate-content case where one bucket swallows the corpus.
    #
    # The cap is enforced BEFORE collect_list, not by filtering the
    # collected array: a COUNT-OVER-WINDOW on the bucket key (r13; the
    # ngram_novelty one-pass precedent) tags every band row with its
    # bucket size in the same exchange the collect_list needs — no
    # separate count aggregation and no semi-join back (the r12 form
    # paid both over the reused exchange; measured 2.42 -> 1.86 s for
    # the candidate subplan at sf0.1, identical pairs). No aggregation
    # buffer ever holds an over-cap id list: the window buffers one
    # bucket's rows per task and SPILLS if degenerate (no orderBy, so
    # no sort), the filter drops over-cap rows before collect_list, so
    # a 10⁹-member boilerplate bucket costs disk-bounded spill, never
    # an 8 GB agg buffer or any pair expansion (pinned at sf1 by
    # test_mega_bucket_boilerplate_at_sf1). Window and groupBy key on
    # (band_no, band_key), so one exchange serves both.
    from pyspark.sql import Window

    wb = Window.partitionBy("band_no", "band_key")
    buckets = (
        banded.withColumn("__n", F.count(F.lit(1)).over(wb))
        .filter((F.col("__n") > 1) & (F.col("__n") <= max_bucket))
        .groupBy("band_no", "band_key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids) - i - 1), b -> struct(a AS id_a, b AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return pairs


def near_dedup_keep_canonical(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    max_bucket: int = 2000,
) -> DataFrame:
    """End-to-end near-dedup: the full production pipeline in one call.

    minhash signatures → LSH banding (candidate pairs) → connected
    components (transitive duplicate clusters) → keep only each
    cluster's minimum-id document. The component step is what makes
    the result coherent: with pairwise logic alone, A≈B and B≈C keeps
    both A and C even though they are near-dups through B.

    Scale shape: signature + banding is scan + two shuffles bounded by
    bucket sizes (see minhash_lsh_candidates); the component loop runs
    on the *pair* graph — orders of magnitude smaller than the corpus,
    with near-clique clusters so the diameter (iteration count) stays
    small; the final anti-join streams the corpus once against the
    victim list. NOTE: victims scale with the duplicate count — on a
    high-duplication corpus they can be a large fraction of the input,
    so the anti-join must NOT be force-broadcast; leave the strategy
    to AQE (shuffled hash / sort-merge when victims are big).
    """
    from awi_datapipelinepublic_spark.operators.graph import dedup_clusters

    pairs = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, k, max_bucket)
    clusters = dedup_clusters(pairs, "id_a", "id_b")
    victims = clusters.filter(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    return df.join(
        victims, df[id_col] == victims["doc_id"], "left_anti"
    ).select(id_col)


def _simhash_half_expr(hex_off: int) -> str:
    """32-bit SimHash half over one 8-hex-digit md5 window of each
    token (``hex_off`` 1 → bits 32..63 of the fingerprint, 9 → bits
    0..31). Votes ±1 per bit per token OCCURRENCE; sign of the tally
    becomes the bit (ties → 0). Every intermediate is a non-negative
    long < 2^32, so shifts and bit tests replay identically in DuckDB
    (no arithmetic-shift-of-negative ambiguity)."""
    return f"""
        aggregate(
          zip_with(
            aggregate(
              transform(split(__norm, ' '),
                        t -> cast(conv(substring(md5(t), {hex_off}, 8), 16, 10) as bigint)),
              array_repeat(0L, 32),
              (acc, h) -> zip_with(
                acc, sequence(0, 31),
                (a, i) -> a + IF((shiftright(h, i) & 1) = 1, 1L, -1L))),
            sequence(0, 31),
            (c, i) -> IF(c > 0, shiftleft(1L, i), 0L)),
          0L, (a, b) -> a | b)
    """


def simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    """64-bit SimHash over md5-derived token hashes, fully JVM-side.

    Each token votes ±1 per bit of its 64-bit hash (two independent
    8-hex-digit md5 windows — the same portability trick as the
    MinHash family above: md5 is bit-identical in every engine, so the
    fingerprint replays exactly in the DuckDB oracle, unlike the
    previous xxhash64 form whose seeds DuckDB cannot reproduce); the
    sign of each bit's tally becomes that bit of the fingerprint.
    Near-duplicate docs land within a small Hamming distance. One
    projection, no shuffle.

    Built as a SQL expression: the Python Column API's shiftright/
    shiftleft only take literal bit counts, but inside higher-order
    lambdas the bit index is itself a column. The SQL functions accept
    expression operands, and the whole thing still runs JVM-side. The
    two 32-bit halves are computed separately (each stays < 2^32, so
    the oracle never shifts a negative value) and combined
    hi<<32 | lo into one signed long whose BIT PATTERN is
    cross-engine canonical — split it back with shiftrightunsigned
    for a sign-free two-column oracle form.
    """
    with_norm = df.withColumn("__norm", normalize_text(text_col))
    combined = (
        f"shiftleft(({_simhash_half_expr(1)}), 32) | ({_simhash_half_expr(9)})"
    )
    return with_norm.withColumn(out_col, F.expr(combined)).drop("__norm")


def simhash_near_dup_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-duplicate candidate pairs by SimHash Hamming distance.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks — any pair within ``max_hamming`` bits
    must agree exactly on at least one chunk, so candidates form only
    inside (chunk_no, chunk_value) buckets. Same single-shuffle
    groupBy + in-bucket expansion shape as MinHash-LSH; the exact
    Hamming filter runs on the bounded candidate set via bit_count.

    ``max_bucket`` drops over-full buckets before any member list is
    collected (count-agg + semi-join, same rationale as
    :func:`minhash_lsh_candidates`): a chunk value shared by a huge
    slice of the corpus carries no discriminating signal, and its n²
    expansion would otherwise land in one task.
    """
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    fp = simhash(df.select(id_col, text_col), text_col)
    chunks = F.array(
        *[
            F.shiftrightunsigned(F.col("simhash"), i * bits).bitwiseAND(F.lit((1 << bits) - 1))
            for i in range(n_chunks)
        ]
    )
    banded = fp.withColumn("chunks", chunks).select(
        id_col, "simhash", F.posexplode("chunks").alias("chunk_no", "chunk_val")
    )
    ok_buckets = (
        banded.groupBy("chunk_no", "chunk_val")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter((F.col("__n") > 1) & (F.col("__n") <= max_bucket))
        .drop("__n")
    )
    buckets = (
        banded.join(ok_buckets, ["chunk_no", "chunk_val"], "left_semi")
        .groupBy("chunk_no", "chunk_val")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "simhash"))).alias("members"))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(members, (a, i) -> "
                    "transform(slice(members, i + 2, size(members) - i - 1), "
                    f"b -> struct(a.{id_col} AS id_a, b.{id_col} AS id_b, "
                    "a.simhash AS ha, b.simhash AS hb))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs


def _guard_pair_expansion(sh: DataFrame, max_pairs: int | None, op: str) -> None:
    """Enforce the exact-similarity ops' "verify stage, not corpus
    sweep" contract by code (mirrors similarity.knn_join_brute's
    max_rows raise): the shingle self-join materializes
    Σ c·(c−1)/2 intermediate rows over per-shingle multiplicities c —
    quadratic in duplicate multiplicity — so estimate that sum with
    one aggregation over the (persisted) exploded shingles and refuse
    to detonate. ``max_pairs=None`` disables the guard for callers
    that have already bounded the input (e.g. an LSH candidate set).
    """
    if max_pairs is None:
        return
    est = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
        .collect()[0]["p"]
    ) or 0
    if est > max_pairs:
        raise ValueError(
            f"{op}: shingle self-join would materialize ~{int(est)} candidate "
            f"rows, over max_pairs={max_pairs}. These exact-similarity ops are "
            "the VERIFY stage over a bounded candidate set — pre-filter the "
            "corpus with minhash_lsh_candidates (or raise max_pairs / pass "
            "max_pairs=None deliberately)."
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_pairs: int | None = 500_000_000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above threshold.

    Plan: explode distinct shingles → self-join on shingle (shuffle on
    shingle hash) → count intersections → join per-doc set sizes →
    |∩| / (|A|+|B|−|∩|). Quadratic in the worst case — at scale this is
    the *verify* stage fed by minhash_lsh_candidates, not a standalone
    sweep, and :func:`_guard_pair_expansion` enforces that contract
    (raises when the estimated self-join expansion tops ``max_pairs``).
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    # Arrow-batched shingle set — the expression form is a
    # CollapseProject trap (the token array re-inlines into the
    # shingling lambda and the tokenize regexp re-runs per element;
    # see operators/quality.py:_gram_list_udf for the measurement) —
    # spread across cores first (small inputs arrive as 1-2 splits).
    from pyspark.storagelevel import StorageLevel

    from awi_datapipelinepublic_spark.functions.parallel import spread_small_input

    sh = spread_small_input(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_shingle_set_udf(k)(F.col(text_col))).alias("sh")
    )
    # The guard count + both self-join sides + sizes all consume sh:
    # persist (MEMORY_ONLY — eviction must free, not spill) so the
    # shingle UDF runs once, not four times.
    sh = sh.persist(StorageLevel.MEMORY_ONLY)
    _guard_pair_expansion(sh, max_pairs, "ngram_jaccard_pairs")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_pairs: int | None = 500_000_000,
) -> DataFrame:
    """Exact n-gram CONTAINMENT for all pairs where either direction
    clears the threshold: containment(A→B) = |shingles(A) ∩
    shingles(B)| / |shingles(A)|. The asymmetric companion of
    :func:`ngram_jaccard_pairs` — a short quote fully contained in a
    long article has Jaccard ≈ |A|/|B| ≈ 0 but containment(A→B) = 1,
    so excerpt/quotation near-dups are invisible to Jaccard and
    near-certain under containment (the broder resemblance-vs-
    containment distinction).

    Same plan shape as the Jaccard form (explode distinct shingles →
    shingle equi-join → intersection counts → size join-back), same
    scale role: the verify stage over LSH candidates, not a standalone
    corpus sweep — enforced by :func:`_guard_pair_expansion`
    (``max_pairs``). Returns (id_a, id_b, cont_a_in_b, cont_b_in_a)
    with id_a < id_b, kept when max(cont) ≥ threshold.
    """
    from pyspark.storagelevel import StorageLevel

    from awi_datapipelinepublic_spark.functions.parallel import spread_small_input

    sh = spread_small_input(df.select(id_col, text_col)).select(
        F.col(id_col), F.explode(_shingle_set_udf(k)(F.col(text_col))).alias("sh")
    )
    sh = sh.persist(StorageLevel.MEMORY_ONLY)
    _guard_pair_expansion(sh, max_pairs, "ngram_containment_pairs")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("cont_a_in_b", F.round(F.col("inter") / F.col("sz_a"), 6))
        .withColumn("cont_b_in_a", F.round(F.col("inter") / F.col("sz_b"), 6))
        .filter(F.greatest("cont_a_in_b", "cont_b_in_a") >= threshold)
        .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
    )


def embedding_near_dup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t).

    Small-side implementation is a self-join; the scale path buckets
    by random-hyperplane LSH first (see operators/similarity.py
    lsh_bucket) so the self-join is per-bucket.
    """
    from pyspark.sql.types import DoubleType

    # Pairwise cosine as an Arrow pandas_udf: HOF expressions are
    # interpreted (no codegen) and lose ~3× to vectorized numpy on
    # dense vectors (micro_bench.py / SCALING.md).
    @F.pandas_udf(DoubleType())
    def pair_cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.stack(a.values).astype(float)
        mb = np.stack(b.values).astype(float)
        d = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        safe = np.where(d == 0, 1.0, d)
        return pd.Series(np.where(d == 0, 0.0, np.einsum("ij,ij->i", ma, mb) / safe))

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(pair_cos("va", "vb"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def segment_exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 20,
    sep_pattern: str | None = None,
    join_sep: str = " ",
) -> DataFrame:
    """C4-style segment-level exact dedup: drop every repeated segment
    corpus-wide (keeping its first occurrence) and reassemble each
    document from its surviving segments.

    A *segment* is either a separator-delimited paragraph
    (``sep_pattern``, e.g. ``r"\\n{2,}"`` — the C4 "three-sentence
    span"/paragraph rule) or, for corpora without structural
    separators, a fixed non-overlapping ``span_words``-word window.
    First occurrence = lowest ``(doc_id, position)``.

    Scale design: segments explode to (id, pos, seg) rows; the winner
    per content hash is ``groupBy(md5).agg(min(struct(id, pos)))`` —
    map-side partial min, ONE skew-proof shuffle even when a
    boilerplate segment repeats 10⁹ times (a row_number window over
    the hash would put all replicas in one partition). Survivors are
    a left-semi join on the (id, pos) winner set, then one
    groupBy(id) reassembly; collect_list holds only one document's
    segments — bounded by max doc length, not corpus size.
    """
    words = F.split(F.col(text_col), r"\s+")
    if sep_pattern is not None:
        segs = F.split(F.col(text_col), sep_pattern)
    else:
        starts = F.sequence(F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(span_words))
        segs = F.transform(starts, lambda s: F.concat_ws(" ", F.slice(words, s + 1, span_words)))
    ex = (
        df.select(F.col(id_col), F.posexplode(segs).alias("pos", "seg"))
        .filter(F.col("seg") != "")
    )
    winners = (
        ex.groupBy(F.md5("seg").alias("__h"))
        .agg(F.min(F.struct(id_col, "pos")).alias("__w"))
        .select(F.col(f"__w.{id_col}").alias(id_col), F.col("__w.pos").alias("pos"))
    )
    kept = ex.join(winners, [id_col, "pos"], "left_semi")
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            join_sep,
            F.transform(F.array_sort(F.collect_list(F.struct("pos", "seg"))), lambda x: x.seg),
        ).alias(text_col)
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_rows: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: keep one representative
    per group of embedding-near-duplicates (pairwise cosine >=
    ``threshold``). Returns the surviving ids.

    Candidate generation is CLUSTER-bounded, the published SemDeDup
    recipe (Abbas et al. 2023): assign every vector to its nearest IVF
    centroid (one Arrow matmul per batch, no shuffle), then compare
    pairs only WITHIN a cluster — an equi-join on the cluster id, so
    pair count is Σ|cluster|² instead of n². Pairs above threshold form
    a graph; connected components pick the min-id canonical per group
    (transitive closure, same machinery as the text dedup pipeline).
    Approximation is exactly SemDeDup's: cross-cluster near-dups are
    missed by design; recall against the brute-force pair set is
    bounded in tests.

    ``n_clusters=None`` (the default) scales the cluster count with
    the corpus — ``clamp(n // target_cluster_rows, 8, 65536)`` — so
    E[|cluster|] stays ≈ target_cluster_rows and the within-cluster
    pair count stays ≈ n·target, LINEAR in n. This mirrors the
    published SemDeDup setting (cluster count grows with corpus
    size); a fixed k is quadratic in disguise (Σ|cluster|² ≈ n²/k),
    which the sf0.1→sf1 sweep measured directly — pass a fixed
    n_clusters only for pinned small-scale experiments.

    At 100 TB: write the corpus partitioned by ``cluster`` and each
    within-cluster join is partition-local; the pair graph and victim
    set follow the same bounded shapes as near_dedup_keep_canonical.
    """
    from awi_datapipelinepublic_spark.operators.graph import dedup_clusters
    from awi_datapipelinepublic_spark.operators.similarity import ivf_assign

    if n_clusters is None:
        n_clusters = min(65536, max(8, emb.count() // target_cluster_rows))
    assigned, _ = ivf_assign(emb, n_clusters, id_col, vec_col, out_col="__cluster")

    # Within-cluster pairs via ONE grouped matmul per cluster, not a
    # self-join: the join form materialized both vectors on every
    # candidate pair row (the knn_join_lsh lesson — vectors must cross
    # the Python boundary once per ROW). Each cluster group computes a
    # blocked sims plane and emits only the (id_a < id_b) pairs above
    # threshold; compute stays Σ|cluster|² either way, boundary
    # traffic drops from per-pair to per-row.
    thr = float(threshold)

    def cluster_pairs(pdf):
        n = len(pdf)
        if n < 2:
            e = np.empty(0, dtype=np.int64)
            return pd.DataFrame({"id_a": e, "id_b": e})
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        M = np.stack(pdf[vec_col].values).astype(float)
        Mn = np.linalg.norm(M, axis=1)
        Mn[Mn == 0] = 1.0
        out_a, out_b = [], []
        blk = max(1, min(4096, (4 << 20) // n))
        for lo in range(0, n, blk):
            # 9dp rounding before the threshold compare — the same
            # cross-engine determinism contract as ivf_assign: numpy
            # and DuckDB sum the dot product in different orders, so a
            # raw double within 1 ulp of the threshold could flip a
            # pair between engines; rounding collapses the boundary
            # identically in both. This is what makes the whole
            # victim set (and the driver gate) hash-verifiable.
            sims = np.round(
                (M[lo : lo + blk] @ M.T) / (Mn[lo : lo + blk, None] * Mn[None, :]), 9
            )
            ra, rb = np.nonzero(sims >= thr)
            ga, gb = ids[lo + ra], ids[rb]
            keep = ga < gb
            out_a.append(ga[keep])
            out_b.append(gb[keep])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    pairs = (
        assigned.select(id_col, vec_col, "__cluster")
        .groupBy("__cluster")
        .applyInPandas(cluster_pairs, schema="id_a long, id_b long")
    )
    clusters = dedup_clusters(pairs, "id_a", "id_b")
    victims = clusters.filter(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    return emb.join(
        victims, emb[id_col] == victims["doc_id"], "left_anti"
    ).select(id_col)


def dedup_cluster_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Duplication profile: histogram of exact-duplicate cluster sizes
    (cluster_size, n_clusters, n_docs) — the before/after audit every
    dedup deployment reports (what fraction of the corpus is singleton
    vs 2-copy vs boilerplate mega-cluster).

    Two chained groupBys: fingerprint → cluster sizes (map-side
    combined, the exact_dedup shuffle), then size → histogram (the
    second input is cluster-cardinality rows, the second shuffle is
    histogram-cardinality — both strictly smaller than the corpus).
    """
    clusters = exact_dedup(df, text_col, id_col)
    return (
        clusters.groupBy(F.col("dup_count").alias("cluster_size"))
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .withColumn("n_docs", (F.col("cluster_size") * F.col("n_clusters")).cast("long"))
    )


def semantic_decontaminate(
    corpus: DataFrame,
    test: DataFrame,
    threshold: float = 0.2,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cluster_rows: int = 64,
) -> DataFrame:
    """Embedding-level decontamination: drop every corpus row whose
    vector has cosine ≥ ``threshold`` to ANY benchmark/test vector —
    the semantic twin of the n-gram `decontaminate` family, catching
    paraphrased test-set leakage that token overlap misses. Returns
    the surviving corpus ids.

    Candidate generation is CLUSTER-bounded like :func:`semantic_dedup`
    (the SemDeDup recipe): corpus ∪ test share one deterministic IVF
    assignment (``ivf_assign`` — ids must be unique across the two
    inputs), and comparisons happen only corpus-row × test-row WITHIN
    a cluster, so the check is Σ|cluster_c|·|cluster_t| instead of
    |corpus|·|test|. Cross-cluster leaks are missed BY DESIGN (the
    published approximation); cluster count auto-scales to hold
    E[|cluster|] ≈ ``target_cluster_rows`` — linear, never n².

    Per cluster the flag is ONE cogrouped blocked matmul (vectors
    cross the Arrow boundary once per row, the knn_join_lsh lesson);
    sims round to 9dp before the ≥ comparison (the ivf_assign
    determinism contract), so the contaminated set replays exactly in
    a DuckDB oracle.
    """
    import pandas as pd

    from awi_datapipelinepublic_spark.operators.similarity import ivf_assign

    u = corpus.select(
        F.col(id_col), F.col(vec_col), F.lit(0).alias("__side")
    ).unionAll(test.select(F.col(id_col), F.col(vec_col), F.lit(1).alias("__side")))
    if n_clusters is None:
        n_clusters = min(65536, max(8, u.count() // target_cluster_rows))
    assigned, _ = ivf_assign(u, n_clusters, id_col, vec_col, out_col="__cluster")
    a = assigned.filter(F.col("__side") == 0).select(
        "__cluster", F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec")
    )
    b = assigned.filter(F.col("__side") == 1).select(
        "__cluster", F.col(vec_col).alias("b_vec")
    )
    thr = float(threshold)

    def flag_contaminated(lpdf, rpdf):
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"a_id": np.empty(0, dtype=np.int64)})
        B = np.stack(rpdf["b_vec"].values).astype(float)
        Bn = np.linalg.norm(B, axis=1)
        Bn[Bn == 0] = 1.0
        hits = []
        blk = max(1, min(4096, (4 << 20) // B.shape[0]))
        for lo in range(0, len(lpdf), blk):
            chunk = lpdf.iloc[lo : lo + blk]
            A = np.stack(chunk["a_vec"].values).astype(float)
            An = np.linalg.norm(A, axis=1)
            An[An == 0] = 1.0
            sims = np.round((A @ B.T) / (An[:, None] * Bn[None, :]), 9)
            bad = (sims >= thr).any(axis=1)
            hits.append(chunk["a_id"].to_numpy(dtype=np.int64)[bad])
        return pd.DataFrame({"a_id": np.concatenate(hits)})

    contaminated = (
        a.groupBy("__cluster")
        .cogroup(b.groupBy("__cluster"))
        .applyInPandas(flag_contaminated, schema="a_id long")
    )
    return (
        corpus.select(F.col(id_col))
        .join(contaminated, F.col(id_col) == F.col("a_id"), "left_anti")
    )


def split_leakage_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    val_hex: str = "1a",
    test_hex: str = "34",
) -> DataFrame:
    """Train/eval leakage audit for a corpus split in one pipeline:
    every val/test document that is a MinHash-LSH near-duplicate of
    some TRAIN document is a leak — the eval score it contributes is
    memorization, not generalization. Run after
    :func:`~awi_datapipelinepublic_spark.operators.sampling.
    train_val_test_split` and before shipping a data card.

    Composition, not new machinery: the split is the deterministic
    md5-prefix rule (so the audit replays cross-engine), the
    signatures are the md5-portable band keys
    (:func:`minhash_band_keys`), and the probe is the
    fuzzy-decontamination shape — eval-side band rows join the
    train-side band index. Unlike the benchmark case the train side
    is CORPUS-sized, so nothing is force-broadcast: the band join is
    a plain equi-join on (band_no, band_key) that AQE sizes.

    Output: (doc_id, split, n_shared_bands BIGINT, train_match BIGINT)
    — one row per leaked eval document, with the lowest-id matching
    train document as deterministic evidence.
    """
    from awi_datapipelinepublic_spark.operators.sampling import train_val_test_split

    split = train_val_test_split(df, id_col, val_hex, test_hex)
    banded = minhash_band_keys(df, text_col, id_col, num_hashes, bands, k).join(
        split.select(id_col, "split"), id_col
    )
    train = banded.filter(F.col("split") == "train").select(
        "band_no", "band_key", F.col(id_col).alias("__train_id")
    )
    holdout = banded.filter(F.col("split") != "train")
    hits = holdout.join(train, ["band_no", "band_key"])
    return hits.groupBy(id_col, "split").agg(
        F.count_distinct(F.col("band_no"), F.col("band_key"))
        .cast("bigint")
        .alias("n_shared_bands"),
        F.min("__train_id").cast("bigint").alias("train_match"),
    )


def dedup_keep_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "n_chars",
) -> DataFrame:
    """Canonical-document selection: within each exact-duplicate
    cluster (same normalized-content fingerprint), keep the
    HIGHEST-QUALITY copy — ties to the lowest id. The survivorship
    policy real curation pipelines want where :func:`exact_dedup`'s
    keep-lowest-id is arbitrary: duplicates differ in upstream
    cleaning (truncation, encoding damage), and the scored copy is
    the one worth keeping.

    One keyed window (row_number per fingerprint over
    (score DESC, id ASC) — a total order, deterministic in any
    engine) on the fingerprint shuffle; no join, no collect. Output
    carries the cluster size so downstream weighting (count-aware
    sampling) needs no second pass.

    Output: (doc_id, score, dup_count BIGINT) — one row per cluster,
    the surviving copy.
    """
    from pyspark.sql import Window

    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("bigint").alias("score"),
        doc_fingerprint(text_col).alias("__fp"),
    )
    w = Window.partitionBy("__fp").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    ranked = keyed.withColumn("__rn", F.row_number().over(w)).withColumn(
        "dup_count", F.count(F.lit(1)).over(Window.partitionBy("__fp"))
    )
    return ranked.filter(F.col("__rn") == 1).select(
        "doc_id", "score", F.col("dup_count").cast("bigint").alias("dup_count")
    )


def dup_rate_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source exact-duplication profile: how much of each source
    is redundant BEFORE dedup runs — the triage report that decides
    which feeds get the expensive near-dup pass (a 40%-duplicate
    crawl and a 2%-duplicate curated feed need different pipelines).
    Fingerprint is the engine-wide :func:`~awi_datapipelinepublic_
    spark.functions.text.doc_fingerprint` (md5 of normalized text),
    so the numbers agree exactly with what :func:`dedup_exact` would
    remove per source.

    Plan: two chained groupBys on a shared key prefix — (source,
    fingerprint) then source — ONE shuffle keyed on the source;
    counts exact, the rate one double division.

    Output: (source, n_docs, n_distinct, n_dup_docs BIGINT,
    dup_rate DOUBLE — duplicate rows over total rows).
    """
    from awi_datapipelinepublic_spark.functions.text import doc_fingerprint

    per_fp = (
        df.select(
            F.col(source_col).alias("__s"), doc_fingerprint(text_col).alias("__fp")
        )
        .groupBy("__s", "__fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    return (
        per_fp.groupBy("__s")
        .agg(
            F.sum("__c").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        )
        .select(
            F.col("__s").alias(source_col),
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("n_dup_docs"),
            (
                (F.col("n_docs") - F.col("n_distinct")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
    )
