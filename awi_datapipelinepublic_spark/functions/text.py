"""Text-analysis expressions for the documents table.

These extend the engine beyond the reference surface (SURVEY.md §7
step 7) with the text ops a training-data pipeline needs: language ID,
quality scoring, token counting, fingerprinting, shingling. All are
built-in Column expressions (split/filter/aggregate/transform run
JVM-side inside codegen) — deliberately no Python in the hot path, so
they scale to a 100 TB documents table exactly like any other
projection.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny high-frequency English stopword list used by the n-gram/token
# heuristics. Frozen: changing it changes lang_id/quality outputs.
EN_STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
    "on", "as", "with", "was", "at", "by", "an", "be", "this", "are",
)

# Frozen high-frequency lists for the multi-language heuristic
# (lang_id_scores). Same contract as EN_STOPWORDS: tiny, fixed, and
# any production deployment swaps in a trained model via the same
# projection shape.
LANG_STOPWORDS = {
    "en": EN_STOPWORDS,
    "de": (
        "der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit",
        "auf", "für", "von", "sich", "dem", "den", "des", "im", "zu",
        "sie", "er",
    ),
    "fr": (
        "le", "la", "les", "et", "est", "un", "une", "pas", "avec",
        "sur", "pour", "de", "se", "du", "des", "au", "en", "que",
        "elle", "il",
    ),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization, empty-safe: '' → [] not ['']."""
    t = F.trim(_col(c))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(c: Column | str) -> Column:
    """Number of whitespace-separated tokens."""
    return F.size(tokens(c)).cast("long")


def stopword_count(c: Column | str) -> Column:
    """Tokens (lowercased, punctuation-stripped) matching EN_STOPWORDS."""
    toks = tokens(F.lower(_col(c)))
    cleaned = F.transform(toks, lambda x: F.regexp_replace(x, r"[^a-z]", ""))
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    return F.size(F.filter(cleaned, lambda x: F.array_contains(stop_arr, x))).cast("long")


def stopword_ratio(c: Column | str) -> Column:
    """stopwords / tokens; 0.0 for empty docs."""
    n = token_count(c)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(c) / n.cast("double"))


def lang_id(c: Column | str, threshold: float = 0.08) -> Column:
    """N-gram-free stopword-ratio language heuristic: 'en' if at least
    ``threshold`` of tokens are high-frequency English words, else
    'unknown'. (A real deployment would swap in a trained n-gram
    model via mapInPandas; the contract — string label column, pure
    projection, no shuffle — is identical.)"""
    return F.when(stopword_ratio(c) >= threshold, F.lit("en")).otherwise(F.lit("unknown"))


def _stopword_ratio_for(c: Column | str, words: tuple[str, ...]) -> Column:
    """Stopword ratio against an arbitrary frozen word list."""
    toks = tokens(F.lower(_col(c)))
    cleaned = F.transform(toks, lambda x: F.regexp_replace(x, r"[^a-zà-ÿ]", ""))
    arr = F.array(*[F.lit(w) for w in words])
    n = F.size(toks)
    hits = F.size(F.filter(cleaned, lambda x: F.array_contains(arr, x)))
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n.cast("double"))


def lang_id_scores(c: Column | str, threshold: float = 0.08) -> dict[str, Column]:
    """Multi-language stopword-ratio heuristic: one ratio per language
    in LANG_STOPWORDS plus an argmax ``lang_pred`` ('unknown' when no
    language clears ``threshold``; ties break by language-code order,
    deterministically). One projection, no shuffle — the multi-class
    twin of :func:`lang_id`, same swap-in-a-real-model contract."""
    scores = {lang: _stopword_ratio_for(c, ws) for lang, ws in LANG_STOPWORDS.items()}
    langs = sorted(scores)
    best = F.lit("unknown")
    best_score = F.lit(float(threshold))
    # strict > against the running best keeps the FIRST language in
    # sorted order on ties (and 'unknown' when nothing clears threshold)
    for lang in langs:
        is_better = scores[lang] > best_score
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    out = {f"score_{lang}": scores[lang] for lang in langs}
    out["lang_pred"] = best
    return out


def punct_ratio(c: Column | str) -> Column:
    """Punctuation chars / total chars; 0.0 for empty docs."""
    col = _col(c)
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(punct.cast("double") / total.cast("double"))


def quality_score(c: Column | str) -> Column:
    """Composite document-quality score in [0,1]:
    0.4·length_score + 0.4·stopword_score + 0.2·(1 − punct_ratio).

    length_score saturates at 200 tokens; stopword_score at ratio 0.2
    (well-formed English prose sits around 0.2-0.4). Deterministic,
    fully JVM-side — the shape every heuristic quality filter
    (Gopher/C4-style) takes.
    """
    n = token_count(c).cast("double")
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) / F.lit(0.2), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.4) * stop_score + F.lit(0.2) * (F.lit(1.0) - punct_ratio(c)),
        6,
    )


_ACCENTED = "àáâãäåèéêëìíîïòóôõöùúûüýÿçñ"
_FOLDED = "aaaaaaeeeeiiiiooooouuuuyycn"


def fold_accents(c: Column | str) -> Column:
    """Latin accent folding (à→a, ç→c, …) — the canonicalization step
    multilingual dedup/fingerprinting needs so 'café' and 'cafe'
    collide. A codegen translate() over the Latin-1-supplement
    lowercase range; uppercase inputs should be lowered first (the
    normalize_text convention). The mapped range replays DuckDB's
    strip_accents character-for-character (pinned by the
    normalize_accents gate), so folded fingerprints stay
    oracle-verifiable. Full Unicode NFKD folding would need a Pandas
    UDF; this covers the Latin scripts the lang_id_scores heuristic
    targets."""
    return F.translate(_col(c), _ACCENTED, _FOLDED)


def normalize_text(c: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace runs, trim."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), r"\s+", " "))


def doc_fingerprint(c: Column | str) -> Column:
    """Content fingerprint: md5 of the normalized text. Two documents
    with the same fingerprint are exact (modulo whitespace/case)
    duplicates. md5 is chosen over xxhash for cross-engine
    verifiability; at 100 TB either is scan-bound, not hash-bound."""
    return F.md5(normalize_text(c))


def shingles_of(toks: Column, k: int = 5) -> Column:
    """Word k-shingles from a tokens array, as array<string>.

    IMPORTANT: pass a *materialized column* (a real attribute from a
    prior withColumn), not a nested expression — expressions referenced
    inside a higher-order-function lambda are re-evaluated per array
    element, so a nested tokenize here turns O(n) shingling into O(n²)
    regexp work per row. Bound column references are O(1) field reads.

    Docs shorter than k tokens yield a single whole-text shingle so
    they still participate in MinHash.
    """
    n = F.size(toks)
    make = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    whole = F.array(F.array_join(toks, " "))
    return F.when(n >= k, make).otherwise(whole)


def char_entropy(c: Column | str) -> Column:
    """Shannon entropy (bits/char) of the character distribution — the
    gibberish/boilerplate detector: natural prose sits ~4-4.5 bits,
    repeated-character spam and template padding fall under ~3, and
    random base64 blobs push ~6.

    Pure higher-order-function Column expression (split → distinct →
    per-char frequency → Σ p·log2 p), JVM-side in codegen like every
    other quality signal. CONVENIENCE FORM for ad-hoc/small use (the
    shingles vs shingles_of split): CollapseProject inlines the char
    array into the fold lambda, so the split re-evaluates per distinct
    character — measured 11.5 s over 50k docs at sf0.1. Hot paths use
    :func:`doc_entropy`, which materializes counts through an explode
    barrier with map-side combine and produced the identical 9dp hash.

    Cross-engine determinism contract: the distinct-character list is
    sorted (array_sort ↔ list_sort) so the float accumulation order is
    identical in Spark and the DuckDB oracle; callers round at 9dp.
    Empty/whitespace-only text → 0.0.
    """
    # Java-regex split keeps a trailing "" element under Spark's
    # limit=-1; DuckDB's string_split does not — drop empties so both
    # engines see the identical character multiset.
    chars = F.filter(F.split(_col(c), ""), lambda x: x != "")
    n = F.size(chars)
    ds = F.array_sort(F.array_distinct(chars))
    ent = -F.aggregate(
        ds,
        F.lit(0.0),
        lambda acc, d: acc
        + (F.size(F.filter(chars, lambda x: x == d)).cast("double") / n)
        * F.log2(F.size(F.filter(chars, lambda x: x == d)).cast("double") / n),
    )
    return F.when(n > 0, ent).otherwise(F.lit(0.0))


def doc_entropy(df, id_cols: list[str], text_col: str = "text", out_col: str = "entropy"):
    """Scalable per-document Shannon entropy (bits/char): the hot-path
    twin of :func:`char_entropy`, same values to the last ulp.

    Shape: explode the char array (codegen Generate, no shuffle of its
    own) → groupBy(id, char) count — map-side partial aggregation
    collapses each document's characters WITHIN its input partition, so
    shuffle volume is rows × alphabet (≤ ~100 entries/doc), never total
    corpus characters → per-doc sorted (char, count) fold. The float
    accumulation order (ascending char) is identical to char_entropy
    and the DuckDB oracle, so the 9dp-rounded results hash-match.

    explode_outer keeps empty/whitespace-only documents (entropy 0.0)
    without a join back to the input.
    """
    from awi_datapipelinepublic_spark.functions.parallel import spread_small_input

    chars = F.filter(F.split(F.col(text_col), ""), lambda x: x != "")
    # A small parquet scan arrives as 1 split; the explode+partial-agg
    # stage would run on one core. No-op at real corpus scale.
    src = spread_small_input(df.select(*id_cols, text_col))
    ex = src.select(*id_cols, F.explode_outer(chars).alias("__ch"))
    cnt = ex.groupBy(*id_cols, "__ch").agg(F.count(F.lit(1)).alias("__k"))
    per = cnt.groupBy(*id_cols).agg(
        F.array_sort(
            F.collect_list(  # null __ch (empty doc) rows drop here
                F.when(
                    F.col("__ch").isNotNull(),
                    F.struct(F.col("__ch").alias("c"), F.col("__k").alias("k")),
                )
            )
        ).alias("__cs")
    )
    n = F.aggregate(F.col("__cs"), F.lit(0).cast("int"), lambda a, s: a + s["k"].cast("int"))
    per = per.withColumn("__n", n)
    # p·log2 p fold in ascending-char order; k/n division replays
    # char_entropy's int-count / int-size double division exactly.
    ent = -F.aggregate(
        F.col("__cs"),
        F.lit(0.0),
        lambda acc, s: acc
        + (s["k"].cast("int").cast("double") / F.col("__n"))
        * F.log2(s["k"].cast("int").cast("double") / F.col("__n")),
    )
    return per.select(
        *id_cols,
        F.when(F.col("__n") > 0, ent).otherwise(F.lit(0.0)).alias(out_col),
    )


def shingles(c: Column | str, k: int = 5) -> Column:
    """Convenience expression form of shingles_of — fine for ad-hoc use
    on small data; hot paths (operators/dedup.py) materialize the token
    column first (see shingles_of's warning)."""
    return shingles_of(tokens(normalize_text(c)), k)


# --- Gopher-style document quality rules -----------------------------
# Word-level repetition-free subset of the Gopher (Rae et al. 2021,
# App. A) quality filter, adapted to a single-line corpus: the two
# line-based rules (bullet-start / ellipsis-end line fractions) have no
# meaning without newlines and are intentionally absent; the bigram/
# n-gram repetition rules live in operators/quality.py:repetition_stats.
# Everything below is derived from the NORMALIZED text (lowercase,
# single-spaced — normalize_text), so token counts and lengths are
# whitespace-run-proof and the DuckDB oracle replays them exactly.


def mean_word_length(c: Column | str) -> Column:
    """Mean characters per word. Computed arithmetically from the
    normalized text — Σ token lengths = length(norm) − (n−1) separators
    — so it stays a codegen projection with NO higher-order fold
    re-evaluating a split per element. 0.0 for empty docs."""
    norm = normalize_text(_col(c))
    n = F.size(F.split(norm, " "))
    return F.when(norm == "", F.lit(0.0)).otherwise(
        (F.length(norm) - n + 1).cast("double") / n.cast("double")
    )


def alpha_word_ratio(c: Column | str) -> Column:
    """Fraction of words containing at least one letter — Gopher's
    '≥80% of words must contain an alphabetic character' signal that
    kills number/symbol soup. 0.0 for empty docs."""
    norm = normalize_text(_col(c))
    toks = F.split(norm, " ")
    n = F.size(toks)
    alpha = F.size(F.filter(toks, lambda x: x.rlike("[a-z]")))
    return F.when(norm == "", F.lit(0.0)).otherwise(
        alpha.cast("double") / n.cast("double")
    )


def symbol_word_ratio(c: Column | str) -> Column:
    """(# count + '...' count) / words — Gopher's symbol-to-word ratio
    flagging markup/boilerplate. Counts are plain substring/regexp
    counts on the normalized text; 0.0 for empty docs."""
    norm = normalize_text(_col(c))
    n = F.size(F.split(norm, " "))
    hashes = F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit("")))
    ellipses = F.regexp_count(norm, F.lit(r"\.\.\."))
    return F.when(norm == "", F.lit(0.0)).otherwise(
        (hashes + ellipses).cast("double") / n.cast("double")
    )


def gopher_rules(
    c: Column | str,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """The Gopher word-level rule set as named Columns plus a composite
    0/1 ``passes`` verdict (INT, not BOOLEAN — canonicalization-proof
    across harness render paths, the validate_expectations lesson).

    Defaults are the paper's (50–100k words, mean word length 3–10,
    symbol ratio < 0.1, ≥80% alphabetic words, ≥2 stopwords); every
    bound is a keyword so short-doc corpora can recalibrate. All five
    signals are single-scan Column projections — at 100 TB this is one
    pass over the text column, no shuffle, fully codegen-resident.

    The pass comparison uses the UNROUNDED doubles: each signal is one
    integer-ratio division, bit-identical across engines, so the
    verdict replays exactly in the DuckDB oracle without a rounding
    contract on the thresholds.
    """
    col = _col(c)
    norm = normalize_text(col)
    n = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))).cast("long")
    mean_len = mean_word_length(col)
    alpha = alpha_word_ratio(col)
    symbol = symbol_word_ratio(col)
    n_stop = stopword_count(col)
    passes = (
        (n >= min_words)
        & (n <= max_words)
        & (mean_len >= min_mean_len)
        & (mean_len <= max_mean_len)
        & (symbol < max_symbol_ratio)
        & (alpha >= min_alpha_ratio)
        & (n_stop >= min_stopwords)
    ).cast("int")
    return {
        "n_words": n,
        "mean_word_len": mean_len,
        "alpha_ratio": alpha,
        "symbol_ratio": symbol,
        "n_stopwords": n_stop,
        "passes": passes,
    }


def readability_cols(c: Column | str) -> dict[str, Column]:
    """Flesch-reading-ease components as pure Column expressions:
    sentence count (terminal-punctuation runs), word count (the
    engine's whitespace tokenizer), and a syllable PROXY (vowel-group
    runs per word — the standard cheap estimator; true syllabification
    needs a dictionary). flesch = 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words), the published formula.

    Everything is regexp_count / integer arithmetic inside codegen —
    no UDF — and replays exactly in any engine with RE2-class regexes.
    Sentences and syllables floor at 1 so degenerate docs stay finite.
    """
    col = _col(c)
    n_words = token_count(col)
    n_sents = F.greatest(F.regexp_count(col, F.lit(r"[.!?]+")), F.lit(1))
    n_syll = F.greatest(
        F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+")), F.lit(1)
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sents)
        - F.lit(84.6) * (n_syll / F.greatest(n_words, F.lit(1)))
    )
    return {
        "n_words": n_words.cast("long"),
        "n_sentences": n_sents.cast("long"),
        "n_syllables": n_syll.cast("long"),
        "flesch": F.round(flesch, 4),
    }


def url_parts(c: Column | str) -> dict[str, Column]:
    """URL decomposition as pure regexp Column expressions — host,
    registrable-suffix-ish TLD (last dot-label of the host), and path
    depth — the fields web-corpus curation filters and aggregates on
    (host-level quality rollups, TLD mixes, blocklists). Regexp-only
    (no parse_url) so the identical expressions replay in any
    RE2-class engine, DuckDB included; non-URL strings yield empty
    host / tld and depth 0 rather than erroring."""
    col = _col(c)
    host = F.regexp_extract(col, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    tld = F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1)
    path = F.regexp_extract(col, r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)
    depth = F.when(path == "", F.lit(0)).otherwise(
        F.regexp_count(path, F.lit("/"))
    )
    return {"host": host, "tld": tld, "path_depth": depth.cast("long")}
