"""Document chunking: fixed-size token windows with overlap.

The unit-of-work transform for LLM training/indexing pipelines: split
each document into ~``size``-token chunks where consecutive chunks
share ``overlap`` tokens. Built entirely from sequence/posexplode/
slice/array_join — JVM-side, no UDF; the only row growth is the
×(n_tokens/stride) chunk fan-out itself.

Scale notes: chunking is a per-row projection + explode — no shuffle.
The token array is materialized once per document (bound column) and
the per-chunk work is an O(size) slice; chunk counts per doc are small
so the HOF re-evaluation hazard (functions/text.shingles_of) does not
bite here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from awi_datapipelinepublic_spark.functions.text import normalize_text, tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 50,
    overlap: int = 10,
) -> DataFrame:
    """(id, chunk_no, chunk_text, n_chunk_tokens) — one row per chunk.

    Chunk i covers tokens [i·stride, i·stride + size) with
    stride = size − overlap; the final chunk may be short (it is never
    dropped — training pipelines dedup/filter downstream, and silent
    tail truncation is the classic data-loss bug).
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    t = (
        df.withColumn("__toks", tokens(normalize_text(text_col)))
        .select(
            id_col,
            "__toks",
            # Last start is capped at n_tokens - overlap - 1: a chunk
            # starting at or past n - overlap is a strict suffix of the
            # previous chunk (every token already covered) — emitting it
            # would duplicate training data for ~overlap/stride of
            # document lengths. greatest(.., 0) keeps chunk 0 for short
            # docs (n <= overlap), so no document is ever dropped.
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("__toks") - F.lit(overlap) - 1, F.lit(0)),
                    F.lit(stride),
                )
            ).alias("chunk_no", "__start"),
        )
    )
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return t.select(
        id_col,
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
    )


def packing_efficiency(
    df: DataFrame,
    token_col: str,
    seq_lens: tuple = (512, 1024, 2048),
    round_dp: int = 6,
) -> DataFrame:
    """Sequence-length decision table for training prep: for each
    candidate ``seq_len`` L, the padding waste of the two standard
    batch layouts over the corpus' per-document token counts —

    - chunked pad-to-max (one document per sequence, long docs split):
      n_chunks  = Σ ⌈t/L⌉ and pad_waste = 1 − Σt / (n_chunks·L);
    - concat packing (documents packed back-to-back, the
      :func:`sequence_pack` layout) lower bound:
      concat_sequences = ⌈Σt / L⌉, concat_waste likewise.

    The spread between the two columns is exactly what switching to
    packed sequences buys at that L — the table a training team reads
    before locking max_seq_len.

    Exact-integer contract: ⌈t/L⌉ = (t + L − 1) DIV L on BIGINTs (no
    float ceils), waste ratios are one double division rounded at
    ``round_dp``. Plan: the L axis is a 3-element literal explode, so
    the whole table is ONE scan + one (L)-grouped map-side-combined
    aggregate — no per-L jobs.
    """
    ls = F.explode(F.array(*[F.lit(int(l)) for l in seq_lens])).alias("seq_len")
    t = F.col(token_col).cast("bigint")
    per = df.select(t.alias("__t"), ls)
    # integer DIV inside the aggregate (the Column / operator is float
    # division — the expr form keeps the ceil exact on BIGINTs)
    agg = per.groupBy("seq_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__t").alias("total_tokens"),
        F.sum(F.expr("(__t + seq_len - 1) DIV seq_len")).cast("bigint").alias("n_chunks"),
    )
    return agg.select(
        "seq_len",
        "n_docs",
        "total_tokens",
        "n_chunks",
        (F.col("n_chunks") * F.col("seq_len")).alias("padded_slots"),
        # try_divide: an all-empty-token corpus has n_chunks = 0 —
        # waste is undefined (NULL), not an ANSI DIVIDE_BY_ZERO
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.col("total_tokens").cast("double"),
                (F.col("n_chunks") * F.col("seq_len")).cast("double"),
            ),
            round_dp,
        ).alias("pad_waste"),
        F.expr("(total_tokens + seq_len - 1) DIV seq_len").cast("bigint").alias(
            "concat_sequences"
        ),
        F.round(
            F.lit(1.0)
            - F.try_divide(
                F.col("total_tokens").cast("double"),
                (
                    F.expr("(total_tokens + seq_len - 1) DIV seq_len")
                    * F.col("seq_len")
                ).cast("double"),
            ),
            round_dp,
        ).alias("concat_waste"),
    )
