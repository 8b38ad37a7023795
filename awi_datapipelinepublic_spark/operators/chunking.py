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
