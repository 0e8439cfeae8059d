"""Sequence packing — how documents become fixed-size training
contexts (the last mile of every LLM data pipeline; no analogue in the
reference — SURVEY §2.8 north-star extension).

Two packing contracts, both deterministic and distributed:

- :func:`concat_chunk_plan` — the GPT-style recipe: concatenate the
  (ordered) token stream and cut fixed ``cap``-token windows; documents
  may straddle chunk boundaries. Pure window math (one cumulative sum
  per stream), fully SQL-expressible → exact DuckDB oracle.
- :func:`next_fit_bins` — no-split packing: each document lands whole
  in the current bin, a new bin opens when it would overflow. This is
  inherently a stateful left-to-right scan, so it runs as an
  Arrow-batched ``applyInPandas`` per stream — the documented UDF
  exception (per-partition sequential semantics that no built-in
  expresses) — and its DuckDB oracle is a recursive CTE that replays
  the same scan.

Parallelism contract shared by both: documents are sharded into
``n_streams`` independent streams by ``doc_id % n_streams`` and packed
per-stream in ``doc_id`` order. Packing quality is within-stream
next-fit (≈ industry practice — global optimal bin packing is NP-hard
and irrelevant at corpus scale); wall-clock scales with the widest
stream. The shuffle moves (id, n_tokens) pairs only — never text.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window

from data_quality_checks_in_relational_database_spark.operators.text import bpe_token_count


def _streamed_tokens(
    df: DataFrame, text_col: str, id_col: str, n_streams: int
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_streams).alias("stream"),
        # NULL text packs as a zero-token document (it still gets a row,
        # keeping doc accounting exact), not a NaN that breaks the scan
        F.coalesce(bpe_token_count(F.col(text_col)), F.lit(0).cast("long")).alias("n_tokens"),
    )


def concat_chunk_plan(
    df: DataFrame,
    text_col: str,
    id_col: str,
    cap: int,
    n_streams: int = 8,
) -> DataFrame:
    """Concat-and-chunk accounting: where each document lands when the
    per-stream token stream is cut into ``cap``-token windows.

    Output per document: (doc_id, stream, n_tokens, start_offset,
    chunk_first, chunk_last, is_split) — ``is_split`` marks documents
    straddling a chunk boundary (the fraction of split docs is the
    classic packing-vs-integrity tradeoff metric). Empty documents
    (0 tokens) take no space: chunk_last = chunk_first, is_split false.
    """
    toks = _streamed_tokens(df, text_col, id_col, n_streams)
    w = Window.partitionBy("stream").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    end = F.sum("n_tokens").over(w)
    start = end - F.col("n_tokens")
    last = F.when(F.col("n_tokens") > 0, (end - 1) / cap).otherwise(start / cap)
    return toks.select(
        "doc_id",
        "stream",
        "n_tokens",
        start.cast("long").alias("start_offset"),
        F.floor(start / cap).cast("long").alias("chunk_first"),
        F.floor(last).cast("long").alias("chunk_last"),
        (F.floor(last) > F.floor(start / cap)).alias("is_split"),
    )


_NF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("stream", LongType()),
        StructField("n_tokens", LongType()),
        StructField("bin_id", LongType()),
        StructField("bin_fill", LongType()),
    ]
)


def next_fit_bins(
    df: DataFrame,
    text_col: str,
    id_col: str,
    cap: int,
    n_streams: int = 8,
) -> DataFrame:
    """No-split next-fit packing per stream: documents in ``doc_id``
    order go into the current bin until the next would overflow
    ``cap``; oversized documents (> cap tokens) occupy a bin alone.

    Output per document: (doc_id, stream, n_tokens, bin_id, bin_fill)
    where bin_id counts per stream from 0 and bin_fill is the bin's
    running total AFTER this document. The scan is sequential per
    stream by construction — Arrow-batched ``applyInPandas``, grouped
    on the stream key, integer columns only.
    """
    toks = _streamed_tokens(df, text_col, id_col, n_streams)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, fills = [], []
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            if not first and fill + t > cap:
                bin_id += 1
                fill = 0
            first = False
            fill += t
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf[["doc_id", "stream", "n_tokens", "bin_id", "bin_fill"]]

    return toks.groupBy("stream").applyInPandas(_pack, _NF_SCHEMA)


def packing_summary(packed: DataFrame, cap: int) -> DataFrame:
    """Per-stream packing efficiency: (stream, n_docs, n_bins,
    n_tokens, fill_ratio) with fill_ratio = tokens / (bins * cap),
    rounded to 6 dp — the one-number packing quality metric."""
    return (
        packed.groupBy("stream")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.max("bin_id") + 1).cast("long").alias("n_bins"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("n_tokens") / ((F.max("bin_id") + 1) * cap), 6
            ).alias("fill_ratio"),
        )
    )


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """RAG-style per-document sliding-window chunking: cut each doc's
    token array into ``size``-token windows every ``stride`` tokens
    (overlap = ``size - stride``), last window allowed short.

    Chunk count is ``1 + ceil(max(n - size, 0) / stride)`` — the tail
    rule that never emits a window fully contained in the previous one.
    Zero-token docs emit nothing.

    Map-only + generate: the token array materializes once per row and
    every chunk is a ``slice`` of it — no shuffle, no re-tokenization,
    and the explode fans out bounded ``O(n_tokens / stride)`` rows per
    doc. Chunks are emitted as (md5, token count), not text, so the
    fan-out carries 48 bytes/chunk no matter the chunk size — at corpus
    scale the text-bearing variant is the same plan with ``concat_ws``
    kept instead of hashed.
    """
    from data_quality_checks_in_relational_database_spark.operators.text import tokens

    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks").cast("long"))
    # integer-exact ceil: (x + stride - 1) div stride
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(F.col("__n") - size, F.lit(0)) + (stride - 1)) / stride
    ).cast("long")
    chunked = (
        staged.filter(F.col("__n") > 0)
        .withColumn("__i", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("__chunk", F.slice(F.col("__toks"), F.col("__i") * stride + 1, size))
    )
    return chunked.select(
        F.col(id_col),
        F.col("__i").cast("long").alias("chunk_id"),
        F.size("__chunk").cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("__chunk")).cast("binary")).alias("chunk_md5"),
    )
