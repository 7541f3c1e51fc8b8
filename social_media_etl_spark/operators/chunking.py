"""Document chunking + corpus statistics for LLM training pipelines.

Chunking splits documents into overlapping token windows — the unit
fed to tokenizer/packing stages downstream. Expressed with
``sequence`` + ``posexplode`` over the token array: pure expressions,
one generate step, no UDF; output rows ≈ n_tokens/stride per doc
regardless of document skew (a 1 GB doc becomes many rows, not one
giant row — the property that keeps downstream stages balanced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from social_media_etl_spark.functions import text as TXT

__all__ = ["chunk_documents", "top_words", "gopher_quality", "pack_chunks"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens of context between
    consecutive chunks. Returns (id, chunk_idx, n_chunk_tokens,
    chunk_text). Documents shorter than one window yield one chunk;
    empty documents yield none.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    # tokenize ONCE into a projected column and derive the window
    # starts from it — referencing TXT.tokens(text_col) in both the
    # Generate and the projection ran the regex tokenizer twice per
    # document (no subexpression elimination across operators; r8
    # review), a 2x cost on the corpus-scan hot path
    toks = df.select(F.col(id_col), TXT.tokens(text_col).alias("__toks")).filter(
        F.size("__toks") > 0
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor(
                (F.size("__toks") - F.lit(overlap) - 1) / F.lit(stride)
            ).cast("int")
            * F.lit(stride),
        ),
        F.lit(stride),
    )
    exploded = toks.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    max_tokens: int = 512,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "n_chunk_tokens",
    n_shards: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Pack chunks into training sequences of ≤ ``max_tokens`` via
    greedy sequential fill — the tokenizer-packing stage of an LLM
    pipeline.

    Greedy packing is inherently sequential, so it is SHARDED: docs
    hash into ``n_shards`` independent shards, each packed greedily
    (applyInPandas, deterministic doc/chunk order inside), and the
    emitted sequence key is (shard, seq_in_shard) — globally unique
    without cross-shard coordination. ``n_shards`` defaults to 2× the
    cluster's default parallelism (each shard is one sequential task;
    2× keeps stragglers amortized); pass it explicitly when the packing
    layout must be reproducible across differently-sized clusters.
    Waste is bounded by one underfull sequence per shard.
    Output: (shard, seq_no, id, chunk_idx, n_chunk_tokens, pos_in_seq).

    ``portable=True`` derives the shard id from md5 instead of
    xxhash64: ``conv(substr(md5('pack:' || id), 1, 4), 16, 10) %
    n_shards``. md5 is reproducible in any engine (the DuckDB oracle
    computes the identical assignment and replays each shard's greedy
    fill as a recursive CTE — same trick as ``sampling.md5_split``),
    at ~2× the hash cost; the shard layout then also survives cluster
    resizes, so use it whenever the packing must be auditable or
    byte-stable across engines/clusters.
    """
    import pandas as pd

    if n_shards is None:
        n_shards = 2 * chunks.sparkSession.sparkContext.defaultParallelism

    if portable:
        shard_expr = F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("pack:"), F.col(id_col).cast("string")
                        ).cast("binary")
                    ),
                    1,
                    4,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_shards),
        )
    else:
        shard_expr = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    sharded = chunks.withColumn("__shard", shard_expr)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        oversize = pdf[tokens_col] > max_tokens
        if oversize.any():
            # clamping would emit a sequence whose reported token sum
            # exceeds the max_tokens contract every trainer allocates
            # buffers by — refuse loudly instead (r8 review)
            bad = pdf.loc[oversize, tokens_col].max()
            raise ValueError(
                f"pack_chunks: chunk of {int(bad)} tokens exceeds "
                f"max_tokens={max_tokens} — re-chunk with "
                "chunk_tokens <= max_tokens before packing"
            )
        pdf = pdf.sort_values([id_col, idx_col], kind="mergesort")
        seq_nos, positions = [], []
        seq_no, used = 0, 0
        for n in pdf[tokens_col]:
            n = int(n)
            if used + n > max_tokens:
                seq_no += 1
                used = 0
            positions.append(used)
            seq_nos.append(seq_no)
            used += n
        out = pdf[[ "__shard", id_col, idx_col, tokens_col]].copy()
        out["seq_no"] = seq_nos
        out["pos_in_seq"] = positions
        return out

    # the id column keeps its INPUT type (r8 review: a hardcoded
    # 'long' broke string ids the portable shard hash explicitly
    # supports)
    id_type = chunks.schema[id_col].dataType.simpleString()
    out_schema = (
        f"__shard long, {id_col} {id_type}, {idx_col} long, "
        f"{tokens_col} long, seq_no long, pos_in_seq long"
    )
    return (
        sharded.groupBy("__shard")
        .applyInPandas(_pack, out_schema)
        .withColumnRenamed("__shard", "shard")
    )


def top_words(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    min_len: int = 1,
) -> DataFrame:
    """Corpus word-frequency table: top-k tokens by occurrence count
    (deterministic ties: count desc, then token asc). The explode →
    count aggregate partial-aggregates map-side, so the shuffle carries
    (token, partial count), not token occurrences. The top-k itself is
    orderBy+limit — Spark's distributed TakeOrdered (per-partition
    heap, merge of k-row candidates) — and only the k SURVIVING rows
    see the rank window; a global row_number window here would instead
    single-partition-sort every distinct token in the corpus."""
    toks = df.select(F.explode(TXT.tokens(text_col)).alias("word")).filter(
        F.length("word") >= min_len
    )
    counts = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.desc("n"), F.col("word")).limit(k)
    w = Window.orderBy(F.desc("n"), F.col("word"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "word", "n")
    )


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 10_000,
    min_avg_word_len: float = 3.0,
    max_avg_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_dup_line_ratio: float = 0.3,
) -> DataFrame:
    """Gopher-style document quality gates (Rae et al. 2021 §A1.1,
    simplified to the signals computable without a tokenizer): token
    count bounds, mean word length band, symbol-to-char ratio cap, and
    duplicate-line fraction cap. Emits one boolean per rule plus the
    conjunction (``keep``) — filter-ready, all in one codegen'd pass.
    """
    t = TXT.tokens(text_col)
    n_tok = F.size(t)
    awl = TXT.avg_token_len(text_col)
    sym = TXT.char_class_ratio(text_col, r"[#@&%$~|^\\]")
    lines = F.split(F.col(text_col), "\n")
    n_lines = F.size(lines)
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    dup_ratio = F.when(n_lines > 0, dup_lines / n_lines).otherwise(F.lit(0.0))
    ok_len = (n_tok >= min_tokens) & (n_tok <= max_tokens)
    ok_awl = (
        awl.isNotNull() & (awl >= min_avg_word_len) & (awl <= max_avg_word_len)
    )
    ok_sym = F.coalesce(sym, F.lit(0.0)) <= max_symbol_ratio
    ok_dup = dup_ratio <= max_dup_line_ratio
    return df.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        ok_len.alias("ok_token_count"),
        ok_awl.alias("ok_avg_word_len"),
        ok_sym.alias("ok_symbol_ratio"),
        ok_dup.alias("ok_dup_lines"),
        (ok_len & ok_awl & ok_sym & ok_dup).alias("keep"),
    )
