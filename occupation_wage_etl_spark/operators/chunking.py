"""Document chunking and sequence packing for training pipelines.

- ``chunk_tokens``: overlapping fixed-size token windows per document.
  Pure projection + ``explode`` — no shuffle, no UDF; at 100 TB the
  chunk explosion happens scan-side and flows straight into the next
  stage's exchange (if any).  Token split is a plain ``\\s+`` regex so
  the DuckDB oracle (``str_split_regex`` + ``list_slice`` +
  ``generate_series``) replays it exactly.

- ``pack_sequences``: greedy first-fit packing of documents into
  fixed token budgets (sequence packing for LLM pretraining).  The
  running-capacity reset makes it non-expressible as a window
  function, so it runs as ``applyInPandas`` per group — each group's
  docs are packed in deterministic doc-id order.  Groups (e.g.
  ``source`` shards) partition the work; at scale choose a grouping
  column with enough cardinality to spread executors evenly.

Reference analogue: none; training-data extension surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode each doc into overlapping windows of ``chunk_size`` tokens.

    Chunk i covers tokens [i*stride, i*stride + chunk_size).  Documents
    with <= chunk_size tokens yield exactly one chunk.  Returns
    (id, chunk_id, chunk_text, n_tokens).
    """
    if stride <= 0 or stride > chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    toks = F.split(F.col(text_col), r"\s+")
    n = F.size(toks)
    # extra full-or-partial windows after the first: ceil((n-size)/stride)
    # in pure integer math so both engines agree on every boundary.
    extra = F.when(
        n > chunk_size,
        (n - F.lit(chunk_size) + F.lit(stride - 1)).cast("long")
        / F.lit(stride),
    ).otherwise(F.lit(0))
    n_chunks = F.floor(extra).cast("int") + 1
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        n.alias("n_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1  # 1-based for slice()
    sliced = F.slice(F.col("toks"), start, chunk_size)
    return base.select(
        "id",
        "chunk_id",
        F.array_join(sliced, " ").alias("chunk_text"),
        F.least(F.lit(chunk_size), F.col("n_toks") - start + 1).alias(
            "n_tokens"
        ),
    )


def pack_sequences(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """Greedy next-fit packing of docs into token-budget bins per group.

    Docs are visited in ascending ``id_col`` within each group; a doc
    that would overflow the current bin opens a new one.  Docs larger
    than the budget get a bin of their own.  Returns one row per doc:
    (group, id, n_tokens, bin_id, bin_fill).
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, fills = [], []
        for nt in pdf["n_tokens"]:
            if fill > 0 and fill + nt > budget:
                bin_id, fill = bin_id + 1, 0
            fill += int(nt)
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    sized = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), r"\s+")).alias("n_tokens"),
    )
    return sized.groupBy("grp").applyInPandas(
        pack, schema="grp string, id long, n_tokens int, bin_id long, bin_fill long"
    )


def denoising_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mask_pct: int = 15,
) -> DataFrame:
    """Deterministic denoising (input, target) pair synthesis — the
    T5/BART-style corruption step of a pre-training pipeline, with the
    mask decided by an md5 keyed on (doc id, token index) so every
    engine, run, and partition layout produces the SAME pairs (no RNG
    state, no seed plumbing).

    Token i of doc d is masked iff
    ``md5(d || ':' || i) (first 8 hex as int) % 100 < mask_pct``.
    ``input_text`` is the unmasked tokens re-joined; ``target_text`` is
    the masked tokens as ``i:token`` entries (position-tagged so the
    target is unambiguous without sentinel bookkeeping).

    Everything is ONE scan-side projection (SQL higher-order filter /
    transform over the token array — per-row work, zero shuffle), so it
    runs at whatever rate the scan runs.  Returns (id, n_tokens,
    n_masked, input_text, target_text).
    """
    toks = f"split(trim(regexp_replace(lower({text_col}), '\\\\s+', ' ')), ' ')"
    mask = (
        f"(x, i) -> CAST(conv(substring(md5(concat(CAST({id_col} AS STRING), "
        f"':', CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    kept = f"filter({toks}, {mask} >= {mask_pct})"
    dropped_tagged = (
        f"filter(transform({toks}, (x, i) -> named_struct('i', i, 't', x)), "
        f"s -> CAST(conv(substring(md5(concat(CAST({id_col} AS STRING), "
        f"':', CAST(s.i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 "
        f"< {mask_pct})"
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size({dropped_tagged})").cast("long").alias("n_masked"),
        F.expr(f"array_join({kept}, ' ')").alias("input_text"),
        F.expr(
            f"array_join(transform({dropped_tagged}, "
            f"s -> concat(CAST(s.i AS STRING), ':', s.t)), ' ')"
        ).alias("target_text"),
    )


_SENT_RE = r"(?<=[.!?])\s+"


def sentence_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
) -> DataFrame:
    """Sentence-aware chunking under a token budget — the RAG/pretrain
    chunker that never cuts mid-sentence: split on sentence boundaries
    (``(?<=[.!?])\\s+``), then greedily pack consecutive sentences
    into chunks of at most ``max_tokens`` whitespace tokens (a single
    over-budget sentence becomes its own chunk — truncation is the
    tokenizer's job, not the chunker's).

    ZERO-shuffle plan: the split, the greedy fold (``F.aggregate``
    with an array-of-chunks accumulator — append-or-merge-into-last
    per sentence), and the chunk explode are all scan-side row-local
    expressions; nothing leaves the task until the next stage.  The
    fold copies its accumulator per step (O(m²) in a doc's sentence
    count m) — fine at document scale, and the whole cost stays inside
    whole-stage projection.

    Returns (id, chunk [0-based], n_sentences, n_tokens, text).
    """
    sents = F.filter(
        F.transform(
            F.split(F.col(text_col), _SENT_RE), lambda s: F.trim(s)
        ),
        lambda s: s != "",
    )
    empty = F.array().cast(
        "array<struct<t:string,n:int,k:int>>"
    )
    ntok = lambda s: F.size(F.split(s, r"\s+"))  # noqa: E731

    def step(acc, s):
        n = ntok(s)
        last = F.element_at(acc, -1)
        fits = (F.size(acc) > 0) & (last["n"] + n <= max_tokens)
        merged = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    F.concat_ws(" ", last["t"], s).alias("t"),
                    (last["n"] + n).cast("int").alias("n"),
                    (last["k"] + 1).cast("int").alias("k"),
                )
            ),
        )
        appended = F.concat(
            acc,
            F.array(
                F.struct(
                    s.alias("t"),
                    n.cast("int").alias("n"),
                    F.lit(1).cast("int").alias("k"),
                )
            ),
        )
        return F.when(fits, merged).otherwise(appended)

    chunks = F.aggregate(sents, empty, step)
    out = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(chunks).alias("chunk", "__c"),
    )
    return out.select(
        F.col("__id").alias(id_col),
        "chunk",
        F.col("__c.k").alias("n_sentences"),
        F.col("__c.n").alias("n_tokens"),
        F.col("__c.t").alias("text"),
    )
