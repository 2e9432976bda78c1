"""Corpus retrieval operators (BM25 scoring / top-k search).

A training-data pipeline needs retrieval for targeted curation (pull
documents matching a topic), decontamination audits (find the corpus
docs closest to an eval query), and quality slicing.  BM25 is the
standard lexical ranking function; this implementation keeps every
stage in whole-stage codegen and shuffles only fixed-width rows.

Scale design (100 TB corpus, q query terms, q ≪ vocabulary):

- tokenize + explode is scan-fused; the (id, term) stream is filtered
  to the q query terms BEFORE any shuffle, so the heavy exchange
  carries only matching postings (≈ Σ_t df_t rows, not corpus tokens);
- document lengths aggregate map-side to one row per doc;
- global stats (N, avgdl) and per-term document frequencies are a few
  rows — broadcast;
- the final score is a fixed-order sum of per-term partial scores
  (conditional aggregation, one column per query term), which makes
  the float result independent of row/partition order — rerunnable
  bit-identically on any layout;
- top-k is TakeOrderedAndProject (no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import text as T

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 against a bag of query terms.

    idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))      (Robertson-
    Sparck Jones, always ≥ 0); score = Σ_t idf_t · tf·(k1+1) /
    (tf + k1·(1 - b + b·dl/avgdl)) with k1=1.2, b=0.75.  N counts docs
    with non-NULL text; dl counts ALL tokens of a doc.  Scores are
    rounded to 6dp (float-fold rule) and ties break by ascending id,
    so the result is total-ordered.
    """
    terms = sorted(set(query_terms))
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(T.tokens(F.col(text_col))).alias("t"),
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    navg = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double"))
        .alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("t").isin(terms))
        .groupBy("id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(navg)).select(
        "t",
        F.log(
            F.lit(1.0)
            + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
        "avgdl",
    )
    part = (
        tf.join(dl, "id")
        .join(F.broadcast(idf), "t")
        .select(
            "id",
            "t",
            (
                F.col("idf")
                * (F.col("tf") * F.lit(BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
    )
    # fixed-order sum: one conditional-agg column per term, added in
    # sorted-term order — the result never depends on row order.
    per_term = part.groupBy("id").agg(
        *[
            F.sum(F.when(F.col("t") == t, F.col("s"))).alias(f"s{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = F.lit(0.0)
    for i in range(len(terms)):
        score = score + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
    return (
        per_term.select(
            F.col("id").alias(id_col),
            F.round(score, 6).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase search via a positional inverted index — the classic
    IR structure (Manning et al., IIR ch. 2), BM25's sibling for quoted
    queries.

    Tokenize with positions, keep ONLY postings whose token appears in
    the phrase (a literal IN filter fused into the scan — the index
    touches a vanishing fraction of the corpus), then align: a posting
    matching phrase token i at position p votes for a phrase start at
    ``p - i``; a start with all ``k`` distinct votes is a hit.  Repeated
    phrase tokens are handled by letting one posting vote for every
    offset it matches (explode over matching offsets — each (start,
    offset) pair is unique, so count(*)==k is exact).

    Returns (id, n_hits, first_pos), 0-based token positions.  Shuffles
    carry (id, start) pairs only — never text.
    """
    toks = T.tokens(F.col(text_col))
    phrase_toks = phrase.split()
    k = len(phrase_toks)
    lit = F.array(*[F.lit(t) for t in phrase_toks])
    posted = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(toks).alias("pos", "tok"),
    ).filter(F.col("tok").isin(phrase_toks))
    votes = posted.select(
        "id",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.element_at(lit, i + 1) == F.col("tok"),
            )
        ).alias("off"),
        "pos",
    ).select("id", (F.col("pos") - F.col("off")).alias("start"))
    hits = (
        votes.groupBy("id", "start")
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .filter((F.col("n_votes") == k) & (F.col("start") >= 0))
    )
    return hits.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("start").alias("first_pos"),
    ).select(F.col("id").alias(id_col), "n_hits", "first_pos")


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    c: int = 60,
    k: int = 15,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (hybrid
    retrieval: lexical BM25 + semantic kNN + priors): score(id) =
    Σ_lists 1/(c + rank), ids absent from a list contribute 0 from it.

    Each input must carry (``id_col``, ``rank``) with rank ≥ 1 and is
    expected to be TOP-L BOUNDED upstream (the standard RRF formulation
    — and what keeps this a constant-size problem at corpus scale: the
    fuse works on N·L rows regardless of corpus size).  The score sums
    the lists in ARGUMENT ORDER via per-list conditional columns —
    a fixed-order float tree, engine-portable without rounding.
    """
    tagged = None
    for i, r in enumerate(rankings):
        t = r.select(
            F.col(id_col), F.lit(i).alias("__src"), F.col("rank").alias("__r")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    per_src = tagged.groupBy(id_col).agg(
        *[
            F.min(F.when(F.col("__src") == i, F.col("__r"))).alias(f"__r{i}")
            for i in range(len(rankings))
        ]
    )
    score = F.lit(0.0)
    for i in range(len(rankings)):
        score = score + F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"__r{i}").cast("double")),
            F.lit(0.0),
        )
    return (
        per_src.withColumn("rrf", score)
        .select(id_col, *[f"__r{i}" for i in range(len(rankings))], "rrf")
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
    )
