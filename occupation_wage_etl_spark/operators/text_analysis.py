"""Whole-table text-analysis operators.

The sibling expressions in ``functions.text`` (quality_score, lang_id, …)
are per-row Column forms; higher-order array functions there are
interpreted per element.  For whole-table runs over billions of docs the
operators here restructure the hot ones as explode → whole-stage-codegen
hash-aggregate: map-side partial aggregation collapses each partition to
one row per doc before any exchange, so the shuffle carries ~#docs rows
regardless of document length (same design as
``operators.dedup.simhash_fingerprints``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import text as T
from occupation_wage_etl_spark.operators._cache import cached


def lang_id_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    script_rung: bool = False,
) -> DataFrame:
    """(id, pred_lang) for every row — same semantics as
    ``functions.text.lang_id`` (stopword-hit argmax; zero hits or ties →
    'und'), restructured for throughput.

    Plan: explode tokens → per-doc conditional counts per language (one
    codegen aggregate with ``IN <10 literals>`` predicates) → argmax.
    ``tokens`` never yields an empty array (blank text → [""]), so no doc
    drops out of the aggregate.

    ``script_rung=True`` prepends ``functions.text.script_lang`` — a
    non-Latin Unicode-block verdict (zh/ja/ko/ru/el/ar/he/hi/th) beats
    the Latin stopword argmax; the codegen expression rides the same
    explode rows and folds through the SAME single aggregate
    (``first`` over a per-row constant), so the plan shape is
    unchanged: one shuffle either way.  Measured operating point: see
    the q299 audit (COVERAGE.md) — long in-table Latin text and pure
    non-Latin scripts are exact; SHORT Latin text degrades to 'und'
    (ties) or a wrong same-family pick ('de la' → es), which is the
    documented cost of a deterministic stopword heuristic."""
    codes = sorted(T.LANG_STOPWORDS)
    # script verdict is projected BELOW the explode (its own select),
    # so the 9-regex scan runs once per DOC, not once per token row
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        *(
            [T.script_lang(F.col(text_col)).alias("__script")]
            if script_rung
            else []
        ),
    )
    toks = base.select(
        "id",
        F.explode(T.tokens(F.col("__text"))).alias("t"),
        *(["__script"] if script_rung else []),
    )
    counts = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.col("t").isin(T.LANG_STOPWORDS[c]), 1).otherwise(0)
            ).alias(f"h_{c}")
            for c in codes
        ],
        *(
            [F.first("__script").alias("__script")]
            if script_rung
            else []
        ),
    )
    best = F.greatest(*[F.col(f"h_{c}") for c in codes])
    n_best = sum(
        (F.when(F.col(f"h_{c}") == best, 1).otherwise(0) for c in codes),
        start=F.lit(0),
    )
    argmax = F.lit(None).cast("string")
    # first match in sorted code order — only reached when the max is unique
    for c in reversed(codes):
        argmax = F.when(F.col(f"h_{c}") == best, F.lit(c)).otherwise(argmax)
    stop_pred = (
        F.when(best == 0, F.lit("und"))
        .when(n_best > 1, F.lit("und"))
        .otherwise(argmax)
    )
    pred = (
        F.coalesce(F.col("__script"), stop_pred)
        if script_rung
        else stop_pred
    )
    return counts.select(
        F.col("id").alias(id_col), pred.alias("pred_lang")
    )


def tfidf_top_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k tokens per document by smoothed TF-IDF.

    Two shuffles total at any scale:
      explode tokens -> count per (doc, token)        [shuffle 1]
      doc-frequency per token from the same counts    [reuses shuffle-1
        output partitioned by token after a re-key]   [shuffle 2]
      idf joined back (token-keyed broadcast when the vocabulary is
      small; hash join otherwise) -> per-doc window top-k.

    tf = occurrences in doc; idf = ln((N+1)/(df+1)) + 1 (smoothed,
    never negative or divide-by-zero).  Scores are float folds ->
    rounded to 6dp per the repo's determinism rules; ties broken by
    token text so the result is total-ordered.

    Reference analogue: none; training-data extension surface.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    idf = docfreq.crossJoin(F.broadcast(n_docs)).select(
        "token",
        (
            F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            + F.lit(1.0)
        ).alias("idf"),
    )
    scored = tf.join(idf, "token").select(
        "id",
        "token",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("tfidf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "token", "tfidf", F.col("rank").cast("long").alias("rank"))
    )


def bigram_familiarity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 3,
) -> DataFrame:
    """Language-model-style quality proxy without a language model:
    the fraction of a document's word bigrams that are "familiar" —
    i.e. occur in at least ``min_df`` distinct documents of the corpus.

    Gibberish, boilerplate-mangled, and OCR-damaged text scores low
    (its bigrams appear nowhere else); fluent in-domain text scores
    high — the same signal an n-gram LM perplexity filter extracts, but
    with *integer* corpus statistics, so the score is a single exact
    division (bit-deterministic across engines and partitionings,
    unlike a sum of per-bigram log-probs whose float fold depends on
    row order).

    Plan (two shuffles at any scale):
      explode positional bigrams → count per (doc, bigram)  [shuffle 1]
      document frequency per bigram from those counts       [shuffle 2]
      join familiarity flag back on bigram, then per-doc codegen
      hash-aggregate of (familiar occurrences, total occurrences).

    Output: (id, n_bigrams, n_familiar, familiarity) — familiarity NULL
    for docs with < 2 tokens (no bigrams).
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.when(
                F.size(T.word_ngrams(F.col(text_col), 2)) > 0,
                T.word_ngrams(F.col(text_col), 2),
            )
        ).alias("g"),
    )
    per_doc = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = per_doc.filter(F.col("g").isNotNull()).groupBy("g").agg(
        F.count(F.lit(1)).alias("df")
    )
    flagged = per_doc.join(docfreq, "g", "left")
    out = flagged.groupBy("id").agg(
        F.sum(F.when(F.col("g").isNotNull(), F.col("tf")).otherwise(0))
        .alias("n_bigrams"),
        F.sum(
            F.when(F.col("df") >= min_df, F.col("tf")).otherwise(0)
        ).alias("n_familiar"),
    )
    return out.select(
        F.col("id").alias(id_col),
        "n_bigrams",
        "n_familiar",
        F.when(
            F.col("n_bigrams") > 0,
            F.col("n_familiar") / F.col("n_bigrams"),
        ).alias("familiarity"),
    )



def cooccurrence_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int,
    k: int,
) -> DataFrame:
    """Market-basket token co-occurrence: the top-k token PAIRS by the
    number of documents containing both, with exact-ratio support —
    topic/template discovery over a corpus (the itemset-mining shape:
    A-priori's "prune items below min support BEFORE forming pairs").

    Funnel: distinct (doc, token) → document frequency per token → only
    tokens with df ≥ ``min_df`` survive (broadcast semi-join) → per-doc
    self-join forms ordered pairs (t1 < t2) → hash-agg pair counts →
    TakeOrdered top-k.  The pair expansion is quadratic ONLY in each
    doc's count of globally-frequent distinct tokens — the min_df prune
    is what bounds it at corpus scale (raise min_df as the corpus
    grows; the candidate set shrinks correspondingly).

    ``support`` = pair_docs / n_docs, one exact integer division.
    """
    from occupation_wage_etl_spark.functions import text as T

    toks = (
        docs.select(
            F.col(id_col).alias("__doc"),
            F.explode(T.tokens(F.col(text_col))).alias("tok"),
        )
        .filter(F.col("tok") != "")  # blank text yields a '' pseudo-token
        .distinct()
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    keep = freq.filter(F.col("df") >= min_df).select("tok")
    pruned = toks.join(F.broadcast(keep), "tok")

    a = pruned.select(F.col("__doc"), F.col("tok").alias("t1"))
    b = pruned.select(F.col("__doc").alias("__doc2"), F.col("tok").alias("t2"))
    pairs = a.join(
        b, (a["__doc"] == b["__doc2"]) & (a["t1"] < b["t2"])
    ).select("t1", "t2")

    counts = pairs.groupBy("t1", "t2").agg(
        F.count(F.lit(1)).alias("pair_docs")
    )
    n_docs = docs.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("__n")
    )
    scored = counts.crossJoin(F.broadcast(n_docs)).select(
        "t1", "t2", "pair_docs",
        (F.col("pair_docs") / F.col("__n")).alias("support"),
    )
    return scored.orderBy(
        F.desc("pair_docs"), F.asc("t1"), F.asc("t2")
    ).limit(k)


def topk_ngrams_per_group(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    n: int = 2,
    k: int = 5,
) -> DataFrame:
    """Top-k word n-grams per group by document frequency — the corpus
    profiling query behind boilerplate detection ("which bigrams dominate
    each language/domain slice?") and per-slice stopword lists.

    Counting is DOCUMENT frequency (each doc contributes an n-gram once
    — ``array_distinct`` before explode), so a single spammy doc can't
    own a slice's profile.  Plan: project → explode → one
    map-side-combined count aggregate on (group, gram) → per-group
    top-k via row_number window.  The window partitions by ``group_col``
    over the AGGREGATED table (cardinality = distinct grams per group,
    already collapsed), never over raw rows.  Ties: gram asc.

    Returns (group, gram, df, rank), rank 1..k.
    """
    grams = df.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.array_distinct(T.word_ngrams(F.col(text_col), n))
        ).alias("gram"),
    )
    counts = grams.groupBy("grp", "gram").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = Window.partitionBy("grp").orderBy(F.desc("df"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col), "gram", "df", "rank"
        )
    )


def dup_ngram_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-document duplicated-n-gram coverage: the fraction of a doc's
    distinct word n-grams that also occur in at least one OTHER doc —
    the fine-grained contamination metric behind Gopher/RefinedWeb-style
    "fraction of chars in duplicated n-grams" filters (pair-level
    near-dup misses partial boilerplate; this catches it).

    Plan: distinct-grams projection → explode → ONE map-side-combined
    count aggregate on the gram → join df-per-gram back to the exploded
    table (shuffle keyed on the gram) → per-doc integer ratio.  The
    ratio is an exact-integer IEEE division (bit-stable, unrounded).
    At 100 TB, key the join on a 64-bit gram hash instead of the string
    (collisions only nudge a heuristic score) — kept as the exact
    string here so the oracle is exact.

    Returns (id, n_grams, n_dup, dup_frac); docs whose text yields zero
    grams are dropped (no denominator).
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(T.word_ngrams(F.col(text_col), n))
        ).alias("gram"),
    )
    gdf = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
    return (
        grams.join(gdf, "gram")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("__df") >= 2).cast("long")).alias("n_dup"),
        )
        .select(
            "id",
            "n_grams",
            "n_dup",
            (F.col("n_dup").cast("double") / F.col("n_grams")).alias(
                "dup_frac"
            ),
        )
    )


def vocab_novelty(
    df: DataFrame,
    slice_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-growth curve across corpus slices: per slice, how many
    distinct tokens it uses and how many appear in NO earlier slice
    (slices ordered by their name) — the Heaps-law novelty signal that
    tells a crawl/data-mixing pipeline when a source stops contributing
    new vocabulary.

    Plan: distinct (slice, token) pairs — one aggregate — then the
    token's first slice via a min-aggregate on the token, joined back.
    Both shuffles carry (token, slice) only.  "Earlier" is the
    lexicographic order of ``slice_col`` (make slice names sortable —
    date-stamped snapshots already are).

    Returns (slice, n_tokens, n_new).
    """
    pairs = (
        df.select(
            F.col(slice_col).alias("slc"),
            F.explode(T.tokens(F.col(text_col))).alias("tok"),
        )
        .distinct()
    )
    first = pairs.groupBy("tok").agg(F.min("slc").alias("__first"))
    return (
        pairs.join(first, "tok")
        .groupBy("slc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("slc") == F.col("__first")).cast("long")).alias(
                "n_new"
            ),
        )
        .select(F.col("slc").alias(slice_col), "n_tokens", "n_new")
    )


def zipf_fit(
    df: DataFrame,
    text_col: str,
    top_k: int = 1000,
) -> DataFrame:
    """Zipf's-law fit over the head of the token-frequency distribution:
    OLS of ln(frequency) on ln(rank) for the ``top_k`` most frequent
    types — slope ≈ −1 is the natural-language signature; a flat slope
    flags synthetic/templated corpora, a cliff flags boilerplate floods.
    (Zipf behavior is a HEAD property; the tail bends away from the
    power law in every natural corpus, hence the rank cutoff — which is
    also what bounds the fit state, making the operator scale-free.)

    Determinism: ranks are exact (count desc, token asc ties);
    ``ln`` values round at 12dp (identical doubles cross-engine — the
    q147 rule); the five OLS moment sums run as SEQUENTIAL rank-ordered
    folds over the ≤ top_k collected terms (array_sort + aggregate —
    bit-identical to the oracle's list_reduce), and the closed-form
    slope/intercept/r² is one fixed scalar tree.  Everything after the
    type histogram is top_k-sized.

    Returns one row (n_ranks, slope, intercept, r2).
    """
    types = (
        df.select(F.explode(T.tokens(F.col(text_col))).alias("__t"))
        .filter(F.col("__t") != "")
        .groupBy("__t")
        .agg(F.count(F.lit(1)).alias("__f"))
    )
    head = (
        types.orderBy(F.desc("__f"), F.asc("__t"))
        .limit(top_k)
        .select(
            F.row_number()
            .over(Window.orderBy(F.desc("__f"), F.asc("__t")))
            .alias("__r"),
            "__f",
        )
    )
    terms = head.select(
        F.struct(
            F.col("__r").alias("r"),
            F.round(F.log(F.col("__r").cast("double")), 12).alias("x"),
            F.round(F.log(F.col("__f").cast("double")), 12).alias("y"),
        ).alias("s")
    )
    one = terms.agg(
        F.count(F.lit(1)).alias("n_ranks"),
        F.array_sort(F.collect_list("s")).alias("arr"),
    )
    fold = lambda expr: F.expr(
        f"aggregate(arr, CAST(0.0 AS DOUBLE), (acc, s) -> acc + {expr})"
    )
    sums = one.select(
        "n_ranks",
        fold("s.x").alias("sx"),
        fold("s.y").alias("sy"),
        fold("s.x * s.y").alias("sxy"),
        fold("s.x * s.x").alias("sxx"),
        fold("s.y * s.y").alias("syy"),
    )
    n = F.col("n_ranks").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    r = cov / (F.sqrt(dx) * F.sqrt(dy))
    return sums.select(
        "n_ranks",
        F.when(dx > 0, cov / dx).alias("slope"),
        F.when(dx > 0, (sy - (cov / dx) * sx) / n).alias("intercept"),
        F.when((dx > 0) & (dy > 0), r * r).alias("r2"),
    )


def pmi_table(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pointwise mutual information between two categorical columns —
    PMI(a, b) = log(N·c_ab / (c_a·c_b)) per observed cell, the
    association readout behind "which sources over-produce which
    languages" corpus-mix diagnostics (chi-square in
    ``operators/hypothesis`` answers IS there association; this says
    WHERE).

    Exactness: the log argument is a ratio of exact integer products
    (int64 — counts bounded by corpus size keep N·c_ab well under
    2⁶³); one double division then one log.  ``log`` is not
    correctly-rounded-mandated by IEEE 754, so the value is 6dp-rounded
    (the repo's standard policy for transcendental tails).

    Shape: one cell aggregate + two marginal aggregates off it (cell
    table is category²-sized, so the re-aggregation is cheap) + a
    1-row total cross-joined broadcast; marginal joins are
    category-sized.  Returns (a, b, n_both, pmi).
    """
    cells = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).alias("n_both"))
    cells = cached(cells)
    ma = cells.groupBy("a").agg(F.sum("n_both").alias("n_a"))
    mb = cells.groupBy("b").agg(F.sum("n_both").alias("n_b"))
    tot = cells.agg(F.sum("n_both").alias("n"))
    return (
        cells.join(ma, "a")
        .join(mb, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            "n_both",
            F.round(
                F.log(
                    (F.col("n") * F.col("n_both")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def readability_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flesch reading-ease per document from three regex counts — the
    classic text-difficulty screen (Flesch 1948; the quality-filter
    sibling of the length/punct heuristics in ``quality_scores``, used
    to skew training mixes toward readable prose or flag boilerplate):

        flesch = 206.835 − 1.015·(words/sentences)
                         − 84.6·(syllables/words)

    with words = alphabetic runs, sentences = ``[.!?]+`` runs (floored
    at 1 so headline-only docs stay defined), and syllables = the
    standard vowel-group approximation (runs of ``[aeiouy]``, case-
    insensitive — the portable heuristic; per-word silent-e rules are
    lexicon work, not engine work).  All three are ``regexp_count``
    scan-side projections (whole-stage codegen, no shuffle at all);
    the score is a fixed double expression tree over integers, so any
    engine reproduces it bit-for-bit without rounding.  Docs with no
    words are dropped.  Returns (id, n_words, n_sentences,
    n_syllables, flesch).
    """
    t = F.col(text_col)
    words = F.regexp_count(t, F.lit("[A-Za-z]+"))
    sylls = F.regexp_count(t, F.lit("[aeiouyAEIOUY]+"))
    sents = F.greatest(F.regexp_count(t, F.lit("[.!?]+")), F.lit(1))
    return (
        df.select(
            F.col(id_col),
            words.cast("long").alias("n_words"),
            sents.cast("long").alias("n_sentences"),
            sylls.cast("long").alias("n_syllables"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            id_col,
            "n_words",
            "n_sentences",
            "n_syllables",
            (
                F.lit(206.835)
                - F.lit(1.015)
                * (
                    F.col("n_words").cast("double")
                    / F.col("n_sentences").cast("double")
                )
                - F.lit(84.6)
                * (
                    F.col("n_syllables").cast("double")
                    / F.col("n_words").cast("double")
                )
            ).alias("flesch"),
        )
    )


def kneser_ney_doc_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under an interpolated Kneser-Ney
    BIGRAM model of the corpus (Kneser & Ney 1995; Chen & Goodman 1999
    — the smoothing inside KenLM, whose perplexity filter is the
    standard LLM-corpus quality gate).  The bigram step past
    ``unigram_cross_entropy`` catches word-salad documents whose
    unigram profile looks fine but whose transitions are corpus-alien.

        P(w|v) = (c(vw) − D)/c(v)
               + D·N₁₊(v·)/c(v) · N₁₊(·w)/N₁₊(··)        D = 3/4

    (continuation probability, not raw frequency, in the backoff — the
    defining KN idea).  Every document bigram is corpus-observed (the
    model trains on the same corpus), so the discounted term never
    clips.

    Determinism (the q161 contract): D = 0.75 is DYADIC, so c − D and
    D·N₁₊ are exact IEEE values; each probability is a fixed two-term
    double tree rounded at 12dp after ``ln``; the per-document sum is
    a sorted sequential fold over the doc's own distinct-bigram
    structs; the closing division is one IEEE op.  No corpus-sized
    float fold.

    Scale shape: tokenize + self-zip explode to (doc, bigram) — the
    row-sized shuffle; three bigram-vocabulary-sized aggregates build
    the model (counts, forward fan-out, backward fan-in — each a hash
    aggregate over the CACHED bigram-type table); one equi-join of doc
    bigram types against the model (dictionary-sized probe side, AQE
    broadcasts when it fits).  Returns (id, n_bigrams, n_bigram_types,
    kn_cross_entropy) in nats/bigram.
    """
    from occupation_wage_etl_spark.functions import text as T
    from occupation_wage_etl_spark.operators._cache import cached

    toks = df.select(
        F.col(id_col).alias("__id"), T.tokens(F.col(text_col)).alias("__a")
    )
    bi = toks.select(
        "__id",
        F.explode(
            F.filter(
                F.zip_with(
                    F.col("__a"),
                    F.slice(F.col("__a"), 2, F.greatest(
                        F.size("__a") - 1, F.lit(0))),
                    lambda v, w: F.struct(v.alias("v"), w.alias("w")),
                ),
                lambda s: (s["v"] != "") & (s["w"] != "")
                & s["w"].isNotNull(),
            )
        ).alias("__b"),
    ).select("__id", F.col("__b.v").alias("__v"), F.col("__b.w").alias("__w"))
    db = cached(
        bi.groupBy("__id", "__v", "__w").agg(F.count(F.lit(1)).alias("__c"))
    )
    # model tables off the bigram-TYPE table (rename at source — the
    # unigram_cross_entropy self-lineage note)
    types = cached(
        db.select(
            F.col("__v").alias("__mv"), F.col("__w").alias("__mw"), "__c"
        )
        .groupBy("__mv", "__mw")
        .agg(F.sum("__c").alias("__cb"))
    )
    ctx = types.groupBy("__mv").agg(
        F.sum("__cb").alias("__cv"), F.count(F.lit(1)).alias("__fwd")
    )
    bwd = types.groupBy("__mw").agg(F.count(F.lit(1)).alias("__bwd"))
    n_all = types.agg(F.count(F.lit(1)).alias("__nall"))
    model = (
        types.join(ctx, "__mv")
        .join(bwd, "__mw")
        .crossJoin(F.broadcast(n_all))
        .select(
            "__mv",
            "__mw",
            F.round(
                F.log(
                    (F.col("__cb").cast("double") - F.lit(0.75))
                    / F.col("__cv").cast("double")
                    + (F.lit(0.75) * F.col("__fwd").cast("double"))
                    / F.col("__cv").cast("double")
                    * (
                        F.col("__bwd").cast("double")
                        / F.col("__nall").cast("double")
                    )
                ),
                12,
            ).alias("__lnp"),
        )
    )
    terms = db.join(
        model,
        (db["__v"] == model["__mv"]) & (db["__w"] == model["__mw"]),
    ).select(
        "__id",
        "__c",
        F.struct(
            F.concat_ws(" ", "__v", "__w").alias("t"),
            (F.col("__c").cast("double") * F.col("__lnp")).alias("x"),
        ).alias("__s"),
    )
    per = terms.groupBy("__id").agg(
        F.sum("__c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_bigram_types"),
        F.aggregate(
            F.array_sort(F.collect_list("__s")),
            F.lit(0.0),
            lambda acc, s: acc + s["x"],
        ).alias("__sum"),
    )
    return per.select(
        F.col("__id").alias(id_col),
        "n_bigrams",
        "n_bigram_types",
        (-F.col("__sum") / F.col("n_bigrams").cast("double")).alias(
            "kn_cross_entropy"
        ),
    )


def token_f1_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-multiset overlap F1 for CANDIDATE pairs — the SQuAD-style
    answer-overlap scorer lifted to document pairs: with per-token
    counts ``cnt_a``/``cnt_b``,

        overlap = Σ_t min(cnt_a(t), cnt_b(t))
        f1      = 2·overlap / (n_a + n_b)

    The verification-tier companion to the fingerprint/LSH candidate
    generators (the same role exact-cosine plays for the banded
    embedding tiers): candidates are cheap and approximate; the F1 is
    the exact, interpretable score layered on top.

    Scale shape: ONE hash aggregate builds the (id, token, cnt) table
    (map-side combine; shuffle is token-type-sized, never raw tokens),
    then two candidate-bounded equi-joins attach both sides' counts
    and one aggregate folds the mins.  Cost is Σ_pairs |types(a)| —
    linear in candidates, never in the corpus.  ``pairs`` must be
    (id_a, id_b); pairs whose docs share no whole token keep
    overlap 0.  F1 is an exact integer ratio in one double division
    (bit-stable cross-engine); NULL when both docs are empty.

    Returns (id_a, id_b, n_a, n_b, overlap, f1).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(T.tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    tc = cached(
        toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    )
    nt = tc.groupBy("id").agg(F.sum("cnt").alias("n_tok"))
    p = pairs.select("id_a", "id_b")
    ov = (
        p.join(
            tc.select(
                F.col("id").alias("id_a"),
                "tok",
                F.col("cnt").alias("__ca"),
            ),
            "id_a",
        )
        .join(
            tc.select(
                F.col("id").alias("id_b"),
                "tok",
                F.col("cnt").alias("__cb"),
            ),
            ["id_b", "tok"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least(F.col("__ca"), F.col("__cb"))).alias("__ov"))
    )
    return (
        p.join(
            # no broadcast hint: nt is one row per DOC (corpus-sized);
            # AQE picks BHJ at test scale and SMJ at 100 TB.  LEFT joins:
            # a token-less doc (empty/NULL text) has no nt row but its
            # pairs must survive with n=0 / overlap 0 / f1 NULL.
            nt.select(F.col("id").alias("id_a"), F.col("n_tok").alias("n_a")),
            "id_a",
            "left",
        )
        .join(
            nt.select(F.col("id").alias("id_b"), F.col("n_tok").alias("n_b")),
            "id_b",
            "left",
        )
        .join(ov, ["id_a", "id_b"], "left")
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
            F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
            F.coalesce(F.col("__ov"), F.lit(0)).alias("overlap"),
            F.when(
                F.coalesce(F.col("n_a"), F.lit(0))
                + F.coalesce(F.col("n_b"), F.lit(0))
                > 0,
                (F.lit(2) * F.coalesce(F.col("__ov"), F.lit(0))).cast("double")
                / (
                    F.coalesce(F.col("n_a"), F.lit(0))
                    + F.coalesce(F.col("n_b"), F.lit(0))
                ).cast("double"),
            ).alias("f1"),
        )
    )
