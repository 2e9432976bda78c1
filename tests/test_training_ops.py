"""Edge cases for the training-pipeline operators added alongside q35-q40
(splits, PII redaction, chunking, vocab, packing, connected components).
Corpus-level parity is covered by tests/test_oracle_parity.py; these hit
the branches the synthetic corpus never exercises.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.functions import pii
from occupation_wage_etl_spark.operators import chunking, graph, splits, vocab


def test_redact_pii_all_types(spark):
    df = spark.createDataFrame(
        [
            ("a@b.co and c.d-e%f@sub.domain.org", "<EMAIL> and <EMAIL>"),
            ("+1-800-555-1234 or 44-020-555-9999", "<PHONE> or <PHONE>"),
            ("from 192.168.0.1 to 10.0.255.254", "from <IP> to <IP>"),
            ("clean text stays clean", "clean text stays clean"),
            # email digits must not leak into phone/ip matching
            ("x 1.2.3.4 y u7@m1.io", "x <IP> y <EMAIL>"),
        ],
        "raw string, want string",
    )
    bad = df.filter(pii.redact_pii(F.col("raw")) != F.col("want")).count()
    assert bad == 0


def test_pii_counts_no_double_count(spark):
    df = spark.createDataFrame(
        [("u@e.com +1-202-555-0101 10.0.0.1",)], "raw string"
    )
    e, p, i = pii.pii_counts(F.col("raw"))
    row = df.select(
        e.alias("e"), p.alias("p"), i.alias("i")
    ).collect()[0]
    assert (row["e"], row["p"], row["i"]) == (1, 1, 1)


def test_hash_split_is_stable_and_partition_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in splits.hash_split(df, "doc_id").collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in splits.hash_split(df.repartition(13), "doc_id").collect()
    }
    assert a == b
    frac_train = sum(v == "train" for v in a.values()) / len(a)
    assert 0.75 < frac_train < 0.85  # 16-bit hash ≈ uniform


def test_stratified_sample_isolated_strata(spark):
    df = spark.createDataFrame(
        [(s, i) for s in ("x", "y") for i in range(500)],
        "source string, doc_id long",
    )
    full = splits.stratified_sample(df, "source", "doc_id", 20)
    only_x = splits.stratified_sample(
        df.filter(F.col("source") == "x"), "source", "doc_id", 20
    )
    # removing stratum y must not change stratum x's sample
    got_x = {r["doc_id"] for r in full.filter(F.col("source") == "x").collect()}
    alone_x = {r["doc_id"] for r in only_x.collect()}
    assert got_x == alone_x


def test_chunk_tokens_boundaries(spark):
    # 10 tokens, size 4, stride 3 -> starts 0,3,6 fully inside; start 9
    # covers the 1-token tail: ceil((10-4)/3)+1 = 3 chunks.
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "only three tokens"), (3, "one")],
        "doc_id long, text string",
    )
    out = chunking.chunk_tokens(df, chunk_size=4, stride=3)
    rows = {(r["id"], r["chunk_id"]): r for r in out.collect()}
    assert sum(1 for (i, _) in rows if i == 1) == 3
    assert rows[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert rows[(1, 2)]["chunk_text"] == "t6 t7 t8 t9"
    assert rows[(1, 2)]["n_tokens"] == 4
    assert rows[(2, 0)]["chunk_text"] == "only three tokens"
    assert rows[(2, 0)]["n_tokens"] == 3
    assert sum(1 for (i, _) in rows if i == 2) == 1
    assert rows[(3, 0)]["n_tokens"] == 1


def test_pack_sequences_overflow_and_oversize(spark):
    texts = {
        1: "a " * 100,   # 101 tokens (trailing empty? no: split \s+ on 'a a ... a ')
        2: "b " * 100,
        3: "c " * 100,
        4: "d " * 500,   # alone over budget -> own bin
        5: "e",
    }
    df = spark.createDataFrame(
        [("s", k, v.strip()) for k, v in texts.items()],
        "source string, doc_id long, text string",
    )
    out = chunking.pack_sequences(df, budget=256)
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["bin_id"] == rows[2]["bin_id"] == 0
    assert rows[3]["bin_id"] == 1  # 300 > 256 -> new bin
    assert rows[4]["bin_id"] == 2  # oversize doc gets its own bin
    assert rows[4]["bin_fill"] == 500
    assert rows[5]["bin_id"] == 3  # 500-bin is already over budget
    # bins never exceed budget unless a single doc does
    for r in rows.values():
        assert r["bin_fill"] <= 256 or r["n_tokens"] > 256


def test_connected_components_chain_and_star(spark):
    edges = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter > 1 iteration) + star 10-(11,12,13)
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["component"]
        for r in graph.connected_components(edges).collect()
    }
    assert {got[i] for i in (1, 2, 3, 4, 5)} == {1}
    assert {got[i] for i in (10, 11, 12, 13)} == {10}


def test_vocab_tie_break_and_truncation(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    out = {r["token"]: r for r in vocab.build_vocab(df, top_n=2).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"]["token_id"] == 1 and out["a"]["doc_freq"] == 3
    assert out["b"]["token_id"] == 2 and out["b"]["doc_freq"] == 2


def test_banded_embedding_near_dup_subset_of_brute_force(spark, sf_tiny):
    """The banded LSH tier emits a subset of the brute-force pairs (same
    cosines, id_a < id_b), and at near-dup thresholds its recall is high.
    The brute-force form stays here as the recall oracle — it must NOT be
    a registry query (O(n²) BroadcastNestedLoopJoin at scale)."""
    from occupation_wage_etl_spark.operators import dedup

    emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    banded = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_pairs_banded(
            emb, dim=64, threshold=0.4
        ).collect()
    }
    assert set(banded) <= set(brute)
    for pair, cos in banded.items():
        assert brute[pair] == cos
    # 16-plane/4-band LSH at threshold 0.4 (~66°) keeps roughly half the
    # pairs; require a sane floor so a banding bug (e.g. wrong mask) fails.
    assert len(banded) >= 0.3 * len(brute)
    # near-dup regime: every almost-parallel pair must survive banding
    near = {p for p, c in brute.items() if c >= 0.9}
    assert near <= set(banded)


# ---------------------------------------------------------------------------
# decontamination / repetition quality / domain caps
# ---------------------------------------------------------------------------


def test_contamination_hash_verified_join(spark):
    from occupation_wage_etl_spark.operators import decontaminate as D

    train = spark.createDataFrame(
        [
            (1, "a b c d e"),      # shares "b c d" with eval doc 10
            (2, "x y z w v"),      # no overlap
            (3, "b c d q b c d"),  # "b c d" twice (counted once) + "q b c"
            (4, "zz"),             # shorter than n → no grams, no row
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(10, "q b c d r"), (11, "m n o p")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_shared_grams"]
        for r in D.contamination(train, eval_df, n=3).collect()
    }
    assert got == {1: 1, 3: 2}


def test_repetition_metrics_edges(spark):
    from occupation_wage_etl_spark.operators import decontaminate as D

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),   # top token a×3/4; top bigram "a a"×2/3
            (2, "solo"),      # single token: no bigrams → NULL frac
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in D.repetition_metrics(docs).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_tok_frac"] == 3 / 4
    assert got[1]["top_bigram_frac"] == 2 / 3
    assert got[2]["n_tokens"] == 1
    assert got[2]["top_bigram_frac"] is None


def test_cap_per_group_deterministic(spark, sf_tiny):
    from occupation_wage_etl_spark.operators import decontaminate as D

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").select(
        "doc_id", "source"
    )
    a = D.cap_per_group(docs, "source", 3).collect()
    sizes = {}
    for r in a:
        sizes[r["source"]] = sizes.get(r["source"], 0) + 1
    assert all(v <= 3 for v in sizes.values())
    b = D.cap_per_group(docs, "source", 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_substring_dup_spans_islands(spark):
    from occupation_wage_etl_spark.operators import dedup

    # window=4 tiles; doc 1 and 2 share tiles "aaaa" (runs merge into
    # spans), doc 3 is unique everywhere.
    docs = spark.createDataFrame(
        [
            (1, "aaaaaaaaXXXXaaaa"),  # tiles: aaaa aaaa XXXX aaaa
            (2, "aaaabbbb"),          # tiles: aaaa bbbb
            (3, "ccccdddd"),          # tiles: cccc dddd
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.substring_dup_spans(docs, window=4).collect()}
    # doc 1: dup tiles at pos 0,1,3 ("aaaa" appears 4x corpus-wide)
    # -> islands [0,1] and [3] = 2 spans, 3 dup tiles of 4
    assert got[1]["total_tiles"] == 4
    assert got[1]["dup_tiles"] == 3
    assert got[1]["n_spans"] == 2
    assert abs(got[1]["dup_frac"] - 0.75) < 1e-12
    # doc 2: "aaaa" dup, "bbbb" unique -> 1 span, 1 of 2 tiles
    assert (got[2]["dup_tiles"], got[2]["n_spans"]) == (1, 1)
    # doc 3: clean
    assert (got[3]["dup_tiles"], got[3]["n_spans"]) == (0, 0)
    assert got[3]["dup_frac"] == 0.0


def test_semantic_dedup_drops_within_cell_only(spark):
    from occupation_wage_etl_spark.operators import dedup

    # two orthogonal centroids; ids 1,2 are near-dups in cell 0 (drop 2);
    # ids 3,4 land in cell 1 but sit at cosine ~0.85 -> both kept.
    centroids = [[1.0, 0.0], [0.0, 1.0]]
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.1]),
            (2, [1.0, 0.11]),
            (3, [0.1, 1.0]),
            (4, [-0.5, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["ivf_cell"]: r for r in
            dedup.semantic_dedup(emb, centroids, threshold=0.95).collect()}
    assert rows[0]["n_vectors"] == 2 and rows[0]["n_dropped"] == 1
    assert rows[1]["n_vectors"] == 2 and rows[1]["n_dropped"] == 0
