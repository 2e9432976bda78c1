"""Invariant tests for the round-2 additions: BM25 retrieval, bigram
familiarity, product quantization, and snapshot CDC diff.  (Oracle
parity for the q55-q58 registry queries lives in test_oracle_parity.py;
these tests pin operator semantics on constructed inputs.)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import cdc, retrieval, similarity
from occupation_wage_etl_spark.operators.text_analysis import bigram_familiarity


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    def test_matching_doc_outranks_nonmatching(self, spark):
        df = _docs(
            spark,
            [
                (1, "spark join window hash spark join"),
                (2, "completely unrelated words only here"),
                (3, "spark appears once"),
            ],
        )
        out = retrieval.bm25_topk(df, ["spark", "join"], k=3).collect()
        ids = [r.doc_id for r in out]
        assert ids[0] == 1  # most matches first
        assert set(ids[:2]) == {1, 3}  # non-matching doc scores 0, sorts last
        assert all(r.bm25 >= 0 for r in out)

    def test_k_limit_and_total_order(self, spark):
        df = _docs(spark, [(i, "spark") for i in range(10)])
        out = retrieval.bm25_topk(df, ["spark"], k=4).collect()
        # identical docs -> identical scores -> ascending-id tiebreak
        assert [r.doc_id for r in out] == [0, 1, 2, 3]


class TestBigramFamiliarity:
    def test_repeated_doc_fully_familiar(self, spark):
        rows = [(i, "the quick brown fox") for i in range(3)]
        rows.append((99, "zxqv wlrtk pmnb gggh"))
        out = {
            r.doc_id: r
            for r in bigram_familiarity(_docs(spark, rows), min_df=3).collect()
        }
        assert out[0].familiarity == 1.0  # bigrams occur in 3 docs
        assert out[99].familiarity == 0.0  # unique gibberish
        assert out[99].n_bigrams == 3

    def test_null_text_yields_null_rate(self, spark):
        out = bigram_familiarity(
            _docs(spark, [(1, None), (2, "a b")]), min_df=1
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id[1].n_bigrams == 0 and by_id[1].familiarity is None
        assert by_id[2].familiarity == 1.0


class TestPQ:
    def test_codes_match_numpy_argmin(self, spark):
        dim, n_sub, n_cent = 16, 4, 8
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(20, dim)).astype("float32")
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        got = {
            (r.id, r.m): r.c
            for r in similarity.pq_codes(
                df, dim=dim, n_sub=n_sub, n_cent=n_cent
            ).collect()
        }
        sub = dim // n_sub
        for i, v in enumerate(vecs):
            for m in range(n_sub):
                cents = np.array(
                    [
                        [
                            similarity._pq_uniform("pq", m, c, j)
                            for j in range(sub)
                        ]
                        for c in range(n_cent)
                    ]
                )
                d = ((v[m * sub : (m + 1) * sub].astype("float64") - cents) ** 2).sum(
                    axis=1
                )
                assert got[(i, m)] == int(np.argmin(d)), (i, m)

    def test_adc_topk_shape(self, spark, sf_tiny):
        emb = spark.read.parquet(f"{sf_tiny}/embeddings.parquet")
        out = similarity.pq_adc_topk(emb, dim=64, k=5).collect()
        assert len(out) == 5
        assert all(len(r.pq_code.split("-")) == 8 for r in out)
        adcs = [r.adc for r in out]
        assert adcs == sorted(adcs)


class TestSnapshotDiff:
    def test_insert_update_delete_and_null_safety(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
            "k long, s string, v long",
        )
        new = spark.createDataFrame(
            [(2, "b", 21), (3, "c", 30), (4, "d", 40), (5, "e", 50)],
            "k long, s string, v long",
        )
        out = {
            r.k: r
            for r in cdc.snapshot_diff(old, new, "k", ["s", "v"]).collect()
        }
        assert out[1].change_type == "delete"
        assert out[5].change_type == "insert"
        assert out[2].change_type == "update" and out[2].changed_cols == "v"
        # NULL -> value is a change under null-safe compare
        assert out[3].change_type == "update" and out[3].changed_cols == "s"
        assert 4 not in out  # unchanged rows never materialize


class TestEncodeCorpus:
    def test_roundtrip_ids_and_oov(self, spark):
        from occupation_wage_etl_spark.operators import vocab as V

        docs = spark.createDataFrame(
            [(1, "a b a c"), (2, "zz a"), (3, None)],
            "doc_id long, text string",
        )
        voc = V.build_vocab(docs, top_n=2)  # keeps 'a' (df 2) and ... 'b'/'c'/'zz' df 1 -> 'b' by tiebreak
        out = {r.doc_id: r for r in V.encode_corpus(docs, voc).collect()}
        vmap = {r.token: r.token_id for r in voc.collect()}
        assert out[1].n_tokens == 4
        ids1 = [int(x) for x in out[1].ids.split(",")]
        assert ids1 == [vmap["a"], vmap.get("b", 0), vmap["a"], vmap.get("c", 0)]
        assert out[1].n_oov == sum(1 for i in ids1 if i == 0)
        assert out[2].n_oov == 1  # 'zz' out of top-2 vocab
        assert out[3].n_tokens == 0 and out[3].ids == ""


class TestSampleToBudget:
    def test_rates_and_determinism(self, spark):
        from occupation_wage_etl_spark.operators.splits import sample_to_budget

        rows = [(i, "big" if i < 80 else "small", 100) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        # budget 4000 over 2 groups -> 2000/group: big (8000) rate .25,
        # small (2000) keeps everything
        out = sample_to_budget(df, "source", "n_chars", 4000)
        a = out.collect()
        b = sample_to_budget(df.repartition(7), "source", "n_chars", 4000).collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
        by_src = {}
        for r in a:
            by_src.setdefault(r.source, []).append(r)
        assert all(r.keep_rate == 1.0 for r in by_src["small"])
        assert len(by_src["small"]) == 20  # rate 1 keeps all
        assert all(r.keep_rate == 0.25 for r in by_src["big"])
        # unbiased hash sampling: expect ~20 of 80, generous tolerance
        assert 8 <= len(by_src["big"]) <= 36


class TestNgramPrefixFilter:
    def test_prefix_tier_equals_count_tier(self, spark, sf_tiny):
        from occupation_wage_etl_spark.operators import dedup

        docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
        a = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs(docs, block_col="lang").collect()
        )
        b = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs(
                docs, block_col="lang", prefix_filter=True
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_shared_gram_table_matches_default(self, spark, sf_tiny):
        """A shingle_table() shared across both funnels (q124's r12
        shape — one parse pass) must reproduce the default per-operator
        parse exactly, for both minhash_lsh_pairs and
        ngram_jaccard_pairs."""
        from pyspark.sql import functions as F

        from occupation_wage_etl_spark.operators import dedup

        docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
        shared = dedup.shingle_table(docs, extra_cols=("lang",))

        mh_default = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.minhash_lsh_pairs(docs).collect()
        )
        mh_shared = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.minhash_lsh_pairs(
                docs,
                shingled=shared.select(
                    "id", F.col("grams").alias("shingles")
                ),
            ).collect()
        )
        assert mh_default == mh_shared and len(mh_shared) > 0

        ng_default = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs(docs, block_col="lang").collect()
        )
        ng_shared = sorted(
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs(
                docs,
                block_col="lang",
                gram_table=shared.select(
                    "id", "grams", F.col("lang").alias("block")
                ),
            ).collect()
        )
        assert ng_default == ng_shared and len(ng_shared) > 0

    def test_stop_gram_corpus(self, spark):
        """Every doc shares one universal phrase; prefixes exclude it, so
        the join fans out on rare grams only — result still exact."""
        from occupation_wage_etl_spark.operators import dedup

        common = "the common header line every page has"
        rows = [(i, f"{common} unique tail {i} {i+1} {i+2}") for i in range(30)]
        rows += [(100, f"{common} unique tail 0 1 2")]  # true near-dup of doc 0
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard_pairs(df, threshold=0.9).collect()
        )
        b = sorted(
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard_pairs(
                df, threshold=0.9, prefix_filter=True
            ).collect()
        )
        assert a == b
        assert (0, 100) in b


class TestHashedLinearScore:
    def test_logit_matches_python_replay(self, spark):
        import hashlib

        from occupation_wage_etl_spark.operators.curation import (
            _weight_int,
            hashed_linear_score,
        )

        docs = spark.createDataFrame(
            [(1, "alpha beta gamma alpha"), (2, None), (3, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in hashed_linear_score(docs).collect()}
        # python replay of doc 1
        toks = "alpha beta gamma alpha".split()
        s = 0
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1024
            s += _weight_int("qw", b, 1000)
        assert out[1].n_tokens == 4
        assert out[1].logit == s / (1000.0 * 4)
        assert out[1].keep == (out[1].logit > 0)
        assert out[2].logit is None and out[2].n_tokens == 0
        # empty text tokenizes to [""] -> one token, scored
        assert out[3].n_tokens == 1


class TestSnapshotDiffRoundtrip:
    def test_apply_delta_reconstructs_new(self, spark):
        """Property: new == (old minus deletes/updates) + (update/insert
        payloads from the new side). Exercised over a generated pair of
        snapshots with all four row fates."""
        from pyspark.sql import functions as F

        from occupation_wage_etl_spark.operators import cdc

        n = 500
        base = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 17).cast("string").alias("s"),
            (F.col("id") * 3).alias("v"),
        )
        old = base.filter(F.col("k") % 11 != 0)            # %11 → inserts
        new = base.filter(F.col("k") % 13 != 0).select(    # %13 → deletes
            "k",
            F.when(F.col("k") % 7 == 0, F.lit("CHANGED")).otherwise(F.col("s")).alias("s"),
            F.when(F.col("k") % 5 == 0, F.col("v") + 1).otherwise(F.col("v")).alias("v"),
        )
        delta = cdc.snapshot_diff(old, new, "k", ["s", "v"])

        # apply: drop deleted+updated keys from old, add new-side payloads
        touched = delta.filter(F.col("change_type").isin("delete", "update", "insert"))
        gone = touched.select("k")
        add = new.join(
            delta.filter(F.col("change_type").isin("update", "insert")).select("k"),
            "k",
            "semi",
        )
        rebuilt = old.join(gone, "k", "anti").unionByName(add)

        got = sorted(tuple(r) for r in rebuilt.collect())
        want = sorted(tuple(r) for r in new.collect())
        assert got == want


class TestGroupDrift:
    def test_flags_shifted_and_missing_groups(self, spark):
        from occupation_wage_etl_spark.operators.profile import group_drift

        old = spark.createDataFrame(
            [("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", 7.0)],
            "g string, v double",
        )
        new = spark.createDataFrame(
            [("a", 10.0), ("a", 20.0), ("b", 105.0), ("d", 1.0)],
            "g string, v double",
        )
        out = {r.g: r for r in group_drift(old, new, "g", "v", 50.0).collect()}
        assert not out["a"].drifted and out["a"].mean_delta == 0.0
        assert out["b"].drifted and out["b"].mean_delta == 100.0
        assert out["c"].drifted and out["c"].mean_new is None  # vanished
        assert out["d"].drifted and out["d"].mean_old is None  # appeared
        assert out["d"].n_old == 0 and out["d"].n_new == 1


class TestContrastiveFunnelRetention:
    def test_contrastive_invariants(self, spark):
        from occupation_wage_etl_spark.operators.decontaminate import (
            contrastive_pairs,
        )

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(20)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (3, 4)], "id_a long, id_b long"
        )
        out = contrastive_pairs(docs, pairs, n_negatives=3).collect()
        assert 0 < len(out) <= 6
        for r in out:
            assert r.negative != r.anchor and r.negative != r.positive
            assert (r.anchor, r.negative) not in {(1, 2), (2, 1), (3, 4), (4, 3)}
        # determinism under repartition
        again = contrastive_pairs(
            docs.repartition(5), pairs, n_negatives=3
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_funnel_strict_order(self, spark):
        from occupation_wage_etl_spark.streaming.events import funnel_conversion

        def ts(m):
            import datetime

            return datetime.datetime(2026, 1, 1, 0, m)

        rows = [
            (1, "view", ts(0)), (1, "click", ts(1)), (1, "purchase", ts(2)),
            (2, "view", ts(0)),                      # stops after view
            (3, "click", ts(0)), (3, "view", ts(1)), # click BEFORE view
            (3, "purchase", ts(2)),                  # no qualifying click
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
        out = {r.step: r for r in funnel_conversion(df, ["view", "click", "purchase"]).collect()}
        assert out["view"].n_users == 3
        assert out["click"].n_users == 1          # only user 1 clicks after view
        assert out["purchase"].n_users == 1
        assert out["click"].conversion_from_prev == 1 / 3

    def test_retention_matrix(self, spark):
        from occupation_wage_etl_spark.streaming.events import cohort_retention

        import datetime

        def wk(n, u):
            return (u, datetime.datetime(2026, 1, 5) + datetime.timedelta(weeks=n))

        rows = [wk(0, 1), wk(1, 1), wk(0, 2), wk(2, 2), wk(0, 3)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        out = {
            (r.weeks_later): r
            for r in cohort_retention(df, max_offset_weeks=3).collect()
        }
        assert out[0].cohort_size == 3 and out[0].n_active == 3
        assert out[1].n_active == 1 and out[1].retention == 1 / 3
        assert out[2].n_active == 1


def test_apply_delta_to_agg_matches_recompute(spark):
    from decimal import Decimal
    from occupation_wage_etl_spark.operators import cdc

    # old snapshot: groups a(2 rows), b(1 row)
    old = spark.createDataFrame(
        [(1, "a", Decimal("1.00")), (2, "a", Decimal("2.00")),
         (3, "b", Decimal("5.00"))],
        "k long, g string, v decimal(12,2)",
    )
    # new: delete key 3 (group b now empty -> dropped), move key 2 a->c,
    # bump key 1 in place, insert key 4 into c
    new = spark.createDataFrame(
        [(1, "a", Decimal("1.50")), (2, "c", Decimal("2.00")),
         (4, "c", Decimal("7.00"))],
        "k long, g string, v decimal(12,2)",
    )
    old_agg = old.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("total")
    )
    delta = cdc.delta_rows(old, new, "k", ["g", "v"])
    got = {
        r["g"]: (r["n_rows"], r["total"])
        for r in cdc.apply_delta_to_agg(old_agg, delta, "g", "v").collect()
    }
    want = {
        r["g"]: (r["n_rows"], r["total"])
        for r in new.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("total"))
        .collect()
    }
    assert set(got) == set(want) == {"a", "c"}  # b dropped at count 0
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == want[g][1]


def test_delta_rows_images(spark):
    from occupation_wage_etl_spark.operators import cdc

    old = spark.createDataFrame([(1, "x"), (2, "y")], "k long, c string")
    new = spark.createDataFrame([(2, "z"), (3, "w")], "k long, c string")
    rows = {r["k"]: r for r in cdc.delta_rows(old, new, "k", ["c"]).collect()}
    assert rows[1]["change_type"] == "delete" and rows[1]["old_c"] == "x"
    assert rows[2]["change_type"] == "update" and (rows[2]["old_c"], rows[2]["new_c"]) == ("y", "z")
    assert rows[3]["change_type"] == "insert" and rows[3]["new_c"] == "w"


def test_phrase_search_alignment_and_repeats(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat sat mat"),   # "the cat sat" x2? pos 0 and... tokens: the cat sat on the cat sat mat -> hits at 0 and 4
            (2, "cat the sat"),                       # all tokens, wrong order
            (3, "the cat"),                           # truncated phrase
            (4, "x the cat sat"),                     # hit at start 1
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"]) for r in
           retrieval.phrase_search(docs, "the cat sat").collect()}
    assert got == {1: (2, 0), 4: (1, 1)}


def test_phrase_search_repeated_token_phrase(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a b b a")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["first_pos"]) for r in
           retrieval.phrase_search(docs, "a b a").collect()}
    assert got == {1: (2, 0)}  # overlapping hits at 0 and 2 both count


def test_scd2_history_runs_and_nulls(spark):
    from datetime import datetime
    from occupation_wage_etl_spark.operators import cdc

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    df = spark.createDataFrame(
        [
            (1, "a", t(1), 100), (1, "a", t(2), 101),  # run collapses
            (1, "b", t(3), 102), (1, "a", t(4), 103),  # back to a = new version
            (2, None, t(1), 200), (2, None, t(2), 201),  # NULL run: ONE version
            (2, "x", t(3), 202),
        ],
        "k long, attr string, ts timestamp, eid long",
    )
    rows = sorted(
        (r["k"], r["version"], r["value"], r["valid_to"] is None)
        for r in cdc.scd2_history(df, "k", "attr", "ts", "eid").collect()
    )
    assert rows == [
        (1, 1, "a", False), (1, 2, "b", False), (1, 3, "a", True),
        (2, 1, None, False), (2, 2, "x", True),
    ]
