"""Tests for market-basket rules, item-item CF (operators/recommend.py)
and the local clustering coefficient (operators/graph.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from occupation_wage_etl_spark.operators import graph, recommend

# baskets: items x/y always together, z independent, w rare
BASKETS = [
    (1, "x"), (1, "y"), (1, "z"),
    (2, "x"), (2, "y"),
    (3, "x"), (3, "y"), (3, "w"),
    (4, "z"),
    (5, "x"), (5, "y"), (5, "z"),
    (6, "z"), (6, "w"),
]


def test_association_rules_counts_and_lift(spark):
    df = spark.createDataFrame(BASKETS, "b long, i string")
    out = recommend.association_rules(
        df, "b", "i", min_pair_support=2, k=10
    ).collect()
    rules = {(r["antecedent"], r["consequent"]): r for r in out}
    # x,y co-occur in 4 of 6 baskets; n(x)=n(y)=4
    r = rules[("x", "y")]
    assert r["pair_baskets"] == 4
    assert r["confidence"] == 4 / 4
    assert r["lift"] == (4 * 6) / (4 * 4)
    # directional: both orientations present, confidence symmetric here
    assert ("y", "x") in rules
    # w pairs never reach support 2 with x -> absent
    assert ("w", "x") not in rules


def test_association_rules_basket_cap_drops_large(spark):
    rows = BASKETS + [(9, c) for c in "abcdefg"]  # basket of 7 items
    df = spark.createDataFrame(rows, "b long, i string")
    out = recommend.association_rules(
        df, "b", "i", min_pair_support=2, k=100, max_basket=5
    ).collect()
    items = {r["antecedent"] for r in out} | {r["consequent"] for r in out}
    assert not (items & set("abcdefg"))


def test_item_item_cf_cosine_exact(spark):
    df = spark.createDataFrame(BASKETS, "b long, i string")
    out = recommend.item_item_cf(
        df, "b", "i", min_users=2, n_neighbors=2
    ).collect()
    got = {(r["item"], r["neighbor"]): r for r in out}
    # |U(x)∩U(y)|=4, |U(x)|=4, |U(y)|=4 -> cos=1.0 and it is x's rank-1
    r = got[("x", "y")]
    assert r["n_both"] == 4 and r["cosine"] == 1.0 and r["rank"] == 1
    # z: bought in {1,4,5,6}; overlap with x = {1,5} -> 2/sqrt(4*4)
    r = got[("z", "x")]
    assert r["cosine"] == 2 / math.sqrt(16)
    # bounded neighbors per item
    per_item = {}
    for (it, _), r in got.items():
        per_item[it] = max(per_item.get(it, 0), r["rank"])
    assert all(v <= 2 for v in per_item.values())


def test_clustering_coefficient_triangle_plus_tail(spark):
    # triangle 1-2-3 plus a pendant 3-4: node 3 has d=3, t=1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    out = {r["node"]: r for r in graph.clustering_coefficient(edges).collect()}
    assert out[1]["coeff"] == 1.0 and out[1]["n_triangles"] == 1
    assert out[2]["coeff"] == 1.0
    assert out[3]["degree"] == 3 and out[3]["n_triangles"] == 1
    assert out[3]["coeff"] == 2 * 1 / (3 * 2)
    assert 4 not in out  # degree-1 node excluded


def test_clustering_coefficient_star_is_zero(spark):
    hub = [(1, k) for k in range(2, 7)]
    edges = spark.createDataFrame(hub, "id_a long, id_b long")
    out = {r["node"]: r for r in graph.clustering_coefficient(edges).collect()}
    assert out[1]["n_triangles"] == 0 and out[1]["coeff"] == 0.0
    assert set(out) == {1}  # leaves have degree 1
