"""Property tests: connected_components vs a Python union-find reference,
and chunking coverage/reconstruction invariants.  Few hypothesis examples
(each example is a Spark job); shrinking still gives minimal counterexamples.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from occupation_wage_etl_spark.operators import chunking, graph


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical component = min member id
    comp: dict[int, int] = {}
    for v in parent:
        root = find(v)
        comp[v] = min(comp.get(root, root), v)
    # second pass: min id per root
    root_min: dict[int, int] = {}
    for v in parent:
        r = find(v)
        root_min[r] = min(root_min.get(r, v), v)
    return {v: root_min[find(v)] for v in parent}


edge = st.tuples(
    st.integers(min_value=0, max_value=15),
    st.integers(min_value=0, max_value=15),
).filter(lambda e: e[0] != e[1])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(edge, min_size=1, max_size=25))
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in graph.connected_components(df).collect()
    }
    assert got == _union_find(edges)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=40),   # n tokens
    st.integers(min_value=1, max_value=12),   # chunk size
)
def test_chunk_tokens_cover_exactly(spark, n, size):
    # stride == size: chunks partition the token sequence exactly
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunking.chunk_tokens(df, chunk_size=size, stride=size).collect(),
        key=lambda r: r["chunk_id"],
    )
    rebuilt = " ".join(r["chunk_text"] for r in rows)
    assert rebuilt == text
    assert sum(r["n_tokens"] for r in rows) == n
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=1, max_value=9),
)
def test_chunk_tokens_overlap_invariants(spark, n, size, stride):
    if stride > size:
        stride = size
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunking.chunk_tokens(df, chunk_size=size, stride=stride).collect(),
        key=lambda r: r["chunk_id"],
    )
    toks = text.split(" ")
    for r in rows:
        start = r["chunk_id"] * stride
        assert r["chunk_text"] == " ".join(toks[start : start + size])
    # every token appears in at least one chunk (full coverage)
    last = rows[-1]
    assert last["chunk_id"] * stride + last["n_tokens"] == n


def test_triangle_counts_exact(spark):
    from occupation_wage_etl_spark.operators.graph import triangle_counts

    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a pendant
    # edge (5,6) and an open wedge 7-8-9 (no triangles).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
         (5, 6), (7, 8), (8, 9)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_sentence_chunks(spark):
    from occupation_wage_etl_spark.operators import chunking

    rows = [
        (1, "One two three. Four five! Six seven eight nine? Ten."),
        (2, "Single sentence without terminator"),
        (3, "A long one two three four five six seven eight. Tiny."),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        chunking.sentence_chunks(df, max_tokens=5).collect(),
        key=lambda r: (r.doc_id, r.chunk),
    )
    as_t = [
        (r.doc_id, r.chunk, r.n_sentences, r.n_tokens, r.text)
        for r in got
    ]
    assert as_t == [
        (1, 0, 2, 5, "One two three. Four five!"),
        (1, 1, 2, 5, "Six seven eight nine? Ten."),
        (2, 0, 1, 4, "Single sentence without terminator"),
        # over-budget sentence -> its own chunk, NOT truncated
        (3, 0, 1, 10, "A long one two three four five six seven eight."),
        (3, 1, 1, 1, "Tiny."),
    ]
    # empty doc -> zero chunks (doc 4 absent)
    assert {r.doc_id for r in got} == {1, 2, 3}
