"""Property tests: politeness_gate_batch vs a pure-Python fold
reference on random request sets, and the Naive Bayes scorer vs a
Python posterior computation.  Few examples — each is a Spark job."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st

from occupation_wage_etl_spark.operators import classify
from occupation_wage_etl_spark.streaming import frontier

req = st.tuples(
    st.integers(min_value=0, max_value=2),     # domain index
    st.integers(min_value=0, max_value=50),    # ts
)
reqs = st.lists(req, min_size=1, max_size=14)
delays = st.tuples(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
)


def _py_gate(rows, delay_by_dom, default):
    by_dom = defaultdict(list)
    for seq, (d, ts) in enumerate(rows):
        by_dom[d].append((ts, seq))
    out = {}
    for dom, items in by_dom.items():
        delay = delay_by_dom.get(dom, default)
        last = None
        for ts, seq in sorted(items):
            sched = ts if last is None else max(ts, last + delay)
            out[seq] = sched
            last = sched
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(reqs, delays)
def test_gate_matches_python_fold(spark, rows, ds):
    delay_by_dom = {0: ds[0], 1: ds[1]}  # domain 2 → default
    df = spark.createDataFrame(
        [
            (f"dom{d}", seq, ts, f"u{seq}")
            for seq, (d, ts) in enumerate(rows)
        ],
        "domain string, seq long, ts long, url string",
    )
    ddf = spark.createDataFrame(
        [(f"dom{k}", v) for k, v in delay_by_dom.items()],
        "domain string, delay_s long",
    )
    got = {
        r.seq: r.scheduled_ts
        for r in frontier.politeness_gate_batch(
            df, ddf, default_delay_s=3
        ).collect()
    }
    assert got == _py_gate(rows, delay_by_dom, 3)


doc = st.tuples(
    st.integers(min_value=0, max_value=1),            # class
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),
        min_size=1, max_size=5,
    ),
)


def _py_nb(rows):
    # mirror the operator's determinism contract: 12dp-rounded logs,
    # exact sums (Python floats over ≤6 terms match decimal sums here
    # because every addend is a 12dp-rounded value; compare at 6dp)
    cls_tok: Counter = Counter()
    cls_tot: Counter = Counter()
    n_docs: Counter = Counter()
    for c, toks in rows:
        n_docs[c] += 1
        for t in toks:
            cls_tok[(c, t)] += 1
            cls_tot[c] += 1
    vocab = {t for (_, t) in cls_tok}
    v = len(vocab)
    out = {}
    for i, (c, toks) in enumerate(rows):
        best = None
        for cand in sorted(n_docs):
            s = round(math.log(n_docs[cand] / len(rows)), 12)
            for t in toks:
                s += round(
                    math.log(
                        (cls_tok[(cand, t)] + 1) / (cls_tot[cand] + v)
                    ),
                    12,
                )
            s = round(s, 6)
            # struct-max semantics: (score, label) tuple max
            if best is None or (s, f"c{cand}") > best:
                best = (s, f"c{cand}")
        out[i] = (best[1], best[0])
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.lists(doc, min_size=2, max_size=8))
def test_nb_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (i, " ".join(toks), f"c{c}")
            for i, (c, toks) in enumerate(rows)
        ],
        "doc_id long, text string, label string",
    )
    got = {
        r.doc_id: (r.pred_label, r.score)
        for r in classify.naive_bayes_self_score(df).collect()
    }
    want = _py_nb(rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert abs(got[k][1] - want[k][1]) < 5e-6, (k, got[k], want[k])
