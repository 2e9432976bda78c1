"""Crawl-frontier politeness gate — the scheduling operator between
the frontier (discovered URLs, q304) and the fetcher fleet: space
each domain's requests at least ``crawl-delay`` apart, preserving
arrival order, without a central coordinator.

The recurrence is ``sched_i = max(ts_i, sched_{i-1} + delay)`` per
domain — a prefix fold, not a window function (each row depends on
the PREVIOUS OUTPUT, not a fixed frame).  Two execution modes, one
contract:

- batch (:func:`politeness_gate_batch`): per-domain
  ``sort_array(collect_list)`` + a codegen ``F.aggregate`` fold +
  ``posexplode`` — the repo's bounded-fold pattern (ewma): state is
  per-DOMAIN frontier-sized, which politeness itself bounds (a
  domain's in-flight queue is delay-rate-limited by construction, so
  the fold never sees an unbounded array at 100 TB; the shuffle is
  one hash-exchange on domain);
- streaming (:func:`streaming_politeness_gate`): the same recurrence
  as ``applyInPandasWithState`` with ONE long of state per domain
  (the last scheduled slot) — micro-batch boundaries never change the
  schedule because the fold is associative over arrival order (the
  stream==batch test plants a multi-batch split).

Reference parity: no frontier tier in the reference — north-star
crawl scope composing with robots.crawl_delay / crawl_budget (q296)
and adaptive_recrawl (q307).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_NEG_INF = -(2**62)


def _with_delay(
    requests: DataFrame,
    delays: DataFrame,
    domain_col: str,
    default_delay_s: int,
) -> DataFrame:
    d = delays.select(
        F.col(domain_col).alias("__dom"), F.col("delay_s").alias("__d")
    )
    return (
        requests.join(
            F.broadcast(d),
            requests[domain_col] == d["__dom"],
            "left",
        )
        .drop("__dom")
        .withColumn(
            "__delay", F.coalesce(F.col("__d"), F.lit(default_delay_s))
        )
        .drop("__d")
    )


def politeness_gate_batch(
    requests: DataFrame,
    delays: DataFrame,
    domain_col: str = "domain",
    ts_col: str = "ts",
    seq_col: str = "seq",
    url_col: str = "url",
    default_delay_s: int = 1,
) -> DataFrame:
    """Assign each request its earliest polite fetch slot:
    (domain, seq, url, ts, scheduled_ts, wait_s), ordered fold per
    domain over (ts, seq).  ``delays`` is (domain, delay_s) — the
    q296 ``crawl_budget``/``robots.crawl_delay`` product — broadcast
    (robots-rule-sized); unknown domains fall back to
    ``default_delay_s``.  Timestamps are integer seconds."""
    reqs = _with_delay(requests, delays, domain_col, default_delay_s)
    g = reqs.groupBy(domain_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).cast("long").alias("ts"),
                    F.col(seq_col).cast("long").alias("seq"),
                    F.col(url_col).alias("url"),
                    F.col("__delay").cast("long").alias("d"),
                )
            )
        ).alias("rs")
    )
    init = F.struct(
        F.lit(_NEG_INF).cast("long").alias("last"),
        F.array().cast(
            "array<struct<seq:bigint,url:string,ts:bigint,"
            "sched:bigint>>"
        ).alias("out"),
    )
    folded = g.select(
        domain_col,
        F.aggregate(
            "rs",
            init,
            lambda acc, r: F.struct(
                F.greatest(r["ts"], acc["last"] + r["d"]).alias("last"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            r["seq"].alias("seq"),
                            r["url"].alias("url"),
                            r["ts"].alias("ts"),
                            F.greatest(
                                r["ts"], acc["last"] + r["d"]
                            ).alias("sched"),
                        )
                    ),
                ).alias("out"),
            ),
        )["out"].alias("out"),
    )
    return folded.select(
        domain_col, F.explode("out").alias("__r")
    ).select(
        domain_col,
        F.col("__r.seq").alias("seq"),
        F.col("__r.url").alias("url"),
        F.col("__r.ts").alias("ts"),
        F.col("__r.sched").alias("scheduled_ts"),
        (F.col("__r.sched") - F.col("__r.ts")).alias("wait_s"),
    )


PG_OUT_SCHEMA = (
    "domain string, seq long, url string, ts long, "
    "scheduled_ts long, wait_s long"
)
PG_STATE_SCHEMA = StructType([StructField("last_sched", LongType())])


def streaming_politeness_gate(
    requests: DataFrame,
    delays: DataFrame,
    domain_col: str = "domain",
    ts_col: str = "ts",
    seq_col: str = "seq",
    url_col: str = "url",
    default_delay_s: int = 1,
) -> DataFrame:
    """Streaming twin of :func:`politeness_gate_batch`: the same
    per-domain recurrence with one long of state (the last scheduled
    slot), so the gate runs continuously against the live frontier.
    The delays table joins stream-static (broadcast) BEFORE the
    stateful op; within a micro-batch rows fold in (ts, seq) order,
    and the carried state makes the schedule identical to the batch
    fold whenever micro-batch boundaries respect arrival order (a
    frontier feed is ts-ordered by construction; an out-of-order
    arrival is scheduled against the state as of its ARRIVAL, which
    is the live-crawler semantics)."""
    reqs = _with_delay(requests, delays, domain_col, default_delay_s)

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (dom,) = key
        (last,) = state.get if state.exists else (_NEG_INF,)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((last,))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            [ts_col, seq_col]
        )
        out = []
        for ts, seq, url, d in zip(
            pdf[ts_col], pdf[seq_col], pdf[url_col], pdf["__delay"]
        ):
            ts, d = int(ts), int(d)
            sched = max(ts, last + d)
            out.append((int(seq), url, ts, sched, sched - ts))
            last = sched
        state.update((last,))
        yield pd.DataFrame(
            {
                "domain": [dom] * len(out),
                "seq": [r[0] for r in out],
                "url": [r[1] for r in out],
                "ts": [r[2] for r in out],
                "scheduled_ts": [r[3] for r in out],
                "wait_s": [r[4] for r in out],
            }
        )

    return reqs.groupBy(domain_col).applyInPandasWithState(
        update,
        PG_OUT_SCHEMA,
        PG_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


CR_OUT_SCHEMA = (
    "surt_key string, url string, n_captures long, n_changes long, "
    "span_s long, mean_interval_s long, est_change_interval_s long"
)
CR_STATE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("first_ts", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_captures", LongType()),
        StructField("n_changes", LongType()),
        StructField("last_digest", StringType()),
    ]
)


def streaming_change_rate(captures: DataFrame) -> DataFrame:
    """Streaming twin of :func:`sources.cdx.cdx_change_rate`: fold the
    live capture feed (surt_key, url, cdx_timestamp, digest) into the
    per-URL change statistics with O(1) state per key — (min url,
    first/last capture epoch, capture count, digest-transition count,
    last digest).  Each micro-batch emits the UPDATED aggregate row
    for every key it touched (latest row per key supersedes earlier
    emissions — the downstream adaptive-recrawl join keys on surt_key
    and reads the freshest row).  Equivalent to the batch operator
    whenever micro-batch boundaries respect capture-timestamp order,
    which an index feed is by construction.  Timestamps are the CDX
    14-digit form, folded to epoch exactly as the batch op's
    try_to_timestamp (UTC)."""
    import calendar
    import datetime

    def _epoch(ts14: str) -> int:
        dt = datetime.datetime.strptime(str(ts14), "%Y%m%d%H%M%S")
        return calendar.timegm(dt.timetuple())

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (sk,) = key
        if state.exists:
            url, first, last, ncap, nchg, ldig = state.get
        else:
            url, first, last, ncap, nchg, ldig = (
                None, None, None, 0, 0, None,
            )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((url, first, last, ncap, nchg, ldig))
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["cdx_timestamp", "digest"]
        )
        for u, ts14, dig in zip(
            pdf["url"], pdf["cdx_timestamp"], pdf["digest"]
        ):
            try:
                ts = _epoch(ts14)
            except ValueError:
                continue  # batch twin drops unparseable captures too
            url = u if url is None else min(url, u)
            first = ts if first is None else min(first, ts)
            last = ts if last is None else max(last, ts)
            if ldig is not None and dig != ldig:
                nchg += 1
            ldig = dig
            ncap += 1
        state.update((url, first, last, ncap, nchg, ldig))
        if ncap == 0:  # every row in the batch failed to parse
            return
        span = last - first
        intervals = max(ncap - 1, 1)
        yield pd.DataFrame(
            {
                "surt_key": [sk],
                "url": [url],
                "n_captures": [ncap],
                "n_changes": [nchg],
                "span_s": [span],
                "mean_interval_s": [int(span / intervals)],
                "est_change_interval_s": [
                    int(span / max(nchg, 1))
                ],
            }
        )

    return captures.groupBy("surt_key").applyInPandasWithState(
        update,
        CR_OUT_SCHEMA,
        CR_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
