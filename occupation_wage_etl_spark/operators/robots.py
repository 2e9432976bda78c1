"""robots.txt parsing + allow/deny evaluation — the crawl-politeness
side of the web-ingest surface (every crawler materializes per-host
rule tables and joins candidate URLs against them before fetching).

Grammar contract (RFC 9309 subset, deterministic and documented):

- lines are ``Field: value`` records; ``#`` comments stripped; field
  names case-insensitive;
- groups are separated by BLANK lines (the universal layout);
  ``User-agent`` lines in a group bind that group's ``Allow`` /
  ``Disallow`` / ``Crawl-delay`` rules to those agents (cartesian
  within the group — multiple UA lines share the rules);
- ``Sitemap`` is group-independent (emitted with NULL agent);
- rule matching is PLAIN PREFIX match (RFC 9309 §2.2.2 without the
  ``*``/``$`` wildcard extension — documented bound); longest match
  wins, tie → Allow (the RFC's least-restrictive tie-break), no
  match → allowed.

Everything is codegen Column expressions: line split + posexplode,
one per-document window (robots files are KB-sized — the window
partitions on the doc key, never globally), one bounded join.

Reference analogue: none; LLM-training-data extension surface
(pairs with sources/warc.py and functions/url.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RULE_FIELDS = ("allow", "disallow", "crawl-delay")


def robots_rules(
    df: DataFrame,
    text_col: str = "robots_txt",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, agent, rule_type, value) rows — group-scoped allow/
    disallow/crawl-delay plus agentless sitemap entries."""
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__pos", "__raw"
        ),
    )
    ln = F.trim(F.regexp_replace(F.col("__raw"), "#.*$", ""))
    w = Window.partitionBy("__id").orderBy("__pos")
    parsed = (
        lines.withColumn("__ln", ln)
        .withColumn(
            "__blk",
            F.sum(
                F.when(F.col("__ln") == "", 1).otherwise(0)
            ).over(w),
        )
        .filter(F.col("__ln") != "")
        .select(
            "__id",
            "__blk",
            F.lower(
                F.regexp_extract(F.col("__ln"), r"^([A-Za-z-]+)\s*:", 1)
            ).alias("__field"),
            F.trim(
                F.regexp_extract(F.col("__ln"), r":\s*(.*)$", 1)
            ).alias("__value"),
        )
        .filter(F.col("__field") != "")
    )
    agents = parsed.filter(F.col("__field") == "user-agent").select(
        "__id", "__blk", F.col("__value").alias("agent")
    )
    rules = parsed.filter(
        F.col("__field").isin(list(_RULE_FIELDS))
    ).select(
        "__id", "__blk",
        F.col("__field").alias("rule_type"),
        F.col("__value").alias("value"),
    )
    grouped = agents.join(rules, ["__id", "__blk"]).select(
        F.col("__id").alias(id_col), "agent", "rule_type", "value"
    )
    sitemaps = parsed.filter(F.col("__field") == "sitemap").select(
        F.col("__id").alias(id_col),
        F.lit(None).cast("string").alias("agent"),
        F.lit("sitemap").alias("rule_type"),
        F.col("__value").alias("value"),
    )
    return grouped.unionByName(sitemaps)


def robots_is_allowed(
    rules: DataFrame,
    urls: DataFrame,
    agent: str = "*",
    id_col: str = "doc_id",
    path_col: str = "path",
) -> DataFrame:
    """Evaluate each (id, path) against the id's rules for ``agent``
    (exact-agent group if one exists, else the ``*`` group —
    RFC 9309's exclusive group selection): longest prefix match wins,
    tie → allow, no match → allowed.  Returns (id, path, allowed,
    matched_rule, matched_len).  One equi-join on the doc key + one
    struct-max aggregate — no window."""
    r = rules.filter(
        F.col("rule_type").isin(["allow", "disallow"])
        & F.col("agent").isin([agent, "*"])
    ).select(
        F.col(id_col).alias("__rid"),
        F.col("agent").alias("__agent"),
        F.col("rule_type").alias("__rt"),
        F.col("value").alias("__rule"),
    )
    # exclusive group selection: keep '*' rules only for ids with no
    # exact-agent group (vacuous when agent == '*')
    if agent != "*":
        has_exact = (
            r.filter(F.col("__agent") == agent)
            .select("__rid").distinct()
            .withColumn("__has", F.lit(1))
        )
        r = (
            r.join(F.broadcast(has_exact), "__rid", "left")
            .filter(
                (F.col("__agent") == agent)
                | F.col("__has").isNull()
            )
            .drop("__has")
        )
    u = urls.select(
        F.col(id_col).alias("__uid"), F.col(path_col).alias("__path")
    )
    cand = u.join(r, u["__uid"] == r["__rid"], "left").withColumn(
        "__hit",
        F.col("__rule").isNotNull()
        & (F.col("__rule") != "")
        & F.col("__path").startswith(F.col("__rule")),
    )
    best = cand.groupBy("__uid", "__path").agg(
        F.max(
            F.when(
                F.col("__hit"),
                F.struct(
                    F.length("__rule").alias("len"),
                    (F.col("__rt") == "allow").alias("is_allow"),
                    F.col("__rule").alias("rule"),
                ),
            )
        ).alias("__best")
    )
    return best.select(
        F.col("__uid").alias(id_col),
        F.col("__path").alias(path_col),
        F.coalesce(F.col("__best.is_allow"), F.lit(True)).alias(
            "allowed"
        ),
        F.col("__best.rule").alias("matched_rule"),
        F.col("__best.len").alias("matched_len"),
    )


def sitemap_entries(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    id_col: str = "doc_id",
    max_entries: int = 50_000,
) -> DataFrame:
    """Parse sitemap.org XML — both ``<urlset>`` (page entries with
    loc/lastmod/changefreq/priority) and ``<sitemapindex>`` (nested
    sitemap pointers) — into (id, kind, ordinal, loc, lastmod,
    changefreq, priority) rows.  ``max_entries`` mirrors the protocol's
    own 50k-URL cap.  Scan-side ``mapInPandas`` (stdlib etree), zero
    shuffles — the discovery companion to :func:`robots_rules`'
    Sitemap lines."""
    import xml.etree.ElementTree as ET
    from collections.abc import Iterator

    import pandas as pd

    ns = "{http://www.sitemaps.org/schemas/sitemap/0.9}"
    schema = (
        f"{id_col} long, kind string, ordinal int, loc string, "
        "lastmod string, changefreq string, priority double"
    )
    cols = [
        id_col, "kind", "ordinal", "loc", "lastmod", "changefreq",
        "priority",
    ]

    def _field(el, name):
        c = el.find(ns + name)
        return None if c is None or c.text is None else c.text.strip()

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for rid, xml_text in zip(batch[id_col], batch[xml_col]):
                try:
                    root = ET.fromstring(str(xml_text or ""))
                except ET.ParseError:
                    continue  # malformed sitemap: skip, never fail
                kind = (
                    "url"
                    if root.tag == ns + "urlset"
                    else "sitemap"
                    if root.tag == ns + "sitemapindex"
                    else None
                )
                if kind is None:
                    continue
                child = ns + ("url" if kind == "url" else "sitemap")
                for k, el in enumerate(root.findall(child)):
                    if k >= max_entries:
                        break
                    pr = _field(el, "priority")
                    rows.append(
                        (
                            int(rid), kind, k, _field(el, "loc"),
                            _field(el, "lastmod"),
                            _field(el, "changefreq"),
                            float(pr) if pr is not None else None,
                        )
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, xml_col).mapInPandas(_run, schema=schema)
