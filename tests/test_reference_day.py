"""End-to-end "reference day": the complete SURVEY §3.1+§3.3 lifecycle —
HTML fixture → clean → lake snapshot → idempotent warehouse append →
both views → notebook top-10 — on a synthetic fixture with the REAL
shape of the reference's data (SURVEY.md §1.3 [derived] cardinalities):

- oews_by_state: 736 rows, soc_code unique ``XX-XXXX``;
- onet_skills: 62,580 rows = 894 codes × 35 elements × 2 scales;
- 774 distinct SOC prefixes; 654 match an OEWS code; 768 matched codes
  → the join view has 768 × 70 = 53,760 rows and the avg view 774
  groups — the exact numbers derived from the reference's shipped data.

One test, one plan chain, asserting every derived number along the way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from occupation_wage_etl_spark.plans import oews, onet, views
from occupation_wage_etl_spark.sources import html_table, lake, warehouse

# --------------------------------------------------------------- fixture
# 856 distinct XX-XXXX codes: [0:654] matched prefixes, [654:774]
# O*NET-only prefixes, [774:856] OEWS-only codes.
CODES = [f"{10 + i % 90:02d}-{1000 + i // 90:04d}" for i in range(856)]
MATCHED, ONET_ONLY, OEWS_ONLY = CODES[:654], CODES[654:774], CODES[774:856]

N_ELEMENTS, N_SCALES = 35, 2


def _onet_codes() -> list[tuple[str, str]]:
    """(code, prefix): 114 matched + 6 unmatched prefixes carry TWO
    O*NET codes, the rest one → 894 codes (768 with a matched prefix)."""
    out = []
    for i, p in enumerate(MATCHED):
        out.append((f"{p}.00", p))
        if i < 114:
            out.append((f"{p}.01", p))
    for i, p in enumerate(ONET_ONLY):
        out.append((f"{p}.00", p))
        if i < 6:
            out.append((f"{p}.01", p))
    return out


def _wage(i: int) -> int:
    return 30_000 + (i * 37) % 70_000


def _oews_html() -> str:
    rows = []
    for i, code in enumerate(MATCHED + OEWS_ONLY):
        # reference-grammar dirty cells: footnote marks, thousands
        # separators, currency signs (FIXTURES.md)
        rows.append(
            f"<tr><td>Occupation {code} ({code})</td>"
            f"<td>(){1_000 + i:,}</td>"
            f"<td>()${_wage(i):,}</td></tr>"
        )
    rows.append("<tr><td>(1) Estimates footer junk</td><td></td><td></td></tr>")
    rows.append("<tr><td>SOC code: legend row</td><td></td><td></td></tr>")
    return (
        "<html><body><table>"
        "<thead><tr><th>Occupation (SOC code)</th><th>Employment(1)</th>"
        "<th>Annual mean wage(2)</th></tr></thead>"
        "<tbody>" + "".join(rows) + "</tbody></table></body></html>"
    )


def _raw_onet_rows() -> list[tuple]:
    rows = []
    for j, (code, _p) in enumerate(_onet_codes()):
        title = f"Occ {code}"
        for e in range(N_ELEMENTS):
            for s, scale in enumerate(("IM", "LV")):
                rows.append(
                    (
                        code,
                        title,
                        f"Skill {e:02d}",
                        scale,
                        float((j + e + s) % 7) + 0.5,
                        "07/2015" if j % 2 == 0 else "08/2025",
                    )
                )
    return rows


RAW_ONET_COLS = [
    "O*NET-SOC Code", "Title", "Element Name", "Scale ID", "Data Value", "Date",
]


def test_reference_day_lifecycle(spark, tmp_path):
    # ---- S1/S2: scrape (fixture-injected fetcher) → raw table ----
    raw_oews = html_table.fetch_and_extract(spark, lambda: _oews_html())
    # ---- P1..P5 + F1..F4: cleaning plan ----
    oews_clean = oews.clean_oews(raw_oews)
    assert oews_clean.count() == 736  # §1.3: 736 rows/snapshot
    assert oews_clean.columns == [
        "soc_code", "occupation", "employment", "annual_mean_wage",
    ]

    raw_onet = spark.createDataFrame(_raw_onet_rows(), RAW_ONET_COLS)
    onet_clean = onet.clean_onet(raw_onet)
    assert onet_clean.count() == 62_580  # §1.3: 894 × 35 × 2

    # ---- S4: lake snapshots (idempotent by partition) ----
    root = str(tmp_path / "lake")
    day = "2026-08-14"
    lake.write_snapshot(oews_clean, root, "oews_by_state", day)
    lake.write_snapshot(onet_clean, root, "onet_skills", day)
    oews_lake = lake.read_snapshot(spark, root, "oews_by_state", day).drop(
        lake.PARTITION_COL
    )
    onet_lake = lake.read_snapshot(spark, root, "onet_skills", day).drop(
        lake.PARTITION_COL
    )

    # ---- S6/S7: idempotent warehouse append (re-run ⇒ no dupes) ----
    warehouse.idempotent_append(oews_lake, "itest_oews_by_state", day)
    warehouse.idempotent_append(oews_lake, "itest_oews_by_state", day)
    assert spark.table("itest_oews_by_state").count() == 736

    # ---- V1/V2 + A1 + J1 + O1: the two views and the notebook top-k ----
    avg_view = views.oews_avg_over_onet(
        onet_lake.withColumn("standard_error", F.col("data_value") / 10)
        .withColumn("lower_ci_bound", F.col("data_value") - 1)
        .withColumn("upper_ci_bound", F.col("data_value") + 1)
    )
    assert avg_view.count() == 774  # §1.3: 774 distinct prefixes

    joined = views.onet_closest_oews(onet_lake, oews_lake)
    assert joined.count() == 53_760  # §1.3: 768 matched codes × 70

    top = views.top_titles_by_wage(joined, k=10).collect()
    assert len(top) == 10
    # expected: wages attach per PREFIX; the top titles are the codes
    # whose prefix has the highest wage (both codes of a 2-code prefix
    # share it), ties broken by title asc — computed independently here
    wages = {code: _wage(i) for i, code in enumerate(MATCHED + OEWS_ONLY)}
    expect = sorted(
        ((f"Occ {c}", wages[p]) for c, p in _onet_codes() if p in set(MATCHED)),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    assert [(r["title"], int(r["annual_mean_wage"])) for r in top] == expect
