"""Reference-fixture replay: the cleaning plans against FIXTURES.md-shaped
dirty data (footnote grammar, suppressed cells, currency/thousands marks,
MM/YYYY dates) and the two views + notebook top-k over miniature tables."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as STypes

from occupation_wage_etl_spark.plans import oews, onet, views

RAW_OEWS_COLS = [
    "Occupation (SOC code)",
    "Employment(1)",
    "Employment percent relative standard error(3)",
    "Hourly mean wage()",
    "Annual mean wage(2)",
]


def raw_oews_df(spark):
    rows = [
        ("Chief Executives (11-1011)", "()2,091,480", "()0.3", "()$26.61", "()$55,350"),
        ("Dentists, General (29-1021)", "(2)12,340", "(8)-", "(4)-", "()$178,260"),
        ("Suppressed Job (13-2099)", "(8)-", "()1.1", "()$9.99", "(5)-"),
        # footer junk rows the extractor would drop positionally; the plan
        # drops them via the soc_code validity filter instead
        ("(1) Estimates for detached rows", "", "", "", ""),
        ("SOC code: Standard Occupational Classification", "", "", "", ""),
    ]
    schema = STypes.StructType(
        [STypes.StructField(c, STypes.StringType()) for c in RAW_OEWS_COLS]
    )
    return spark.createDataFrame(rows, schema)


def test_clean_oews_semantics(spark):
    got = oews.clean_oews(raw_oews_df(spark))
    # P5: footer rows filtered by validity, not position
    assert got.count() == 3
    # P1+P4: normalized names, [soc_code, occupation, *rest] order
    assert got.columns == [
        "soc_code",
        "occupation",
        "employment",
        "employment_percent_relative_std_error",
        "hourly_mean_wage",
        "annual_mean_wage",
    ]
    rows = {r["soc_code"]: r for r in got.collect()}
    ce = rows["11-1011"]
    # P3 split + F2/F3 strip + F4 typing
    assert ce["occupation"] == "Chief Executives"
    assert ce["employment"] == 2091480  # footnote + commas stripped, long
    assert ce["hourly_mean_wage"] == 26.61  # $ stripped, double
    assert ce["annual_mean_wage"] == 55350  # INT_COLUMNS → long
    de = rows["29-1021"]
    assert de["occupation"] == "Dentists, General"  # comma kept in title
    assert de["employment"] == 12340  # "(2)" footnote variant
    # F1: suppressed markers → NULL (not 0, not crash)
    assert de["employment_percent_relative_std_error"] is None
    assert de["hourly_mean_wage"] is None
    assert rows["13-2099"]["annual_mean_wage"] is None
    # schema typing matches FIXTURES.md §2
    types = dict(got.dtypes)
    assert types["employment"] == "bigint"
    assert types["hourly_mean_wage"] == "double"
    assert types["annual_mean_wage"] == "bigint"


def raw_onet_df(spark):
    rows = [
        ("11-1011.00", "Chief Executives", "Reading Comprehension", "IM", 4.12, "07/2015"),
        ("11-1011.03", "Chief Sustainability Officers", "Reading Comprehension", "LV", 4.75, "08/2025"),
        ("29-1021.00", "Dentists, General", "Science", "IM", 3.5, "02/2021"),
        ("99-9999.00", "No OEWS Match", "Science", "LV", 1.0, "13/2021"),  # bad month
    ]
    cols = ["O*NET-SOC Code", "Title", "Element Name", "Scale ID", "Data Value", "Date"]
    return spark.createDataFrame(rows, cols)


def test_clean_onet_semantics(spark):
    got = onet.clean_onet(raw_onet_df(spark))
    assert got.columns == [
        "onet_soc_code", "title", "element_name", "scale_id", "data_value", "date",
    ]
    rows = {r["onet_soc_code"]: r for r in got.collect()}
    # F5: MM/YYYY → month-start date; malformed month → NULL, no ANSI error
    assert rows["11-1011.00"]["date"] == datetime.date(2015, 7, 1)
    assert rows["11-1011.03"]["date"] == datetime.date(2025, 8, 1)
    assert rows["99-9999.00"]["date"] is None


def test_with_soc_prefix(spark):
    got = onet.with_soc_prefix(onet.clean_onet(raw_onet_df(spark)))
    pref = {r["onet_soc_code"]: r["split_onet_soc_code"] for r in got.collect()}
    assert pref["11-1011.00"] == "11-1011"
    assert pref["11-1011.03"] == "11-1011"


def _mini_warehouse(spark):
    onet_df = spark.createDataFrame(
        [
            ("11-1011.00", "Chief Executives", 4.0, 0.1, 3.8, 4.2),
            ("11-1011.03", "Chief Sustainability Officers", 3.0, 0.3, 2.5, 3.5),
            ("29-1021.00", "Dentists, General", 2.0, 0.2, 1.9, 2.1),
            ("99-9999.00", "No Match", 1.0, 0.4, 0.5, 1.5),
        ],
        ["onet_soc_code", "title", "data_value", "standard_error",
         "lower_ci_bound", "upper_ci_bound"],
    )
    oews_df = spark.createDataFrame(
        [
            ("11-1011", "Chief Executives", 55350),
            ("29-1021", "Dentists, General", 178260),
            ("53-3032", "Heavy Truck Drivers", 50340),
        ],
        ["soc_code", "occupation", "annual_mean_wage"],
    )
    return onet_df, oews_df


def test_views_and_topk(spark):
    onet_df, oews_df = _mini_warehouse(spark)

    avg = views.oews_avg_over_onet(onet_df)
    got = {r["split_onet_soc_code"]: r for r in avg.collect()}
    assert len(got) == 3  # 774-group analog: one group per prefix
    assert got["11-1011"]["mean_data_value"] == 3.5  # round(avg(4,3),2)
    assert got["11-1011"]["mean_standard_error"] == 0.2

    joined = views.onet_closest_oews(onet_df, oews_df)
    # inner join: 99-9999 has no OEWS row; 53-3032 has no O*NET rows
    assert joined.count() == 3
    # SELECT *-parity: both sides' columns present (colliding names prefixed)
    assert "title" in joined.columns and "soc_code" in joined.columns

    top = views.top_titles_by_wage(
        joined.withColumn("annual_mean_wage", F.col("annual_mean_wage").cast("double")),
        k=2,
    )
    rows = top.collect()
    assert [r["title"] for r in rows] == ["Dentists, General", "Chief Executives"]
    assert rows[0]["annual_mean_wage"] == 178260.0


def test_register_views(spark):
    onet_df, oews_df = _mini_warehouse(spark)
    views.register_views(spark, onet_df, oews_df)
    assert spark.sql("SELECT count(*) c FROM vw_onet_closest_oews").first()["c"] == 3
    assert spark.sql("SELECT count(*) c FROM vw_oews_avg_over_onet").first()["c"] == 3


def test_join_is_broadcast(spark):
    """The 736-row OEWS dim side must broadcast — at 100 TB the probe side
    never shuffles (SURVEY.md §2.5 J1)."""
    onet_df, oews_df = _mini_warehouse(spark)
    plan = views.onet_closest_oews(onet_df, oews_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
