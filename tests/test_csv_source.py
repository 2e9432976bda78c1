"""Tests for the CSV source with schema enforcement and
corrupt-record quarantine (sources/csv_source.py)."""

from __future__ import annotations

from occupation_wage_etl_spark.sources import csv_source


def test_csv_roundtrip_and_quarantine(spark, tmp_path):
    raw = tmp_path / "in"
    raw.mkdir()
    (raw / "part1.csv").write_text(
        "id,name,price\n"
        "1,widget,9.50\n"
        "2,gadget,12.00\n"
        "oops,not_a_long,xx\n"  # id fails LONG cast -> quarantined
        "3,sprocket,1.25\n"
    )
    good, quarantine = csv_source.read_csv(
        spark, str(raw), "id LONG, name STRING, price DOUBLE"
    )
    rows = {r["id"]: (r["name"], r["price"]) for r in good.collect()}
    assert rows == {
        1: ("widget", 9.5),
        2: ("gadget", 12.0),
        3: ("sprocket", 1.25),
    }
    q = quarantine.collect()
    assert len(q) == 1 and q[0]["raw_line"].startswith("oops")


def test_csv_write_then_read_back(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a,b", 2.5), (2, 'q"x', 0.5)], "id long, s string, v double"
    )
    out = str(tmp_path / "out")
    csv_source.write_csv(df, out)
    good, quarantine = csv_source.read_csv(
        spark, out, "id LONG, s STRING, v DOUBLE"
    )
    assert quarantine.count() == 0
    got = {r["id"]: (r["s"], r["v"]) for r in good.collect()}
    assert got == {1: ("a,b", 2.5), 2: ('q"x', 0.5)}


def test_csv_custom_separator(spark, tmp_path):
    raw = tmp_path / "tsv"
    raw.mkdir()
    (raw / "p.tsv").write_text("id\tname\n1\talpha\n2\tbeta\n")
    good, quarantine = csv_source.read_csv(
        spark, str(raw), "id LONG, name STRING", sep="\t"
    )
    assert quarantine.count() == 0
    assert {r["name"] for r in good.collect()} == {"alpha", "beta"}
