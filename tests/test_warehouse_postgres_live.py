"""LIVE PostgreSQL warehouse dialect test (sources/pgwire.py).

The sandbox ships real Postgres 15 server binaries (no JDBC jar, no
Python driver) — this module boots a throwaway cluster in a temp dir
(as the ``postgres`` OS user, trust auth, unix socket only) and
EXECUTES the reference's exact warehouse dialect
(``pipeline/load_data.py:152-213``: CREATE TABLE IF NOT EXISTS with
Postgres types + append INSERTs) through the pure-Python wire client,
with executor-parallel partition writes — closing the one
reference-parity gap Derby could not (the Postgres dialect itself).

Skips cleanly when the binaries or the postgres OS user are absent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import uuid

import pytest

INITDB = shutil.which("initdb") or "/usr/local/bin/initdb"
PG_CTL = shutil.which("pg_ctl") or "/usr/local/bin/pg_ctl"


def _have_postgres() -> bool:
    if not (os.path.exists(INITDB) and os.path.exists(PG_CTL)):
        return False
    try:
        subprocess.run(
            ["su", "postgres", "-c", "true"],
            check=True,
            capture_output=True,
            cwd="/tmp",
        )
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_postgres(),
    reason="postgres server binaries / postgres OS user not available",
)


@pytest.fixture(scope="module")
def pg_socket_dir():
    # NOT pytest's tmp_path: that lives under a 0700 root-owned parent
    # the postgres OS user cannot traverse
    import tempfile

    d = tempfile.mkdtemp(prefix="pglive_", dir="/tmp")
    os.chmod(d, 0o777)
    data = f"{d}/data"
    subprocess.run(["mkdir", "-p", data], check=True)
    subprocess.run(["chown", "-R", "postgres:postgres", d], check=True)
    run = lambda cmd: subprocess.run(  # noqa: E731
        ["su", "postgres", "-c", cmd],
        check=True,
        capture_output=True,
        cwd="/tmp",
    )
    run(f"{INITDB} -D {data} -A trust --no-sync")
    run(
        f"{PG_CTL} -D {data} -l {d}/log -o \"-c listen_addresses='' "
        f'-c unix_socket_directories={d}" start'
    )
    try:
        yield d
    finally:
        run(f"{PG_CTL} -D {data} -m immediate stop")
        shutil.rmtree(d, ignore_errors=True)


def test_postgres_dialect_append_scan_idempotent(spark, pg_socket_dir):
    from occupation_wage_etl_spark.sources import pgwire

    table = f"occupation_wages_{uuid.uuid4().hex[:8]}"
    # the reference's Postgres column dialect (load_data.py:152-200):
    # TEXT codes/titles, DOUBLE PRECISION wage columns, BIGINT counts
    ddl = (
        "occ_code TEXT, occ_title TEXT, tot_emp BIGINT, "
        "a_mean DOUBLE PRECISION, a_median DOUBLE PRECISION"
    )
    df = spark.createDataFrame(
        [
            ("11-1011", "Chief Executives", 211230, 258900.5, 213020.0),
            ("15-1252", "Software Developers", 1656880, 138110.0, None),
            ("29-1141", "Registered Nurses", 3175390, 94480.25, 86070.0),
        ],
        "occ_code string, occ_title string, tot_emp long, "
        "a_mean double, a_median double",
    ).repartition(3)  # force multiple executor-partition connections

    pgwire.postgres_append(df, pg_socket_dir, table, ddl, "2026-08-15")
    # RE-RUN the same snapshot: delete-by-date makes it idempotent
    # (the reference's to_sql('append') re-run duplicated rows)
    pgwire.postgres_append(df, pg_socket_dir, table, ddl, "2026-08-15")
    # a second snapshot accumulates
    pgwire.postgres_append(df, pg_socket_dir, table, ddl, "2026-08-16")

    back = pgwire.postgres_scan(
        spark,
        pg_socket_dir,
        f"SELECT occ_code, occ_title, tot_emp, a_mean, a_median, "
        f"snapshot_date FROM {table} ORDER BY snapshot_date, occ_code",
        "occ_code string, occ_title string, tot_emp long, "
        "a_mean double, a_median double, snapshot_date string",
    )
    rows = back.collect()
    assert len(rows) == 6  # 3 per snapshot, no duplicates from the re-run
    by_code = {
        (r["snapshot_date"], r["occ_code"]): r
        for r in rows
    }
    r = by_code[("2026-08-15", "15-1252")]
    assert r["occ_title"] == "Software Developers"
    assert r["tot_emp"] == 1656880
    assert r["a_mean"] == 138110.0 and r["a_median"] is None
    # doubles survive text round-trip bit-exactly (repr literal)
    assert by_code[("2026-08-16", "29-1141")]["a_mean"] == 94480.25

    # dialect details Derby could not prove: server version + a real
    # Postgres-ism in the same session (ON CONFLICT would be another)
    conn = pgwire.PgWire(pg_socket_dir)
    try:
        _, v = conn.query("SHOW server_version")
        assert v and v[0][0].startswith("15")
        _, n = conn.query(
            f"SELECT count(*)::BIGINT FROM {table} "
            f"WHERE snapshot_date = '2026-08-15'"
        )
        assert n[0][0] == "3"
    finally:
        conn.close()


def test_sql_literal_non_finite_floats():
    # ungated (no server needed): repr()'s bare nan/inf tokens are
    # Postgres syntax errors — non-finite doubles must use the QUOTED
    # spellings float8in accepts
    from occupation_wage_etl_spark.sources.pgwire import sql_literal

    assert sql_literal(float("nan")) == "'NaN'"
    assert sql_literal(float("inf")) == "'Infinity'"
    assert sql_literal(float("-inf")) == "'-Infinity'"
    assert sql_literal(1.5) == "1.5"
    assert sql_literal(None) == "NULL"
    assert sql_literal("O'Neil") == "'O''Neil'"
