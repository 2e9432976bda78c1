"""Minimal pure-Python PostgreSQL v3 wire-protocol client + sink.

The sandbox ships real Postgres 15 server binaries but NO JDBC driver
jar and no Python DB driver, so Spark's ``format("jdbc")`` writer
(proven live against embedded Derby — ``tests/
test_warehouse_jdbc_live.py``) cannot reach it.  The protocol itself is
public and small (PostgreSQL docs, "Frontend/Backend Protocol"):
startup message → trust auth → simple-query messages.  This module
implements exactly that slice — enough to EXECUTE the reference's
warehouse dialect (``pipeline/load_data.py:152-213``: CREATE TABLE IF
NOT EXISTS with Postgres types + append INSERTs) against a live
server, with the same executor-parallel write shape as the JDBC sink:
``postgres_append`` opens one connection PER PARTITION inside
``foreachPartition``, so write parallelism is Spark's, not the
driver's.

Scope: trust/ident auth only (no password hashing), text-format simple
queries — the test harness slice, not a production driver.  At 100 TB
the warehouse path is the lakehouse catalog (``warehouse.py``
docstring); a row-store INSERT stream is the reference-parity path.
"""

from __future__ import annotations

import math
import socket
import struct
from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from occupation_wage_etl_spark.sources.warehouse import PARTITION_COL


class PgWireError(RuntimeError):
    pass


class PgWire:
    """One connection, simple-query protocol, text results."""

    def __init__(
        self,
        host: str,
        database: str = "postgres",
        user: str = "postgres",
        port: int = 5432,
    ) -> None:
        if host.startswith("/"):  # unix socket directory
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.connect(f"{host}/.s.PGSQL.{port}")
        else:
            self.sock = socket.create_connection((host, port))
        params = f"user\0{user}\0database\0{database}\0\0".encode()
        payload = struct.pack(">ii", 8 + len(params), 196608) + params
        self.sock.sendall(payload)
        self._drain_until_ready()

    # ---------------------------------------------------------- framing

    def _recv(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise PgWireError("server closed connection")
            buf += chunk
        return buf

    def _read_msg(self) -> tuple[bytes, bytes]:
        tag = self._recv(1)
        (ln,) = struct.unpack(">i", self._recv(4))
        return tag, self._recv(ln - 4)

    def _drain_until_ready(self) -> None:
        while True:
            tag, body = self._read_msg()
            if tag == b"R":
                (code,) = struct.unpack(">i", body[:4])
                if code != 0:
                    raise PgWireError(
                        f"auth method {code} not supported (use trust)"
                    )
            elif tag == b"E":
                raise PgWireError(_err_text(body))
            elif tag == b"Z":
                return
            # 'S' parameter status / 'K' backend key / notices: ignore

    # ----------------------------------------------------------- public

    def query(self, sql: str) -> tuple[list[str], list[list[str | None]]]:
        """Run one simple query; returns (column names, text rows)."""
        payload = sql.encode() + b"\0"
        self.sock.sendall(b"Q" + struct.pack(">i", 4 + len(payload)) + payload)
        cols: list[str] = []
        rows: list[list[str | None]] = []
        err: str | None = None
        while True:
            tag, body = self._read_msg()
            if tag == b"T":
                (nf,) = struct.unpack(">h", body[:2])
                cols, pos = [], 2
                for _ in range(nf):
                    end = body.index(b"\0", pos)
                    cols.append(body[pos:end].decode())
                    pos = end + 1 + 18  # name NUL + 6 fixed fields
            elif tag == b"D":
                (nf,) = struct.unpack(">h", body[:2])
                pos, row = 2, []
                for _ in range(nf):
                    (fl,) = struct.unpack(">i", body[pos : pos + 4])
                    pos += 4
                    if fl == -1:
                        row.append(None)
                    else:
                        row.append(body[pos : pos + fl].decode())
                        pos += fl
                rows.append(row)
            elif tag == b"E":
                err = _err_text(body)
            elif tag == b"Z":
                if err:
                    raise PgWireError(err)
                return cols, rows
            # 'C' command complete / 'N' notice / 'I' empty: ignore

    def close(self) -> None:
        try:
            self.sock.sendall(b"X" + struct.pack(">i", 4))
        finally:
            self.sock.close()


def _err_text(body: bytes) -> str:
    parts = {}
    for fld in body.split(b"\0"):
        if fld:
            parts[chr(fld[0])] = fld[1:].decode(errors="replace")
    return parts.get("M", "postgres error")


def sql_literal(v) -> str:
    """Text literal with standard_conforming_strings quoting; floats go
    through repr (shortest round-trip form — Postgres parses it back to
    the identical double).  Non-finite doubles have no bare-token form
    in Postgres SQL (repr's ``nan``/``inf`` are syntax errors that
    would fail the whole partition INSERT): they need the QUOTED
    spellings the float8 input function accepts."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "'NaN'"
        if math.isinf(v):
            return "'Infinity'" if v > 0 else "'-Infinity'"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def postgres_append(
    df: DataFrame,
    host: str,
    table: str,
    ddl_schema: str,
    snapshot_date: str,
    database: str = "postgres",
    user: str = "postgres",
    port: int = 5432,
    insert_batch: int = 500,
) -> None:
    """The reference's Postgres load (``load_data.py:152-213``) done
    idempotently against a LIVE server: CREATE TABLE IF NOT EXISTS with
    the caller's Postgres-dialect column list, DELETE the snapshot's
    rows (so re-runs replace instead of duplicating — the reference
    re-run bug, fixed the same way ``idempotent_append`` fixes it for
    catalog tables), then executor-parallel multi-row INSERTs: each
    Spark partition opens its own wire connection inside
    ``foreachPartition`` — the JDBC sink's write topology without the
    driver jar."""
    drv = PgWire(host, database, user, port)
    try:
        drv.query(
            f"CREATE TABLE IF NOT EXISTS {table} "
            f"({ddl_schema}, {PARTITION_COL} TEXT)"
        )
        drv.query(
            f"DELETE FROM {table} WHERE {PARTITION_COL} = "
            f"{sql_literal(snapshot_date)}"
        )
    finally:
        drv.close()

    cols = [*df.columns, PARTITION_COL]
    col_sql = ", ".join(cols)
    stamped = df.withColumn(PARTITION_COL, F.lit(snapshot_date))

    def _write_partition(rows: Iterable) -> None:
        conn: PgWire | None = None
        batch: list[str] = []

        def flush() -> None:
            nonlocal conn
            if not batch:
                return
            if conn is None:
                conn = PgWire(host, database, user, port)
            conn.query(
                f"INSERT INTO {table} ({col_sql}) VALUES "
                + ", ".join(batch)
            )
            batch.clear()

        for row in rows:
            batch.append(
                "(" + ", ".join(sql_literal(row[c]) for c in cols) + ")"
            )
            if len(batch) >= insert_batch:
                flush()
        flush()
        if conn is not None:
            conn.close()

    stamped.foreachPartition(_write_partition)


def postgres_scan(
    spark,
    host: str,
    sql: str,
    schema: str,
    database: str = "postgres",
    user: str = "postgres",
    port: int = 5432,
) -> DataFrame:
    """Driver-side scan of a warehouse query result into a DataFrame
    (text rows cast through the given schema) — the verification-scale
    read-back path; production reads stay on the lakehouse."""
    conn = PgWire(host, database, user, port)
    try:
        cols, rows = conn.query(sql)
    finally:
        conn.close()
    out = spark.createDataFrame(
        [tuple(r) for r in rows],
        ", ".join(f"{c} string" for c in cols),
    )
    casts = []
    for field in schema.split(","):
        name, typ = field.strip().split(" ", 1)
        casts.append(F.col(name).cast(typ).alias(name))
    return out.select(*casts)
