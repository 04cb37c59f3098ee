"""Flight round-trip tests (port of the reference's
``src/tests/test_flight_server.py``: background server, schema equality
via get_flight_info, full-table equality via do_get) plus the
SQL-in-ticket path the reference left as a stub."""

from __future__ import annotations

import os

import pytest

from iceberg_cache_spark.engine import CachedQueryEngine
from iceberg_cache_spark.serving.flight import (
    SparkFlightServer,
    query_sql,
    query_table,
    serve_background,
)

pytest.importorskip("pyarrow.flight")


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    engine = CachedQueryEngine(spark)
    for t in ("region", "nation"):
        engine.register_parquet(t, os.path.join(sf_dir, f"{t}.parquet"))
    srv = SparkFlightServer(engine, "grpc://127.0.0.1:0")  # ephemeral port
    location = f"grpc://127.0.0.1:{srv.port}"
    serve_background(srv)
    yield location, engine
    srv.shutdown()


def test_do_get_full_table_roundtrip(spark, sf_dir, server):
    location, engine = server
    got = query_table(location, "region")
    want = engine.table("region").toArrow()
    assert got.equals(want)


def test_get_flight_info_schema(spark, server):
    import pyarrow.flight as flight

    location, engine = server
    client = flight.connect(location)
    info = client.get_flight_info(flight.FlightDescriptor.for_path("nation"))
    assert info.schema == engine.table("nation").limit(0).toArrow().schema


def test_sql_in_ticket(server):
    location, _ = server
    got = query_sql(
        location,
        "SELECT r.r_name, COUNT(*) AS n FROM region r "
        "JOIN nation n ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name ORDER BY r.r_name",
    )
    assert got.num_rows == 5
    assert got.column("n").to_pylist() == [5, 5, 5, 5, 5]


def test_list_flights(server):
    import pyarrow.flight as flight

    location, _ = server
    client = flight.connect(location)
    names = sorted(f.descriptor.path[0].decode() for f in client.list_flights())
    assert names == ["nation", "region"]


def test_flight_bad_ticket_surfaces_error(server):
    import pyarrow.flight as flight

    location, _ = server
    client = flight.connect(location)
    # server-side KeyError crosses gRPC with its message intact
    with pytest.raises(Exception, match="no loader registered"):
        client.do_get(flight.Ticket(b"no_such_table")).read_all()


def test_flight_bad_sql_surfaces_error(server):
    import pyarrow.flight as flight

    location, _ = server
    client = flight.connect(location)
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|cannot be found"):
        client.do_get(flight.Ticket(b"sql:SELECT * FROM nope")).read_all()
