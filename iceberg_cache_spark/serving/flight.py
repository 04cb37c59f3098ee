"""Arrow Flight serving shim in front of the engine.

Re-expression of the reference's Flight plane (ref
``src/flight_server/server.py``): ``get_flight_info`` resolves the
schema, ``do_get`` streams the table as RecordBatches (reference batch
size 10,000 rows, ref ``src/flight_server/server.py:53``). Two ticket
forms:

- ``<table_id>`` — full-table fetch (the reference's path), and
- ``sql:<query>`` — runs SQL through the engine, fixing the client
  ``query_sql`` stub the reference left unimplemented (ref
  ``src/examples/client/flight_client.py:21-24``).

``list_flights`` is implemented (the reference declared it and left
``pass``). Scale note: results stream partition-by-partition via
``toLocalIterator``-style Arrow slicing; a 100 TB serving deployment
fronts many sessions — this shim is per-driver.
"""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as flight

from pyspark.sql import DataFrame

from iceberg_cache_spark.engine import CachedQueryEngine

DEFAULT_BATCH_SIZE = 10_000


def _df_schema(df: DataFrame) -> pa.Schema:
    """Arrow schema of a DataFrame without materializing rows."""
    return df.limit(0).toArrow().schema


def _batches(df: DataFrame, batch_size: int):
    """Yield RecordBatches of at most ``batch_size`` rows, streaming.

    Rows flow through ``toLocalIterator(prefetchPartitions=True)`` —
    Spark streams results to the driver one partition at a time (with
    one partition of prefetch), so peak driver memory is
    O(partition + batch), never O(result). The previous implementation
    (``df.toArrow()``) collected the entire result before the first
    batch went out — fine at dev scale, an OOM at 100 TB serving."""
    schema = _df_schema(df)
    names = schema.names
    buf: list = []
    for row in df.toLocalIterator(prefetchPartitions=True):
        buf.append(row)
        if len(buf) >= batch_size:
            yield _rows_to_batch(buf, schema, names)
            buf = []
    if buf:
        yield _rows_to_batch(buf, schema, names)


def _plain(v):
    """Spark Row → pyarrow-friendly plain Python (structs become dicts)."""
    if hasattr(v, "asDict"):
        return {k: _plain(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v


def _rows_to_batch(rows: list, schema: pa.Schema, names: list[str]) -> pa.RecordBatch:
    cols = {name: [_plain(row[i]) for row in rows] for i, name in enumerate(names)}
    return pa.RecordBatch.from_pydict(cols, schema=schema)


class SparkFlightServer(flight.FlightServerBase):
    def __init__(
        self,
        engine: CachedQueryEngine,
        location: str = "grpc://0.0.0.0:8815",
        batch_size: int = DEFAULT_BATCH_SIZE,
    ) -> None:
        super().__init__(location)
        self.engine = engine
        self.location = location
        self.batch_size = batch_size

    # -- resolution --------------------------------------------------------

    def _resolve(self, name: str, materialize: bool = True) -> DataFrame:
        if name.startswith("sql:"):
            return self.engine.sql(name[4:])
        # materialize=False for metadata-only calls: a schema request on a
        # cold table must not trigger a full count() materialization job.
        return self.engine.table(name, materialize=materialize)

    # -- Flight protocol ---------------------------------------------------

    def get_flight_info(self, context, descriptor):  # noqa: D102
        name = descriptor.path[0].decode()
        df = self._resolve(name, materialize=False)
        endpoint = flight.FlightEndpoint(name, [self.location])
        return flight.FlightInfo(_df_schema(df), descriptor, [endpoint], -1, -1)

    def do_get(self, context, ticket):  # noqa: D102
        name = ticket.ticket.decode()
        df = self._resolve(name)
        schema = _df_schema(df)
        return flight.GeneratorStream(schema, _batches(df, self.batch_size))

    def list_flights(self, context, criteria):  # noqa: D102
        for table_id in self.engine._loaders:
            df = self._resolve(table_id, materialize=False)
            descriptor = flight.FlightDescriptor.for_path(table_id)
            endpoint = flight.FlightEndpoint(table_id, [self.location])
            yield flight.FlightInfo(_df_schema(df), descriptor, [endpoint], -1, -1)


def serve_background(server: SparkFlightServer) -> threading.Thread:
    """Run the server on a daemon thread (test/demo convenience)."""
    t = threading.Thread(target=server.serve, daemon=True)
    t.start()
    return t


# -- client helpers (the reference's example client, ref
# src/examples/client/flight_client.py) -----------------------------------


def query_table(location: str, table_id: str) -> pa.Table:
    client = flight.connect(location)
    info = client.get_flight_info(flight.FlightDescriptor.for_path(table_id))
    reader = client.do_get(info.endpoints[0].ticket)
    return reader.read_all()


def query_sql(location: str, sql: str) -> pa.Table:
    client = flight.connect(location)
    reader = client.do_get(flight.Ticket(f"sql:{sql}".encode()))
    return reader.read_all()
