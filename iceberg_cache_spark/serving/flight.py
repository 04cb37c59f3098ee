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


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate (no job). Filters and
    projections shrink it; unknown stats return a huge sentinel so the
    caller falls back to the streaming path (never the materializing
    one) on missing information."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return 1 << 62


# Operators whose non-CBO sizeInBytes passes the CHILD size through
# while the OUTPUT can be many times larger: Generate (explode & co.
# fan out rows) and Expand (rollup/cube/grouping-sets multiply rows by
# the grouping-set count). A plan containing one can under-estimate by
# the fan-out factor — the one direction that hurts (driver OOM on the
# materializing path). Over-estimates (joins multiply child sizes,
# aggregates inherit theirs) only cost the ~2x-slower streaming path.
_UNDERESTIMATING_NODES = frozenset({"Generate", "Expand"})

# Outer joins preserve every row of the outer side(s) no matter what
# the other side contributes, but the non-CBO Join estimate is the
# PRODUCT of the child sizes — which collapses toward zero when either
# child is estimated tiny (an empty-looking filtered dim, a fresh view
# with no stats smaller than the row width). Inner/cross products only
# over-estimate (the safe direction: ~2x-slower streaming path), so
# only outer join types are untrusted. ExistenceJoin (a correlated
# EXISTS Catalyst didn't rewrite to LeftSemi) also preserves the whole
# left side while its non-CBO estimate is the child product.
_UNDERESTIMATING_JOIN_TYPES = (
    "LeftOuter", "RightOuter", "FullOuter", "ExistenceJoin",
)


def _estimate_trustworthy(df: DataFrame) -> bool:
    """False when the optimized plan contains an operator whose size
    estimate can come out SMALLER than the actual output: a
    row-expanding operator with a pass-through estimate (see
    _UNDERESTIMATING_NODES) or an outer join whose child-size product
    collapses below the preserved side (_UNDERESTIMATING_JOIN_TYPES) —
    such results must take the O(flush-window) streaming path no matter
    how small Catalyst thinks they are. Walks the (small) logical plan
    via py4j; any reflection failure counts as untrustworthy."""
    try:
        stack = [df._jdf.queryExecution().optimizedPlan()]
        while stack:
            node = stack.pop()
            name = node.nodeName()
            if name in _UNDERESTIMATING_NODES:
                return False
            if name == "Join" and any(
                t in node.joinType().toString()
                for t in _UNDERESTIMATING_JOIN_TYPES
            ):
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:
        return False


def _materialized_batches(df: DataFrame, schema: pa.Schema, batch_size: int):
    """Fast serve path for results estimated to fit comfortably in
    driver memory: one parallel ``toArrow`` job (no Python-worker
    round trip, no per-partition sequential jobs), then zero-copy
    re-chunking to the advertised batch size. ~gRPC-framing overhead
    over plain ``toArrow`` — the profile the reference serves from (an
    in-memory Arrow table, ref ``src/flight_server/server.py:53``)."""
    table = df.toArrow()
    if table.schema != schema:
        table = table.cast(schema)
    yield from table.to_batches(max_chunksize=batch_size)


def _make_ipc_pack():
    """Executor-side Arrow→IPC packer for ``mapInArrow``. Defined in a
    factory with self-contained imports so cloudpickle ships it by
    value (workers need no importable repo copy)."""

    def pack(batches):
        import pyarrow as _pa

        # One IPC stream per ~flush-window of batches (not per 10k-row
        # batch): amortizes stream framing + schema headers and gives the
        # driver a handful of large blobs per partition instead of dozens
        # of tiny ones. Flush bounds the executor-side buffer so a fat
        # partition never accumulates as one giant blob.
        FLUSH_ROWS = 262_144

        def blob(sink):
            return _pa.RecordBatch.from_arrays(
                [_pa.array([sink.getvalue().to_pybytes()], type=_pa.binary())],
                names=["ipc"],
            )

        sink = writer = None
        buffered = 0
        for b in batches:
            if writer is None:
                sink = _pa.BufferOutputStream()
                writer = _pa.ipc.new_stream(sink, b.schema)
                buffered = 0
            writer.write_batch(b)
            buffered += b.num_rows
            if buffered >= FLUSH_ROWS:
                writer.close()
                yield blob(sink)
                sink = writer = None
        if writer is not None:
            writer.close()
            yield blob(sink)

    return pack


def _batches(df: DataFrame, batch_size: int):
    """Yield RecordBatches of at most ``batch_size`` rows, streaming,
    columnar end-to-end.

    Executors serialize the result to IPC bytes inside ``mapInArrow``
    (one binary cell per ~256k-row flush window — the data NEVER
    crosses row-at-a-time Python, and stream framing is amortized over
    the window instead of paid per 10k-row batch); the driver walks the
    packed one-column DataFrame with
    ``toLocalIterator(prefetchPartitions=True)``, so peak driver
    memory stays O(flush window + batch), never O(result), and decodes
    each blob's batches directly off the IPC stream (no read_all /
    re-slice copies).

    The decoded batches are cast to the advertised schema: executor
    batches annotate TIMESTAMP_LTZ columns with the session timezone
    while the driver-side schema says UTC — both are instant-correct
    tz-aware types, so the cast is a metadata-only rename (verified by
    the non-UTC round-trip test). This also fixes the prior row-path
    bug where naive ``toLocalIterator`` datetimes were reinterpreted
    against a tz-annotated Arrow type, shifting served values by the
    driver-timezone offset."""
    schema = _df_schema(df)
    packed = df.mapInArrow(_make_ipc_pack(), "ipc binary")
    for row in packed.toLocalIterator(prefetchPartitions=True):
        reader = pa.ipc.open_stream(row[0])
        recast = reader.schema != schema
        for batch in reader:
            if recast:
                # tz-annotation rename only — both types are instant-
                # correct; cast via a single-batch table (RecordBatch
                # itself has no cast), metadata-only so no copy.
                (batch,) = pa.Table.from_batches([batch]).cast(schema).to_batches()
            if batch.num_rows <= batch_size:
                yield batch
            else:
                for off in range(0, batch.num_rows, batch_size):
                    yield batch.slice(off, batch_size)


class SparkFlightServer(flight.FlightServerBase):
    def __init__(
        self,
        engine: CachedQueryEngine,
        location: str = "grpc://0.0.0.0:8815",
        batch_size: int = DEFAULT_BATCH_SIZE,
        materialize_below_bytes: int = 1 << 30,
    ) -> None:
        """``materialize_below_bytes``: results whose Catalyst size
        estimate is under this use the single-job ``toArrow`` fast path
        (driver memory = result size, ~2x faster than streaming);
        larger or unestimable results stream partition-by-partition
        with O(flush-window) driver memory. Same estimate-driven
        physical choice Spark itself makes for broadcast joins; set to
        0 to force streaming for every result."""
        super().__init__(location)
        self.engine = engine
        self.location = location
        self.batch_size = batch_size
        self.materialize_below_bytes = materialize_below_bytes

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
        if (
            _estimated_bytes(df) <= self.materialize_below_bytes
            and _estimate_trustworthy(df)
        ):
            gen = _materialized_batches(df, schema, self.batch_size)
        else:
            gen = _batches(df, self.batch_size)
        return flight.GeneratorStream(schema, gen)

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
