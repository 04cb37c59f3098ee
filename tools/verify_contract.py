"""Drive __spark_entry__ exactly as the driver's verify does:
vanilla SparkSession, entry() smoke, then every queries() entry at
sf0.01 compared with its oracle_sql() via DuckDB."""
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

df = m.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={df.schema.simpleString()}", flush=True)

from tests.oracle import compare  # same canonicalization as the driver-style gate

SF = "/root/testdata/sf0.01"
qs, oracles = m.queries(), m.oracle_sql()
ok = bad = 0
for name in sorted(qs):
    t0 = time.time()
    try:
        res = qs[name](spark, SF)
        if name in oracles:
            compare(res, oracles[name], SF)
            status = "MATCH"
        else:
            n = res.count()
            status = f"ROWS_ONLY({n})"
        ok += 1
    except Exception as exc:
        status = f"FAIL: {str(exc)[:160]}"
        bad += 1
    print(f"{name:28s} {status:14s} {time.time()-t0:5.1f}s", flush=True)
print(f"RESULT: {ok} ok, {bad} failed", flush=True)
