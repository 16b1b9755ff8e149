"""Driver-style smoke test: load __spark_entry__ by file path from a
foreign cwd and run entry(spark) — exactly the shape of the driver's
t1 smoke check."""

import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

sys.path.insert(0, "/root/repo")
from holmes_extractor_spark.session import get_spark  # noqa: E402

spark = get_spark(cpus=8)
df = mod.entry(spark)
print("entry rows:", df.count(), "cols:", df.columns, flush=True)
print("queries:", len(mod.queries()), "oracles:", len(mod.oracle_sql()), flush=True)
spark.stop()
