"""SparkSession factory tuned for the engine.

Scale notes (the configs below are chosen for a large cluster, tested on
local[32]):

* AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace most hand-tuning at 100 TB.
* ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound; AQE
  coalesces down using ``advisoryPartitionSizeInBytes`` so the same code runs
  at sf0.001 and at 100 TB without re-tuning.
* Timestamps: the engine standardizes on UTC micro-second timestamps
  (ClickHouse DateTime64(9) loses ns -> micro; see io.py).
* Arrow enabled for the few Pandas-UDF code paths (exp-histogram merge,
  multimodal decode) — everything else stays JVM-side.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs every entry point re-asserts, so the engine
# behaves identically whether it owns the session or receives one (the
# correctness driver passes its own session into __spark_entry__.entry).
RUNTIME_CONFS = {
    # test parquet is written with INT64 TIMESTAMP(NANOS) which Spark cannot
    # read natively; read as long and convert in io.load_table
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # testdata may also be written as TIMESTAMP(MICROS) with
    # isAdjustedToUTC=false; read it as plain TIMESTAMP in the UTC session
    # (not TIMESTAMP_NTZ) so epoch fns (unix_micros & co) apply uniformly
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: the engine implements ClickHouse-ish "OrDefault"/"OrNull"
    # coercions itself (try_cast + coalesce); ANSI runtime errors on bad
    # casts would break that contract.
    "spark.sql.ansi.enabled": "false",
}


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally-created session.

    Idempotent per session object: every entry point calls this (often
    several times per query via ``load_table``), and each ``conf.set`` is a
    synchronous driver RPC — 12 confs × 2-4 loads per query was ~5% of the
    sub-second queries' wall (r16 driver-overhead profile).  The confs are
    constants, so setting them once per session is equivalent."""
    if getattr(spark, "_hdx_session_tuned", False):
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # immutable in this deployment — keep going, the engine degrades
            # gracefully (io falls back to pyarrow-level conversion)
            pass
    try:
        spark._hdx_session_tuned = True
    except Exception:
        pass  # exotic session proxy refusing attributes — just re-tune
    return spark


def get_spark(app_name: str = "hyperdx_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 32)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # Static conf: PySpark 4 wraps every DataFrame/Column op in a
        # call-site capture (errors/utils._with_origin) costing ~3 extra
        # driver RPCs + a Python stack walk per op — measured ~20% of
        # query-construction wall across the headline queries (r16).  The
        # capture only enriches error messages with user line numbers; the
        # engine's own validation raises descriptive errors before Spark
        # ever sees bad input, so trade the debug nicety for driver
        # latency.  Scale-independent: this is per-API-call driver
        # overhead, identical on a 1000-node cluster.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # Split size trades scheduling overhead against parallelism. On a
        # 1000-executor cluster reading 100 TB the Spark default (128 MB ->
        # ~800k tasks) is right, and a deployment would leave it alone. This
        # harness runs local[32] over sf<=1 parquet (tens of MB/table): at
        # 128 MB a whole table is 1-2 splits and 30 cores idle through every
        # scan-heavy query, so default to 8 MB here (sf1 documents -> 8
        # tasks; measured 3-4x on the HOF-heavy text/codec queries).
        # Env-overridable for cluster-profile runs.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8388608"),
        )
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return tune_session(spark)
