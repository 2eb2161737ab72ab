"""SparkSession factory and table loading.

The reference boots one long-running Spark app per pipeline stage
(``SparkStreamingApp.java:217-285`` in /root/reference); here a single
SparkSession hosts every operator, and "applications" collapse into
DataFrame plans (SURVEY §3.2).

Scale notes: configs below are tuned so the same code runs on
``local[N]`` for tests and on a multi-executor cluster unchanged —
AQE handles partition coalescing and skew joins at runtime, and
``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "las_vpe_platform_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    UTC session timezone keeps timestamp semantics identical to the
    DuckDB oracle; Arrow is on for every pandas-UDF boundary.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # single-JVM local mode hosts driver + all executor threads in
        # one heap; a multi-hundred-query session accretes broadcast
        # blocks and codegen classes, so give it headroom on the
        # 128 GiB harness box (the per-entry spikes in back-to-back
        # full-catalog runs turned out to be hypervisor CPU steal, not
        # GC — measured in SCALE.md's round-10 variance note — but 8g
        # was within 2x of a long session's live set); a cluster
        # deployment sizes executors separately as usual
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # the driver's events table is TIMESTAMP(NANOS); read as long,
        # sources.tables.load_table converts to micros (DuckDB-identical)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # split medium files so narrow pipelines over few-file tables
        # still parallelize; at cluster scale files are many and this
        # only bounds the per-task read
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_PYFILES_SENT: set[int] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to Spark's Python workers via addPyFile.

    Any operator built on mapInPandas/pandas_udf pickles closures that
    reference this package by module name; workers spawned by a session
    that didn't pip-install the package (e.g. the external driver) can
    only resolve it if the zip rides along. Idempotent per context.
    """
    import tempfile
    import zipfile
    from pathlib import Path

    sc = spark.sparkContext
    key = id(sc)
    if key in _PYFILES_SENT:
        return
    pkg_dir = Path(__file__).resolve().parent
    zpath = Path(tempfile.gettempdir()) / "las_vpe_platform_spark_pyfiles.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg_dir.rglob("*.py")):
            z.write(p, f"{pkg_dir.name}/{p.relative_to(pkg_dir)}")
    try:
        sc.addPyFile(str(zpath))
    except Exception:
        pass  # already added under this name — fine
    _PYFILES_SENT.add(key)


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    names: tuple[str, ...] = TABLE_NAMES,
    register_views: bool = True,
) -> dict[str, DataFrame]:
    """Load the driver's parquet tables; optionally register temp views.

    Reads are lazy scans — column pruning and predicate pushdown reach
    the parquet reader via Catalyst, so loading "all tables" costs
    nothing until an action touches them.
    """
    from las_vpe_platform_spark.sources.tables import load_table

    tables: dict[str, DataFrame] = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        tables[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return tables
