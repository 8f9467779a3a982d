"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]``; the same config block is what we
would ship to a 1000-executor cluster — AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow for the Python
boundary, UTC session time zone so timestamp semantics match the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_worker_imports(spark: SparkSession) -> None:
    """Make cflux_spark importable inside Python workers of an
    ALREADY-RUNNING session (e.g. one the grading driver created before
    importing us — worker PYTHONPATH is fixed at JVM start, so the env
    var approach in get_spark can't help there). Ships the package as a
    zip via addPyFile, which live workers pick up. Idempotent per
    session."""
    sc = spark.sparkContext
    if getattr(sc, "_cflux_pyfile_added", False):
        return
    import pathlib
    import tempfile
    import zipfile

    pkg_root = pathlib.Path(__file__).resolve().parent
    zpath = os.path.join(tempfile.gettempdir(), "cflux_spark_pyfiles.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for f in sorted(pkg_root.rglob("*.py")):
            z.write(f, "cflux_spark/" + str(f.relative_to(pkg_root)))
    sc.addPyFile(zpath)
    sc._cflux_pyfile_added = True


def get_spark(app_name: str = "cflux_spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``spark.sql.shuffle.partitions`` is sized to the local core count
    rather than the 200 default — at cluster scale this would instead be
    ~2-3× total executor cores, and AQE coalesces the excess anyway.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    # Make cflux_spark importable inside Python workers (mapInPandas /
    # pandas_udf): prepend the repo root to PYTHONPATH before the JVM
    # forks the worker daemon. On a real cluster this would be a
    # --py-files/pip-installed wheel instead.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = repo_root + (os.pathsep + existing if existing else "")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # Long-lived driver capacity (round 12, measured): a session that
        # plans hundreds of distinct queries generates far more than the
        # 100 codegen units the Janino class cache holds by default, so
        # every re-run re-compiles every WholeStageCodegen unit; and the
        # JIT's 'profiled nmethods' heap (1/2 of the 240 MB default
        # ReservedCodeCacheSize) saturates mid-run, flushing warm compiled
        # code. Both are driver-JVM capacity knobs, not data-scale knobs —
        # the same values are right on a production cluster driver.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4000"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS", "-XX:ReservedCodeCacheSize=512m"
            ),
        )
    )
    # Deployment-specific overrides (event logging for profiling, the
    # cleaner knobs, cluster shuffle tuning) without editing code:
    # semicolon-separated key=value pairs. Values here win over the
    # defaults above.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in extra.split(";"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
