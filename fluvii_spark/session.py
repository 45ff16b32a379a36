"""SparkSession factory with scale-oriented defaults.

The reference (fluvii) has no engine to configure — its throughput knobs are
Kafka-transaction batch sizes (``fluvii/components/consumer/config.py:26-30``).
Here the equivalent role is played by Spark conf: AQE, shuffle partitioning,
Arrow for the Pandas-UDF paths, and broadcast sizing.

Design notes for 100 TB (local[] is only the test harness):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  replaces hand-tuned ``spark.sql.shuffle.partitions`` at scale.
- ``autoBroadcastJoinThreshold`` stays enabled so dimension tables
  (region/nation/customer at TPC-H shapes) broadcast instead of shuffling.
- Arrow enabled: every Python-side operator in this package uses Arrow-batched
  Pandas UDFs / mapInPandas, never row-at-a-time Python UDFs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session handed to us (including the
# driver's): these are safe `spark.conf.set` keys, not builder-only.
# REQUIRED — forced unconditionally: the engine's correctness contract
# depends on them (nanos parquet reads; UTC so timestamp determinism and
# the NTZ casts in asof/tolerance paths hold). An external override here
# doesn't yield a different-but-valid engine, it yields wrong answers.
RUNTIME_CONFS: dict[str, str] = {
    # the testdata events table stores TIMESTAMP(NANOS); Spark refuses it
    # unless read as long (we convert: ns DIV 1000 → micros, matching duckdb's
    # truncation semantics).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow is FORCE-ENABLED, not a respect-existing preference: its stock
    # default ("false") is indistinguishable from a deliberate external
    # "false", so the PERF_CONFS stock-value contract cannot apply. Every
    # Python-side operator here is an Arrow pandas_udf/mapInPandas — with
    # Arrow off they still run (Spark falls back to pickle serialization)
    # but 10-100× slower, which at engine scale is an outage, not a choice.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

# Performance defaults, applied ONLY when the session still carries Spark's
# stock value — an explicit caller override (e.g. "-1" to force the bucketed
# 100 TB plan shape in tests) must survive apply_runtime_confs.
#
# 64 MB broadcast ceiling (stock 10 MB): TPC-H-shaped dimensions (customer
# at sf≤1, all of nation/region/part) broadcast instead of shuffling the
# fact side. On 100 TB clusters executors hold multi-GB heaps — a 64 MB
# build side is cheap, and AQE only converts when the RUNTIME size clears
# the bar, so mis-estimates don't OOM. Measured: q07 5-way star −15% wall
# at sf0.1.
PERF_CONFS: dict[str, tuple[str, frozenset[str]]] = {
    "spark.sql.autoBroadcastJoinThreshold": (
        str(64 * 1024 * 1024),
        frozenset({"10485760", "10485760b", "10MB"}),
    ),
    # Recursive-CTE row budget (stock 1M): the limit is a runaway-recursion
    # safety valve, but it counts CUMULATIVE rows across iterations, so a
    # legitimate bounded-depth walk blows it as soon as the DATA grows —
    # q118's ancestor chain emits n·log2(max_id) rows (~1.7M at the g=20
    # growth corpus, billions at 100 TB; caught by growth_smoke r9). 1e9
    # keeps the valve (a true runaway still trips) while scaling with real
    # corpora; the LEVEL limit (100, untouched) remains the depth guard.
    "spark.sql.cteRecursionRowLimit": (
        str(1_000_000_000),
        frozenset({"1000000"}),
    ),
    # AQE knobs are engine PREFERENCES: re-assert the stock default, but an
    # external driver that deliberately flipped one (plan-stability tests
    # pinning adaptive off, say) keeps its setting — same respect-existing
    # contract as the broadcast threshold above. (Arrow is NOT here: its
    # stock "false" can't be told apart from a deliberate one, so it lives
    # in RUNTIME_CONFS as an honest force-enable.)
    "spark.sql.adaptive.enabled": ("true", frozenset({"true"})),
    "spark.sql.adaptive.coalescePartitions.enabled": (
        "true",
        frozenset({"true"}),
    ),
    "spark.sql.adaptive.skewJoin.enabled": ("true", frozenset({"true"})),
}


def require_spark(
    spark: SparkSession, minimum: tuple[int, int], feature: str
) -> None:
    """Fail fast with a clear message when the running Spark predates a
    feature this engine leans on (q92 ``parse_json``/``variant_get``, q118
    ``WITH RECURSIVE`` — both Spark 4.0+). Without the guard a 3.5 cluster
    dies mid-plan with an opaque AttributeError / ParseException.

    ``pyproject.toml`` pins ``pyspark>=4.0``; this is the runtime backstop
    for deployments that ship their own Spark (spark-submit against a
    cluster older than the client wheel).
    """
    parts = spark.version.split(".")
    try:
        running = (int(parts[0]), int(parts[1]))
    except (ValueError, IndexError):  # vendor builds like "4.x-custom"
        return
    if running < minimum:
        raise RuntimeError(
            f"{feature} requires Spark {minimum[0]}.{minimum[1]}+ "
            f"(running {spark.version}); upgrade the cluster or drop the "
            "query — see pyproject.toml's pyspark pin"
        )


_PKG_ZIP: str | None = None


def _package_zip() -> str:
    """Zip the installed fluvii_spark package once per process (sources only)."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        import tempfile
        import zipfile

        import fluvii_spark

        pkg_dir = os.path.dirname(os.path.abspath(fluvii_spark.__file__))
        fd, path = tempfile.mkstemp(prefix="fluvii_spark_pkg_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join(
                            "fluvii_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        _PKG_ZIP = path
    return _PKG_ZIP


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to Python workers via ``addPyFile``.

    Arrow-UDF operators (``operators/multimodal.py``'s mapInPandas stages and
    friends) reference module-level helpers, which cloudpickle serializes BY
    REFERENCE — the worker process must be able to ``import fluvii_spark``.
    When the driving process starts outside the repo (different cwd, no
    PYTHONPATH), that import fails only on the WORKER, at execution time.
    Shipping a zip of the package through ``SparkContext.addPyFile`` makes
    worker-side imports independent of the driver's cwd — exactly how the
    package would deploy on a real cluster (``--py-files``). Idempotent per
    session; the zip is built once per process (~sources only, no pycache).
    """
    try:
        sc = spark.sparkContext
    except Exception:
        # Spark Connect sessions have no SparkContext; ship through the
        # Connect artifact API instead (same --py-files effect). The flag
        # lives on the session object — one ship per remote session.
        if getattr(spark, "_fluvii_pkg_shipped", False):
            return
        try:
            spark.addArtifact(_package_zip(), pyfile=True)
        except Exception as exc:  # noqa: BLE001
            # same retry-then-latch contract as the classic branch below:
            # warn once, leave unlatched for two retries (the failure may
            # be a transient endpoint error), latch on the third
            attempts = getattr(spark, "_fluvii_pkg_attempts", 0) + 1
            spark._fluvii_pkg_attempts = attempts
            if attempts == 1:
                import warnings

                warnings.warn(
                    "fluvii_spark: Connect addArtifact failed; worker "
                    f"package shipping is degraded ({exc!r})",
                    RuntimeWarning,
                    stacklevel=2,
                )
            if attempts < 3:
                return
        spark._fluvii_pkg_shipped = True
        return
    if getattr(sc, "_fluvii_pkg_shipped", False):
        return
    try:
        sc.addPyFile(_package_zip())
    except Exception as exc:
        # A session that forbids addPyFile (or a same-name re-add after
        # restart) falls back to the ambient import path — the pre-r4
        # status quo, correct whenever the driver runs from the repo root.
        # Retry on later calls (the failure may be transient) up to a small
        # bound so a permanently-forbidding deployment doesn't pay a
        # per-query exception, and warn ONCE so the degraded mode is
        # diagnosable instead of surfacing later as an unrelated-looking
        # worker ImportError.
        attempts = getattr(sc, "_fluvii_pkg_attempts", 0) + 1
        sc._fluvii_pkg_attempts = attempts
        if attempts == 1:
            import warnings

            warnings.warn(
                "fluvii_spark: addPyFile failed; worker package shipping "
                "is degraded — foreign-cwd Arrow-UDF jobs may hit worker "
                f"ImportError for fluvii_spark ({exc!r})",
                RuntimeWarning,
                stacklevel=2,
            )
        if attempts < 3:
            return  # leave unlatched: retry on the next entry point
    sc._fluvii_pkg_shipped = True


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Called at the top of every query entry point so the engine behaves the
    same whether the session was built by :func:`get_session` or handed to us
    by an external driver.

    The REQUIRED RUNTIME_CONFS are forced on every entry (the documented
    contract: even a session that pinned Arrow off gets it back at the
    next entry point). The PERF_CONFS respect-existing pass, though, is
    memoized per session object: its ~10 conf get/set py4j round trips
    run per TABLE ACCESS per query and under a 16-thread bench become
    measurable driver/gateway contention for zero new information — once
    the stock values have been upgraded, re-checking can never change
    anything (an external mid-session override is BY CONTRACT respected,
    i.e. left alone, so skipping the re-check is behavior-identical).
    """
    ensure_package_on_workers(spark)
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-settable in this deployment → keep going; queries that
            # depend on a conf guard for it explicitly.
            pass
    if not getattr(spark, "_fluvii_perf_confs_applied", False):
        for k, (v, stock_values) in PERF_CONFS.items():
            try:
                current = spark.conf.get(k, None)
                if current is None or current in stock_values:
                    spark.conf.set(k, v)
            except Exception:
                pass
        try:
            spark._fluvii_perf_confs_applied = True
        except Exception:  # exotic proxy that forbids attribute writes
            pass
    return spark


def _resolve_master(
    master: str | None, cpus: str, env: dict[str, str]
) -> str | None:
    """None under an externally-managed deployment (spark-submit gateway or
    MASTER/SPARK_MASTER env) stays None — the cluster manager decides;
    otherwise the local test-harness default."""
    if master is not None:
        return master
    externally_managed = (
        "PYSPARK_GATEWAY_PORT" in env  # launched by spark-submit
        or env.get("MASTER")
        or env.get("SPARK_MASTER")
    )
    return None if externally_managed else f"local[{cpus}]"


def get_session(
    app_name: str = "fluvii-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state_store: bool = False,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for
    the test harness; on a real cluster pass ``None`` via spark-submit and the
    cluster manager decides — detected via the gateway env spark-submit sets
    (PYSPARK_GATEWAY_PORT) or an externally-provided spark.master
    (MASTER/SPARK_MASTER env), in which case NO master is pinned here:
    builder .master() would override --master and silently run the whole
    cluster job in one local driver process.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = _resolve_master(master, cpus, os.environ)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # local mode: keep result/broadcast sizes sane for 32-thread runs
        .config("spark.driver.maxResultSize", "4g")
        # concurrent queries (bench, notebook users) round-robin task slots
        # instead of FIFO-starving behind the first big stage; single-query
        # workloads are unaffected (one job ≈ one pool entry)
        .config("spark.scheduler.mode", "FAIR")
    )
    if master is not None:
        # only pin a master we actually resolved — under spark-submit the
        # cluster manager owns this and builder.master() would override it
        builder = builder.master(master)
    if rocksdb_state_store:
        # default (HDFSBackedStateStoreProvider) keeps every key in executor
        # heap — fine for tests, a ceiling for large keyed state; RocksDB
        # spills to local disk with changelog checkpointing (the moral
        # equivalent of the reference's SQLite+changelog, done by the engine)
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, (v, _stock) in PERF_CONFS.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
