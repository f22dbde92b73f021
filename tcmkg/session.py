"""SparkSession factory tuned for this engine.

Local mode stands in for a multi-executor cluster; every knob here is the
one we would also set on a real 1000-executor deployment (AQE, skew join,
Arrow batching, sane shuffle partitioning). Iceberg jars are not present in
this sandbox image, so checkpoint tables fall back to parquet-with-manifest
(see pipeline/checkpoints.py); on a cluster with the iceberg-spark-runtime
jar, `iceberg=True` configures a hadoop catalog instead.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def package_zip(dest_dir: str = "/tmp") -> str:
    """Zip the tcmkg package for worker shipping — the local-mode equivalent
    of `spark-submit --py-files tcmkg.zip` (north-rule deployment shape).
    Python workers are separate processes and do not inherit the driver's
    sys.path, so the package must travel via addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(dest_dir, "tcmkg_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join("tcmkg", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    return out


def get_spark(
    app_name: str = "tcmkg",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    iceberg: bool = False,
    warehouse: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: int N -> local[N]; "*" -> local[*]; None -> $SPARK_GRAFT_CPUS or "*".
    shuffle_partitions defaults to the core count (local mode: more is waste).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    ncores = os.cpu_count() or 8
    if isinstance(cores, int) or (isinstance(cores, str) and cores.isdigit()):
        ncores = int(cores)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, ncores)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("TCMKG_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # RAM-backed shuffle dirs: on this single box the overlay-fs /tmp makes
    # shuffle I/O a serial bottleneck that masks CPU scaling; a real cluster
    # would have NVMe + network shuffle. tmpfs restores the honest compute
    # profile. (Harmless if /dev/shm is absent.)
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        b = b.config("spark.local.dir", "/dev/shm/tcmkg-spark")
        # shuffle bytes live in RAM here, so lz4 is pure CPU overhead that
        # inflates per-core work (~2x on the window chain). On a network
        # shuffle cluster leave compression ON — this branch only fires with
        # tmpfs-local shuffle.
        b = b.config("spark.shuffle.compress", "false")
        b = b.config("spark.shuffle.spill.compress", "false")
    if iceberg:
        wh = warehouse or "/tmp/tcmkg_warehouse"
        b = (
            b.config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.local.type", "hadoop")
            .config("spark.sql.catalog.local.warehouse", wh)
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # ship the package to Python workers (works in local and cluster mode)
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this context
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
