"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _warehouse_dir() -> str:
    """Local-mode warehouse under the per-user staging root (on a real
    cluster spark.sql.warehouse.dir comes from --conf at submit time)."""
    from doc_ocr_spark import staging

    return os.path.join(staging.stage_root(), "warehouse")


def get_spark(
    app_name: str = "doc_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Defaults chosen for the 100TB design point, applied identically in
    local mode:

    - AQE on (runtime re-plan, skew-join splitting)
    - Arrow enabled, record-batch cap so one batch of giant html blobs
      cannot exceed task memory (skew rule — SURVEY.md §7.4.2)
    - shuffle partitions sized to cores locally; on a real cluster this
      is overridden by --conf at submit time
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 64m broadcast room: mid-size dims (orders at bench SF) hash-
        # broadcast instead of shuffling both sides; AQE's runtime stats
        # still demote anything that turns out bigger than this.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # 16m scan splits: html-heavy corpora must split finer than the
        # 128m default or a single big file caps map-stage parallelism
        # (262 MB file -> 3 tasks; the kernel stage then can't use the
        # cores).  Row groups are written ~8-16 MB (datagen) so every
        # split maps to whole row groups.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", _warehouse_dir())
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
