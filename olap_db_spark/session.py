"""SparkSession factory tuned for OLAP workloads.

Defaults are chosen for the 100 TB design point and scale down to the
local[32] test rig:

- **AQE on** (runtime re-planning: shuffle-partition coalescing, skew-join
  splitting, dynamic broadcast conversion) — replaces hand-tuning
  ``spark.sql.shuffle.partitions`` per query.
- **Arrow on** for any pandas interchange (vectorized Pandas UDF paths).
- **Session timezone pinned to UTC** so timestamp semantics are
  deterministic and oracle-comparable regardless of host TZ.
- Parquet vectorized reader + dictionary filtering stay at their (on)
  defaults; filters/column pruning reach the scan via Catalyst.

On a real cluster the same factory is used with ``master`` unset (picked up
from spark-submit) and executor sizing supplied externally; nothing in the
engine assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """Driver-heap default derived from the HOST, not hardcoded (round-2
    ADVICE: a blind 48g + AlwaysPreTouch commits 48 GB physical at JVM
    start and fails outright on smaller hosts). Half of MemAvailable,
    clamped to [2g, 48g]; conservative 4g when /proc/meminfo is absent
    (non-Linux)."""
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(48, avail_gb // 2))}g"
    except OSError:
        pass
    return "4g"


def get_spark(
    app_name: str = "olap-db-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``shuffle_partitions`` is an *initial* value only — AQE coalesces it at
    runtime, so a high value is safe at scale and cheap locally.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 32)
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY") or _default_driver_memory()

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- Adaptive execution: the scale story -------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- Shuffle / memory -------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- Python interchange ------------------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- Determinism ---------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(isAdjustedToUTC=false) as TIMESTAMP_NTZ so
        # wall-clock values match the oracle engine exactly.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Local-mode driver heap: explicit env wins; otherwise sized to the
        # host (see _default_driver_memory). Harmless on cluster, where
        # spark-submit supplies executor/driver sizing.
        .config("spark.driver.memory", driver_mem)
        # Commit the whole heap at JVM start: lazily-committed heap growth
        # mid-run stalled whichever query first expanded the heap (~15-45s,
        # observed repeatedly on this box ~60s into bench runs). Pre-touch
        # pays that cost once, before any query is timed. Safe because the
        # heap is sized to the host above, never past MemAvailable/2.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch",
        )
        .config("spark.ui.enabled", "false")
    )
    # Shuffle/spill scratch on tmpfs when it actually has headroom: the
    # container's /tmp sits on a virtio disk whose periodic writeback
    # stalls can freeze one shuffle-heavy query for ~30s (observed in
    # bench runs). Guarded (round-2 ADVICE): only when /dev/shm has ≥8 GiB
    # free, and opt-out via SPARK_GRAFT_SHM=0 — so heavy spills never
    # compete with the pre-touched heap on small hosts. On a real cluster
    # this config is the standard local NVMe scratch mount.
    shm = "/dev/shm/spark-local"
    if os.environ.get("SPARK_GRAFT_SHM", "1") != "0":
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 * 1024**3:
                os.makedirs(shm, exist_ok=True)
                builder = builder.config("spark.local.dir", shm)
        except OSError:
            pass
    return builder.getOrCreate()
