"""Streaming twin of incremental IVF maintenance: append-cadence routing
+ maintenance-cadence refresh evaluation == the batch operator, with
exactly-once replay semantics (the package-wide twin contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_ivf_refresh_stream_equals_batch(spark, tmp_path):
    """Arriving vectors are routed per micro-batch against the standing
    centroid table and committed as exactly-once append deltas; the
    read-side maintenance pass over the committed log equals
    ``sim_ivf_refresh`` on the identical base/appended split, and
    replaying a committed batch id commits nothing."""
    from olap_db_spark.operators._vector import quantize
    from olap_db_spark.operators.data_selection import _md5_coin
    from olap_db_spark.operators.similarity import (
        _REFRESH_COIN_MOD,
        _REFRESH_COIN_PREFIX,
        ivf_base_index,
        sim_ivf_refresh,
    )
    from olap_db_spark.sources import versioned as V
    from olap_db_spark.streaming.ann_maintenance import (
        ivf_append_handler,
        ivf_refresh_from_log,
    )

    e = spark.read.parquet(SF + "/embeddings.parquet")
    is_new = _md5_coin(_REFRESH_COIN_PREFIX, F.col("vec_id"), _REFRESH_COIN_MOD) == 0
    allq = e.select(
        "vec_id", quantize(F.col("embedding")).alias("qv"), is_new.alias("is_new")
    )
    base = allq.filter(~F.col("is_new")).select("vec_id", "qv")
    new = allq.filter(F.col("is_new")).select("vec_id", "qv")

    assigned, cent, counts = ivf_base_index(spark, SF, base)
    # pin the standing index once (the persisted-index stand-in)
    assigned = assigned.localCheckpoint()
    cent = cent.localCheckpoint()
    counts = counts.localCheckpoint()

    src = tmp_path / "arrivals"
    src.mkdir()
    new.filter("vec_id % 2 = 0").coalesce(1).write.parquet(str(src / "a.parquet"))
    new.filter("vec_id % 2 = 1").coalesce(1).write.parquet(str(src / "b.parquet"))

    results = str(tmp_path / "routed")
    handler = ivf_append_handler(cent, results)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
    )
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(V.versions(results)) == 2, "one assignment delta per trigger"
    got = sorted(
        tuple(r)
        for r in ivf_refresh_from_log(spark, assigned, cent, counts, results).collect()
    )
    want = sorted(tuple(r) for r in sim_ivf_refresh(spark, SF).collect())
    assert got == want, "stream != batch on the identical base/appended split"
    assert any(r[3] == 1 for r in got), "vacuous: no cell crossed the threshold"

    # replay of a committed trigger: nothing commits
    handler(new.filter("vec_id % 2 = 1"), 1)
    assert len(V.versions(results)) == 2
