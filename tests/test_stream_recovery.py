"""Streaming checkpoint recovery: a file-sink stream stopped and
restarted from its checkpoint must process each input file EXACTLY
ONCE — the durability contract a production pipeline relies on."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("event_id", T.LongType()), T.StructField("value", T.DoubleType())]
)


def _run_until_done(spark, src, out, ckpt):
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .withColumn("doubled", F.col("value") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_resume_is_exactly_once(spark):
    tmp = tempfile.mkdtemp(prefix="skyhook_ckpt_")
    src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
    try:
        batch1 = spark.createDataFrame([(i, float(i)) for i in range(100)], SCHEMA)
        batch1.write.mode("overwrite").parquet(src)
        _run_until_done(spark, src, out, ckpt)
        assert spark.read.parquet(out).count() == 100

        # new file arrives; resume from the SAME checkpoint
        batch2 = spark.createDataFrame(
            [(i, float(i)) for i in range(100, 150)], SCHEMA
        )
        batch2.write.mode("append").parquet(src)
        _run_until_done(spark, src, out, ckpt)

        result = spark.read.parquet(out)
        assert result.count() == 150  # batch1 NOT reprocessed
        assert result.select(F.count_distinct("event_id")).collect()[0][0] == 150
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_drain_to_files_reads_only_committed_files(spark):
    """drain_to_files' read-back must honor the _spark_metadata commit
    log: a stray (uncommitted) parquet file dropped into the output
    directory — what a dead task's partial write looks like — is
    invisible to the batch read."""
    from skyhookdb_ceph_spark.streaming.replay import drain_to_files

    tmp = tempfile.mkdtemp(prefix="skyhook_filesink_t_")
    src, out = f"{tmp}/src", f"{tmp}/out"
    try:
        spark.createDataFrame(
            [(i, float(i)) for i in range(50)], SCHEMA
        ).write.mode("overwrite").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        committed = drain_to_files(stream.where(F.col("event_id") < 40), out)
        assert committed.count() == 40

        # simulate a partial write: an orphan file with valid parquet
        # bytes but no commit-log entry
        spark.createDataFrame([(999, 9.9)], SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/orphan")
        import glob as _glob

        orphan = _glob.glob(f"{tmp}/orphan/part-*.parquet")[0]
        shutil.copy(orphan, f"{out}/part-99999-orphan.snappy.parquet")
        assert spark.read.parquet(out).count() == 40  # orphan ignored
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
