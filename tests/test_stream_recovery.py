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
