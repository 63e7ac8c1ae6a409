"""Streaming dvid ingestion — the reference's injection scripts as a
Structured Streaming pipeline (U3/S4: ``second_third_and_forth_data_
injection.py`` appends a tagged batch per run; ``fifth_data_injection.py:
154-158`` verifies per-dvid counts).

Shape: readStream → foreachBatch(append with dvid = batch id) into a
dvid-PARTITIONED parquet state table. foreachBatch is the production
pattern for incremental upserts: each micro-batch runs an arbitrary BATCH
write (here an append into a partition, in general a MERGE), and the
checkpoint makes the whole pipeline restartable — a replayed batch
re-appends to the same dvid partition idempotently overwritten via
dynamic partition overwrite.

Scale: the state table is partitioned by dvid, so snapshot(dvid<=k) reads
prune to k partitions (the partition-prunable predicate graph/build.py's
snapshot() relies on); appends never rewrite history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import normalize_event_ts


def stream_dvid_ingest(
    spark: SparkSession, sf_dir: str, out_dir: str, ckpt_dir: str, rows_per_batch: int = 4000
) -> DataFrame:
    """Drain the events table through a rate-limited readStream, appending
    each micro-batch to ``out_dir`` as dvid = micro-batch id + 1 (dvid is
    1-based in the reference). Returns the per-dvid count frame read back
    from the state table.

    ``maxFilesPerTrigger`` can't split one parquet file, so batching is by
    row ranges: the source is pre-split into ceil(n/rows_per_batch) files
    and streamed one file per trigger — each trigger IS one injection.
    """
    import os

    src_dir = f"{out_dir}_src"
    if not os.path.isdir(src_dir):
        # deterministic row→file assignment (event_id ranges), one file per
        # injection. Created once: a restart must see the SAME file
        # identities, or the checkpoint's seen-files log would replay
        # everything as new input.
        events = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
        n_parts = max(1, (events.count() + rows_per_batch - 1) // rows_per_batch)
        (
            events.repartitionByRange(n_parts, "event_id")
            .write.mode("overwrite")
            .parquet(src_dir)
        )

    schema = spark.read.parquet(src_dir).schema

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        # dynamic partition overwrite: a replayed micro-batch rewrites its
        # own dvid partition instead of double-appending (idempotent)
        (
            batch_df.withColumn("dvid", F.lit(batch_id + 1))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("dvid")
            .parquet(out_dir)
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    state = spark.read.parquet(out_dir)
    return state.groupBy("dvid").agg(F.count("*").alias("cnt")).orderBy("dvid")
