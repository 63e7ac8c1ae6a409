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


def stream_curated_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    ckpt_dir: str,
    n_batches: int = 4,
    max_hamming: int = 3,
    progress_out: list | None = None,
) -> DataFrame:
    """Streaming corpus curation: documents arrive in micro-batches and each
    batch is ADMITTED against the already-admitted state — within-batch
    keep-first near-dup screening (a doc is dropped if a lower-id doc in
    its batch is within ``max_hamming`` simhash bits) plus a cross-batch
    screen against every previously admitted doc (the incremental_dedup
    join, state-side banded). Only admitted (doc_id, simhash) rows append
    to the state table, partitioned by batch with dynamic partition
    overwrite — replays are idempotent, exactly the dvid-ingest discipline.

    Batches are the DETERMINISTIC split doc_id % n_batches, one parquet
    file per batch with ascending mtimes so the file source triggers them
    in order — which makes the whole streaming pipeline's admission
    semantics reproducible and (for fixed n_batches) expressible as an
    unrolled SQL oracle: a hash-checkable Structured Streaming pipeline.
    (The local file fabrication is the test fixture; in production the
    source is whatever landing zone delivers document batches — the
    foreachBatch admission logic is source-agnostic.)

    Scale: per micro-batch work is |batch| x band-density against state —
    increment-bounded; the state table is append-only and banded joins
    prune by band key. Returns per-batch admitted counts.
    """
    import os
    import time

    from ..operators import dedup as dd

    src_dir = f"{out_dir}_src"
    if not os.path.isdir(src_dir):
        import shutil

        os.makedirs(src_dir, exist_ok=True)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        t0 = time.time() - 3600
        # ONE partitioned write builds every batch file (vs n_batches
        # filtered jobs): repartition by the batch key -> one file per
        # dynamic partition, then lift the part files out with ascending
        # mtimes so the file source triggers them in batch order
        tmp = f"{src_dir}/_tmp_all"
        (
            docs.withColumn("_b", F.pmod(F.col("doc_id"), F.lit(n_batches)))
            .repartition(n_batches, "_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(tmp)
        )
        for b in range(n_batches):
            bdir = f"{tmp}/_b={b}"
            part = next(f for f in os.listdir(bdir) if f.startswith("part-"))
            dst = f"{src_dir}/batch_{b}.parquet"
            os.replace(f"{bdir}/{part}", dst)
            os.utime(dst, (t0 + b, t0 + b))  # trigger order = batch order
        shutil.rmtree(tmp, ignore_errors=True)

    schema = spark.read.parquet(src_dir).schema

    def band_keys(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(*[
                    F.concat_ws(
                        "_", F.lit(b), F.shiftright(F.col("simhash"), b * 8).bitwiseAND(F.lit(255))
                    )
                    for b in range(4)
                ])
            ).alias("band_key"),
        )

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # exact-collapse pre-pass on the SIMHASH VALUE (the production
        # order: exact dedup, then near-dup): docs sharing a simhash are
        # hamming-0 near-dups, so the keep-first screen would drop all but
        # the min-id one anyway — collapsing them first is
        # admission-identical (oracle hash unchanged, re-verified) but pins
        # the within-batch PAIR volume to distinct signatures: a batch with
        # d verbatim copies per doc otherwise generates d² near-dup pairs
        # per group (the 20× probe measured 3.5× wall for 2× docs before
        # this). Keying on the already-computed signature — not a separate
        # content fingerprint — makes the pre-pass one small groupBy, free
        # on natural data.
        sh_all = dd.simhash(batch_df)
        reps = sh_all.groupBy("simhash").agg(F.min("doc_id").alias("doc_id"))
        sh = sh_all.join(reps.select("doc_id"), "doc_id", "left_semi")
        batch_reps = batch_df.join(reps.select("doc_id"), "doc_id", "left_semi")

        # within-batch keep-first: drop any doc near-dup of a lower id
        within_drop = (
            dd.simhash_near_dup(batch_reps, max_hamming=max_hamming)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        survivors = sh.join(within_drop, "doc_id", "left_anti")
        state = (
            spark.read.parquet(out_dir).select("doc_id", "simhash")
            if os.path.isdir(out_dir)
            else None
        )
        if state is not None:
            nb = band_keys(survivors).withColumnsRenamed({"doc_id": "nid", "simhash": "nh"})
            sb = band_keys(state)
            rejected = (
                nb.join(sb, "band_key")
                .filter(F.bit_count(F.col("nh").bitwiseXOR(F.col("simhash"))) <= max_hamming)
                .select(F.col("nid").alias("doc_id"))
                .distinct()
            )
            survivors = survivors.join(rejected, "doc_id", "left_anti")
        batch_no = batch_df.select(
            F.pmod(F.min("doc_id"), F.lit(n_batches)).alias("b")
        ).collect()[0]["b"]
        (
            survivors.withColumn("batch_id", F.lit(int(batch_no)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", ckpt_dir)
        .start()
    )
    try:
        q.processAllAvailable()
        if progress_out is not None:
            progress_out.extend(q.recentProgress)
    finally:
        q.stop()

    state = spark.read.parquet(out_dir)
    return state.groupBy("batch_id").agg(F.count("*").alias("admitted")).orderBy("batch_id")
