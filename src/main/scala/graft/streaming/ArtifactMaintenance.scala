package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import StreamingOps.BandedDoc

/** Streaming twin of the batch day-over-day artifact loop
  * ([[graft.pipeline.Dedup.extendCorpusArtifact]]): a continuously
  * maintained (bandings, signatures) artifact that each micro-batch is
  * deduplicated AGAINST and that each micro-batch's survivors are
  * appended TO — the corpus is banded exactly once, ever.
  *
  * Per micro-batch (inside `foreachBatch`, so plain batch semantics):
  *  1. candidates = batch bandings ⋈ artifact bandings on (band, bucket)
  *     — the artifact doc always precedes — plus the in-batch bucket
  *     self-join with lower-id precedence (the batch incremental path's
  *     ordering);
  *  2. verification by signature-agreement estimated Jaccard
  *     ([[StreamingOps.verifyCandidatesBatch]], the streaming verify
  *     half) against the artifact's signatures plus the batch's own —
  *     a candidate-bounded join, never corpus-wide;
  *  3. survivors' bandings and signatures are appended to the artifact
  *     (per-doc banding is order-independent, so append IS
  *     `extendCorpusArtifact` — the
  *     `maintained == bandedCorpusArtifact(corpus ∪ survivors)` row-set
  *     invariant PipelineSuite pins for the batch loop holds here by the
  *     same argument, and StreamingSuite pins it end to end).
  *
  * 100 TB shape: stage 1 is batch-linear (only the batch is shingled,
  * signed, banded — [[StreamingOps.minhashBanded]] upstream); the
  * artifact side of the candidate join is partition-prunable parquet;
  * stage 2 joins candidate-bounded sets; stage 3 appends batch-sized
  * data. No corpus re-read, no text retained in the artifact, no
  * unbounded state — unlike the in-memory bucket state of
  * [[StreamingOps.nearDupCandidatesStream]], the artifact never expires,
  * so this loop also catches dups that straddle the state horizon.
  */
object ArtifactMaintenance {

  /** Seed the maintained artifact from an existing corpus — run once;
    * afterwards only survivors are ever appended.
    */
  def initArtifact(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      bandingsDir: String,
      signaturesDir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3): Unit = {
    import graft.pipeline.Dedup
    Dedup.bandedCorpusArtifact(corpus, idCol, textCol, numHashes, bands, shingleSize)
      .write.mode("overwrite").parquet(bandingsDir)
    Dedup.minhashSignatures(corpus, idCol, textCol, numHashes, shingleSize)
      .write.mode("overwrite").parquet(signaturesDir)
  }

  /** One micro-batch of the loop: dedup `batchBanded` (the collected
    * [[StreamingOps.minhashBanded]] rows of this batch) against the
    * artifact, append the survivors' rows to it, and write the survivor
    * ids to `survivorsDir`. Idempotent per unique doc id only to the
    * extent the upstream stream is (use checkpointing; exactly-once per
    * batch id is foreachBatch's contract).
    */
  def processBandedBatch(
      batchBanded: DataFrame,
      bandingsDir: String,
      signaturesDir: String,
      survivorsDir: String,
      threshold: Double = 0.5): Unit = {
    val spark = batchBanded.sparkSession
    val b = batchBanded.select("doc_id", "band", "bucket", "signature").persist()
    try {
      if (b.isEmpty) return
      val batchBand = b.select("doc_id", "band", "bucket")
      val batchSigs = b.groupBy("doc_id").agg(first("signature").as("signature"))
        .select(col("doc_id").as("id"), col("signature"))
      val artBand = spark.read.parquet(bandingsDir)
      val artSigs = spark.read.parquet(signaturesDir)
      // artifact doc precedes any batch doc; in-batch, lower id precedes —
      // the batch incremental path's precedence order
      val cvb = batchBand.as("nb").join(artBand.as("ab"),
          col("nb.band") === col("ab.band") && col("nb.bucket") === col("ab.bucket"))
        .select(col("nb.doc_id").as("doc_id"), col("ab.id").as("candidate_of"))
      val inb = batchBand.as("x").join(batchBand.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("y.doc_id").as("doc_id"), col("x.doc_id").as("candidate_of"))
      val verified = StreamingOps.verifyCandidatesBatch(
        cvb.unionByName(inb), artSigs.unionByName(batchSigs), threshold)
      val victims = verified.select("doc_id").distinct()
      // EAGER localCheckpoint, not persist: the survivor plan READS the
      // artifact paths (via the candidate join), and appending to a
      // parquet path makes Spark recache-by-path every cached plan that
      // reads it — a merely-persisted survivors frame would silently
      // RECOMPUTE against the already-extended artifact, match itself at
      // est_jaccard 1.0, and come back empty. Checkpointing truncates
      // the lineage so the artifact appends below cannot reach it.
      val survivors = batchSigs.select(col("id").as("doc_id"), col("signature"))
        .join(victims, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      survivors.select("doc_id").write.mode("append").parquet(survivorsDir)
      // append == extendCorpusArtifact: banding is per-doc, so the union
      // of old artifact rows and survivor rows is exactly a full re-band
      // of (corpus ∪ survivors)
      batchBand.join(survivors.select("doc_id"), Seq("doc_id"))
        .select(col("doc_id").as("id"), col("band"), col("bucket"))
        .write.mode("append").parquet(bandingsDir)
      survivors.select(col("doc_id").as("id"), col("signature"))
        .write.mode("append").parquet(signaturesDir)
    } finally b.unpersist(blocking = false)
  }

  /** Wire the loop onto a banded stream: `foreachBatch` runs
    * [[processBandedBatch]] per micro-batch. Caller provides the
    * checkpoint via `.option("checkpointLocation", ...)`-style settings
    * on the returned query's writer beforehand if resuming matters.
    */
  def artifactLoopSink(
      banded: Dataset[BandedDoc],
      bandingsDir: String,
      signaturesDir: String,
      survivorsDir: String,
      threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    banded.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBandedBatch(batch, bandingsDir, signaturesDir, survivorsDir, threshold)
      }
      .outputMode("append")
      .start()
}
