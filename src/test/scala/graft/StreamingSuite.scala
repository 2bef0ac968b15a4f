package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSuite extends SparkSpec {

  private def eventsBatch = Tables.events(spark, "/root/testdata/sf0.001")

  test("streaming windowed counts equal the batch q6 aggregation") {
    val s = spark
    import s.implicits._
    val batch = eventsBatch.select("ts", "event_type", "value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))

    implicit val sq = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val query = StreamingOps.windowedEventCounts(streamDf)
      .writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("append")
      .start()
    try {
      // two micro-batches + a far-future row to advance the watermark past
      // every real window
      val (a, b) = batch.splitAt(batch.length / 2)
      mem.addData(a.toSeq)
      query.processAllAvailable()
      mem.addData(b.toSeq)
      query.processAllAvailable()
      mem.addData(Seq((java.sql.Timestamp.valueOf("2999-01-01 00:00:00"), "zz", 0.0)))
      query.processAllAvailable()

      val streamed = s.sql(
        "SELECT window_start, event_type, event_count FROM win_counts WHERE event_type <> 'zz'")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val expected = Queries.q6EventWindows(s, "/root/testdata/sf0.001")
        .select("window_start", "event_type", "event_count")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === expected)
    } finally query.stop()
  }

  test("streaming session counts equal the batch sessionization") {
    val s = spark
    import s.implicits._
    val batch = eventsBatch.select("ts", "user_id")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))

    implicit val sq = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val streamDf = mem.toDF().toDF("ts", "user_id")
    val query = StreamingOps.sessionCounts(streamDf)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    try {
      mem.addData(batch.toSeq)
      query.processAllAvailable()
      mem.addData(Seq((java.sql.Timestamp.valueOf("2999-01-01 00:00:00"), -1L)))
      query.processAllAvailable()
      val streamed = s.sql(
        "SELECT user_id, count(*) AS n_sessions, sum(n_events) AS n_events FROM sessions " +
          "WHERE user_id >= 0 GROUP BY user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val expected = Queries.pSessions(s, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === expected)
    } finally query.stop()
  }

  test("streaming dedup keeps the first occurrence per fingerprint") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)] // ts, doc_id, fingerprint
    val streamDf = mem.toDF().toDF("ts", "doc_id", "fp")
    val query = graft.streaming.StreamingOps.dedupStream(streamDf, "fp", "ts")
      .writeStream.format("memory").queryName("dedup_out").outputMode("append")
      .start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData((t(0), 1L, 100L), (t(1), 2L, 200L), (t(2), 3L, 100L))
      query.processAllAvailable()
      mem.addData((t(3), 4L, 100L), (t(4), 5L, 300L))
      query.processAllAvailable()
      val kept = s.sql("SELECT fp, count(*) FROM dedup_out GROUP BY fp")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(kept === Map(100L -> 1L, 200L -> 1L, 300L -> 1L))

      // state is bounded by the watermark: after it advances past the
      // expiry horizon, a re-arriving fingerprint is a NEW occurrence
      mem.addData((java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), 6L, 999L))
      query.processAllAvailable()
      mem.addData((java.sql.Timestamp.valueOf("2024-01-02 10:01:00"), 7L, 100L))
      query.processAllAvailable()
      val again = s.sql("SELECT count(*) FROM dedup_out WHERE fp = 100")
        .head().getLong(0)
      assert(again === 2L, "expired fingerprint state must allow re-emission")
    } finally query.stop()
  }

  test("streaming dedup runs on the RocksDB state store provider") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val streamDf = mem.toDF().toDF("ts", "doc_id", "fp")
    val query = graft.streaming.StreamingOps.dedupStream(streamDf, "fp", "ts")
      .writeStream.format("memory").queryName("dedup_rocks").outputMode("append")
      .start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData((t(0), 1L, 100L), (t(1), 2L, 200L), (t(2), 3L, 100L))
      query.processAllAvailable()
      mem.addData((t(3), 4L, 200L), (t(4), 5L, 300L))
      query.processAllAvailable()
      val kept = s.sql("SELECT fp, count(*) FROM dedup_rocks GROUP BY fp")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(kept === Map(100L -> 1L, 200L -> 1L, 300L -> 1L))
      // the provider actually engaged: RocksDB-specific state metrics are
      // reported in the query progress
      val progressJson = query.recentProgress.map(_.json).mkString
      assert(progressJson.contains("rocksdb"),
        "query progress carries no rocksdb state metrics — provider not engaged")
    } finally {
      query.stop()
      prev match {
        case Some(v) => s.conf.set(providerKey, v)
        case None => s.conf.unset(providerKey)
      }
    }
  }

  test("late events beyond the watermark are dropped, not double-counted") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val query = StreamingOps.windowedEventCounts(streamDf, watermark = "1 hour")
      .writeStream.format("memory").queryName("late_win").outputMode("append")
      .start()
    try {
      def ts(v: String) = java.sql.Timestamp.valueOf(v)
      // window [10:00, 11:00) gets two on-time events
      mem.addData((ts("2024-01-01 10:00:00"), "a", 1.0), (ts("2024-01-01 10:30:00"), "a", 1.0))
      query.processAllAvailable()
      // advance the watermark to 13:00 - 1h = 12:00 -> the 10:00 window
      // finalizes and is emitted
      mem.addData((ts("2024-01-01 13:00:00"), "b", 1.0))
      query.processAllAvailable()
      // a late event for the finalized window: must be dropped
      mem.addData((ts("2024-01-01 10:45:00"), "a", 1.0))
      query.processAllAvailable()
      // flush the remaining window so all appends are visible
      mem.addData((ts("2024-01-01 20:00:00"), "c", 1.0))
      query.processAllAvailable()

      val aCount = s.sql(
        "SELECT event_count FROM late_win WHERE event_type = 'a'")
        .collect().map(_.getLong(0))
      assert(aCount.toSeq === Seq(2L),
        s"late event must not re-open or re-count the finalized window: $aCount")
      val dropped = query.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1L, "watermark drop metric did not register the late event")
    } finally query.stop()
  }

  test("stream-stream interval join equals the batch interval join") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val batch = eventsBatch.select("ts", "user_id", "event_id", "event_type")
    val clicks = batch.filter(col("event_type") === "click")
    val purchases = batch.filter(col("event_type") === "purchase")
    val expected = graft.streaming.StreamingOps
      .intervalJoin(clicks, purchases)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val rows = batch.collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val memL = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val memR = MemoryStream[(java.sql.Timestamp, Long, Long, String)]
    val ldf = memL.toDF().toDF("ts", "user_id", "event_id", "event_type")
    val rdf = memR.toDF().toDF("ts", "user_id", "event_id", "event_type")
    val query = graft.streaming.StreamingOps.intervalJoin(ldf, rdf)
      .writeStream.format("memory").queryName("ij_out").outputMode("append")
      .start()
    try {
      memL.addData(rows.filter(_._4 == "click").toSeq)
      memR.addData(rows.filter(_._4 == "purchase").toSeq)
      query.processAllAvailable()
      val far = java.sql.Timestamp.valueOf("2999-01-01 00:00:00")
      memL.addData(Seq((far, -1L, -1L, "click")))
      memR.addData(Seq((far, -1L, -1L, "purchase")))
      query.processAllAvailable()
      val streamed = s.sql("SELECT user_id, l_id, r_id FROM ij_out WHERE user_id >= 0")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === expected)
    } finally query.stop()
  }

  test("stateful query resumes from checkpoint with state intact") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val mem = MemoryStream[StreamingOps.UserEvent]

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]()
    def start() = StreamingOps.runningUserStats(mem.toDS())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingOps.UserStats], _: Long) =>
        batch.collect().foreach(u => seen.add((u.user_id, u.n_events, u.sum_value)))
      }
      .start()

    val q1 = start()
    mem.addData(StreamingOps.UserEvent(7, "a", 10.0), StreamingOps.UserEvent(7, "b", 5.0))
    q1.processAllAvailable()
    q1.stop()

    // restart against the same checkpoint; state must carry the first run
    val q2 = start()
    try {
      mem.addData(StreamingOps.UserEvent(7, "c", 1.0))
      q2.processAllAvailable()
      val last = seen.toArray(Array.empty[(Long, Long, Double)]).last
      assert(last === ((7L, 3L, 16.0)))
    } finally q2.stop()
  }

  test("streaming minhash near-dup detection flags planted dups; banding matches batch") {
    val s = spark
    import s.implicits._
    // 20 distinct docs + near-dups of docs 0 and 1 arriving later
    val rng = new scala.util.Random(7)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "quick", "brown", "fox", "jumps")
    val base = (0 until 20).map(i =>
      (i.toLong, Array.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" ")))
    def dupOf(i: Int, id: Long) = {
      val toks = base(i)._2.split(" ")
      (id, (toks.dropRight(2) ++ Array("x", "y")).mkString(" "))
    }
    val dups = Seq(dupOf(0, 100L), dupOf(1, 101L))
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)

    // batch-parity check: the streaming banding of the same docs yields
    // exactly the batch pipeline's (id, band, bucket) rows
    val allDocs = (base ++ dups).toDF("doc_id", "text")
      .withColumn("ts", lit(t0))
    val streamingBands = StreamingOps.minhashBanded(
        allDocs, "doc_id", "text", "ts", numHashes = 16, bands = 4)
      .collect().map(b => (b.doc_id, b.band, b.bucket)).toSet
    val sigs = pipeline.Dedup.minhashSignatures(allDocs, "doc_id", "text", 16)
    val batchBands = sigs.select(
        col("id"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            org.apache.spark.sql.graft.GraftExpressions
              .longSliceHash(col("signature"), b * 4, 4, b.toLong).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamingBands === batchBands)

    // streaming detection: originals first, dups in a later micro-batch
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val streamDf = mem.toDF().toDF("doc_id", "text", "ts")
    val banded = StreamingOps.minhashBanded(
      streamDf, "doc_id", "text", "ts", numHashes = 16, bands = 4)
    val query = StreamingOps.nearDupHitsStream(banded, threshold = 0.5)
      .writeStream.format("memory").queryName("near_dups").outputMode("append")
      .start()
    try {
      mem.addData(base.map { case (id, t) => (id, t, ts(0)) })
      query.processAllAvailable()
      mem.addData(dups.map { case (id, t) => (id, t, ts(10)) })
      query.processAllAvailable()
      val hits = s.sql("SELECT doc_id, dup_of FROM near_dups")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // each planted dup is flagged against its original (possibly from
      // several bands — set semantics); no original is flagged
      assert(hits === Set((100L, 0L), (101L, 1L)), s"hits: $hits")
    } finally query.stop()
  }

  test("streaming near-dup hits equal the batch minhashPairs pair set") {
    val s = spark
    import s.implicits._
    // a corpus with planted near-dups (same generator shape as
    // PipelineSuite.docs), streamed in id order across 3 micro-batches.
    // Structural invariants (hold for ANY data): every streaming hit is a
    // batch pair (same estimator over a candidate subset), and every doc
    // with a qualifying earlier partner gets flagged (they share a band
    // bucket, and in id-order arrival the partner is already in state).
    // Streaming emits only the BEST match per arriving doc, so hit-set
    // EQUALITY additionally relies on this fixture's single-partner
    // planting (each dup near-dups exactly one original).
    val rng = new scala.util.Random(23)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "the", "and", "of", "quick", "brown", "fox")
    val base = (0 until 60).map { i =>
      (i.toLong, Array.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val dups = (0 until 6).map { i =>
      val toks = base(i)._2.split(" ")
      (1000L + i, (toks.dropRight(3) ++ Array("x", "y", "z")).mkString(" "))
    }
    val all = base ++ dups
    val batchPairs = pipeline.Dedup.minhashPairs(
        all.toDF("doc_id", "text"), "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val streamDf = mem.toDF().toDF("doc_id", "text", "ts")
    val banded = StreamingOps.minhashBanded(
      streamDf, "doc_id", "text", "ts", numHashes = 16, bands = 4)
    val query = StreamingOps.nearDupHitsStream(banded, threshold = 0.5)
      .writeStream.format("memory").queryName("near_dup_parity").outputMode("append")
      .start()
    try {
      all.sortBy(_._1).grouped(25).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk.map { case (id, t) =>
          (id, t, new java.sql.Timestamp(t0.getTime + i * 60000L))
        })
        query.processAllAvailable()
      }
      val hits = s.sql("SELECT dup_of, doc_id FROM near_dup_parity")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // structural: hits ⊆ pairs, and the flagged-doc sets coincide
      assert(hits.subsetOf(batchPairs), s"streaming hits not in batch pairs: ${hits -- batchPairs}")
      assert(hits.map(_._2) === batchPairs.map(_._2),
        s"flagged docs ${hits.map(_._2)} vs batch victims ${batchPairs.map(_._2)}")
      // fixture-specific (single partner per dup): exact pair equality
      assert(hits === batchPairs, s"streaming hits $hits vs batch pairs $batchPairs")
      assert(batchPairs.nonEmpty) // the comparison must not be vacuous
    } finally query.stop()
  }

  test("candidate stream strips the signature from the state shuffle and covers batch pairs") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(41)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "the", "and", "of", "quick", "brown", "fox")
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val dups = (0 until 4).map { i =>
      val toks = base(i)._2.split(" ")
      (1000L + i, (toks.dropRight(3) ++ Array("x", "y", "z")).mkString(" "))
    }
    val all = base ++ dups
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

    // row-width pin (batch-mode planning of the same operators): the
    // candidate path's state shuffle must NOT carry the signature array,
    // while the exact-hit path's one does — that is the whole point
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the exchange is inserted by EnsureRequirements (executedPlan), and
    // AQE would wrap it behind an adaptive root — disable AQE for the
    // width check so the exchange is directly collectible. Restore the
    // PRIOR value, not a hardcoded one, so the shared session's conf is
    // exactly what the next test expects.
    val aqeBefore = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val allDf = all.toDF("doc_id", "text").withColumn("ts", lit(t0))
      val bandedBatch = StreamingOps.minhashBanded(allDf, "doc_id", "text", "ts", 16, 4)
      def exchangeCols(df: org.apache.spark.sql.Dataset[_]): Seq[Seq[String]] =
        df.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e.output.map(_.name.toLowerCase)
        }
      val candCols = exchangeCols(StreamingOps.nearDupCandidatesStream(bandedBatch))
      assert(candCols.nonEmpty)
      assert(candCols.forall(!_.exists(_.contains("signature"))),
        s"candidate-path shuffle still carries the signature: $candCols")
      val hitCols = exchangeCols(StreamingOps.nearDupHitsStream(bandedBatch))
      assert(hitCols.exists(_.exists(_.contains("signature"))),
        s"expected the exact-hit path to carry signatures (baseline): $hitCols")
    } finally s.conf.set("spark.sql.adaptive.enabled", aqeBefore)

    // parity: streamed candidates (id-order arrival) = the batch LSH
    // candidate pair set over the same banding
    val sigs = pipeline.Dedup.minhashSignatures(all.toDF("doc_id", "text"), "doc_id", "text", 16)
    val batchCands = pipeline.Dedup.minhashCandidatePairs(sigs, 4, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val banded = StreamingOps.minhashBanded(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", 16, 4)
    val query = StreamingOps.nearDupCandidatesStream(banded)
      .writeStream.format("memory").queryName("near_dup_cands").outputMode("append")
      .start()
    try {
      all.sortBy(_._1).grouped(20).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk.map { case (id, t) =>
          (id, t, new java.sql.Timestamp(t0.getTime + i * 60000L))
        })
        query.processAllAvailable()
      }
      val streamed = s.sql("SELECT candidate_of, doc_id FROM near_dup_cands")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batchCands,
        s"streamed candidates ${streamed} vs batch ${batchCands}")
      assert(batchCands.nonEmpty)
    } finally query.stop()
  }

  test("candidates + foreachBatch verification equal the batch minhashPairs") {
    val s = spark
    import s.implicits._
    // the full streaming propose/verify loop: signature-free candidate
    // stream, then per-micro-batch verification against a signature
    // table — must reproduce the batch pipeline's verified pairs exactly
    val rng = new scala.util.Random(57)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "the", "and", "of", "quick", "brown", "fox")
    val base = (0 until 50).map { i =>
      (i.toLong, Array.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val dups = (0 until 5).map { i =>
      val toks = base(i)._2.split(" ")
      (1000L + i, (toks.dropRight(3) ++ Array("x", "y", "z")).mkString(" "))
    }
    val all = base ++ dups
    val allDf = all.toDF("doc_id", "text")
    val sigs = pipeline.Dedup.minhashSignatures(allDf, "doc_id", "text", 16)
    sigs.persist()
    val batchPairs = pipeline.Dedup.minhashPairs(allDf, "doc_id", "text",
        numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val banded = StreamingOps.minhashBanded(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts", 16, 4)
    val verified = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    val query = StreamingOps.nearDupCandidatesStream(banded)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamingOps.CandidatePair], _: Long) =>
        StreamingOps.verifyCandidatesBatch(batch.toDF(), sigs, 0.5)
          .collect().foreach(r =>
            verified += ((r.getLong(1), r.getLong(0), r.getDouble(2))))
        ()
      }
      .start()
    try {
      all.sortBy(_._1).grouped(20).zipWithIndex.foreach { case (chunk, i) =>
        mem.addData(chunk.map { case (id, t) =>
          (id, t, new java.sql.Timestamp(t0.getTime + i * 60000L))
        })
        query.processAllAvailable()
      }
      // (dup_of, doc_id, est) with id-order arrival == batch (doc_a <
      // doc_b, est): same candidate set (suite-pinned upstream), same
      // component-agreement estimator, same rounding
      assert(verified.toSet === batchPairs,
        s"verified ${verified.toSet} vs batch $batchPairs")
      assert(batchPairs.nonEmpty)
    } finally {
      query.stop()
      sigs.unpersist(blocking = false)
    }
  }

  test("near-dup bucket overflow: a re-arriving doc is not re-emitted") {
    val s = spark
    import s.implicits._
    // maxPerBucket = 1: doc 0 fills the bucket; doc 1 is compared and
    // flagged but NOT stored (cap). Its id must still be remembered so a
    // re-arrival in a later micro-batch does not emit the same hit twice.
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val banded = StreamingOps.minhashBanded(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      numHashes = 16, bands = 4)
    val query = StreamingOps.nearDupHitsStream(banded, threshold = 0.5, maxPerBucket = 1)
      .writeStream.format("memory").queryName("near_dup_overflow")
      .outputMode("append").start()
    try {
      mem.addData(Seq((0L, text, ts(0))))
      query.processAllAvailable()
      mem.addData(Seq((1L, text, ts(1))))
      query.processAllAvailable()
      val afterFirst = s.sql("SELECT * FROM near_dup_overflow WHERE doc_id = 1").count()
      assert(afterFirst > 0, "overflow doc was not flagged on first arrival")
      mem.addData(Seq((1L, text, ts(2))))
      query.processAllAvailable()
      val afterSecond = s.sql("SELECT * FROM near_dup_overflow WHERE doc_id = 1").count()
      assert(afterSecond === afterFirst, "re-arriving overflow doc was emitted again")
    } finally query.stop()
  }

  test("minhashBanded sheds non-numeric ids, null ts, null text instead of failing") {
    val s = spark
    import s.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // the guard must filter on the CASTED id: "not-a-number" is non-null
    // before the cast but null after it, and would otherwise kill the
    // query in the non-nullable Long decode
    val df = Seq(
      ("7", "alpha beta gamma delta", t0),
      ("not-a-number", "alpha beta gamma delta", t0),
      ("8", "alpha beta gamma delta", null.asInstanceOf[java.sql.Timestamp]),
      (null.asInstanceOf[String], "alpha beta gamma delta", t0),
      ("9", null.asInstanceOf[String], t0)
    ).toDF("doc_id", "text", "ts")
    val ids = StreamingOps.minhashBanded(df, "doc_id", "text", "ts", 16, 4)
      .collect().map(_.doc_id).toSet
    assert(ids === Set(7L))
  }

  test("streaming artifact loop matches the batch two-day incremental loop") {
    val s = spark
    import s.implicits._
    // the PipelineSuite two-day fixture: corpus0 pre-seeded, then two
    // daily batches each containing originals plus planted near-dups of
    // those originals, streamed as two micro-batches
    val rng = new scala.util.Random(23)
    val vocab = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "the", "and", "of", "quick", "brown", "fox")
    val base = (0 until 100).map { i =>
      (i.toLong, Array.fill(40)(vocab(rng.nextInt(vocab.length))).mkString(" "))
    }
    val dups = (0 until 10).map { i =>
      val toks = base(i)._2.split(" ")
      (1000L + i, (toks.dropRight(3) ++ Array("x", "y", "z")).mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "text")
    val corpus0 = docs.filter(col("doc_id") >= 10 && col("doc_id") < 1000)
    val batch1 = (base.take(5) ++ dups.take(5))
    val batch2 = (base.slice(5, 10) ++ dups.slice(5, 10))
    val nh = 16
    val nb = 4

    val dir = java.nio.file.Files.createTempDirectory("stream_art").toString
    val (bandDir, sigDir, survDir) =
      (s"$dir/bandings", s"$dir/signatures", s"$dir/survivors")
    streaming.ArtifactMaintenance.initArtifact(
      corpus0, "doc_id", "text", bandDir, sigDir, nh, nb)

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val streamDf = mem.toDF().toDF("doc_id", "text", "ts")
    val banded = StreamingOps.minhashBanded(streamDf, "doc_id", "text", "ts", nh, nb)
    val query = streaming.ArtifactMaintenance.artifactLoopSink(
      banded, bandDir, sigDir, survDir)
    try {
      mem.addData(batch1.map { case (id, t) => (id, t, t0) })
      query.processAllAvailable()
      mem.addData(batch2.map { case (id, t) =>
        (id, t, new java.sql.Timestamp(t0.getTime + 60000L))
      })
      query.processAllAvailable()
    } finally query.stop()

    val streamedSurvivors = s.read.parquet(survDir)
      .collect().map(_.getLong(0)).toSet

    // batch reference: the SAME two days through the batch incremental
    // loop with the maintained batch artifact (PipelineSuite's invariant)
    val art0 = pipeline.Dedup.bandedCorpusArtifact(corpus0, "doc_id", "text", nh, nb)
    val surv1 = pipeline.Dedup.incrementalDedupSurvivors(
      corpus0, batch1.toDF("doc_id", "text"), "doc_id", "text",
      numHashes = nh, bands = nb, corpusBanded = Some(art0))
    surv1.persist()
    val surv1Ids = surv1.select("doc_id").collect().map(_.getLong(0)).toSet
    val corpus1 = corpus0.unionByName(docs.filter(col("doc_id").isin(surv1Ids.toSeq: _*)))
    val art1 = pipeline.Dedup.extendCorpusArtifact(art0, surv1, "doc_id", "text", nh, nb)
    val surv2Ids = pipeline.Dedup.incrementalDedupSurvivors(
        corpus1, batch2.toDF("doc_id", "text"), "doc_id", "text",
        numHashes = nh, bands = nb, corpusBanded = Some(art1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    surv1.unpersist(blocking = false)
    assert(streamedSurvivors === (surv1Ids ++ surv2Ids),
      s"streaming survivors $streamedSurvivors vs batch ${surv1Ids ++ surv2Ids}")
    // the fixture's planted dups are dropped, originals survive
    assert(streamedSurvivors === (0L until 10L).toSet)

    // the corpus-recompute-free invariant, streaming edition: the
    // maintained banding artifact is row-set-identical to a full re-band
    // of corpus0 ∪ survivors
    val maintained = s.read.parquet(bandDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val fullReband = pipeline.Dedup.bandedCorpusArtifact(
        corpus0.unionByName(docs.filter(col("doc_id") < 10L)), "doc_id", "text", nh, nb)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(maintained === fullReband)
    // and the signature artifact matches a full recompute too
    val maintainedSigs = s.read.parquet(sigDir)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val fullSigs = pipeline.Dedup.minhashSignatures(
        corpus0.unionByName(docs.filter(col("doc_id") < 10L)), "doc_id", "text", nh)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(maintainedSigs === fullSigs)
  }

  test("stateless corpus transforms (chunking, decontamination) run verbatim on streams") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "x y z"),
      (3L, "a b c q r s t u v w"), (4L, "m n o p")
    )
    val evalGrams = graft.pipeline.Decontaminate.evalGramArray(
      Seq((99L, "a b c d")).toDF("doc_id", "text"), "text", 3)

    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    // the SAME Column programs applied to a streaming frame: chunking's
    // sequence/transform/explode and decontamination's broadcast-array
    // UDF are stateless, so they must run append-mode with no watermark
    val chunkQ = graft.pipeline.Chunking.chunkDocuments(streamDf, "text", 5, 3)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .writeStream.format("memory").queryName("chunk_out").outputMode("append")
      .start()
    val deconQ = graft.pipeline.Decontaminate
      .markContaminated(streamDf, "text", 3, evalGrams)
      .select("doc_id", "n_ngrams", "n_hits")
      .writeStream.format("memory").queryName("decon_out").outputMode("append")
      .start()
    try {
      mem.addData(docs.take(2): _*)
      Seq(chunkQ, deconQ).foreach(_.processAllAvailable())
      mem.addData(docs.drop(2): _*)
      Seq(chunkQ, deconQ).foreach(_.processAllAvailable())

      val batchDf = docs.toDF("doc_id", "text")
      val chunkBatch = graft.pipeline.Chunking.chunkDocuments(batchDf, "text", 5, 3)
        .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
        .collect().map(_.toSeq).toSet
      val chunkStream = s.sql("SELECT * FROM chunk_out").collect().map(_.toSeq).toSet
      assert(chunkStream === chunkBatch)

      val deconBatch = graft.pipeline.Decontaminate
        .markContaminated(batchDf, "text", 3, evalGrams)
        .select("doc_id", "n_ngrams", "n_hits")
        .collect().map(_.toSeq).toSet
      val deconStream = s.sql("SELECT * FROM decon_out").collect().map(_.toSeq).toSet
      assert(deconStream === deconBatch)
      // the planted contaminated doc really hits: 'a b c' from doc 3
      assert(deconStream.exists(r => r.head == 3L && r(2).asInstanceOf[Long] > 0L))
    } finally Seq(chunkQ, deconQ).foreach(_.stop())
  }

  test("range sharding against precomputed bounds runs verbatim on a stream") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val rows = (1 to 60).map(i => (i.toLong, ((i * 7) % 23).toLong))
    val batchDf = rows.toDF("id", "k")
    // boundaries derived ONCE from the batch corpus (R-1 plain doubles),
    // then served: batch-with-bounds must equal the self-deriving path...
    val derived = graft.pipeline.Sampling.rangeShards(batchDf, "k", 4)
      .select("id", "shard_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val ps = Seq(0.25, 0.5, 0.75)
    val bounds = batchDf
      .agg(percentile(col("k").cast("double"), typedLit(ps)).as("bs"))
      .head().getSeq[Double](0)
    val withBounds = graft.pipeline.Sampling
      .rangeShardsWithBounds(batchDf, "k", bounds)
      .select("id", "shard_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(withBounds === derived)

    // ...and the SAME call on a stream is a stateless projection:
    // append mode, no watermark, identical assignments
    val mem = MemoryStream[(Long, Long)]
    val q = graft.pipeline.Sampling
      .rangeShardsWithBounds(mem.toDF().toDF("id", "k"), "k", bounds)
      .select("id", "shard_id")
      .writeStream.format("memory").queryName("shard_out").outputMode("append")
      .start()
    try {
      mem.addData(rows.take(30): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(30): _*)
      q.processAllAvailable()
      val streamed = s.sql("SELECT * FROM shard_out")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(streamed === derived)
    } finally q.stop()
  }

  test("map-side LM scoring and mixture rate application run verbatim on streams") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import graft.pipeline.{LanguageModel, Sampling}
    val modelCorpus = Seq((0L, "the cat sat on the mat the cat ran"))
      .toDF("doc_id", "text")
    val model = LanguageModel.collectModel(
      LanguageModel.unigramCounts(modelCorpus, "text"),
      LanguageModel.bigramCounts(modelCorpus, "text"))
    val docs = Seq(
      (1L, "en", "the cat sat"), (2L, "en", "mat ran the on"),
      (3L, "de", "qq zz ww"), (4L, "de", "solo"), (5L, "en", "the mat"))
    val batchDf = docs.toDF("doc_id", "lang", "text")
    val rates = Sampling.temperatureRates(batchDf, "lang", 0.3, 4L)
      .persist()
    rates.count()

    val mem = MemoryStream[(Long, String, String)]
    val streamDf = mem.toDF().toDF("doc_id", "lang", "text")
    // both operators are stateless (broadcast model / broadcast static
    // rate table + map arithmetic): append mode, no watermark, and the
    // SAME code path as batch
    val lmQ = LanguageModel.scoreWithModel(streamDf, "doc_id", "text", model)
      .writeStream.format("memory").queryName("lm_out").outputMode("append")
      .start()
    val mixQ = Sampling.applyRates(streamDf, "lang", "doc_id", rates)
      .select("doc_id", "lang", "rate", "n_copies")
      .writeStream.format("memory").queryName("mix_out").outputMode("append")
      .start()
    try {
      mem.addData(docs.take(2): _*)
      Seq(lmQ, mixQ).foreach(_.processAllAvailable())
      mem.addData(docs.drop(2): _*)
      Seq(lmQ, mixQ).foreach(_.processAllAvailable())

      val lmBatch = LanguageModel.scoreWithModel(batchDf, "doc_id", "text", model)
        .collect().map(_.toSeq).toSet
      assert(s.sql("SELECT * FROM lm_out").collect().map(_.toSeq).toSet === lmBatch)
      val mixBatch = Sampling.applyRates(batchDf, "lang", "doc_id", rates)
        .select("doc_id", "lang", "rate", "n_copies")
        .collect().map(_.toSeq).toSet
      assert(s.sql("SELECT * FROM mix_out").collect().map(_.toSeq).toSet === mixBatch)
      // and the streamed scorer agrees with the distributed batch path
      val distBatch = LanguageModel.scoreDocs(batchDf, "doc_id", "text",
          LanguageModel.unigramCounts(modelCorpus, "text"),
          LanguageModel.bigramCounts(modelCorpus, "text"))
        .collect().map(_.toSeq).toSet
      assert(lmBatch === distBatch)
    } finally {
      Seq(lmQ, mixQ).foreach(_.stop())
      rates.unpersist(blocking = false)
    }
  }

  test("broadcast-model quality-classifier scoring runs verbatim on a document stream") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import graft.pipeline.QualityClassifier
    // a deterministic synthetic model (the gate's LCG table) — the
    // streaming pin is about the SCORER's stateless map-side shape, not
    // training
    val nb = 64
    val weights = (0 until nb).map { b =>
      val u = java.lang.Math.floorMod(b.toLong * 1103515245L + 12345L, 4294967296L) / 4294967296.0
      BigDecimal(u * 0.2 - 0.1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toArray
    val model = QualityClassifier.LinearModel(weights, 0.037)
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "alpha beta gamma"),
      (3L, null.asInstanceOf[String]), (4L, "solo"), (5L, "  padded   text  "))
    val batchDf = docs.toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    // stateless broadcast scorer: append mode, no watermark, the SAME
    // code path as batch
    val q = QualityClassifier.scoreWithModel(streamDf, "doc_id", "text", model)
      .writeStream.format("memory").queryName("qc_out").outputMode("append")
      .start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val batch = QualityClassifier.scoreWithModel(batchDf, "doc_id", "text", model)
        .collect().map(_.toSeq).toSet
      assert(s.sql("SELECT * FROM qc_out").collect().map(_.toSeq).toSet === batch)
      // and the streamed scorer agrees with the distributed join path
      val tbl = QualityClassifier.lcgWeightTable(batchDf, nb)
      val dist = QualityClassifier
        .scoreWithTable(batchDf, "doc_id", "text", tbl, 0.037, nb)
        .collect().map(_.toSeq).toSet
      assert(batch === dist)
    } finally q.stop()
  }

  test("winnowing fingerprint selection runs verbatim on a document stream") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import graft.pipeline.Winnowing
    val docs = Seq(
      (0L, (0 until 20).map(i => s"tok$i").mkString(" ")),
      (1L, "zzz yyy tok5 tok6 tok7 tok8 tok9 tok10 www"),
      (2L, "short"), (3L, null.asInstanceOf[String]),
      (4L, Seq.fill(9)("same").mkString(" ")))
    val batchDf = docs.toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("doc_id", "text")
    // map-side selection (per-row array program, no shuffle): append
    // mode, no watermark, the SAME code path as batch
    val q = Winnowing.winnowFingerprints(streamDf, "doc_id", "text", 3, 4)
      .writeStream.format("memory").queryName("win_out").outputMode("append")
      .start()
    try {
      mem.addData(docs.take(2): _*)
      q.processAllAvailable()
      mem.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val batch = Winnowing.winnowFingerprints(batchDf, "doc_id", "text", 3, 4)
        .collect().map(_.toSeq).toSet
      assert(s.sql("SELECT * FROM win_out").collect().map(_.toSeq).toSet === batch)
    } finally q.stop()
  }

  test("broadcast-index BM25 query scoring runs verbatim on a query stream") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    import graft.pipeline.Retrieval
    val docs = Seq(
      (0L, "alpha beta gamma alpha"),
      (1L, "alpha beta"),
      (2L, "gamma delta epsilon"),
      (3L, "beta beta beta"),
      (4L, "alpha gamma delta")
    ).toDF("doc_id", "text")
    val (n, tot) = Retrieval.indexStats(docs, "text")
    val idx = Retrieval.collectIndex(
      Retrieval.postings(docs, "doc_id", "text"), n, tot)
    val queries = Seq(
      (10L, "alpha beta alpha"), (11L, "delta gamma"), (12L, "no-match"))
    val batchDf = queries.toDF("query_id", "qtext")

    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF().toDF("query_id", "qtext")
    // stateless map-side scorer: append mode, no watermark, SAME code
    // path as batch — the online-serving deployment of the BM25 stack
    val q = Retrieval.scoreWithIndex(streamDf, "query_id", "qtext", idx, 3)
      .writeStream.format("memory").queryName("bm25_out").outputMode("append")
      .start()
    try {
      mem.addData(queries.take(2): _*)
      q.processAllAvailable()
      mem.addData(queries.drop(2): _*)
      q.processAllAvailable()
      val streamed = s.sql("SELECT * FROM bm25_out").collect().map(_.toSeq).toSet
      val batch = Retrieval.scoreWithIndex(batchDf, "query_id", "qtext", idx, 3)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // and the broadcast scorer agrees with the distributed corpus path
      val dist = Retrieval.bm25TopK(docs, "doc_id", "text",
          batchDf, "query_id", "qtext", 3)
        .collect().map(_.toSeq).toSet
      assert(batch === dist)
    } finally q.stop()
  }

  test("flatMapGroupsWithState running stats accumulate across batches") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val mem = MemoryStream[StreamingOps.UserEvent]
    val query = StreamingOps.runningUserStats(mem.toDS())
      .writeStream.format("memory").queryName("user_stats").outputMode("update")
      .start()
    try {
      mem.addData(StreamingOps.UserEvent(1, "a", 1.0), StreamingOps.UserEvent(1, "b", 2.0))
      query.processAllAvailable()
      mem.addData(StreamingOps.UserEvent(1, "c", 3.0), StreamingOps.UserEvent(2, "a", 5.0))
      query.processAllAvailable()
      val byUser = s.sql(
        "SELECT user_id, max(n_events) n, max(sum_value) v FROM user_stats GROUP BY user_id")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(byUser(1L) === ((3L, 6.0)))
      assert(byUser(2L) === ((1L, 5.0)))
    } finally query.stop()
  }

  test("asofEnrichStream equals the batch as-of join, ties and tolerance included") {
    val s = spark
    import s.implicits._
    import StreamingOps.AsofEvent

    def ev(uid: Long, sec: Long, side: Int, id: Long, v: Double) =
      AsofEvent(uid, new java.sql.Timestamp(sec * 1000L), sec * 1000000L, side, id, v)
    // rights: t=100, tie at t=300 (ids 21/22 -> payload-max rule), t=700
    // lefts: before-anything, equal-ts, mid, tie-ts, late
    val all = Seq(
      ev(1, 100, 0, 20, 1.5), ev(1, 300, 0, 21, 2.5), ev(1, 300, 0, 22, 0.5),
      ev(1, 700, 0, 23, 9.0),
      ev(1, 50, 1, 1, 0), ev(1, 100, 1, 2, 0), ev(1, 250, 1, 3, 0),
      ev(1, 300, 1, 4, 0), ev(1, 500, 1, 5, 0), ev(1, 1000, 1, 6, 0),
      ev(2, 400, 0, 30, 7.0), ev(2, 350, 1, 7, 0), ev(2, 450, 1, 8, 0))

    // batch truth via AsofJoin on the same rows (right payload = (id, value))
    val views = all.filter(_.side == 1).map(e => (e.id, e.user_id, e.ts_us))
      .toDF("left_id", "user_id", "ts_us")
    val clicks = all.filter(_.side == 0).map(e => (e.user_id, e.ts_us, e.id, e.value))
      .toDF("user_id", "ts_us", "id", "value")
    def batchSet(tol: Option[Long]) =
      graft.pipeline.AsofJoin.asofJoin(views, clicks, "user_id", "ts_us", tol, "r_")
        .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2),
          Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet

    Seq((None: Option[Long], "asof_free"), (Some(150000000L), "asof_tol")).foreach {
      case (tol, tbl) =>
        implicit val sq = s.sqlContext
        val mem = MemoryStream[AsofEvent]
        val query = StreamingOps.asofEnrichStream(mem.toDS(), "10 minutes", tol)
          .writeStream.format("memory").queryName(tbl)
          .outputMode("append").start()
        try {
          // out-of-order WITHIN each chunk; chunk2 later than chunk1
          val (a, b) = all.partition(_.ts_us <= 400000000L)
          mem.addData(scala.util.Random.shuffle(a)); query.processAllAvailable()
          mem.addData(scala.util.Random.shuffle(b)); query.processAllAvailable()
          mem.addData(Seq(ev(999, 32503680000L, 0, 0, 0))) // flush watermark
          query.processAllAvailable()
          val streamed = s.sql(
            s"SELECT user_id, left_id, ts_us, right_id, right_ts_us, right_value FROM $tbl")
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
              Option(r.get(3)).map(_.asInstanceOf[Long]),
              Option(r.get(4)).map(_.asInstanceOf[Long]),
              Option(r.get(5)).map(_.asInstanceOf[Double]))).toSet
          assert(streamed === batchSet(tol), s"variant=$tbl")
        } finally query.stop()
    }
  }

  test("per-micro-batch data-quality gate matches batch validation") {
    val s = spark
    import s.implicits._
    import graft.pipeline.QualityChecks
    import QualityChecks._
    // the production shape: validate each arriving batch in foreachBatch
    // BEFORE it reaches the corpus sink; quarantine on any failed check.
    // Parity pin: the per-batch report equals the batch API's report on
    // the same static slice — i.e. the checks are streaming-deployable
    // verbatim (stateless one-scan aggregates, no window/sort).
    val clean = (1L to 20L).map(i => (i, s"doc $i", i.toDouble))
    val dirty = Seq((100L, null.asInstanceOf[String], 5.0),
      (100L, "dup key", -3.0), (101L, "ok", 2.0))
    val checks = Seq(NotNull("text"), InRange("v", 0.0, 100.0), MinRows(2L))
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String, Double)]
    val reports = new java.util.concurrent.ConcurrentHashMap[Long, Seq[(String, Double, Boolean)]]()
    val query = mem.toDF().toDF("id", "text", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val rep = QualityChecks.validate(batch, checks).collect()
          .map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4))).toSeq
        reports.put(id, rep): Unit
      }
      .start()
    try {
      mem.addData(clean)
      query.processAllAvailable()
      mem.addData(dirty)
      query.processAllAvailable()
    } finally query.stop()
    assert(reports.size === 2)
    val batchClean = QualityChecks.validate(clean.toDF("id", "text", "v"), checks)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4))).toSeq
    val batchDirty = QualityChecks.validate(dirty.toDF("id", "text", "v"), checks)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getBoolean(4))).toSeq
    assert(reports.get(0L) === batchClean, "clean micro-batch == batch API")
    assert(reports.get(1L) === batchDirty, "dirty micro-batch == batch API")
    assert(reports.get(0L).forall(_._3), "clean batch passes the gate")
    val dirtyFails = reports.get(1L).filterNot(_._3).map(_._1).toSet
    assert(dirtyFails === Set("not_null", "in_range"),
      s"quarantine decision pins WHICH checks failed: $dirtyFails")
  }

  test("streaming SCD2 maintenance equals sequential batch merges") {
    val s = spark
    import s.implicits._
    import graft.pipeline.Scd2
    // dimension sink maintained in foreachBatch: each micro-batch merges
    // into the running snapshot. The snapshot must be eagerly
    // localCheckpoint-ed per merge — the r10 recache trap: a lazily
    // chained plan would re-read mutated inputs and double per batch.
    val day0 = Seq((1L, "a", 0L, None: Option[Long], true),
      (2L, "b", 0L, None: Option[Long], true))
      .toDF("key", "seg", "valid_from", "valid_to", "is_current")
    val b1 = Seq(2L -> "B", 3L -> "c")           // change 2, insert 3
    val b2 = Seq(2L -> "B2", 4L -> "d", 1L -> "a") // change 2 again, insert 4, resend 1
    implicit val sq = s.sqlContext
    val mem = MemoryStream[(Long, String)]
    @volatile var snapshot = day0.localCheckpoint(true)
    val query = mem.toDF().toDF("key", "seg").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        snapshot = Scd2.merge(snapshot, batch, "key", Seq("seg"),
          batchTs = 100L * (id + 1)).localCheckpoint(true)
        ()
      }
      .start()
    try {
      mem.addData(b1); query.processAllAvailable()
      mem.addData(b2); query.processAllAvailable()
    } finally query.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4))).toSet
    val batchTwin = Scd2.merge(
      Scd2.merge(day0, b1.toDF("key", "seg"), "key", Seq("seg"), 100L),
      b2.toDF("key", "seg"), "key", Seq("seg"), 200L)
    assert(rows(snapshot) === rows(batchTwin), "streamed == sequential batch merges")
    // the twice-changed key carries its full version chain
    val key2 = rows(snapshot).filter(_._1 == 2L).toSeq.sortBy(_._3)
    assert(key2 === Seq((2L, "b", 0L, Some(100L), false),
      (2L, "B", 100L, Some(200L), false), (2L, "B2", 200L, None, true)))
  }
  test("JSONL quarantine split is batch==stream (file stream, corrupt-record column)") {
    val s = spark
    import graft.sources.Jsonl
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val dir = java.nio.file.Files.createTempDirectory("jsonl_stream").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard0.jsonl"),
      """{"doc_id":1,"text":"one"}
        |{"doc_id":2}
        |{"doc_id":3,"text":"trunca
        |""".stripMargin)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard1.jsonl"),
      """{"doc_id":4,"text":"four"}
        |not json at all
        |""".stripMargin)
    // batch twin
    val qr = Jsonl.readWithQuarantine(s, dir, schema)
    val (batchGood, batchBad) =
      try (qr.good.collect().map(_.toSeq).toSet,
        qr.quarantined.collect().map(_.toSeq).toSet)
      finally qr.release()
    // stream: the same split per micro-batch via splitQuarantine inside
    // foreachBatch (persist the batch first — filtering the corrupt
    // column alone from a lazily-parsed JSON scan requires it, the same
    // Spark rule the batch path persists for)
    val goodAcc = scala.collection.mutable.Set.empty[Seq[Any]]
    val badAcc = scala.collection.mutable.Set.empty[Seq[Any]]
    val q = Jsonl.readCorpusStream(s, dir, schema)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.persist()
        try {
          val (g, b) = Jsonl.splitQuarantine(batch)
          goodAcc ++= g.collect().map(_.toSeq)
          badAcc ++= b.collect().map(_.toSeq)
          ()
        } finally { batch.unpersist(blocking = false); () }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    assert(goodAcc.toSet === batchGood, "streamed good rows == batch good rows")
    assert(badAcc.toSet === batchBad, "streamed quarantine == batch quarantine")
    assert(badAcc.size === 2)
  }
}
