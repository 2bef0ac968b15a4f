package graft

import graft.pipeline.Sampling
import org.scalatest.funsuite.AnyFunSuite

/** Pure-arithmetic properties of the sampling bucket function (hand-rolled
  * generators, same style as GraftUtilsSuite). The Spark Column path is
  * spot-checked against this arithmetic in PipelineSuite (including
  * negative ids); here the portable SQL formula documented in
  * Sampling/oracleSql is proven equal to the pmod-based implementation
  * for the whole Long domain, which is the cross-engine contract.
  */
class SamplingPropertiesSuite extends AnyFunSuite {

  private val M = 4294967296L // 2^32
  private val rng = new scala.util.Random(11)

  /** Spark-semantics twin of Sampling.lcgBucket (pmod == floorMod). */
  private def pmodBucket(id: Long): Long =
    Math.floorMod(Math.floorMod(id, M) * 1103515245L + 12345L, M)

  /** The portable sign-preserving-% formula the DuckDB oracle embeds. */
  private def portableBucket(id: Long): Long =
    ((((id % M) * 1103515245L + 12345L) % M) + M) % M

  test("portable SQL formula equals the pmod implementation on the Long domain") {
    val edges = Seq(0L, 1L, -1L, M - 1, M, -M, M + 1, -(M + 1),
      Long.MaxValue, Long.MinValue, Long.MaxValue - 1, Long.MinValue + 1)
    edges.foreach(id => assert(portableBucket(id) === pmodBucket(id), s"id=$id"))
    for (_ <- 0 until 100000) {
      val id = rng.nextLong()
      assert(portableBucket(id) === pmodBucket(id), s"id=$id")
    }
  }

  test("bucket is always in [0, 2^32)") {
    for (_ <- 0 until 100000) {
      val b = pmodBucket(rng.nextLong())
      assert(b >= 0L && b < M)
    }
  }

  test("rateCutoff is monotone with exact endpoints") {
    assert(Sampling.rateCutoff(0.0) === 0L)
    assert(Sampling.rateCutoff(1.0) === M)
    var prev = -1L
    (0 to 1000).foreach { i =>
      val c = Sampling.rateCutoff(i / 1000.0)
      assert(c >= prev, s"cutoff not monotone at rate ${i / 1000.0}")
      prev = c
    }
  }

  test("keep-sets are monotone in the rate (mix retuning only adds rows)") {
    for (_ <- 0 until 1000) {
      val id = rng.nextLong()
      val r1 = rng.nextDouble()
      val r2 = r1 + (1.0 - r1) * rng.nextDouble()
      val b = pmodBucket(id)
      if (b < Sampling.rateCutoff(r1)) assert(b < Sampling.rateCutoff(r2))
    }
  }

  test("realized rate tracks the nominal rate (LCG uniformity is adequate)") {
    Seq(0.1, 0.25, 0.5, 0.9).foreach { rate =>
      val cutoff = Sampling.rateCutoff(rate)
      val n = 200000
      var kept = 0
      var i = 0
      while (i < n) {
        if (pmodBucket(rng.nextLong()) < cutoff) kept += 1
        i += 1
      }
      val realized = kept.toDouble / n
      assert(math.abs(realized - rate) < 0.01,
        s"rate $rate realized $realized")
    }
  }

  test("sequential-id keep-sets also track the rate (the common id shape)") {
    Seq(0.1, 0.5).foreach { rate =>
      val cutoff = Sampling.rateCutoff(rate)
      val kept = (0L until 100000L).count(pmodBucket(_) < cutoff)
      val realized = kept.toDouble / 100000
      assert(math.abs(realized - rate) < 0.01, s"rate $rate realized $realized")
    }
  }
}
