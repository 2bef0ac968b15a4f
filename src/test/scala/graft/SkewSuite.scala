package graft

import graft.pipeline.SkewJoin
import org.apache.spark.sql.functions._

/** Proves the SCALE.md skew patterns: (1) a salted two-stage aggregation
  * gives identical results to the direct groupBy on a pathologically
  * skewed key while bounding any single task's group size; (2) the
  * SkewJoin operator's salted equi-join is output-identical to the plain
  * join while spreading the hot key over saltFactor sub-keys.
  */
class SkewSuite extends SparkSpec {

  test("salted two-stage aggregation equals direct aggregation on skewed keys") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(83)
    // 90% of rows share one key
    val df = (0 until 50000).map { i =>
      val k = if (rng.nextDouble() < 0.9) "hot" else s"k${rng.nextInt(100)}"
      (k, rng.nextInt(1000).toDouble)
    }.toDF("key", "v").repartition(16)

    val direct = df.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"), max("v").as("max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap

    // stage 1: aggregate on (key, salt); stage 2: merge the partials
    val salted = df
      .withColumn("salt", pmod(xxhash64(monotonically_increasing_id()), lit(16)))
      .groupBy("key", "salt")
      .agg(sum("v").as("ps"), count(lit(1)).as("pc"), max("v").as("pm"))
      .groupBy("key")
      .agg(sum("ps").as("sum_v"), sum("pc").as("cnt"), max("pm").as("max_v"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3))))
      .toMap

    assert(salted.keySet === direct.keySet)
    direct.foreach { case (k, (sv, c, m)) =>
      val (sv2, c2, m2) = salted(k)
      assert(c2 === c, s"count mismatch for $k")
      assert(m2 === m, s"max mismatch for $k")
      assert(math.abs(sv2 - sv) < 1e-6 * math.max(1.0, math.abs(sv)), s"sum mismatch for $k")
    }
  }

  private lazy val skewed = {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(91)
    // 40% of fact rows on key -1, the rest uniform over 200 keys
    val fact = (0 until 60000).map { i =>
      val k = if (rng.nextDouble() < 0.4) -1L else rng.nextInt(200).toLong
      (k, rng.nextInt(100).toDouble, s"row$i")
    }.toDF("k", "v", "tag").repartition(16)
    val dim = (-1L to 199L).map(k => (k, s"dim$k", k * 10.0))
      .toDF("k", "name", "weight")
    (fact, dim)
  }

  test("hotKeys finds exactly the keys above the threshold") {
    val (fact, _) = skewed
    assert(SkewJoin.hotKeys(fact, "k", 0.05) === Seq(-1L))
    // everything clears a tiny threshold; capped by maxKeys, hottest first
    val top3 = SkewJoin.hotKeys(fact, "k", 1e-9, maxKeys = 3)
    assert(top3.length === 3 && top3.head === -1L)
    // uniform data has no hot keys at a meaningful threshold
    val uniform = fact.filter(col("k") =!= -1L)
    assert(SkewJoin.hotKeys(uniform, "k", 0.05).isEmpty)
  }

  test("hotKeys: hot keys survive sampling; empty input yields no keys") {
    val (fact, _) = skewed
    // 5% sample of 60k rows: the 40%-hot key is unmissable, and the
    // sampled path never scans the full table
    val sampled = SkewJoin.hotKeys(fact, "k", 0.05, sampleFraction = 0.05)
    assert(sampled === Seq(-1L))
    // zero-row frame: sum over nothing is SQL null — must not NPE
    val empty = fact.filter(col("k") === 12345L)
    assert(SkewJoin.hotKeys(empty, "k", 0.05).isEmpty)
    assert(SkewJoin.hotKeys(empty, "k", 0.05, sampleFraction = 0.1).isEmpty)
  }

  test("saltedEquiJoin equals the plain join on skewed keys") {
    val (fact, dim) = skewed
    val plain = fact.join(dim, "k")
      .select("k", "v", "tag", "name", "weight")
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", "k", Seq(-1L), saltFactor = 8)
      .select("k", "v", "tag", "name", "weight")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // empty hot set degenerates to the plain join
    val unsalted = SkewJoin.saltedEquiJoin(fact, dim, "k", "k", Nil)
      .select("k", "v", "tag", "name", "weight")
    assert(unsalted.exceptAll(plain).isEmpty)
  }

  test("salting bounds the hot reducer: max join-task rows drop saltFactor-ish-fold") {
    val (fact, dim) = skewed
    // the dim must not broadcast (201 rows would) — the skew problem only
    // exists on the shuffled path, as in the bench pair / at 100 TB
    val dimSH = dim.hint("shuffle_hash")
    def maxJoinTaskRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id().as("pid")).count()
        .agg(max("count")).head().getLong(0)
    // AQE's small-partition coalescing would re-merge the salted
    // sub-partitions at this toy scale (they're KBs; advisory target is
    // MBs) — at real scale partitions are fat and stay split. Pin the
    // mechanism itself, not AQE's re-bundling of a 60k-row fixture.
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(coalesceKey)
    val beforeParts = spark.conf.get(partsKey)
    try {
      spark.conf.set(coalesceKey, "false")
      // the suite default of 4 reducers caps ANY spread at total/4 —
      // mirror the bench's 32 so the salted spread is observable
      spark.conf.set(partsKey, "32")
      val saltFactor = 8
      val hotCount = fact.filter(col("k") === -1L).count() // ~24k of 60k
      val plainMax = maxJoinTaskRows(fact.join(dimSH, "k"))
      val saltedMax = maxJoinTaskRows(
        SkewJoin.saltedEquiJoin(fact, dimSH, "k", "k", Seq(-1L), saltFactor))
      assert(plainMax >= hotCount,
        s"plain join should funnel the whole hot key ($hotCount rows) " +
          s"through one task, saw max $plainMax")
      assert(saltedMax <= plainMax / (saltFactor / 2),
        s"salted max task rows $saltedMax not well under plain $plainMax")
    } finally {
      spark.conf.set(coalesceKey, before)
      spark.conf.set(partsKey, beforeParts)
    }
  }

  test("salting spreads the hot key across saltFactor sub-keys") {
    val (fact, dim) = skewed
    val saltFactor = 8
    val hotCount = fact.filter(col("k") === -1L).count()
    // reconstruct the salted left side the way saltedEquiJoin builds it
    val groups = fact
      .withColumn("__salt",
        when(col("k") === -1L, (rand(42L) * saltFactor).cast("int"))
          .otherwise(lit(0)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === -1L)
      .collect().map(_.getLong(2))
    assert(groups.length === saltFactor, "hot key must occupy all salt buckets")
    assert(groups.max < hotCount / 2,
      s"largest salted group ${groups.max} should be well under the unsalted $hotCount")
    // and the replicated dim side matches each hot row exactly once
    val joined = SkewJoin.saltedEquiJoin(fact, dim, "k", "k", Seq(-1L), saltFactor)
    assert(joined.filter(col("k") === -1L).count() === hotCount)
  }
}
