package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Every variant is built
  * on the same scalable skeleton: per-row signatures (narrow, codegen'd)
  * -> banding/bucketing (one shuffle on the bucket key) -> within-bucket
  * candidate pairs -> exact verification. No O(n^2) stage ever
  * materializes at full width; the only self-join keys are bucket hashes
  * whose expected multiplicity is controlled by the banding parameters.
  *
  * Cache lifetime: operators persist intermediates (shingle/signature
  * tables) that the returned lazy DataFrame still references, so they are
  * NOT unpersisted here — callers running many dedups in one long-lived
  * session should `spark.catalog.clearCache()` between passes (or consume
  * and drop each result promptly; LRU eviction covers the rest).
  */
object Dedup {

  import TextFunctions._

  /** Exact dedup: canonical row = min(id) per normalized text. One
    * hash-shuffle on the (hashed) text; at 100 TB you'd pre-hash to a
    * 64-bit key so the shuffle carries 8 bytes, which is what grouping on
    * `fingerprint` does here.
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    df.groupBy(norm.as("__text_key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
      .select("keep_id", "dup_count")
  }

  /** The deduplicated corpus itself: keep the canonical (min-id) row per
    * normalized text. One broadcast-able semi join against the keep-set.
    */
  def dedupedCorpus(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactDedup(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact n-gram Jaccard similar pairs >= threshold via the
    * shingle-inverted-index self-join — the exact-verification half of the
    * MinHash pipeline, also usable standalone at moderate scale.
    */
  /** `maxDocFrequency > 0` drops shingles present in more than that many
    * docs before the self-join — the skew guard for web-scale corpora
    * (boilerplate shingles otherwise cost df(s)^2 pairs while carrying no
    * near-dup signal). 0 = exact Jaccard (the oracle-checked mode).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      threshold: Double,
      maxDocFrequency: Long = 0L): DataFrame = {
    // shingle_hashes produces the distinct 8-byte shingle keys directly
    // from the token array (no intermediate shingle strings), and the
    // self-join shuffles longs instead of ~20-byte UTF8 keys (collisions
    // are ~2^-40-level and would only perturb one count)
    val shAll = {
      import org.apache.spark.sql.graft.ShingleHashesFn.shingle_hashes
      df.select(
        col(idCol).as("id"),
        explode(shingle_hashes(tokens(col(textCol)), n)).as("s"))
    }
    val sh =
      if (maxDocFrequency <= 0) shAll
      else {
        val hot = shAll.groupBy("s").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFrequency)
          .select("s")
        shAll.join(broadcast(hot), Seq("s"), "left_anti")
      }
    // the shingle table feeds three plans (sizes + both join sides):
    // persist it, and hash-join on the 8-byte key — sorting the inverted
    // index for a sort-merge join is pure overhead (40% of the op's
    // wall-clock at sf0.1)
    sh.persist()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn(
        "jaccard",
        col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures: each shingle is string-hashed ONCE (xxhash64),
    * then the k salted hash functions are derived from that long by a
    * splitmix64 mixer inside a single fused aggregate
    * (MinHashSignatureAgg) holding k running minima. One explode + one
    * partial-aggregated groupBy — linear in corpus size, shuffle carries
    * k longs per doc. (The naive form — k aggregate expressions each
    * re-hashing the shingle string — spent ~85% of the pipeline's
    * wall-clock on string hashing.)
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      shingleSize: Int = 3): DataFrame = {
    import org.apache.spark.sql.graft.MinHashSignature.minhash_signature
    import org.apache.spark.sql.graft.ShingleHashesFn.shingle_hashes
    df.select(
        col(idCol).as("id"),
        explode(shingle_hashes(tokens(col(textCol)), shingleSize)).as("h"))
      .groupBy("id")
      .agg(minhash_signature(col("h"), numHashes).as("signature"))
  }

  /** LSH banding: split the signature into `bands` bands, bucket docs by
    * (band index, band hash), emit within-bucket pairs. With b bands of r
    * rows, P(candidate) = 1-(1-j^r)^b — the standard S-curve.
    */
  def minhashCandidatePairs(
      signatures: DataFrame, bands: Int, numHashes: Int): DataFrame = {
    val rows = numHashes / bands
    require(rows > 0, s"bands=$bands > numHashes=$numHashes")
    require(numHashes % bands == 0,
      s"bands=$bands must divide evenly into numHashes=$numHashes " +
        "(a remainder would silently leave signature tail components unbanded)")
    val banded = signatures.select(
      col("id"),
      explode(
        array((0 until bands).map { b =>
          struct(
            lit(b).as("band"),
            // codegen'd splitmix fold over the band's longs in place — no
            // slice allocation, no per-row string rendering (the previous
            // xxhash64(slice(...).cast("string")) dominated this loop)
            org.apache.spark.sql.graft.GraftExpressions
              .longSliceHash(col("signature"), b * rows, rows, b.toLong)
              .as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    banded.persist()
    banded.as("a")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .distinct()
  }

  /** MinHash near-dup pipeline: candidates from banding, verified with the
    * estimated Jaccard (fraction of agreeing signature components).
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numHashes)
    sigs.persist()
    val cands = minhashCandidatePairs(sigs, bands, numHashes)
    val agree = aggregate(
      zip_with(col("sa.signature"), col("sb.signature"),
        (x, y) => when(x === y, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x)
    cands
      .join(sigs.as("sa"), col("doc_a") === col("sa.id"))
      .join(sigs.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn("est_jaccard", round(agree / numHashes, 6))
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
  }

  /** Exact-Jaccard verification of an LSH candidate pair set: join the
    * candidates back to the per-doc shingle-hash inverted index, count the
    * intersection per pair, and keep pairs at or above `threshold`. This is
    * the standard second half of a production LSH dedup (banding proposes,
    * exact verification disposes): the cost is proportional to the
    * candidate count, which the banding parameters control, so the exact
    * step never touches the O(n^2) pair space.
    */
  private[pipeline] def verifyPairsExactJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      pairs: DataFrame, // (doc_a, doc_b)
      shingleSize: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.ShingleHashesFn.shingle_hashes
    val sh = df.select(
      col(idCol).as("id"),
      explode(shingle_hashes(tokens(col(textCol)), shingleSize)).as("s"))
    sh.persist()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("va"), col("doc_a") === col("va.id"))
      .join(sh.as("vb"),
        col("doc_b") === col("vb.id") && col("va.s") === col("vb.s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn(
        "jaccard",
        col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash near-dup pipeline with EXACT verification: banding proposes
    * candidates, the shingle inverted index verifies true Jaccard >=
    * threshold. Output is therefore exact (equal to [[ngramJaccardPairs]])
    * whenever banding recall is 1 at the threshold — with b bands of r rows
    * the per-pair miss probability is (1-j^r)^b, e.g. ~1e-5 at j=0.85 with
    * 16x4 — while doing candidate-count work instead of n^2.
    */
  def minhashPairsVerified(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
    sigs.persist()
    val cands = minhashCandidatePairs(sigs, bands, numHashes)
    verifyPairsExactJaccard(df, idCol, textCol, cands, shingleSize, threshold)
  }

  /** SimHash near-dup pipeline with EXACT verification: Hamming-ball
    * banding proposes candidates, exact Jaccard disposes. `maxHamming`
    * trades recall (wider ball catches more true pairs) against candidate
    * count; false positives cost only verification work.
    */
  def simhashPairsVerified(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 8,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val cands = simhashPairs(df, idCol, textCol, maxHamming)
      .select("doc_a", "doc_b")
    verifyPairsExactJaccard(df, idCol, textCol, cands, shingleSize, threshold)
  }

  /** 64-bit SimHash over token hashes: per-row bit-vote accumulation (a
    * single UDF, no shuffle), then near-dup pairs by the pigeonhole trick:
    * docs within Hamming distance d must agree on one of d+1 chunks, so
    * band on 16-bit chunks and verify with bit_count(xor).
    */
  val simhashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (toks: Seq[String]) =>
      if (toks == null) null
      else {
        val votes = new Array[Int](64)
        toks.foreach { t =>
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < t.length) { h ^= t.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        java.lang.Long.valueOf(sig)
      }
    }

  def simhash(text: Column): Column = simhashUdf(TextFunctions.tokens(text))

  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    // pigeonhole: two signatures within Hamming distance d must agree on
    // at least one of d+1 chunks — banding into fewer chunks silently
    // loses pairs whose differing bits spread across every chunk.
    // Balanced boundaries (bit c*64/n .. (c+1)*64/n) guarantee exactly
    // numChunks non-empty, non-overlapping chunks with shifts < 64 (a
    // uniform ceil-width would push some chunk's shift to 64, which the
    // JVM masks to 0, silently duplicating chunk 0).
    val numChunks = math.min(maxHamming + 1, 64)
    val bounds = Array.tabulate(numChunks + 1)(c => c * 64 / numChunks)
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    sigs.persist()
    val banded = sigs.select(
      col("id"), col("sig"),
      explode(array((0 until numChunks).map { c =>
        val start = bounds(c)
        val width = bounds(c + 1) - bounds(c)
        val mask = if (width >= 64) -1L else (1L << width) - 1
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), start).bitwiseAND(lit(mask)).as("piece"))
      }: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.chunk"), col("bb.piece"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.piece") === col("b.piece") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs above a cosine threshold. `bruteForce` is
    * the exact small-scale path (cross join, bounded by caller); the LSH
    * path buckets by random-hyperplane sign bits so only same-bucket pairs
    * are compared — the 100 TB path.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.GraftExpressions.arrayDot
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    // same left-to-right summation as DuckDB's list_dot_product (oracle
    // bit-equality), but whole-stage-codegen'd instead of interpreted HOFs
    arrayDot(ad, bd) / (sqrt(arrayDot(ad, ad)) * sqrt(arrayDot(bd, bd)))
  }

  def embeddingDupPairsBrute(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import org.apache.spark.sql.graft.GraftExpressions.arrayDot
    // norms computed once per row, not once per pair; the pair loop is a
    // single codegen'd dot product
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(arrayDot(col("v"), col("v"))))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", arrayDot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Random-hyperplane LSH: `planes` seeded Gaussian hyperplanes -> sign
    * bits -> bucket id; compare only within buckets (repeat with `tables`
    * independent plane sets to recover recall).
    */
  def embeddingDupPairsLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      planes: Int = 12,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val rng = new scala.util.Random(seed)
    val hyperplanes: Array[Array[Array[Double]]] =
      Array.fill(tables, planes, dim)(rng.nextGaussian())
    val bucketUdf = udf { (v: Seq[Double], t: Int) =>
      val hp = hyperplanes(t)
      var bucket = 0L
      var p = 0
      while (p < hp.length) {
        var dot = 0.0
        var i = 0
        while (i < v.length) { dot += hp(p)(i) * v(i); i += 1 }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val banded = v.select(
      col("id"), col("v"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), bucketUdf(col("v"), lit(t)).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.t"), col("bb.bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
      .distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
