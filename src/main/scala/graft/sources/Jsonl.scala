package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) corpus source + sink — the interchange
  * format training corpora actually ship in (The Pile, RedPajama, Dolma,
  * FineWeb all distribute `.jsonl.gz`/`.jsonl.zst` shards). Thin by
  * design — Spark's native JSON reader/writer does the parsing — what
  * this seam adds is the CONTRACT a pipeline needs around it:
  *
  *  - an explicit, caller-supplied schema on read (schema inference over
  *    100 TB is a full extra scan AND nondeterministic under sampling;
  *    an ingest pipeline must pin its schema, not discover it);
  *  - a QUARANTINE path: malformed lines land in a `(raw)` side table
  *    instead of silently becoming all-null rows (Spark's PERMISSIVE
  *    default) or killing the job (FAILFAST) — a crawl shard with a few
  *    truncated lines loses those LINES, not the shard;
  *  - one-line-per-row framing on write via `to_json` over the full row
  *    struct, with optional gzip or zstd (neither is block-splittable
  *    from Spark's text writer, so production parallelism is file-level
  *    — size shard counts to executors, the WARC discipline; zstd is
  *    the modern interchange choice: ~gzip ratio at several times the
  *    decode speed).
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY
  * §2.5); the reference library has no source/sink surface.
  */
object Jsonl {

  private val Codecs = Set("none", "gzip", "zstd")

  /** Resolve a codec short name for the text datasource; `zstd` maps to
    * the repo's pure-JVM [[ZstdJniCodec]] (Hadoop's own needs native
    * libhadoop — Spark's text writer lists zstd as unavailable without
    * it) and registers it for extension-based resolution on read. The
    * registration preserves any caller-set `io.compression.codecs`
    * (Hadoop replaces its ServiceLoader list when the key is set, so
    * the standard text codecs are re-listed alongside ours).
    */
  private def resolveCodec(spark: SparkSession, codec: String): String = {
    require(Codecs.contains(codec),
      s"codec must be one of ${Codecs.mkString("/")}, got $codec")
    if (codec != "zstd") codec
    else { ensureZstdReadable(spark); classOf[ZstdJniCodec].getName }
  }

  private def ensureZstdReadable(spark: SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "io.compression.codecs"
    val ours = classOf[ZstdJniCodec].getName
    val cur = Option(conf.get(key)).map(_.trim).filter(_.nonEmpty)
    if (!cur.exists(_.contains(ours))) {
      // Append to the EFFECTIVE codec list — whatever
      // CompressionCodecFactory resolves right now (the ServiceLoader
      // discovery when the key is unset, or the caller's own list) —
      // never a hardcoded base: overwriting the key with a fixed trio
      // silently broke extension resolution for every other discovered
      // codec (.snappy, .lz4, cluster-installed) session-wide after the
      // first zstd call. Ours goes LAST so it wins the ".zst" extension
      // slot over Hadoop's native-lib ZStandardCodec (the factory keys
      // by extension; later registrations overwrite earlier ones).
      import scala.jdk.CollectionConverters._
      val effective = org.apache.hadoop.io.compress.CompressionCodecFactory
        .getCodecClasses(conf).asScala.map(_.getName).filterNot(_ == ours)
      conf.set(key, (effective :+ ours).mkString(","))
    }
  }

  /** Write `df` as JSONL text files under `dir` — one JSON object per
    * line, field order = column order, null fields omitted (the JSONL
    * convention; a reader's schema restores them as nulls). Map-side
    * only: one `to_json` projection, no shuffle. `codec` is one of
    * `none` / `gzip` (`.jsonl.gz` shards) / `zstd` (`.jsonl.zst`, via
    * [[ZstdJniCodec]]).
    */
  def writeCorpus(df: DataFrame, dir: String, codec: String = "none"): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite")
      .option("compression", resolveCodec(df.sparkSession, codec))
      .text(dir)

  /** Read JSONL under `path` (glob ok, `.gz`/`.zst` transparent) with
    * the caller's schema. Malformed lines become all-null rows here
    * (PERMISSIVE); use [[readWithQuarantine]] when they must be kept.
    */
  def readCorpus(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    ensureZstdReadable(spark)
    spark.read.schema(schema).json(path)
  }

  /** A quarantine read in flight: `good` has exactly the caller's
    * schema columns (rows that parsed), `quarantined` is `(raw)` — the
    * verbatim text of every line that did not. Both frames derive from
    * ONE persisted parse (`raw`); call [[release]] once both have been
    * consumed. (Returning the persisted frame is the r13-advice fix:
    * the old tuple API told callers to `good.unpersist()`, which is a
    * no-op — Dataset.unpersist only matches the exact persisted plan —
    * so the corpus-sized cache could never actually be dropped.)
    */
  final case class QuarantineRead(good: DataFrame, quarantined: DataFrame, raw: DataFrame) {
    def release(): Unit = raw.unpersist(blocking = false)
  }

  /** Read with a quarantine side-channel. The split is computed from
    * ONE read: the corrupt-record column rides the same parse, and
    * Spark requires the frame be persisted before the corrupt column is
    * filtered alone — the persisted parse is exposed on the returned
    * [[QuarantineRead]] so the caller can actually release it.
    */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): QuarantineRead = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema may not contain the reserved _corrupt column")
    ensureZstdReadable(spark)
    val raw = spark.read
      .schema(schema.add("_corrupt", StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .persist()
    val good = raw.filter(col("_corrupt").isNull).drop("_corrupt")
    val bad = raw.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw"))
    QuarantineRead(good, bad, raw)
  }

  /** Streaming twin of [[readWithQuarantine]]: a file-stream JSONL read
    * carrying the `_corrupt` column, so a `foreachBatch` (or two
    * filtered sinks) performs the same good/quarantine split per
    * micro-batch — batch==stream parity for the last batch-only source
    * (StreamingSuite pins it). No persist here: streaming plans cannot
    * cache, so the caller splits with [[splitQuarantine]] INSIDE the
    * batch where both halves share the scan.
    */
  def readCorpusStream(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema may not contain the reserved _corrupt column")
    ensureZstdReadable(spark)
    spark.readStream
      .schema(schema.add("_corrupt", StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
  }

  /** Split a `_corrupt`-carrying frame (one [[readCorpusStream]]
    * micro-batch, typically) into the same `(good, quarantined)` shapes
    * [[readWithQuarantine]] returns. Pure projection — no persist, no
    * shuffle.
    */
  def splitQuarantine(withCorrupt: DataFrame): (DataFrame, DataFrame) = (
    withCorrupt.filter(col("_corrupt").isNull).drop("_corrupt"),
    withCorrupt.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw")))
}
