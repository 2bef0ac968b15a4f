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
  *    struct, with optional gzip (`.jsonl.gz` shards are not
  *    block-splittable, so production parallelism is file-level — size
  *    shard counts to executors, the WARC discipline).
  *
  * Reference scope note: beyond-reference pipeline surface (SURVEY
  * §2.5); the reference library has no source/sink surface.
  */
object Jsonl {

  /** Write `df` as JSONL text files under `dir` — one JSON object per
    * line, field order = column order, null fields omitted (the JSONL
    * convention; a reader's schema restores them as nulls). Map-side
    * only: one `to_json` projection, no shuffle.
    */
  def writeCorpus(df: DataFrame, dir: String, gzip: Boolean = false): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite")
      .option("compression", if (gzip) "gzip" else "none")
      .text(dir)

  /** Read JSONL under `path` (glob ok, `.gz` transparent) with the
    * caller's schema. Malformed lines become all-null rows here
    * (PERMISSIVE); use [[readWithQuarantine]] when they must be kept.
    */
  def readCorpus(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read with a quarantine side-channel: returns `(good, quarantined)`
    * where `good` has exactly `schema`'s columns (rows that parsed) and
    * `quarantined` is `(raw)` — the verbatim text of every line that
    * did not. The split is computed from ONE read (the corrupt-record
    * column rides the same pass; Spark requires the frame be persisted
    * before the corrupt column is filtered alone — the caller gets both
    * frames already split and should unpersist `good` when done, as the
    * two share the cached parse).
    */
  def readWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema may not contain the reserved _corrupt column")
    val withCorrupt = schema.add("_corrupt", StringType, nullable = true)
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .persist()
    val good = raw.filter(col("_corrupt").isNull).drop("_corrupt")
    val bad = raw.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw"))
    (good, bad)
  }
}
