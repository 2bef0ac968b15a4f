package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 maintenance — the MERGE a warehouse
  * runs nightly to version dimension rows instead of overwriting them
  * (the Kimball SCD2 contract, the batch half of Delta/Iceberg
  * `MERGE INTO`):
  *
  *  - a key new to the dimension INSERTS an open row
  *    `(valid_from = batchTs, valid_to = null, is_current = true)`;
  *  - a key whose attributes CHANGED (null-safe comparison) CLOSES the
  *    current row (`valid_to = batchTs, is_current = false`) and inserts
  *    the new open row;
  *  - unchanged keys and keys absent from the batch pass through
  *    untouched, as does all closed history.
  *
  * One full-outer join between the current slice and the batch (both
  * shuffle-keyed on the dimension key, broadcast when the batch is
  * small), then a per-key classification emitting 0-2 rows — history
  * rows never move, so the nightly cost is O(current + batch), not
  * O(history). Dimensions are small next to facts; at 100 TB the fact
  * pipeline joins THIS output's current slice, so keeping the merge
  * key-partitioned co-locates it with downstream fact joins.
  *
  * Contract: `updates` must be unique per key (pre-validate with
  * [[QualityChecks.Unique]]; dedup a multi-change batch to its latest
  * version upstream — intra-batch churn is not representable in one
  * SCD2 step). `current` must hold at most one open row per key.
  */
object Scd2 {

  def merge(
      current: DataFrame,
      updates: DataFrame,
      keyCol: String,
      attrCols: Seq[String],
      batchTs: Long,
      validFromCol: String = "valid_from",
      validToCol: String = "valid_to",
      isCurrentCol: String = "is_current"): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val outCols = (keyCol +: attrCols) ++ Seq(validFromCol, validToCol, isCurrentCol)
    val cur = current.filter(col(isCurrentCol))
    val hist = current.filter(!col(isCurrentCol)).select(outCols.map(col): _*)

    def rowStruct(src: String, vf: Column, vt: Column, ic: Column): Column =
      struct(
        (col(s"$src.$keyCol").as(keyCol) +:
          attrCols.map(a => col(s"$src.$a").as(a))) ++
          Seq(vf.as(validFromCol), vt.cast("long").as(validToCol),
            ic.as(isCurrentCol)): _*)

    val j = cur.as("c").join(updates.as("u"),
      col(s"c.$keyCol") === col(s"u.$keyCol"), "full_outer")
    val inBoth = col(s"c.$keyCol").isNotNull && col(s"u.$keyCol").isNotNull
    val unchanged = attrCols.map(a => col(s"c.$a") <=> col(s"u.$a")).reduce(_ && _)
    val emitted = j.select(explode(array(
        // untouched current row (key absent from batch, or attrs equal)
        when(col(s"u.$keyCol").isNull || (inBoth && unchanged),
          rowStruct("c", col(s"c.$validFromCol"), col(s"c.$validToCol"), lit(true))),
        // closed version of a changed row
        when(inBoth && !unchanged,
          rowStruct("c", col(s"c.$validFromCol"), lit(batchTs), lit(false))),
        // freshly opened row (new key, or the changed row's new version)
        when(col(s"c.$keyCol").isNull || (inBoth && !unchanged),
          rowStruct("u", lit(batchTs), lit(null), lit(true))))).as("r"))
      .filter(col("r").isNotNull)
      .select("r.*")
    hist.unionByName(emitted)
  }
}
