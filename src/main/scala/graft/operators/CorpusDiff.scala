package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff — the change feed an incremental
  * curation pipeline consumes (re-embed only `added`/`changed` docs,
  * tombstone `removed` ones in the downstream indexes) instead of
  * recomputing the world per crawl.
  *
  * Both snapshots project to `(id, fingerprint)` BEFORE the join, so
  * the shuffle carries ~16 bytes a row no matter how wide the
  * documents are; the diff of two 100 TB snapshots moves two slim
  * columns. The join shuffles on the id — snapshots bucketed or
  * pre-partitioned by id co-locate and skip both exchanges. Content
  * equality rides on `xxhash64` over the content columns (a 64-bit
  * fingerprint equality check, the standard CDC trade: a collision
  * mislabels one pair as `unchanged`; diff on full bytes instead and
  * the shuffle is as wide as the corpus).
  */
object CorpusDiff {

  /** Per-id status between `oldDf` and `newDf`:
    *
    *  - `added`     — id only in `newDf`;
    *  - `removed`   — id only in `oldDf`;
    *  - `changed`   — id in both, content fingerprint differs;
    *  - `unchanged` — id in both, fingerprint equal (emitted only with
    *    `includeUnchanged = true`; the change feed is the point, and
    *    at corpus scale `unchanged` is ~all rows).
    *
    * Output: `(<idCol>, status)`. Ids must be unique per snapshot
    * (they are primary keys of a snapshot by construction); null
    * content columns fingerprint like any other value, so a
    * null→value edit reads as `changed`.
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCols: Seq[String], includeUnchanged: Boolean = false): DataFrame = {
    require(contentCols.nonEmpty, "corpus diff needs at least one content column")
    def fp(df: DataFrame, out: String) =
      df.select(col(idCol), xxhash64(contentCols.map(df(_)): _*).as(out))
    val j = fp(oldDf, "__graft_fp_old")
      .join(fp(newDf, "__graft_fp_new"), Seq(idCol), "full_outer")
    val status = when(col("__graft_fp_old").isNull, lit("added"))
      .when(col("__graft_fp_new").isNull, lit("removed"))
      .when(col("__graft_fp_old") === col("__graft_fp_new"), lit("unchanged"))
      .otherwise(lit("changed"))
    val all = j.select(col(idCol), status.as("status"))
    if (includeUnchanged) all else all.where(col("status") =!= "unchanged")
  }
}
