package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small relational building blocks the pipeline queries reuse: top-k
  * per group, and a salted equi-join for skewed keys.
  */
object Relational {

  /** One-pass "dataset card": the exact corpus-level stats a data
    * release documents — doc/source/language counts, char and token
    * volume, length extremes, and the distinct-normalized-text count
    * (1 − distinct/total = the exact-dup rate). Output is long-form
    * `(metric, value)` with every value an exact BIGINT, so the report
    * is engine-reproducible with no float anywhere.
    *
    * Scale shape: ONE scan feeding partial-aggregable aggregates (the
    * distinct counts are hash-partial `count(DISTINCT)` over slim
    * columns; the text fingerprint is the md5 normalization rule of
    * the dedup family, computed in the scan projection), two one-row
    * aggregate subtrees joined by a 1×1 crossJoin, unpivoted to rows.
    * Nothing driver-side, nothing quadratic.
    */
  def corpusReport(df: DataFrame, textCol: String, sourceCol: String,
      langCol: String): DataFrame = {
    val tokCount = size(filter(
      split(trim(col(textCol)), "\\s+"), w => w =!= ""))
    val fp = md5(lower(regexp_replace(trim(col(textCol)), "\\s+", " ")))
    val base = df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      countDistinct(col(langCol)).as("n_langs"),
      sum(length(col(textCol))).as("total_chars"),
      sum(tokCount.cast("long")).as("total_tokens"),
      max(length(col(textCol))).cast("long").as("max_doc_chars"),
      min(length(col(textCol))).cast("long").as("min_doc_chars"))
    val distinctTexts = df.agg(
      countDistinct(fp).as("n_distinct_texts"))
    base.crossJoin(distinctTexts)
      .selectExpr(
        """stack(8,
          |  'n_docs', n_docs,
          |  'n_sources', n_sources,
          |  'n_langs', n_langs,
          |  'total_chars', CAST(total_chars AS BIGINT),
          |  'total_tokens', total_tokens,
          |  'max_doc_chars', max_doc_chars,
          |  'min_doc_chars', min_doc_chars,
          |  'n_distinct_texts', n_distinct_texts
          |) AS (metric, value)""".stripMargin)
  }

  /** Top `k` rows per group. Plans with rank-limit pushdown
    * (`WindowGroupLimit`): each shuffle partition keeps only k rows per
    * group before the final sort, so the shuffle never materializes full
    * groups — the difference between "top 3 per key" and "sort 100 TB".
    * Ties broken by the order columns themselves; add a unique id to the
    * ordering for full determinism.
    */
  def topKPerGroup(df: DataFrame, groupBy: Seq[Column], orderBy: Seq[Column], k: Int,
      rankCol: String = "rnk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(groupBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }

  /** Equi-join with key salting for skew: the build side replicates each
    * row `salt` times with salt ids 0..salt-1; the probe side scatters
    * each row to ONE salt via a per-partition row counter
    * (`monotonically_increasing_id` increments by one within each map
    * partition, so consecutive rows cycle round-robin through the
    * slots). A counter rather than a row hash on purpose: the
    * pathological hot key is many IDENTICAL probe rows, and any
    * content hash sends all of them to the SAME slot — the exact
    * straggler the operator exists to break up. Same trick as
    * [[graft.plans.SaltedRangePartitioning]]'s per-map-partition
    * counter; the join result is salt-assignment-independent (every
    * slot carries the full build side), so counter nondeterminism
    * across task retries cannot change the output.
    *
    * AQE's skew-join splitting usually makes this unnecessary — reach for
    * it when a single key is so hot that even a split partition is one
    * task (or when a deterministic layout is needed across stages).
    * Build-side replication costs `salt`×|right|: salt the SMALL side.
    */
  /** The probe side of [[saltedEquiJoin]] with its assigned salt slot
    * kept as `__graft_salt` — package-private so the suite can assert
    * that identical hot-key rows actually spread across slots.
    */
  private[graft] def saltedProbe(left: DataFrame, salt: Int): DataFrame =
    left.withColumn("__graft_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))

  def saltedEquiJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    val l = saltedProbe(left, salt)
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r,
        l(leftKey) === r(rightKey) &&
          l("__graft_salt") === r("__graft_salt"), "inner")
      .drop("__graft_salt")
  }
}
