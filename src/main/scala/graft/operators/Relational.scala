package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small relational building blocks the pipeline queries reuse: top-k
  * per group, and a salted equi-join for skewed keys.
  */
object Relational {

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
    * each row to ONE random-but-deterministic salt (hash of the whole
    * probe row), so a hot key's probe rows spread over `salt` reducers
    * instead of one straggler.
    *
    * AQE's skew-join splitting usually makes this unnecessary — reach for
    * it when a single key is so hot that even a split partition is one
    * task (or when a deterministic layout is needed across stages).
    * Build-side replication costs `salt`×|right|: salt the SMALL side.
    */
  def saltedEquiJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt > 1, s"salt must be > 1, got $salt")
    val saltL = pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salt))
    val l = left.withColumn("__graft_salt", saltL)
    val r = right.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r,
        l(leftKey) === r(rightKey) &&
          l("__graft_salt") === r("__graft_salt"), "inner")
      .drop("__graft_salt")
  }
}
