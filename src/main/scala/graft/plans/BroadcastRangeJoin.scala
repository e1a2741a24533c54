package graft.plans

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, ProjectExec, SparkPlan, SparkStrategy}

/** Shared kernel of the range-join physical operators: sort one side by
  * the join key once, then answer each probe with a binary search whose
  * result is a CONTIGUOUS run of matches (transitivity of the order) —
  * the reference's algorithm (pandance/pandance.py:787-876) re-expressed
  * per Spark task. Matching cost O(n log m + output) instead of the
  * O(n·m) compare loop of BroadcastNestedLoopJoin.
  */
private[plans] object RangeProbe {

  /** Evaluate `key` over `rows`, drop nulls, sort ascending. */
  def sortedByKey(
      rows: Iterator[InternalRow],
      boundKey: Expression,
      ord: Ordering[Any]): Array[(Any, InternalRow)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Any, InternalRow)]
    rows.foreach { r =>
      val k = boundKey.eval(r)
      if (k != null) buf += ((k, r))
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr, Ordering.by[(Any, InternalRow), Any](_._1)(ord))
    arr
  }

  /** Flat emit loop for one probe row's contiguous match run: a single
    * hand-rolled iterator instead of range/map/filter/map chains — the
    * output of an inequality join is the dominant cost, so per-row
    * iterator overhead is the throughput knob.
    */
  def emitRun(
      lrow: InternalRow,
      sorted: Array[(Any, InternalRow)],
      start: Int,
      end: Int,
      joined: JoinedRow,
      residual: Option[Expression],
      toUnsafe: UnsafeProjection): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private var j = start
      private var ready: InternalRow = _
      private def advance(): Unit =
        while (ready == null && j < end) {
          val r = joined(lrow, sorted(j)._2)
          j += 1
          if (residual.isEmpty || residual.get.eval(r) == true) ready = r
        }
      override def hasNext: Boolean = { advance(); ready != null }
      override def next(): InternalRow = {
        advance()
        val r = ready
        ready = null
        toUnsafe(r)
      }
    }

  /** [start, end) of rows in `sorted` matching `v OP key`. */
  def matchRange(
      sorted: Array[(Any, InternalRow)],
      v: Any,
      op: String,
      ord: Ordering[Any]): (Int, Int) = {
    // first index with key >= v (strictUpper=false) or key > v (true)
    def bound(strictUpper: Boolean): Int = {
      var lo = 0
      var hi = sorted.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val c = ord.compare(sorted(mid)._1, v)
        if (c < 0 || (strictUpper && c == 0)) lo = mid + 1 else hi = mid
      }
      lo
    }
    op match {
      case "<"  => (bound(strictUpper = true), sorted.length)
      case "<=" => (bound(strictUpper = false), sorted.length)
      case ">=" => (0, bound(strictUpper = true))
      case ">"  => (0, bound(strictUpper = false))
    }
  }
}

/** Custom physical operator for single-column inequality inner joins
  * (`l.a OP r.b`, OP ∈ {<, <=, >=, >}) with a broadcastable build side:
  * the build (right) side arrives via a broadcast exchange
  * (IdentityBroadcastMode); each task sorts it once and probes it per
  * left row ([[RangeProbe]]).
  *
  * Planned by [[RangeJoinStrategy]] (enable via GraftExtensions) only
  * when the join condition is a bare inequality conjunct set with no
  * equi-conjunct (hash joins beat us there). Large×large joins without a
  * broadcastable side plan as [[ShuffledRangeJoinExec]] instead.
  */
case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    op: String, // left-perspective operator: leftKey OP rightKey
    residual: Option[Expression])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRel = right.executeBroadcast[Array[InternalRow]]()
    val boundLeftKey = BindReferences.bindReference(leftKey, left.output)
    val boundRightKey = BindReferences.bindReference(rightKey, right.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val opLocal = op
    val outputLocal = output

    left.execute().mapPartitions { leftIter =>
      // sort the broadcast build side once per task (cheap relative to
      // the probe loop; the array is shared, the sorted index is local)
      val sorted = RangeProbe.sortedByKey(
        broadcastRel.value.iterator, boundRightKey, keyOrdering)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputLocal, outputLocal)
      leftIter.flatMap { lrow =>
        val v = boundLeftKey.eval(lrow)
        if (v == null) Iterator.empty
        else {
          val (start, end) = RangeProbe.matchRange(sorted, v, opLocal, keyOrdering)
          RangeProbe.emitRun(lrow, sorted, start, end, joined, boundResidual, toUnsafe)
        }
      }
    }
  }
}

/** Skew-aware replacement for [[RangePartitioner]] in the shuffled range
  * join. Spark's RangePartitioner cannot split EQUAL keys: every row of
  * one hot key lands in a single partition, and a 50%-duplicate right
  * side was measured at 2.5× the uniform case's per-row cost (PLANS.md).
  * This partitioning samples the keyed RDD ONCE (reservoir per input
  * partition + exact counts, the same job shape RangePartitioner runs)
  * and derives BOTH:
  *
  *  - `bounds` — p−1 weighted-quantile cut keys (duplicate keys collapse
  *    into one bucket, exactly like RangePartitioner); and
  *  - `sizes`  — per-bucket SALT sub-slot counts `s_i = max(1,
  *    round(share_i · p))`, where `share_i` is the bucket's sampled mass.
  *    A balanced bucket gets 1 slot (zero overhead vs the unsalted
  *    plan); a bucket holding a hot key gets ~its proportional share of
  *    the cluster.
  *
  * Right rows go to slot `offset(bucket) + counter % s_bucket` (counter
  * = per-map-partition round-robin, so even FULLY identical rows
  * spread). Left rows fan out to every slot of every bucket they could
  * match — and because global slot ids are bucket-prefix-sum ordered,
  * that is still one CONTIGUOUS pid range, same as the unsalted plan.
  * Each qualifying pair still meets exactly once: the right row's slot
  * is unique, and the left row visits it iff it visits the bucket.
  */
private[plans] final class SaltedRangePartitioning(
    rdd: RDD[(Any, InternalRow)],
    targetParts: Int)(implicit ord: Ordering[Any]) extends Serializable {

  val (bounds: Array[Any], sizes: Array[Int]) = {
    val perPart = math.max(1, math.ceil(
      3.0 * math.min(20.0 * targetParts, 1e6) / math.max(1, rdd.partitions.length)).toInt)
    val sketched: Array[(Long, Array[Any])] =
      rdd.mapPartitionsWithIndex { (idx, it) =>
        // reservoir sample of keys + exact count, seeded by partition id
        val sample = new Array[Any](perPart)
        val rng = new java.util.Random(0x9e3779b97f4a7c15L ^ idx)
        var n = 0L
        it.foreach { case (k, _) =>
          if (n < perPart) sample(n.toInt) = k
          else {
            val j = (rng.nextDouble() * (n + 1)).toLong
            if (j < perPart) sample(j.toInt) = k
          }
          n += 1
        }
        val kept = if (n < perPart) sample.take(n.toInt) else sample
        Iterator.single((n, kept))
      }.collect()

    val total = sketched.map(_._1).sum
    if (total == 0L) (Array.empty[Any], Array(1))
    else {
      // weight each sampled key by rows-represented, then cut p-1 bounds
      // at equal cumulative-weight steps (weighted quantiles)
      val candidates = sketched.flatMap { case (n, ks) =>
        if (ks.isEmpty) Array.empty[(Any, Double)]
        else { val w = n.toDouble / ks.length; ks.map(k => (k, w)) }
      }
      java.util.Arrays.sort(candidates, Ordering.by[(Any, Double), Any](_._1)(ord))
      val sumW = candidates.map(_._2).sum
      val p = math.max(1, targetParts)
      val step = sumW / p
      val bnds = scala.collection.mutable.ArrayBuffer.empty[Any]
      var cum = 0.0
      var target = step
      candidates.foreach { case (k, w) =>
        cum += w
        if (cum >= target && bnds.size < p - 1 &&
            (bnds.isEmpty || ord.compare(k, bnds.last) > 0)) {
          bnds += k
          target += step
        }
      }
      val boundsArr = bnds.toArray
      // sampled mass per bucket -> proportional sub-slot count
      val share = new Array[Double](boundsArr.length + 1)
      candidates.foreach { case (k, w) => share(bucketIn(boundsArr, k)) += w }
      val sz = share.map(s => math.max(1, math.round(s / sumW * p).toInt))
      (boundsArr, sz)
    }
  }

  private val offsets: Array[Int] = sizes.scanLeft(0)(_ + _).init
  val numPartitions: Int = offsets.last + sizes.last
  def numBuckets: Int = sizes.length
  def maxSlots: Int = sizes.max

  /** First bucket whose upper bound is >= k (keys above every bound →
    * last bucket) — monotone in k, so left fan-out runs stay contiguous.
    */
  private def bucketIn(bs: Array[Any], k: Any): Int = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.compare(bs(mid), k) < 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  def bucketOf(k: Any): Int = bucketIn(bounds, k)

  /** Global slot for a right row: its bucket's offset plus a round-robin
    * salt. The counter spreads even identical rows; determinism across
    * task retries matches the upstream's own order determinism (the same
    * contract Spark's round-robin repartition relies on).
    */
  def slotOf(k: Any, counter: Int): Int = {
    val b = bucketIn(bounds, k)
    val s = sizes(b)
    offsets(b) + (if (s == 1) 0 else Integer.remainderUnsigned(counter, s))
  }

  /** Contiguous global-pid range a left row must visit: all slots of all
    * buckets at-or-after (ascending ops) / at-or-before (descending) its
    * home bucket.
    */
  def leftSlotRange(v: Any, ascending: Boolean): Range = {
    val b = bucketIn(bounds, v)
    if (ascending) offsets(b) until numPartitions
    else 0 until (offsets(b) + sizes(b))
  }
}

/** Shuffle-based range join for large×large inputs — the IEJoin-style
  * plan the broadcast variant cannot serve (SURVEY.md §4.1 M3; round-2
  * verdict's top gap):
  *
  *  1. sample the RIGHT side's join keys once
  *     ([[SaltedRangePartitioning]]) to derive range-bucket bounds AND
  *     per-bucket salt sub-slot counts (hot EQUAL keys, which range
  *     partitioning alone cannot split, get proportionally many slots);
  *  2. shuffle each right row to its home slot (exactly one);
  *  3. replicate each left row to every slot that can hold a matching
  *     right key — a contiguous slot SUFFIX for `<`/`<=`, PREFIX for
  *     `>`/`>=` (bucketing is monotone in the key; slot ids are
  *     bucket-prefix-sum ordered);
  *  4. per slot: sort the right fragment, binary-search each left row,
  *     emit the contiguous match run ([[RangeProbe]]).
  *
  * Each qualifying pair meets in exactly one partition (the right row's
  * unique slot), so no dedup pass is needed. Left replication is bounded by the
  * number of partitions actually containing matches, which the output
  * itself must touch — replication cost is amortized by the inherent
  * O(output) lower bound of an inequality join. The sampling pass
  * executes the right child twice (sample + shuffle), the same trade
  * Spark's own RangePartitioning exchange makes.
  */
case class ShuffledRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    op: String, // left-perspective operator: leftKey OP rightKey
    residual: Option[Expression])
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, UnspecifiedDistribution)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val boundLeftKey = BindReferences.bindReference(leftKey, left.output)
    val boundRightKey = BindReferences.bindReference(rightKey, right.output)
    val boundResidual = residual.map(BindReferences.bindReference(_, output))
    implicit val keyOrdering: Ordering[Any] =
      TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val opLocal = op
    val outputLocal = output
    val targetParts = conf.numShufflePartitions

    // (key, row) pairs; null keys can never match an inequality
    val rightKeyed: RDD[(Any, InternalRow)] = right.execute().mapPartitions { it =>
      it.flatMap { r =>
        val k = boundRightKey.eval(r)
        if (k == null) Iterator.empty else Iterator.single((k, r.copy()))
      }
    }
    val rangePart = new SaltedRangePartitioning(rightKeyed, targetParts)
    val p = rangePart.numPartitions
    val idPart = new Partitioner {
      override def numPartitions: Int = p
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }

    val rightShuffled = rightKeyed
      .mapPartitions { it =>
        var cnt = 0
        it.map { case (k, row) =>
          cnt += 1
          (rangePart.slotOf(k, cnt), row)
        }
      }
      .partitionBy(idPart)
      .values
    val ascending = opLocal == "<" || opLocal == "<="
    val leftShuffled = left.execute().mapPartitions { it =>
      it.flatMap { r =>
        val v = boundLeftKey.eval(r)
        if (v == null) Iterator.empty
        else {
          val row = r.copy()
          // matching right keys are OP-bounded by v, so they live in a
          // contiguous slot run relative to v's home bucket (salted
          // sub-slots of a bucket are globally contiguous by prefix sum)
          rangePart.leftSlotRange(v, ascending).iterator.map(pid => (pid, row))
        }
      }
    }.partitionBy(idPart).values

    rightShuffled.zipPartitions(leftShuffled) { (rIter, lIter) =>
      val sorted = RangeProbe.sortedByKey(rIter, boundRightKey, keyOrdering)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputLocal, outputLocal)
      if (sorted.isEmpty) Iterator.empty
      else lIter.flatMap { lrow =>
        val v = boundLeftKey.eval(lrow)
        val (start, end) = RangeProbe.matchRange(sorted, v, opLocal, keyOrdering)
        RangeProbe.emitRun(lrow, sorted, start, end, joined, boundResidual, toUnsafe)
      }
    }
  }
}

/** Planner strategy: fires on inner joins whose condition splits into
  * exactly one cross-side inequality conjunct (plus optional residual
  * conjuncts, none of them equi). Plan choice mirrors Catalyst's own
  * join-side logic:
  *  - right side under the broadcast threshold → [[BroadcastRangeJoinExec]];
  *  - else left side small → the same exec with sides swapped (operator
  *    mirrored), re-projected to the original output order;
  *  - else → [[ShuffledRangeJoinExec]] (large×large, no broadcast).
  */
object RangeJoinStrategy extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(l, r, Inner, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => crossSide(a, b, j).isDefined
        case _ => false
      }
      if (hasEqui) Nil
      else {
        val sqlConf = org.apache.spark.sql.internal.SQLConf.get
        def small(side: LogicalPlan): Boolean =
          sqlConf.autoBroadcastJoinThreshold > 0 &&
            side.stats.sizeInBytes <= sqlConf.autoBroadcastJoinThreshold
        val ineq = conjuncts.flatMap {
          case c @ LessThan(a, b) => orient(a, b, "<", ">", j)
          case c @ LessThanOrEqual(a, b) => orient(a, b, "<=", ">=", j)
          case c @ GreaterThan(a, b) => orient(a, b, ">", "<", j)
          case c @ GreaterThanOrEqual(a, b) => orient(a, b, ">=", "<=", j)
          case _ => None
        }
        ineq.headOption match {
          case Some((lk, rk, op, src)) =>
            val residual = conjuncts.filterNot(_ fastEquals src).reduceOption(And)
            if (small(r))
              BroadcastRangeJoinExec(
                planLater(l), planLater(r), lk, rk, op, residual) :: Nil
            else if (small(l))
              // broadcast the LEFT side instead: swap sides, mirror the
              // operator, restore the original column order on top
              ProjectExec(
                j.output,
                BroadcastRangeJoinExec(
                  planLater(r), planLater(l), rk, lk, mirror(op), residual)) :: Nil
            else
              ShuffledRangeJoinExec(
                planLater(l), planLater(r), lk, rk, op, residual) :: Nil
          case None => Nil
        }
      }
    case _ => Nil
  }

  private def mirror(op: String): String = op match {
    case "<" => ">"
    case "<=" => ">="
    case ">" => "<"
    case ">=" => "<="
  }

  private def crossSide(a: Expression, b: Expression, j: Join): Option[Boolean] =
    if (refsOf(a, j.left) && refsOf(b, j.right)) Some(false)
    else if (refsOf(b, j.left) && refsOf(a, j.right)) Some(true)
    else None

  private def refsOf(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) && e.deterministic

  /** Normalize `a OP b` so the left-side expression comes first; the
    * operator mirrors when the sides arrive swapped.
    */
  private def orient(
      a: Expression, b: Expression, op: String, mirrored: String,
      j: Join): Option[(Expression, Expression, String, Expression)] = {
    val src = op match {
      case "<" => LessThan(a, b)
      case "<=" => LessThanOrEqual(a, b)
      case ">" => GreaterThan(a, b)
      case ">=" => GreaterThanOrEqual(a, b)
    }
    crossSide(a, b, j).map {
      case false => (a, b, op, src)
      case true => (b, a, mirrored, src)
    }
  }
}
