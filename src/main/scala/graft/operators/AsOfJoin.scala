package graft.operators

import java.time.Duration

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** As-of join: for every left row, the single nearest right row on a
  * timestamp column, within an optional tolerance. A natural extension of
  * the reference's band join (`fuzzy_join` returns ALL matches in the
  * band, pandance/pandance.py:22-208; as-of keeps the best one —
  * SURVEY.md §2.4 flags it as the adjacent operator the reference lacks).
  *
  * Direction:
  *  - "nearest": smallest `|l.ts - r.ts| <= tol`
  *  - "backward": largest r.ts with `l.ts - tol <= r.ts <= l.ts`
  *  - "forward":  smallest r.ts with `l.ts <= r.ts <= l.ts + tol`
  *
  * Ties break deterministically: smaller |Δ| first, then earlier right
  * timestamp, then smallest `rightId`.
  *
  * Join type: `"inner"` (default) drops left rows with no right row in
  * the band; `"left"` keeps them with null right columns — pandas
  * `merge_asof` semantics (every left row survives exactly once,
  * including left rows whose join key is null).
  *
  * == Scale design ==
  * Same bucketed-equi-join rewrite as [[FuzzyJoin]] (candidates land in
  * adjacent `floor(epoch_us / tol)` buckets), then a per-left-row window
  * (`row_number` over the left row id) keeps the best candidate. Both
  * stages are shuffle-partitioned: candidates per left row are bounded by
  * the band width, so the window partitions are tiny and skew-free. The
  * left form rides the SAME plan — the candidate join just runs as a
  * left-outer hash join (an unmatched left row surfaces once with null
  * right columns and trivially wins its own window), no extra shuffle or
  * anti-join pass.
  */
object AsOfJoin {

  private val RID = "__graft_asof_rowid"
  private val DELTA = "__graft_asof_delta"

  /** Post-suffix names of the same-name `by` columns on each side: a
    * grouped as-of join only ever matches rows with EQUAL group keys
    * (pandas `merge_asof(by=...)`), and since the keys exist on both
    * sides they are always in the suffix overlap.
    */
  private def byCols(
      left: DataFrame, right: DataFrame, by: Seq[String],
      suffixes: (String, String)): (Seq[String], Seq[String]) = {
    by.foreach { c =>
      JoinSpec.requireColumn(left, c, "left (by)")
      JoinSpec.requireColumn(right, c, "right (by)")
    }
    val overlap = left.columns.toSet intersect right.columns.toSet
    (by.map(c => if (overlap(c)) c + suffixes._1 else c),
      by.map(c => if (overlap(c)) c + suffixes._2 else c))
  }

  def time(
      left: DataFrame,
      right: DataFrame,
      tol: Duration,
      rightId: String,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      direction: String = "nearest",
      by: Seq[String] = Nil,
      suffixes: (String, String) = ("_x", "_y"),
      joinType: String = "inner",
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("nearest", "backward", "forward")(direction),
      s"direction must be nearest|backward|forward, got $direction")
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got $joinType")
    val tolUs = tol.toNanos / 1000L
    require(tolUs > 0, s"tolerance must be >= 1 microsecond, got $tol")
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    val (byL, byR) = byCols(left, right, by, suffixes)

    // DateType / TimestampNTZ keys widen to TimestampType under the
    // session zone first, like FuzzyJoin.time — unix_micros requires
    // it. ONLY those: an unchecked cast would silently reinterpret a
    // long key as epoch seconds and turn a string key into nulls the
    // isNotNull filters drop — wrong-typed keys must raise, as
    // FuzzyJoin.time's validateTimestamp does
    def widen(df: DataFrame, c: String, side: String): DataFrame = {
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case TimestampType => df
        case TimestampNTZType | DateType =>
          df.withColumn(c, col(c).cast(TimestampType))
        case other => throw new IllegalArgumentException(
          s"$side as-of key `$c` must be a timestamp/date type, got $other")
      }
    }
    val leftW = widen(left, cols.leftCol, "left")
    val rightW = widen(right, cols.rightCol, "right")
    // a left join keeps null-key left rows (they surface unmatched); the
    // inner form prunes them before the shuffle, like the reference's
    // NaN pre-filter (pandance/pandance.py:265-312)
    val lPruned =
      if (joinType == "left") leftW
      else leftW.filter(col(cols.leftCol).isNotNull)
    val lf = lPruned.withColumn(RID, monotonically_increasing_id())
    val rf = rightW.filter(col(cols.rightCol).isNotNull)
    val (l, r, c) = JoinSpec.applySuffixes(lf, rf, cols, suffixes)
    val ridCol = if (l.columns.contains(RID)) RID else RID + suffixes._1
    val idOut = if (r.columns.contains(rightId)) rightId else rightId + suffixes._2

    def bucket(v: org.apache.spark.sql.Column) =
      graft.functions.LongMath.floorDiv(unix_micros(v), tolUs)
    val signedDelta = unix_micros(col(c.leftCol)) - unix_micros(col(c.rightCol))
    // allowExactMatches = false (pandas merge_asof's flag) excludes the
    // equal-timestamp right row from every direction's band
    val inBand = direction match {
      case "nearest" =>
        if (allowExactMatches) abs(signedDelta) <= lit(tolUs)
        else abs(signedDelta) <= lit(tolUs) && signedDelta =!= lit(0)
      case "backward" =>
        (if (allowExactMatches) signedDelta >= lit(0) else signedDelta > lit(0)) &&
          signedDelta <= lit(tolUs)
      case "forward" =>
        (if (allowExactMatches) signedDelta <= lit(0) else signedDelta < lit(0)) &&
          -signedDelta <= lit(tolUs)
    }

    val lb = l.withColumn("__graft_bl", bucket(col(c.leftCol)))
    val rb = r.withColumn("__graft_br",
      explode(array(bucket(col(c.rightCol)) - 1, bucket(col(c.rightCol)), bucket(col(c.rightCol)) + 1)))
    // group keys join as extra EQUI conjuncts — they tighten the hash
    // key (bucket, by...), so grouped as-of gets better partitioning for
    // free; null group keys drop (inner equi semantics, like pandas)
    val byMatch = byL.zip(byR)
      .map { case (a, b) => col(a) === col(b) }
      .foldLeft(lit(true))(_ && _)
    // the left-outer form emits an unmatched left row ONCE with null
    // right columns — it is the only row in its rid window, so the
    // row_number pass below passes it through untouched
    val cands = lb
      .join(rb, col("__graft_bl") === col("__graft_br") && byMatch && inBand, joinType)
      .withColumn(DELTA, abs(signedDelta))

    val w = Window
      .partitionBy(col(ridCol))
      .orderBy(col(DELTA).asc, unix_micros(col(c.rightCol)).asc, col(idOut).asc)
    val outCols = (l.columns.filterNot(_ == ridCol) ++ r.columns).map(col).toIndexedSeq
    cands
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .select(outCols: _*)
  }

  /** Unbounded as-of join — the `merge_asof` production shape: for every
    * left row, the single nearest PRECEDING (`direction = "backward"`,
    * `r.ts <= l.ts`) or FOLLOWING (`"forward"`, `r.ts >= l.ts`) right
    * row, with NO tolerance window. The band-bucket rewrite cannot
    * express tol = ∞, so this is a sort-based plan instead:
    *
    *  1. union both sides tagged, range-repartition on the join column —
    *     the engine's scalable global sort primitive (sampled bounds);
    *  2. per partition, one running-window pass carries the latest
    *     right-row payload onto each left row (right rows order before
    *     left rows at equal timestamps, so the bound is inclusive);
    *  3. a partition-level carry fixes the boundary: the extreme right
    *     row of each partition (one row per partition) is cumulated
    *     across the partition sequence, so a left row whose match lives
    *     in an earlier (later, for forward) partition still finds it.
    *
    * `direction = "nearest"` (pandas `merge_asof`'s third form) takes
    * whichever of the two directional picks is closer — BOTH picks
    * come from the SAME range exchange (two window sorts inside it, a
    * bidirectional carry), |Δ| ties to the preceding row; the join
    * column must be a timestamp or numeric (|Δ| subtracts).
    *
    * No shuffle moves more than the data once; the carry frame is one
    * row per partition. Ties on the timestamp break to the LARGEST
    * `rightId` for backward and the SMALLEST for forward
    * (deterministic). `joinType = "inner"` (default) drops left rows
    * with no match; `"left"` keeps every left row — unmatched ones
    * (including null-timestamp / null-`by` rows, which skip the shuffle
    * entirely) surface once with null right columns, pandas
    * `merge_asof` / DuckDB `ASOF LEFT JOIN` semantics. The left form is
    * the SAME plan: the match filter just relaxes, and the skipped-row
    * leg is a shuffle-free scan unioned onto the output.
    */
  def unbounded(
      left: DataFrame,
      right: DataFrame,
      rightId: String,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      direction: String = "backward",
      by: Seq[String] = Nil,
      suffixes: (String, String) = ("_x", "_y"),
      joinType: String = "inner",
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(Set("inner", "left")(joinType),
      s"joinType must be inner|left, got $joinType")
    val backward = direction == "backward"
    val nearest = direction == "nearest"
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    JoinSpec.requireColumn(right, rightId, "right")
    val (byL, byR) = byCols(left, right, by, suffixes)
    val rf = right.filter(col(cols.rightCol).isNotNull)
    val (l, r, c) = JoinSpec.applySuffixes(left, rf, cols, suffixes)
    val idOut = if (r.columns.contains(rightId)) rightId else rightId + suffixes._2
    require(l.schema(c.leftCol).dataType == r.schema(c.rightCol).dataType,
      s"as-of join columns must share a type, got " +
        s"${l.schema(c.leftCol).dataType} vs ${r.schema(c.rightCol).dataType}")
    byL.zip(byR).foreach { case (a, b) =>
      require(l.schema(a).dataType == r.schema(b).dataType,
        s"as-of by columns must share a type, got " +
          s"${l.schema(a).dataType} vs ${r.schema(b).dataType}")
    }

    val TS = "__graft_uasof_ts"
    val TAG = "__graft_uasof_tag"
    val TIE = "__graft_uasof_tie"
    val LROW = "__graft_uasof_l"
    val RROW = "__graft_uasof_r"
    val PID = "__graft_uasof_pid"
    val K = by.indices.map(i => s"__graft_uasof_k$i")
    val lType = StructType(l.schema.fields)
    val rType = StructType(r.schema.fields)
    val tieType = r.schema(idOut).dataType

    // group keys are normalized to K(i) on both sides so the union
    // aligns; null-ts / null-key rows can never match, so they skip the
    // shuffle — the inner form drops them, the left form re-unions them
    // below with null right columns
    val lValid = col(c.leftCol).isNotNull &&
      byL.map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val lT = l.filter(lValid)
      .select(byL.map(col).zip(K).map { case (cc, k) => cc.as(k) } ++ Seq(
        col(c.leftCol).as(TS), lit(1).as(TAG), lit(null).cast(tieType).as(TIE),
        struct(l.columns.map(col).toIndexedSeq: _*).as(LROW),
        lit(null).cast(rType).as(RROW)): _*)
    val rT = r.filter(byR.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select(byR.map(col).zip(K).map { case (cc, k) => cc.as(k) } ++ Seq(
        col(c.rightCol).as(TS), lit(0).as(TAG), col(idOut).as(TIE),
        lit(null).cast(lType).as(LROW),
        struct(r.columns.map(col).toIndexedSeq: _*).as(RROW)): _*)
    val p = left.sparkSession.sessionState.conf.numShufflePartitions
    // spark_partition_id is nondeterministic, so the projection stays
    // pinned above the range exchange (and AQE only merges ADJACENT
    // range partitions, which keeps pid order aligned with ts order).
    // Range-partition on (K..., TS): rows of one group stay contiguous
    // in the compound order, ascending ts with ascending pid, so the
    // per-group carry below remains correct when a group spans a
    // partition boundary. Equal timestamps must co-locate regardless of
    // side (never add TAG/TIE to the range key), or a boundary between
    // right rows and left rows at the same timestamp would hide the
    // equal-ts match from the forward window (the carry only covers
    // strictly later partitions).
    // MATERIALIZE once: the frame feeds three subtrees (window, carry,
    // pid list), and each re-execution would re-sample the range bounds
    // and renumber pids — the carry join would then mix two different
    // partitionings. One pass over the data, same trade as any sort
    // materialization.
    val parted = lT.unionByName(rT)
      .repartitionByRange(p, (K.map(col) :+ col(TS)): _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(true)

    // the directional building blocks, shared by the single-direction
    // paths and the two-sided "nearest" composition
    // allowExactMatches rides entirely on the TAG order at equal
    // timestamps: inclusive puts right rows (TAG 0) BEFORE left rows,
    // so the running pick sees the equal-ts match; exclusive (pandas
    // allow_exact_matches = false) puts left rows first, hiding it.
    // The cross-partition carry stays strict either way: equal range
    // keys co-locate, so carried rights are strictly earlier/later.
    val tagOrd: Column => Column =
      if (allowExactMatches) _.asc else _.desc
    def windowIn(back: Boolean): Column = {
      val ord: Seq[Column] =
        if (back) Seq(col(TS).asc, tagOrd(col(TAG)), col(TIE).asc)
        else Seq(col(TS).desc, tagOrd(col(TAG)), col(TIE).desc)
      last(col(RROW), ignoreNulls = true).over(
        Window.partitionBy((col(PID) +: K.map(col)): _*).orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    // one extreme right row per partition (and group), cumulated across
    // the partition sequence — for a grouped join the cumulation runs
    // PER GROUP (real window partitions); ungrouped keeps the
    // O(#partitions) single-partition frame
    def extAgg(back: Boolean): Column =
      if (back) max_by(col(RROW), struct(col(TS), col(TIE)))
      else min_by(col(RROW), struct(col(TS), col(TIE)))
    // partitionBy(pmod(PID, 1)) in the ungrouped case: that frame is
    // O(#partitions) rows (one per pid), so single-partition execution
    // is the point, not a bottleneck — the constant-valued key just
    // keeps WindowExec from logging its "No Partition Defined"
    // performance warning on every run. It must be NON-FOLDABLE: a
    // plain lit(1) is stripped by Spark 4's EliminateWindowPartitions
    // rule, putting the warning right back; pmod(PID, 1) is always 0
    // but survives the optimizer.
    val carryKeys: Seq[Column] =
      if (K.isEmpty) Seq(pmod(col(PID), lit(1))) else K.map(col)
    def carryOver(back: Boolean, src: Column): Column =
      last(src, ignoreNulls = true).over(
        Window.partitionBy(carryKeys: _*)
          .orderBy(if (back) col(PID).asc else col(PID).desc)
          .rowsBetween(Window.unboundedPreceding, -1))
    val pidList = parted.select((col(PID) +: K.map(col)): _*).distinct()

    // the left form keeps unmatched left rows: field access on the null
    // match struct yields the null right columns
    val matchFilter =
      if (joinType == "inner") col(TAG) === 1 && col("__graft_match").isNotNull
      else col(TAG) === 1
    val matched =
      if (!nearest) {
        val withIn = parted.withColumn("__graft_within", windowIn(backward))
        val perPart = parted.filter(col(TAG) === 0)
          .groupBy((col(PID) +: K.map(col)): _*).agg(extAgg(backward).as("__graft_ext"))
        val carry = pidList
          .join(perPart, PID +: K, "left")
          .withColumn("__graft_carry", carryOver(backward, col("__graft_ext")))
          .select((Seq(col(PID)) ++ K.map(col) ++ Seq(col("__graft_carry"))): _*)
        // ungrouped carry is one row per partition — always broadcast;
        // grouped carry is O(groups crossing a boundary) and joins back
        // on (pid, keys), so the planner picks (AQE broadcasts if small)
        val carryJ = if (K.isEmpty) broadcast(carry) else carry
        withIn.join(carryJ, PID +: K, "left")
          .withColumn("__graft_match",
            coalesce(col("__graft_within"), col("__graft_carry")))
          .filter(matchFilter)
      } else {
        // NEAREST (pandas merge_asof direction="nearest"): BOTH
        // directional picks from the SAME exchange — two window sorts
        // (interpolate's shape) + a bidirectional one-row-per-partition
        // carry — then the smaller |Δ| wins, ties to the PRECEDING row
        // (and each side keeps its own ts-tie rule). |Δ| needs
        // subtraction, so the axis must be a timestamp or numeric.
        val tsType = l.schema(c.leftCol).dataType
        require(tsType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
            tsType.isInstanceOf[org.apache.spark.sql.types.NumericType],
          "unbounded nearest needs a timestamp or numeric join column " +
            s"(|delta| comparison), got $tsType")
        val delta: (Column, Column) => Column = tsType match {
          case _: org.apache.spark.sql.types.TimestampType =>
            (x, y) => unix_micros(x) - unix_micros(y)
          case _ => (x, y) => x - y
        }
        val withIn = parted
          .withColumn("__graft_wb", windowIn(true))
          .withColumn("__graft_wf", windowIn(false))
        val perPart = parted.filter(col(TAG) === 0)
          .groupBy((col(PID) +: K.map(col)): _*)
          .agg(extAgg(true).as("__graft_eb"), extAgg(false).as("__graft_ef"))
        val carry = pidList
          .join(perPart, PID +: K, "left")
          .withColumn("__graft_cb", carryOver(true, col("__graft_eb")))
          .withColumn("__graft_cf", carryOver(false, col("__graft_ef")))
          .select((Seq(col(PID)) ++ K.map(col) ++
            Seq(col("__graft_cb"), col("__graft_cf"))): _*)
        val carryJ = if (K.isEmpty) broadcast(carry) else carry
        val b = coalesce(col("__graft_wb"), col("__graft_cb"))
        val f = coalesce(col("__graft_wf"), col("__graft_cf"))
        withIn.join(carryJ, PID +: K, "left")
          .withColumn("__graft_match",
            when(b.isNull, f).when(f.isNull, b)
              .when(delta(col(TS), b.getField(c.rightCol)) <=
                delta(f.getField(c.rightCol), col(TS)), b)
              .otherwise(f))
          .filter(matchFilter)
      }
    val outCols =
      l.columns.map(n => col(s"$LROW.`$n`").as(n)) ++
        r.columns.map(n => col(s"__graft_match.`$n`").as(n))
    val base = matched.select(outCols.toIndexedSeq: _*)
    if (joinType == "inner") base
    else {
      // null-ts / null-key left rows never entered the shuffle; they
      // rejoin here with null right columns (one shuffle-free scan)
      val skipped = l.filter(!coalesce(lValid, lit(false)))
        .select((l.columns.map(col) ++ r.schema.fields.map(f =>
          lit(null).cast(f.dataType).as(f.name))).toIndexedSeq: _*)
      base.unionByName(skipped)
    }
  }

  /** INTERPOLATING as-of enrichment — the time-series alignment step
    * sensor/market pipelines need beyond nearest-event picks: each
    * left row gets the right stream's `valueCol` LINEARLY INTERPOLATED
    * at its position on the join axis from the bracketing events,
    * `v1 + (v2 − v1) · (t − t1)/(t2 − t1)`. The axis may be a
    * timestamp (differences as exact microsecond longs) or ANY numeric
    * column — sensor depth, position, sequence number — (integral
    * differences as exact longs, fractional as doubles).
    * One-sided rows (before the first / after the last right
    * event) take the available neighbor's value as-is; an exact
    * timestamp hit takes that event's value; left rows matching no
    * right event at all (including null-timestamp / null-`by` rows)
    * yield null.
    *
    * Duplicate-timestamp contract: right rows sharing `(by…, ts)` are
    * pre-aggregated to the MAX of their values inside the operator, so
    * both brackets see the SAME well-defined value per timestamp —
    * symmetric by construction (de-dup the right stream upstream if a
    * different resolution is wanted).
    *
    * == Scale design ==
    * ONE pass of [[unbounded]]'s union-and-range-partition machinery
    * computes BOTH brackets: the tagged union range-partitions on
    * `(by…, ts)` once, a backward window (ts asc) carries the latest
    * right event onto each left row while a forward window (ts desc)
    * carries the earliest following one — two sorts inside the SAME
    * exchange, no second shuffle of the left side and no join back on
    * a row id (so `leftId` need not be unique; the parameter remains
    * for signature compatibility and is validated only for existence).
    * Partition-boundary fix-up is the same one-row-per-partition carry
    * frame as [[unbounded]], cumulated in both directions.
    */
  def interpolate(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      leftId: String,
      on: Option[String] = None,
      leftOn: Option[String] = None,
      rightOn: Option[String] = None,
      by: Seq[String] = Nil,
      outCol: String = "value_interp"): DataFrame = {
    val cols = JoinSpec.resolve(on, leftOn, rightOn)
    JoinSpec.requireColumn(left, cols.leftCol, "left")
    JoinSpec.requireColumn(left, leftId, "left")
    JoinSpec.requireColumn(right, cols.rightCol, "right")
    JoinSpec.requireColumn(right, valueCol, "right")
    by.foreach { c =>
      JoinSpec.requireColumn(left, c, "left (by)")
      JoinSpec.requireColumn(right, c, "right (by)")
    }
    require(!left.columns.contains(outCol),
      s"interpolate: left must not carry $outCol")
    require(!left.columns.exists(_.startsWith("__gi_")),
      "interpolate: left must not carry __gi_-prefixed columns")

    val TS = "__graft_gi_ts"
    val TAG = "__graft_gi_tag"
    val BR = "__graft_gi_br"
    val LROW = "__graft_gi_l"
    val PID = "__graft_gi_pid"
    val K = by.indices.map(i => s"__graft_gi_k$i")
    val lType = StructType(left.schema.fields)
    val axisType = left.schema(cols.leftCol).dataType
    val brType = StructType(Seq(
      org.apache.spark.sql.types.StructField("t", axisType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    require(axisType == right.schema(cols.rightCol).dataType,
      s"interpolate: join columns must share a type, got " +
        s"$axisType vs ${right.schema(cols.rightCol).dataType}")
    require(axisType.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
        axisType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"interpolate: the join axis must be a timestamp or numeric column " +
        s"(the bracket fraction needs subtraction/division), got $axisType")
    // the bracket fraction's axis arithmetic: timestamps subtract as
    // exact microsecond longs, integral axes (sensor depth/position,
    // sequence numbers) as exact longs, fractional/decimal axes as
    // doubles — in every case the two differences are computed exactly
    // first and only the final ratio is IEEE division
    val axisDelta: (Column, Column) => Column = axisType match {
      case _: org.apache.spark.sql.types.TimestampType =>
        (x, y) => (unix_micros(x) - unix_micros(y)).cast("double")
      case org.apache.spark.sql.types.LongType |
          org.apache.spark.sql.types.IntegerType |
          org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.ByteType =>
        (x, y) => (x.cast("long") - y.cast("long")).cast("double")
      case _ =>
        (x, y) => x.cast("double") - y.cast("double")
    }

    // right events deduped per (by…, ts): max value (the documented
    // duplicate-timestamp contract), carried as one bracket struct
    val rT = right
      .filter(col(cols.rightCol).isNotNull &&
        by.map(col(_).isNotNull).foldLeft(lit(true))(_ && _))
      .select(by.zip(K).map { case (c, k) => col(c).as(k) } ++ Seq(
        col(cols.rightCol).as(TS),
        col(valueCol).cast("double").as("__gi_rv0")): _*)
      .groupBy((K :+ TS).map(col): _*)
      .agg(max(col("__gi_rv0")).as("__gi_rv"))
      .select(K.map(col) ++ Seq(
        col(TS), lit(0).as(TAG),
        struct(col(TS).as("t"), col("__gi_rv").as("v")).as(BR),
        lit(null).cast(lType).as(LROW)): _*)
    // left rows whose ts or by keys are null can't bracket — they skip
    // the shuffle entirely and rejoin the output with a null outCol
    val lValid = col(cols.leftCol).isNotNull &&
      by.map(col(_).isNotNull).foldLeft(lit(true))(_ && _)
    val lT = left.filter(lValid)
      .select(by.zip(K).map { case (c, k) => col(c).as(k) } ++ Seq(
        col(cols.leftCol).as(TS), lit(1).as(TAG),
        lit(null).cast(brType).as(BR),
        struct(left.columns.map(col).toIndexedSeq: _*).as(LROW)): _*)

    // same materialized-range-exchange contract as [[unbounded]]: the
    // frame feeds the windows, the carry, and the pid list
    val p = left.sparkSession.sessionState.conf.numShufflePartitions
    val parted = rT.unionByName(lT)
      .repartitionByRange(p, (K.map(col) :+ col(TS)): _*)
      .withColumn(PID, spark_partition_id())
      .localCheckpoint(true)

    // two window passes inside the one exchange: right rows order
    // before left rows at equal ts in BOTH directions (TAG asc), so
    // each bracket is inclusive of exact hits
    val wB = Window.partitionBy((col(PID) +: K.map(col)): _*)
      .orderBy(col(TS).asc, col(TAG).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy((col(PID) +: K.map(col)): _*)
      .orderBy(col(TS).desc, col(TAG).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withIn = parted
      .withColumn("__gi_wb", last(col(BR), ignoreNulls = true).over(wB))
      .withColumn("__gi_wf", last(col(BR), ignoreNulls = true).over(wF))

    // ONE aggregate yields both per-partition extremes; the cumulation
    // across the partition sequence runs once per direction over the
    // O(#partitions) frame (pmod non-foldable key — see [[unbounded]])
    val perPart = parted.filter(col(TAG) === 0)
      .groupBy((col(PID) +: K.map(col)): _*)
      .agg(max_by(col(BR), col(TS)).as("__gi_eb"),
        min_by(col(BR), col(TS)).as("__gi_ef"))
    val carryKeys: Seq[Column] =
      if (K.isEmpty) Seq(pmod(col(PID), lit(1))) else K.map(col)
    val wcB = Window.partitionBy(carryKeys: _*).orderBy(col(PID).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wcF = Window.partitionBy(carryKeys: _*).orderBy(col(PID).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = parted.select((col(PID) +: K.map(col)): _*).distinct()
      .join(perPart, PID +: K, "left")
      .withColumn("__gi_cb", last(col("__gi_eb"), ignoreNulls = true).over(wcB))
      .withColumn("__gi_cf", last(col("__gi_ef"), ignoreNulls = true).over(wcF))
      .select((Seq(col(PID)) ++ K.map(col) ++
        Seq(col("__gi_cb"), col("__gi_cf"))): _*)
    val carryJ = if (K.isEmpty) broadcast(carry) else carry

    val b = coalesce(col("__gi_wb"), col("__gi_cb"))
    val f = coalesce(col("__gi_wf"), col("__gi_cf"))
    val interp =
      when(b.getField("v").isNull, f.getField("v"))
        .when(f.getField("v").isNull, b.getField("v"))
        .when(f.getField("t") === b.getField("t"), b.getField("v"))
        .otherwise(b.getField("v") + (f.getField("v") - b.getField("v")) *
          (axisDelta(col(TS), b.getField("t")) /
            axisDelta(f.getField("t"), b.getField("t"))))
    val outCols = left.columns.map(n => col(s"$LROW.`$n`").as(n)).toIndexedSeq
    val computed = withIn.join(carryJ, PID +: K, "left")
      .filter(col(TAG) === 1)
      .select(outCols :+ interp.as(outCol): _*)
    val skipped = left.filter(!coalesce(lValid, lit(false)))
      .withColumn(outCol, lit(null).cast("double"))
    computed.unionByName(skipped)
  }
}
