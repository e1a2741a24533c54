package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and dataset splitting for
  * training-data pipelines. Random-seed sampling ties reproducibility to
  * one engine's RNG stream and partitioning; hashing the row's stable id
  * instead makes the SAME rows land in the SAME split on any engine, any
  * partitioning, any day — which is what dataset versioning, leak-free
  * train/val separation, and incremental reruns actually need.
  */
object Sampling {

  /** Sizing rule for [[globalShuffleRank]]'s derived bucket count: each
    * bucket's within-partition sort handles about this many rows (~1 GB
    * at a typical 100 B/row), comfortably in-memory for an executor
    * core while keeping the per-bucket count map broadcastable.
    */
  val ShuffleRankTargetRowsPerBucket: Long = 10L * 1000 * 1000

  /** Stable bucket in [0, buckets): first 8 hex chars of md5 of the id's
    * string form. md5 is md5 everywhere — Spark, DuckDB, Python — so the
    * assignment is reproducible across engines (unlike xxhash64/`hash`,
    * whose seeds and algorithms differ).
    */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Keep a deterministic `fraction` of rows by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      buckets: Int = 10000): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1], got $fraction")
    df.filter(hashBucket(col(idCol), buckets) < (fraction * buckets).toLong)
  }

  /** Append a `split` column: "test" gets the first `testPct` of hash
    * space, "val" the next `valPct`, "train" the rest. Stable under
    * re-partitioning and incremental appends — a row's split never
    * changes when the dataset around it does.
    */
  def trainValTest(df: DataFrame, idCol: String,
      valPct: Double = 0.1, testPct: Double = 0.1,
      buckets: Int = 10000, splitCol: String = "split"): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 1)
    val b = hashBucket(col(idCol), buckets)
    val testEdge = (testPct * buckets).toLong
    val valEdge = testEdge + (valPct * buckets).toLong
    df.withColumn(splitCol,
      when(b < testEdge, "test").when(b < valEdge, "val").otherwise("train"))
  }

  /** Per-stratum deterministic downsampling: keep `fractions(stratum)`
    * of each stratum's rows (default fraction for unlisted strata), by
    * id hash — the class-rebalancing primitive, reproducible across
    * engines like everything above.
    */
  def stratifiedHashSample(
      df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 1.0,
      buckets: Int = 10000): DataFrame = {
    val b = hashBucket(col(idCol), buckets)
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(b < (frac * buckets).cast("long"))
  }

  /** Deterministic source-mixture sampling: downsample each source so
    * the kept rows hit target proportions `weights` (source → fraction
    * of the OUTPUT), at the largest total size achievable WITHOUT
    * upsampling — the domain-mixing step of a training-data pipeline
    * ("50% web, 30% books, 20% code"), reproducible across engines and
    * runs because membership is md5-of-id, not an RNG stream.
    *
    * Given observed counts `n_s` and weights `w_s`, the largest total
    * `T` with `T·w_s <= n_s` for every weighted source is
    * `T = min_s n_s/w_s`; each source keeps a `T·w_s/n_s` hash-fraction
    * of its rows (the binding source keeps everything). Sources not in
    * `weights` are dropped. Achieved proportions are exact up to hash
    * granularity (`1/buckets`).
    *
    * Scale shape: one count aggregation (#sources rows, collected),
    * then one scan with a broadcast threshold join — no shuffle of the
    * kept rows; the corpus is filtered in place.
    */
  def mixSources(
      df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], buckets: Int = 10000): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"mixSources: weights must be positive, got $weights")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty,
      s"mixSources: weighted sources absent from the data: $missing")
    // arithmetic order matters: the oracle replicates t*w/n*buckets
    // left-to-right in doubles, so identical IEEE results on both sides
    val t = counts.map { case (s, n) => n / weights(s) }.min
    val thresholds = counts.map { case (s, n) =>
      (s, math.floor(t * weights(s) / n * buckets).toLong)
    }
    val thDf = broadcast(thresholds.toSeq.toDF(sourceCol, "__thr"))
    df.join(thDf, sourceCol)
      .filter(hashBucket(col(idCol), buckets) < col("__thr"))
      .drop("__thr")
  }

  /** Temperature-based source mixing WITH upsampling — the standard
    * multilingual/multi-domain LM recipe: source `s` with `n_s` rows
    * gets output share `n_s^alpha / Σ_t n_t^alpha` of `totalRows`
    * (alpha = 1 keeps natural proportions, alpha = 0 equalizes sources,
    * alpha ∈ (0,1) boosts small sources). Unlike [[mixSources]], the
    * per-source factor `f_s = totalRows·share_s / n_s` may EXCEED 1:
    * every row then emits `floor(f_s)` copies, plus one more for the
    * deterministic md5-hash fraction `f_s − floor(f_s)` of ids — so
    * repetition counts are reproducible across engines and runs, and an
    * incremental rerun repeats exactly the same rows.
    *
    * Engine-portable arithmetic: `pow` is not correctly rounded (libm
    * vs JVM may differ in the last ulp), so weights are floored to a
    * 1e-4 grid and summed as EXACT scaled longs (order-free — no
    * dependence on either engine's aggregation order); the factor is
    * then the fixed left-to-right double expression
    * `totalRows * (w/z) / n` that the oracle replays verbatim.
    *
    * Scale shape: one count aggregation (#sources rows, collected),
    * factors broadcast back; copies materialize as an
    * `explode(sequence(...))` in the scan projection — kept rows never
    * shuffle, and upsampled duplicates are created where the row
    * already lives.
    */
  def mixSourcesTemperature(
      df: DataFrame, sourceCol: String, idCol: String,
      alpha: Double, totalRows: Long,
      buckets: Int = 10000, copyCol: String = "mix_copy"): DataFrame =
    mixTemperatureImpl(df, sourceCol, idCol, lit(1L), alpha, totalRows,
      buckets, copyCol)

  /** [[mixSourcesTemperature]] in a WEIGHT space — the form real LM
    * mixes use: `totalBudget` and the per-source masses are sums of
    * `weight` (typically a token count), so source `s` receives budget
    * share `W_s^alpha / Σ W_t^alpha` measured in TOKENS, not rows. The
    * per-source rate `f_s = totalBudget·share_s / W_s` is still a ROW
    * multiplier (each emitted copy carries the row's whole weight), so
    * the copies arithmetic, md5 determinism, and engine-portable
    * grid/scaled-long weight handling are identical to the row form.
    * Sources whose weight sums to zero carry no budget and are dropped.
    */
  def mixSourcesTemperatureWeighted(
      df: DataFrame, sourceCol: String, idCol: String, weight: Column,
      alpha: Double, totalBudget: Long,
      buckets: Int = 10000, copyCol: String = "mix_copy"): DataFrame =
    mixTemperatureImpl(df, sourceCol, idCol, weight.cast("long"), alpha,
      totalBudget, buckets, copyCol)

  private def mixTemperatureImpl(
      df: DataFrame, sourceCol: String, idCol: String, weight: Column,
      alpha: Double, totalBudget: Long,
      buckets: Int, copyCol: String): DataFrame = {
    require(alpha >= 0, s"mixSourcesTemperature: alpha must be >= 0, got $alpha")
    require(totalBudget > 0, s"mixSourcesTemperature: total budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(sourceCol)).agg(sum(weight).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0) // zero-mass sources carry no budget
    require(counts.nonEmpty, "mixSourcesTemperature: no source with positive mass")
    val wScaled = counts.map { case (s, n) =>
      s -> math.floor(math.pow(n.toDouble, alpha) * 10000).toLong
    }.toMap
    val z = wScaled.values.sum // exact long sum, aggregation-order-free
    val factors = counts.map { case (s, n) =>
      // left-to-right doubles, mirrored verbatim in the oracle SQL
      val f = totalBudget.toDouble * (wScaled(s).toDouble / z.toDouble) / n.toDouble
      val full = math.floor(f).toLong
      val thr = math.floor((f - math.floor(f)) * buckets).toLong
      (s, full, thr)
    }
    val fDf = broadcast(factors.toSeq.toDF(sourceCol, "__full", "__thr"))
    df.join(fDf, sourceCol)
      .withColumn("__copies",
        col("__full") +
          when(hashBucket(col(idCol), buckets) < col("__thr"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__full", "__thr", "__copies")
  }

  /** Dense global `0..n-1` ordering by a SCORE — curriculum ordering
    * (easy→hard by length, quality, or perplexity), where
    * [[globalShuffleRank]] is the same contract ordered by hash.
    * Deterministic: `(score, md5(id), id)`, so equal-score runs are a
    * stable engine-portable shuffle, not input order.
    *
    * No single-partition sort of the DATA: the cumulative walk runs
    * over the DISTINCT-score table (one row per score value — tiny for
    * grid-valued scores), and rows only rank within their own score's
    * tie window. A row's rank is `(rows with a strictly better
    * score) + (its tie rank) − 1`.
    *
    * SCORE-GRID CONTRACT: the walk is bounded only when the score has
    * few distinct values — every gate caller here passes 1e-4-grid
    * scores. A RAW continuous score makes the distinct table ≈ the
    * full table and the ordered walk a single-partition sort: pass
    * `scoreGrid = Some(g)` to quantize first (`floor(score·g)` as a
    * long — order-preserving across cells, ties inside a cell break by
    * the deterministic md5 rule like any equal-score run).
    */
  /** The distinct-score walk's quantization knob: `None` passes the
    * score through (the caller promises it is already grid-valued —
    * every gate caller here floors onto the 1e-4 grid); `Some(g)`
    * floors onto `1/g`-wide cells as exact longs, keeping the walk's
    * distinct table bounded for raw continuous scores.
    */
  private def gridScore(score: Column, grid: Option[Double]): Column =
    grid match {
      case Some(g) =>
        require(g > 0 && !g.isNaN && !g.isInfinite,
          s"scoreGrid must be positive and finite, got $g")
        floor(score * lit(g)).cast("long")
      case None => score
    }

  def curriculumRank(df: DataFrame, idCol: String, score: Column,
      ascending: Boolean = true, rankCol: String = "rank",
      scoreGrid: Option[Double] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(Seq("__sc", "__cb", rankCol).contains),
      s"curriculumRank: input must not carry columns __sc/__cb/$rankCol")
    val withS = df.withColumn("__sc", gridScore(score, scoreGrid))
    val cnt = withS.groupBy(col("__sc")).agg(count(lit(1)).as("__c"))
    val ord = if (ascending) col("__sc").asc else col("__sc").desc
    val wOrd = Window.orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = cnt
      .withColumn("__cb", sum(col("__c")).over(wOrd) - col("__c"))
      .select(col("__sc"), col("__cb"))
    val wTie = Window.partitionBy(col("__sc"))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    withS.join(st, Seq("__sc"))
      .withColumn(rankCol, col("__cb") + row_number().over(wTie) - 1)
      .select(df.columns.map(col).toSeq :+ col(rankCol): _*)
  }

  /** Keep each row with its OWN probability — the importance-sampling
    * primitive behind quality-weighted corpus selection (keep
    * probability rising with a classifier score, the
    * DCLM/FineWeb-style soft filter that preserves score diversity
    * where a hard threshold cliffs). Membership is the shared md5
    * bucket rule against `floor(prob · buckets)`, so the decision is a
    * pure function of `(id, prob)` — reproducible across engines,
    * runs, and repartitioning, and an incremental rerun keeps exactly
    * the same rows. The caller supplies `prob` already on a coarse
    * grid (e.g. a 1e-4-floored sigmoid of an exact-grid score);
    * clamping makes the function total on out-of-range inputs.
    */
  def keepByProbability(df: DataFrame, idCol: String, prob: Column,
      buckets: Int = 10000): DataFrame = {
    val thr = least(greatest(floor(prob * buckets), lit(0.0)), lit(buckets.toDouble))
      .cast("long")
    df.filter(hashBucket(col(idCol), buckets) < thr)
  }

  /** Fixed data-recipe mixing: each source repeats for an explicit
    * (possibly fractional) EPOCH count — `"wiki" -> 3.5` emits every
    * wiki row 3 times plus a 4th copy for the deterministic md5-hash
    * half of ids. The form a finalized training recipe ships in
    * (epochs per source decided offline), where
    * [[mixSourcesTemperature]] is the form that derives them. Sources
    * absent from the recipe are dropped — a recipe is a whitelist, and
    * silently passing an unlisted source through at 1.0 is how a
    * stray corpus ends up in a training run.
    *
    * Scale shape: NO aggregation at all (the recipe is given, not
    * derived) — a broadcast of the per-source `(floor, fraction)`
    * factors into the scan, copies materialized by
    * `explode(sequence(...))` where each row already lives; kept rows
    * never shuffle. Fraction membership uses the same md5 bucket rule
    * as every sampler here, so an incremental rerun repeats exactly
    * the same rows.
    */
  def mixEpochs(
      df: DataFrame, sourceCol: String, idCol: String,
      epochs: Map[String, Double],
      buckets: Int = 10000, copyCol: String = "epoch"): DataFrame = {
    require(epochs.nonEmpty, "mixEpochs: empty recipe")
    epochs.foreach { case (s, e) =>
      require(e >= 0, s"mixEpochs: negative epoch count $e for source $s")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val factors = epochs.toSeq.map { case (s, e) =>
      (s, math.floor(e).toLong, math.floor((e - math.floor(e)) * buckets).toLong)
    }
    val fDf = broadcast(factors.toDF(sourceCol, "__full", "__thr"))
    df.join(fDf, sourceCol)
      .withColumn("__copies",
        col("__full") +
          when(hashBucket(col(idCol), buckets) < col("__thr"), 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn(copyCol, explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__full", "__thr", "__copies")
  }

  /** Deterministic global shuffle rank: a dense `0..n-1` ordering of
    * the corpus by `(md5(id), id)` — the reproducible "random" training
    * order — WITHOUT the single-partition sort that `row_number()` over
    * an unpartitioned window would plan.
    *
    * Two-pass distributed ranking: bucket every row by an ORDER-
    * PRESERVING prefix of the hash (top 32 bits scaled to `buckets`, so
    * bucket boundaries respect the global hash order), count rows per
    * bucket (tiny aggregate, collected), and broadcast the cumulative
    * offsets back; a row's rank is its bucket's offset plus its
    * `row_number` within the bucket — windows partitioned by bucket run
    * in parallel across the cluster, each sorting ~n/buckets rows with
    * the external spillable sort. The classic distributed dense-rank
    * shape (what `zipWithIndex` does at the RDD layer), kept in the
    * DataFrame plan.
    *
    * `buckets <= 0` (the default) derives the count from the plan's
    * row-count estimate, targeting [[ShuffleRankTargetRowsPerBucket]]
    * rows per within-bucket sort (md5 spreads rows uniformly, so the
    * target is also the expected size): a flat default would mean
    * ~100 GB-per-bucket sorts at 100 TB — spillable but slow — or
    * thousands of near-empty buckets on a small frame. Clamped to
    * [parallelism, 1 << 20]; the broadcast offset map stays tiny (one
    * (int, long) pair per bucket) at either end.
    */
  /** Null or NEGATIVE token values are contract errors, not silent
    * behavior: a negative count breaks the running sum's monotonicity,
    * which both the strict-prefix contract and the off-budget bucket
    * prune depend on (a pruned bucket could secretly dip back under
    * budget). assert_true is codegen'd inline — no extra pass.
    */
  private def checkedTokens(tokens: Column, op: String): Column = {
    val t = tokens.cast("long")
    when(assert_true(t.isNotNull && t >= 0,
      lit(s"$op: token expression is null, not castable to long, " +
        "or negative")).isNull, t)
  }

  /** Stats-derived bucket count shared by every bucket-offset two-pass
    * in this object: rowCount when the source has stats, else bytes at
    * a conservative ~100 B/row (overestimating rows only makes buckets
    * smaller than target, never a too-big sort); targets
    * [[ShuffleRankTargetRowsPerBucket]] rows per within-bucket sort,
    * clamped to [parallelism, 1 << 20].
    */
  private def deriveBuckets(df: DataFrame): Int = {
    val stats = df.queryExecution.optimizedPlan.stats
    val estRows = stats.rowCount.map(_.toLong)
      .getOrElse((stats.sizeInBytes / 100).toLong max 1L)
    val target =
      (estRows + ShuffleRankTargetRowsPerBucket - 1) / ShuffleRankTargetRowsPerBucket
    math.min(1L << 20,
      math.max(df.sparkSession.sparkContext.defaultParallelism.toLong, target)).toInt
  }

  /** Order-preserving hash-prefix bucket of `md5(id)`: top 32 bits of
    * the hash scaled to `n` — lexicographic md5-hex order == numeric
    * order of the 8-hex-char prefix, so the bucket is monotone in the
    * hash order every two-pass rank/cumsum here relies on.
    */
  private def hashPrefixBucket(h: Column, n: Int): Column =
    (conv(substring(h, 1, 8), 16, 10).cast("long") * n / lit(4294967296L))
      .cast("int")

  def globalShuffleRank(
      df: DataFrame, idCol: String, buckets: Int = 0,
      rankCol: String = "shuffle_rank"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val buckets0 = if (buckets > 0) buckets else deriveBuckets(df)
    val h = md5(col(idCol).cast("string"))
    val b = hashPrefixBucket(h, buckets0)
    val withB = df.withColumn("__bkt", b)
    val counts = withB.groupBy(col("__bkt")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (bk, n)) => (bk, acc + n) }
      .init.map { case (_, off) => off }
    val offDf = broadcast(
      counts.map(_._1).zip(offsets).toSeq.toDF("__bkt", "__off"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__bkt")).orderBy(h.asc, col(idCol).asc)
    withB.join(offDf, "__bkt")
      .withColumn(rankCol, col("__off") + row_number().over(w) - 1)
      .drop("__bkt", "__off")
  }

  /** Deterministic token-budget prefix sample: keep the documents whose
    * CUMULATIVE token count, taken in `(md5(id), id)` order, stays
    * within `budget` — "build an exactly-≤-B-token training set from a
    * bigger corpus", the last step before a training run is sized. The
    * hash order makes the prefix an unbiased, engine-portable sample
    * (same keep set every run, every engine); the contract is a strict
    * prefix — once a doc crosses the budget, nothing after it refills
    * the gap (refilling would make the keep set order-dependent and
    * unreproducible).
    *
    * Scale shape = [[globalShuffleRank]]'s two-pass bucket-offset
    * cumulative sum, with one extra lever: buckets whose EXCLUSIVE
    * token offset already exceeds the budget are dropped by the
    * broadcast-join pre-filter before any window runs — sampling a
    * 1 T-token subset out of a 100 T-token corpus sorts ~1% of the
    * buckets and never touches the rest. Per-bucket token sums (one
    * tiny collected aggregate) ride back as broadcast offsets; the
    * within-bucket running sum is a window over ~rows/buckets rows.
    *
    * Returns the kept rows with `cum_tokens` (inclusive global running
    * total) appended. Null token values are contract errors (packGreedy
    * style), not silent drops; zero-token docs cost nothing and are
    * kept wherever they land.
    */
  def sampleToTokenBudget(
      df: DataFrame, idCol: String, tokens: Column, budget: Long,
      buckets: Int = 0): DataFrame = {
    require(budget >= 0, s"sampleToTokenBudget: negative budget $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val nBuckets = if (buckets > 0) buckets else deriveBuckets(df)
    val h = md5(col(idCol).cast("string"))
    val b = hashPrefixBucket(h, nBuckets)
    val tokChecked = checkedTokens(tokens, "sampleToTokenBudget")
    val withB = df.withColumn("__tok", tokChecked).withColumn("__bkt", b)
    val sums = withB.groupBy(col("__bkt")).agg(sum(col("__tok")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft((0, 0L)) { case ((_, acc), (bk, s)) => (bk, acc + s) }
      .init.map { case (_, off) => off }
    // keep only buckets that can still contribute (off <= budget: a
    // boundary bucket may still fit rows; `<=` not `<` so zero-token
    // rows sitting exactly on the budget line survive, matching the
    // global cum<=budget rule) — the inner broadcast join IS the prune
    val offDf = broadcast(
      sums.map(_._1).zip(offsets).toSeq.toDF("__bkt", "__off")
        .filter(col("__off") <= budget))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__bkt")).orderBy(h.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = df.columns.map(col).toSeq :+
      (col("__off") + col("__cum")).as("cum_tokens")
    withB.join(offDf, "__bkt")
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__off") + col("__cum") <= budget)
      .select(outCols: _*)
  }

  /** Assign every row an OUTPUT SHARD so each shard holds ≈
    * `shardTokens` tokens — the writer-side step that turns a curated
    * corpus into N balanced training files (row-count partitioning
    * skews shard sizes 2-4× when doc lengths do; token balancing is
    * what the trainer's data loader actually wants). A row's shard is
    * `floor(tokens-before-it / shardTokens)` in the deterministic
    * global md5-of-id order — a doc straddling a boundary stays whole
    * in its starting shard (±1 doc of drift, never a split doc), and
    * the assignment is a pure function of the corpus, reproducible
    * across engines and reruns. Output: input columns +
    * `(shard, cum_tokens)`; write with `partitionBy("shard")`.
    *
    * Scale shape: [[sampleToTokenBudget]]'s two-pass bucket-offset
    * cumulative sum — per-bucket sums (tiny aggregate, broadcast
    * offsets), then windows WITHIN buckets only; no global sort, no
    * single-partition window.
    */
  def assignTokenShards(
      df: DataFrame, idCol: String, tokens: Column, shardTokens: Long,
      buckets: Int = 0): DataFrame = {
    require(shardTokens > 0,
      s"assignTokenShards: shardTokens must be positive, got $shardTokens")
    val spark = df.sparkSession
    import spark.implicits._
    val nBuckets = if (buckets > 0) buckets else deriveBuckets(df)
    val h = md5(col(idCol).cast("string"))
    val b = hashPrefixBucket(h, nBuckets)
    val tokChecked = checkedTokens(tokens, "assignTokenShards")
    val withB = df.withColumn("__tok", tokChecked).withColumn("__bkt", b)
    val sums = withB.groupBy(col("__bkt")).agg(sum(col("__tok")).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = sums.scanLeft((0, 0L)) { case ((_, acc), (bk, s)) => (bk, acc + s) }
      .init.map { case (_, off) => off }
    val offDf = broadcast(
      sums.map(_._1).zip(offsets).toSeq.toDF("__bkt", "__off"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__bkt")).orderBy(h.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = df.columns.map(col).toSeq :+
      expr(s"(__off + __cum - __tok) div ${shardTokens}L").as("shard") :+
      (col("__off") + col("__cum")).as("cum_tokens")
    withB.join(offDf, "__bkt")
      .withColumn("__cum", sum(col("__tok")).over(w))
      .select(outCols: _*)
  }

  /** Cross-source score CALIBRATION: each row's percentile of `score`
    * WITHIN its group — the step that makes per-source quality scores
    * comparable before a global threshold (a "good" web page and a
    * "good" academic page live on different raw scales; their
    * percentiles don't). `percent_rank` semantics: ties share one
    * percentile — so with grid scores the output is fully
    * deterministic with NO tiebreak order anywhere, and the value
    * `(rank − 1)/(n − 1)` is the same small-integer ratio in every
    * engine. Same grid contract as the other score walks: pass
    * `scoreGrid` for raw float scores.
    *
    * Scale shape: one shuffle co-locates each group for the rank
    * window; no distinct-score collect, no driver pass.
    */
  def normalizeScoresPerGroup(df: DataFrame, groupCol: String,
      score: Column, scoreGrid: Option[Double] = None,
      outCol: String = "score_pct"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"normalizeScoresPerGroup: input must not carry $outCol")
    df.withColumn(outCol,
      percent_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
          .orderBy(gridScore(score, scoreGrid).asc)))
  }

  /** Per-group [[sampleToTokenBudget]] — THE data-recipe primitive:
    * "B_s tokens from source s" for an explicit budget map, each
    * group's keep set an independent strict md5-order prefix. Groups
    * ABSENT from the map are dropped (a recipe is exhaustive by
    * contract — silence is exclusion, not unlimited).
    *
    * Same two-pass shape keyed by `(group, bucket)`: the collected
    * aggregate is one row per group per bucket (bounded by
    * #groups × buckets — recipes name domains/sources, not documents),
    * offsets accumulate within each group, and the broadcast pre-join
    * drops every bucket whose group offset already exceeds that
    * group's budget before any window runs.
    */
  def sampleToTokenBudgetByGroup(
      df: DataFrame, groupCol: String, idCol: String, tokens: Column,
      budgets: Map[String, Long], buckets: Int = 0): DataFrame = {
    require(budgets.nonEmpty, "sampleToTokenBudgetByGroup: empty budget map")
    require(budgets.values.forall(_ >= 0),
      s"sampleToTokenBudgetByGroup: negative budget in $budgets")
    val spark = df.sparkSession
    import spark.implicits._
    val nBuckets = if (buckets > 0) buckets else deriveBuckets(df)
    val h = md5(col(idCol).cast("string"))
    val b = hashPrefixBucket(h, nBuckets)
    val tokChecked = checkedTokens(tokens, "sampleToTokenBudgetByGroup")
    val withB = df
      .filter(col(groupCol).isin(budgets.keys.toSeq: _*))
      .withColumn("__tok", tokChecked).withColumn("__bkt", b)
    val sums = withB.groupBy(col(groupCol), col("__bkt"))
      .agg(sum(col("__tok")).as("__s"))
      .collect().toSeq.map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy { case (g, bk, _) => (g, bk) }
    val offsets = sums
      .groupBy(_._1)
      .flatMap { case (g, rows) =>
        val sorted = rows.sortBy(_._2)
        sorted.map(_._2).zip(
          sorted.map(_._3).scanLeft(0L)(_ + _).init).map { case (bk, off) => (g, bk, off) }
      }.toSeq
    val offDf = broadcast(
      offsets.toDF(groupCol, "__bkt", "__off")
        .filter(col("__off") <=
          element_at(typedLit(budgets), col(groupCol))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol), col("__bkt"))
      .orderBy(h.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = df.columns.map(col).toSeq :+
      (col("__off") + col("__cum")).as("cum_tokens")
    withB.join(offDf, Seq(groupCol, "__bkt"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__off") + col("__cum") <=
        element_at(typedLit(budgets), col(groupCol)))
      .select(outCols: _*)
  }

  /** Keep the top `numer/denom` fraction of each group by score — the
    * quantile-threshold curation rule ("top 30% of each source by
    * quality"), the fraction-form sibling of [[cappedPerGroup]]'s
    * fixed N. The fraction is a RATIONAL, not a double: the keep rule
    * is `rank · denom <= n_g · numer` in exact longs, so no engine's
    * rounding can move the cut.
    *
    * NOT a per-group global sort: pass 1 aggregates `(group, score)`
    * counts (one row per DISTINCT score — the table a cumulative
    * window then walks, tiny next to the data), derives each group's
    * keep-count and classifies every score as keep-all /
    * threshold / drop; pass 2 equi-joins that verdict back and sorts
    * ONLY the threshold ties (window over `(group, score)`), breaking
    * them by md5-of-id — deterministic, engine-portable, unbiased.
    * Rows below the threshold drop before the tie window, so the only
    * row-level sort touches the boundary score's rows; a pathological
    * group where every row shares one score degrades to sorting that
    * group, which is the problem statement itself.
    *
    * SCORE-GRID CONTRACT (see [[curriculumRank]]): the distinct-score
    * table is only "tiny next to the data" for grid-valued scores —
    * pass `scoreGrid = Some(g)` to quantize a raw continuous score, or
    * the walk degrades to a per-group sort of all rows.
    */
  def topFractionPerGroup(
      df: DataFrame, groupCol: String, idCol: String, score: Column,
      numer: Long, denom: Long, scoreGrid: Option[Double] = None): DataFrame = {
    require(denom > 0, s"topFractionPerGroup: denom must be positive, got $denom")
    require(numer >= 0, s"topFractionPerGroup: negative numer $numer")
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(
        Seq("__sc", "__cum", "__keep", "__slots", "__rk").contains),
      "topFractionPerGroup: input must not carry columns " +
        "__sc/__cum/__keep/__slots/__rk")
    val withS = df.withColumn("__sc", gridScore(score, scoreGrid))
    val cnt = withS.groupBy(col(groupCol), col("__sc"))
      .agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy(col(groupCol))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = cnt
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wg))
      // exact integer floor division — no doubles anywhere in the cut
      .withColumn("__keep", expr(s"(__n * ${numer}L) div ${denom}L"))
      .withColumn("__slots", col("__keep") - (col("__cum") - col("__c")))
      .filter(col("__slots") > 0) // below-threshold scores never rejoin
      .select(col(groupCol), col("__sc"), col("__cum"), col("__keep"),
        col("__slots"))
    val wTie = Window.partitionBy(col(groupCol), col("__sc"))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    withS.join(st, Seq(groupCol, "__sc"))
      .withColumn("__rk", row_number().over(wTie))
      .filter(col("__cum") <= col("__keep") || col("__rk") <= col("__slots"))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Label every row of each group with its rational quantile bucket
    * by score — the LABELING sibling of [[topFractionPerGroup]]
    * (CCNet's head/middle/tail split is `cuts = (1,3), (2,3)` with
    * three labels). Row with per-group rank `r` (score desc, md5-of-id
    * tie-break) gets `labels(i)` for the first cut with
    * `r · denom_i <= n_g · numer_i`, else the last label — exact
    * longs, no doubles in any boundary.
    *
    * Same scale shape as [[topFractionPerGroup]]: the cumulative walk
    * runs over the DISTINCT-score table; the only row-level window
    * ranks ties within one `(group, score)` — a row's global rank is
    * `(rows above its score) + (its tie rank)`, so no per-group
    * global sort exists anywhere. Same SCORE-GRID CONTRACT too:
    * quantize raw continuous scores via `scoreGrid`.
    */
  def quantileLabelsPerGroup(
      df: DataFrame, groupCol: String, idCol: String, score: Column,
      cuts: Seq[(Long, Long)], labels: Seq[String],
      labelCol: String = "bucket", scoreGrid: Option[Double] = None): DataFrame = {
    require(labels.length == cuts.length + 1,
      s"quantileLabelsPerGroup: ${cuts.length} cuts need ${cuts.length + 1} " +
        s"labels, got ${labels.length}")
    require(cuts.forall { case (nu, de) => de > 0 && nu >= 0 },
      s"quantileLabelsPerGroup: invalid cut in $cuts")
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(Seq("__sc", "__cb", "__n", labelCol).contains),
      s"quantileLabelsPerGroup: input must not carry columns __sc/__cb/__n/$labelCol")
    val withS = df.withColumn("__sc", gridScore(score, scoreGrid))
    val cnt = withS.groupBy(col(groupCol), col("__sc"))
      .agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy(col(groupCol))
    val wOrd = Window.partitionBy(col(groupCol)).orderBy(col("__sc").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = cnt
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wg))
      .select(col(groupCol), col("__sc"),
        (col("__cum") - col("__c")).as("__cb"), col("__n"))
    val wTie = Window.partitionBy(col(groupCol), col("__sc"))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    val rank = col("__cb") + row_number().over(wTie)
    val label = cuts.zip(labels.init).foldRight(lit(labels.last): Column) {
      case (((nu, de), lb), rest) =>
        when(rank * lit(de) <= col("__n") * lit(nu), lit(lb)).otherwise(rest)
    }
    withS.join(st, Seq(groupCol, "__sc"))
      .withColumn(labelCol, label)
      .select(df.columns.map(col).toSeq :+ col(labelCol): _*)
  }

  /** At most `n` rows per group, chosen DETERMINISTICALLY by md5-of-id
    * order (ties impossible: ids are distinct; the hash order is a
    * stable, engine-portable "random" order, so the cap is an unbiased
    * sample that never changes across runs or engines). The dominant
    * corpus-curation primitive — "at most N documents per domain" —
    * planned as `row_number` over (group, hash): Spark's rank-limit
    * pushdown (`WindowGroupLimit`) keeps only n rows per group per
    * partition BEFORE the shuffle, so a 100 TB corpus with a billion-doc
    * domain never materializes that domain's full candidate list.
    */
  def cappedPerGroup(
      df: DataFrame, groupCol: String, idCol: String, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")))
    df.withColumn("__graft_capn", row_number().over(w))
      .filter(col("__graft_capn") <= n)
      .drop("__graft_capn")
  }

  /** Weighted sampling WITHOUT replacement, `n` rows per group (or
    * globally with `groupCols = Nil`): the Efraimidis–Spirakis A-ES
    * scheme — each row draws a key `u^(1/w)` and the `n` largest keys
    * win, which provably selects each subset with probability
    * proportional to its weights. A higher-weight row is more likely
    * IN, but nothing is guaranteed in — the weighted generalization of
    * [[cappedPerGroup]]'s uniform cap (w ≡ 1 recovers it exactly up to
    * key shape).
    *
    * Deterministic and engine-portable like everything in this file:
    * `u` is md5-of-id mapped into (0,1) — `(h32 + 0.5) / 2³²` — not an
    * RNG stream, so membership survives re-partitioning, re-runs, and
    * engine swaps. The key is ranked in the DOUBLE-log domain:
    * `L = ln(−ln u) − ln w` ascending is monotone-equivalent to
    * `u^(1/w)` descending (both logs are strictly monotone; `−ln u > 0`
    * always, since `u < 1` strictly), and — unlike the raw `ln(u)/w`,
    * whose magnitude shrinks as `1/w` and would collapse any FIXED grid
    * to a handful of cells at large weights — `L` is bounded by a few
    * hundred for EVERY positive finite double weight
    * (`ln(−ln u) ∈ [−22.9, 3.2]`, `|ln w| < 745`). Flooring `L` onto a
    * 1e-12 grid as an exact long therefore gives a RELATIVE 1e-12
    * resolution on the key at every weight magnitude, with no overflow
    * and no valid-weight-range caveat; id tie-break covers the
    * (negligible-probability) residual knife edges from `ln` not being
    * IEEE-correctly-rounded — the same defense
    * [[graft.operators.Search.bm25TopK]] documents for its idf, here
    * made magnitude-uniform.
    *
    * Rows with null, NaN, non-positive, or infinite weight are
    * excluded — A-ES is undefined there (a zero-weight row must never
    * win, and `ln(+∞)` has no place on the grid).
    *
    * Scale: one scan + one rank window; Spark's rank-limit pushdown
    * (`WindowGroupLimit`) prunes every partition to its local top-n
    * BEFORE the shuffle, so a billion-row group ships ~n·partitions
    * candidate rows, not the group.
    */
  def weightedSamplePerGroup(
      df: DataFrame, idCol: String, weight: Column, n: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(n > 0, s"weightedSamplePerGroup: n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(Seq("__wk", "__wr").contains),
      "weightedSamplePerGroup: input must not carry columns __wk/__wr")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    // smaller L = larger u^(1/w) = better, so the window ranks ASCENDING
    val w =
      if (groupCols.isEmpty) Window.orderBy(col("__wk").asc, col(idCol).asc)
      else Window.partitionBy(groupCols.map(col): _*)
        .orderBy(col("__wk").asc, col(idCol).asc)
    // `> 0` alone would PASS NaN (Spark and DuckDB both order NaN above
    // every number), so NaN is excluded explicitly; +Inf is excluded so
    // ln(w) stays finite and the long cast is engine-portable
    val wd = weight.cast("double")
    df.filter(weight > 0 && !isnan(wd) && wd < lit(Double.PositiveInfinity))
      .withColumn("__wk", floor((log(-log(u)) - log(wd)) * lit(1e12)).cast("long"))
      .withColumn("__wr", row_number().over(w))
      .filter(col("__wr") <= n)
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Group-level quality propagation (the RefinedWeb/C4 domain-filter
    * move): aggregate a per-row score to its group's MEAN and keep only
    * rows whose group clears `minMean`, appending the group mean as
    * `<meanCol>`. Curation signal at the DOMAIN granularity — a spam
    * domain's individually-plausible pages all drop because the domain
    * average is poor, and a reputable domain's occasional weak page
    * survives.
    *
    * Determinism: scores are floored onto a `1/grid` lattice as exact
    * longs before summing (order-independent), and the mean is ONE
    * division `sum / (count · grid)` — the same IEEE operation on the
    * same integers on any engine.
    *
    * Scale: one partial-aggregating groupBy over `(group)` — the
    * aggregate is |groups| rows (domains, not documents) — joined back
    * on the group key; Catalyst/AQE broadcasts the aggregate side when
    * it is small, and a 100M-domain aggregate degrades to a plain
    * shuffle join, never a driver collect.
    */
  def filterByGroupScore(
      df: DataFrame, groupCol: String, score: Column, minMean: Double,
      grid: Double = 10000.0, meanCol: String = "group_score"): DataFrame = {
    require(grid > 0 && !grid.isNaN && !grid.isInfinite,
      s"filterByGroupScore: grid must be positive and finite, got $grid")
    require(!df.columns.exists(Seq("__gs", meanCol).contains),
      s"filterByGroupScore: input must not carry columns __gs/$meanCol")
    val g = df.withColumn("__gs", floor(score * lit(grid)).cast("long"))
    val means = g.groupBy(col(groupCol))
      .agg((sum(col("__gs")) / (count(lit(1)) * lit(grid))).as(meanCol))
      .filter(col(meanCol) >= lit(minMean))
    g.join(means, Seq(groupCol))
      .select(df.columns.map(col).toSeq :+ col(meanCol): _*)
  }
}
