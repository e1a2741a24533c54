package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Worst-case scale stress for the dedup path: replicate the sf0.1
  * corpus `copies`× (ids offset), so every document has `copies` exact
  * duplicates — posting lists grow `copies`×, candidate pairs
  * ~`copies`²×. Checks that nothing degenerates catastrophically at a
  * 10× corpus with pathological duplication.
  */
object ScaleStress {
  def t[T](l: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[stress] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n = base.count()
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _)
      .localCheckpoint(true)
    println(s"[stress] corpus: ${big.count()} docs (${copies}x $n)")
    t("exact dedup")(println("[stress]   rows: " +
      Dedup.exact(big, "text", "doc_id").count()))
    t("minhash lsh")(println("[stress]   pairs: " +
      Dedup.minhashLsh(big, "doc_id", "text", 3, 128, 32, 0.8).count()))
    t("ngram jaccard")(println("[stress]   pairs: " +
      Dedup.ngramJaccard(big, "doc_id", "text", 3, 0.6).count()))
    t("simhash")(println("[stress]   pairs: " +
      Dedup.simhashPairs(big, "doc_id", "text", 7).count()))
    spark.stop()
  }
}

/** Worst-case round count for distributed connected components: a PATH
  * graph (diameter = edge count) is the adversarial input for label
  * propagation. Prints rounds-to-fixpoint and wall time so the
  * O(log₄ diameter) claim in [[graft.operators.Dedup.connectedComponents]]
  * stays measured, not asserted.
  */
object ScaleStressCC {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toInt).getOrElse(600000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // path 0-1-2-...-nEdges: one component, diameter nEdges
    val pairs = spark.range(nEdges)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val t0 = System.nanoTime()
    val (labels, rounds) = graft.operators.Dedup.connectedComponentsImpl(
      pairs, "a", "b", maxIter = 40, localThreshold = 0L)
    val comps = labels.select("component").distinct().count()
    println(f"[stress-cc] path($nEdges): $rounds rounds, " +
      f"$comps component(s), ${(System.nanoTime() - t0) / 1e9}%.2f s")
    assert(comps == 1L, s"path graph must collapse to 1 component, got $comps")
    // the durable-checkpoint premium on the same adversarial graph:
    // what a cluster pays for executor-loss safety per round
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_stress_").toString
    val t1 = System.nanoTime()
    val (labelsR, roundsR) = graft.operators.Dedup.connectedComponentsImpl(
      pairs, "a", "b", maxIter = 40, localThreshold = 0L,
      checkpointDir = Some(ckpt))
    val compsR = labelsR.select("component").distinct().count()
    println(f"[stress-cc] path($nEdges) RELIABLE: $roundsR rounds, " +
      f"$compsR component(s), ${(System.nanoTime() - t1) / 1e9}%.2f s " +
      s"(spill dirs left: ${new java.io.File(ckpt).listFiles().length})")
    assert(compsR == 1L)
    spark.stop()
  }
}

/** The FULL pipeline_clean_corpus composition (quality gate -> language
  * gate -> exact dedup -> adaptive near-dup clustering -> connected
  * components -> representative-per-cluster anti-join) on the `copies`×
  * duplicated stress corpus, with a per-stage wall-time breakdown. The
  * components are individually stress-measured above; this answers the
  * question they can't: does the COMPOSITION hold up when every doc has
  * `copies` exact duplicates (the order-of-operations claim — exact
  * dedup first collapses the k² posting blowup — under its own worst
  * case).
  */
object ScaleStressPipeline {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TextFunctions
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    println(s"[stress-pipe] corpus: ${big.count()} docs (${copies}x)")
    val tAll = System.nanoTime()
    def stage[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stress-pipe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // EXACTLY the SparkEntry composition, stage-materialized so each
    // phase gets its own wall clock (the extra checkpoints make the
    // breakdown; the one after exact dedup exists in the query too)
    val filtered = stage("quality+lang gates") {
      big.select(col("doc_id"), col("text"),
          TextFunctions.qualityScore(col("text")).as("__q"),
          TextFunctions.langId(col("text")).as("__lang"))
        .filter(col("__q") >= 0.5 && col("__lang") === "en")
        .localCheckpoint(true)
    }
    println(s"[stress-pipe]   gated docs: ${filtered.count()}")
    val exact = stage("exact dedup") {
      Dedup.exact(filtered, "text", "doc_id").localCheckpoint(true)
    }
    println(s"[stress-pipe]   unique docs: ${exact.count()}")
    val pairs = stage("adaptive near-dup join (incl. probe)") {
      Dedup.ngramJaccardAuto(exact, "doc_id", "text", n = 3, threshold = 0.6)
        .select("doc_a", "doc_b").localCheckpoint(true)
    }
    println(s"[stress-pipe]   near-dup pairs: ${pairs.count()}")
    val comps = stage("connected components") {
      Dedup.connectedComponents(pairs, "doc_a", "doc_b").localCheckpoint(true)
    }
    val kept = stage("representative anti-join") {
      val drops = comps.filter(col("id") =!= col("component"))
        .select(col("id").as("__dropid"))
      exact.join(drops, exact("doc_id") === col("__dropid"), "left_anti").count()
    }
    println(f"[stress-pipe] TOTAL: ${(System.nanoTime() - tAll) / 1e9}%.2f s, kept $kept docs")
    spark.stop()
  }
}

/** Prefix-filter variant on the same stress corpus. */
object ScaleStressPrefix {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until copies).map(i =>
      base.select((col("doc_id") + lit(i * 1000000)).as("doc_id"), col("text")))
      .reduce(_ union _).localCheckpoint(true)
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.ngramJaccardPrefix(big, "doc_id", "text", 3, 0.6).count()
    println(f"[stress] ngram prefix: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n pairs")
    spark.stop()
  }
}

/** Round-17 verdict #3: scale-stress the PARITY JOINS beyond sf0.1 —
  * replicate the sf0.1 tables to ~sf0.3 and ~sf1 volumes and measure
  * rows/s, then run a synthetic hot-key skew (one value holding ~25%
  * of a side) and report the heaviest stage's max/mean task-time ratio
  * plus whether AQE split skewed partitions. The linearity table and
  * the skew balance numbers are the "plans survive 100×" evidence a
  * single-SF bench cannot give.
  *
  * Usage: runMain graft.tools.JoinScaleStress [maxCopies]
  */
object JoinScaleStress {
  import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

  /** max/mean task duration per stage, over the run of `body`. */
  private final class StageBalance extends SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val d = te.taskInfo.duration
      byStage.merge(te.stageId, (d, d, 1L), (a, b) =>
        (math.max(a._1, b._1), a._2 + b._2, a._3 + b._3))
      ()
    }
    /** (maxTask, meanTask, nTasks) of the stage with the largest total. */
    def heaviest: (Double, Double, Long) = {
      import scala.jdk.CollectionConverters._
      val (mx, sum, n) = byStage.values.asScala.maxBy(_._2)
      (mx / 1e3, sum / 1e3 / n, n)
    }
  }

  private def timed(spark: org.apache.spark.sql.SparkSession, label: String)(
      df: => org.apache.spark.sql.DataFrame): Unit = {
    val bal = new StageBalance
    spark.sparkContext.addSparkListener(bal)
    val t0 = System.nanoTime()
    val d = df
    val rows = d.count()
    val secs = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.runtime.ListenerDrain.drain(spark.sparkContext)
    spark.sparkContext.removeSparkListener(bal)
    val (mx, mean, n) = bal.heaviest
    val skewSplit = d.queryExecution.executedPlan.toString.contains("skewed=true")
    println(f"[jscale] $label%-28s rows=$rows%10d  ${secs}%7.2f s  " +
      f"${rows / secs / 1e6}%8.2f Mrow/s  heaviest-stage max/mean=" +
      f"${mx / math.max(mean, 0.001)}%5.1fx ($n tasks)  aqeSkewSplit=$skewSplit")
  }

  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val maxCopies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    def rep(table: String, copies: Int, idCol: String, valCol: String,
        isolate: Boolean): org.apache.spark.sql.DataFrame = {
      val base = spark.read.parquet(s"$sf/$table.parquet")
      (0 until copies).map { i =>
        val shifted =
          if (isolate) base.withColumn(valCol, col(valCol) + lit(i * 40000.0))
          else base
        shifted.withColumn(idCol, col(idCol) + lit(i * 10000000L))
      }.reduce(_ unionByName _).localCheckpoint(true)
    }

    for (k <- Seq(1, 3, maxCopies)) {
      println(s"[jscale] ===== ${k}x sf0.1 (≈sf${"%.1f".format(k * 0.1)}) =====")
      // fuzzy: copies value-isolated so output grows k× — the
      // linearity probe (time should track rows, not rows²)
      val cI = rep("customer", k, "c_custkey", "c_acctbal", isolate = true)
      val sI = rep("supplier", k, "s_suppkey", "s_acctbal", isolate = true)
      timed(spark, s"fuzzy_join tol=5 ${k}x") {
        graft.operators.FuzzyJoin.numeric(cI, sI, 5.0,
          leftOn = Some("c_acctbal"), rightOn = Some("s_acctbal"))
      }
      // ineq: output grows ~k² (output-dominated op) — the metric is
      // output rows/s holding steady as volume grows
      val c = rep("customer", k, "c_custkey", "c_acctbal", isolate = false)
      val su = rep("supplier", k, "s_suppkey", "s_acctbal", isolate = false)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      timed(spark, s"ineq_join >= shuffled ${k}x") {
        graft.operators.IneqJoin(
          s2.createDataFrame(c.toJavaRDD, c.schema),
          s2.createDataFrame(su.toJavaRDD, su.schema), how = ">=",
          leftOn = Some("c_acctbal"), rightOn = Some("s_acctbal"), prune = false)
      }
      // interval join: window self-similar, output grows k×
      val o = rep("orders", k, "o_orderkey", "o_totalprice", isolate = false)
        .filter(col("o_orderdate") >= to_timestamp(lit("2001-06-01")) &&
          col("o_orderdate") < to_timestamp(lit("2001-06-15")))
        .select(col("o_orderkey"), col("o_orderdate").as("o_start"),
          (col("o_orderdate") + expr("INTERVAL 5 DAYS")).as("o_end"))
      val li = rep("lineitem", k, "l_orderkey", "l_quantity", isolate = false)
        .filter(col("l_shipdate") >= to_timestamp(lit("2001-06-01")) &&
          col("l_shipdate") < to_timestamp(lit("2001-06-20")))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").as("l_start"),
          (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("l_end"))
      timed(spark, s"interval_join ${k}x") {
        graft.operators.IntervalJoin.time(o, li, "o_start", "o_end",
          "l_start", "l_end", java.time.Duration.ofDays(5))
      }
    }

    println(s"[jscale] ===== skew: ${maxCopies}x, one value = ~25% of a side =====")
    // hot-key skew: a quarter of the RIGHT side pinned to one value —
    // the adversarial input for both the fuzzy equi-bucket rewrite
    // (AQE skew split) and the shuffled range join (salted
    // partitioning); balance shows up as max/mean task time ≈ 1
    // both sides hot on ONE value: the left quarter and right quarter
    // land in a single tol-bucket, so the equi-rewrite's hot partition
    // carries ~(n/4)·(m/4) residual evaluations unless something splits
    // or drifts the bucket — the adversarial shape for the band join
    val cU = rep("customer", maxCopies, "c_custkey", "c_acctbal", isolate = false)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 4 === 0, lit(5000.02)).otherwise(col("c_acctbal")))
      .localCheckpoint(true)
    val sSkew = rep("supplier", maxCopies, "s_suppkey", "s_acctbal", isolate = false)
      .withColumn("s_acctbal",
        when(col("s_suppkey") % 4 === 0, lit(5000.0)).otherwise(col("s_acctbal")))
      .localCheckpoint(true)
    timed(spark, s"fuzzy_join SKEWED ${maxCopies}x") {
      graft.operators.FuzzyJoin.numeric(cU, sSkew, 0.05,
        leftOn = Some("c_acctbal"), rightOn = Some("s_acctbal"))
    }
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val cNarrow = cU.filter(col("c_acctbal") >= 4999.0 && col("c_acctbal") <= 5001.0)
    timed(spark, s"range_join SKEWED ${maxCopies}x") {
      graft.operators.IneqJoin(
        s3.createDataFrame(cNarrow.toJavaRDD, cNarrow.schema),
        s3.createDataFrame(sSkew.toJavaRDD, sSkew.schema), how = "<=",
        leftOn = Some("c_acctbal"), rightOn = Some("s_acctbal"), prune = false)
    }
    spark.stop()
  }
}
