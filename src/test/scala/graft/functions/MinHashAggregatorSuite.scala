package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Group-level MinHash aggregator: estimator accuracy against true
  * set Jaccard, partitioning invariance (the merge is the real test of
  * an Aggregator), and map-side partial aggregation in the plan.
  */
class MinHashAggregatorSuite extends SparkSpec {
  import spark.implicits._

  private val k = 256

  test("signature estimate tracks the true Jaccard of the union sets") {
    val rnd = new scala.util.Random(3)
    val universe = (0 until 400).map(i => s"tok$i")
    // group A and B share ~half their vocabulary
    def doc(ws: Seq[String]) = Seq.fill(20)(ws(rnd.nextInt(ws.size))).mkString(" ")
    val aWords = universe.take(260)
    val bWords = universe.drop(140)
    val df = ((0 until 40).map(i => ("A", doc(aWords))) ++
      (0 until 40).map(i => ("B", doc(bWords)))).toDF("grp", "text")
      .withColumn("sh", TextFunctions.shingles(col("text"), 2))

    val agg = new MinHashAggregator(k).toColumn
    val sigs = df.as[(String, String, Seq[String])]
      .groupByKey(_._1)
      .mapValues(_._3)
      .agg(agg.name("sig"))
      .collect().toMap

    // true Jaccard of the union shingle sets
    val sets = df.select("grp", "sh").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.flatMap(_.getSeq[String](1)).toSet).toMap
    val inter = sets("A").intersect(sets("B")).size
    val trueJ = inter.toDouble / (sets("A").size + sets("B").size - inter)
    val est = MinHashAggregator.estimateJaccard(sigs("A").toSeq, sigs("B").toSeq)
    assert(math.abs(est - trueJ) < 3.0 / math.sqrt(k), // ~3 sigma
      s"estimate $est vs true $trueJ")
  }

  test("signature is invariant under partitioning (merge correctness)") {
    val docs = (0 until 50).map(i => ("g", s"alpha$i beta${i % 7} gamma${i % 3} delta"))
    def sigOf(parts: Int): Seq[Long] = {
      val df = docs.toDF("grp", "text")
        .repartition(parts)
        .withColumn("sh", TextFunctions.shingles(col("text"), 2))
      df.as[(String, String, Seq[String])]
        .groupByKey(_._1).mapValues(_._3)
        .agg(new MinHashAggregator(k).toColumn.name("sig"))
        .collect().head._2.toSeq
    }
    assert(sigOf(1) == sigOf(7))
  }

  test("plan uses partial aggregation (buffers cross the shuffle, not rows)") {
    val df = (0 until 100).map(i => (s"g${i % 3}", Seq(s"s$i", "shared")))
      .toDF("grp", "sh")
    val plan = df.as[(String, Seq[String])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAggregator(16).toColumn.name("sig"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan.take(600))
  }
}
