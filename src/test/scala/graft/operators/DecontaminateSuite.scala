package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSuite extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private val train = Seq(
    (1L, "a b c d e f"),        // shares "b c d" + "c d e" + "b c d e" windows with eval 10
    (2L, "x y z w q r"),        // no overlap
    (3L, "c d e zz yy"),        // shares "c d e" with eval 10
    (4L, "one two")             // too short for n=3: no shingles
  ).toDF("doc_id", "text")

  private val evalSet = Seq(
    (10L, "b c d e"),
    (11L, "completely different words here")
  ).toDF("doc_id", "text")

  test("ngramOverlap flags exactly the docs sharing an n-gram, with exact counts") {
    val out = Decontaminate.ngramOverlap(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // doc 1: shingles {abc,bcd,cde,def} (4); eval has {bcd,cde} → 2 shared
    // doc 3: shingles {cde,dezz,zzyy...} → exactly "c d e" shared (1 of 3)
    assert(out.toSeq == Seq(
      (1L, 2L, 4L, 0.5),
      (3L, 1L, 3L, 0.3333)))
  }

  test("clean corpus and sub-n docs produce no rows") {
    val clean = train.filter($"doc_id" === 2L || $"doc_id" === 4L)
    assert(Decontaminate.ngramOverlap(clean, evalSet, "doc_id", "text", n = 3).count() == 0)
  }

  test("pairs attribute the contamination to the right eval doc") {
    val pairs = Decontaminate.ngramOverlapPairs(train, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == Seq((1L, 10L, 2L), (3L, 10L, 1L)))
  }

  test("eval side broadcasts (the 100 TB-corpus plan shape)") {
    val plan = Decontaminate.ngramOverlap(train, evalSet, "doc_id", "text", n = 3)
      .queryExecution.executedPlan
    assert(collectBroadcasts(plan).nonEmpty, s"no broadcast exchange in:\n$plan")
  }

  test("broadcastEval=false still returns identical rows") {
    val a = Decontaminate.ngramOverlap(train, evalSet, "doc_id", "text", n = 3, broadcastEval = false)
    val b = Decontaminate.ngramOverlap(train, evalSet, "doc_id", "text", n = 3)
    assertSameRows(a.orderBy("doc_id"), b.orderBy("doc_id"))
  }

  private def collectBroadcasts(plan: SparkPlan): Seq[SparkPlan] =
    collectWithSubqueries(plan) { case b: BroadcastExchangeExec => b }
}
