package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source/sink round-trips and the scan-pruning properties the scale
  * design depends on (partition pruning, filter pushdown).
  */
class SourcesSuite extends SparkSpec {
  import spark.implicits._

  private val tmp = "target/test-tmp/sources"

  test("csv with explicit schema round-trips types") {
    val dir = s"$tmp/csv"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/data.csv"), "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Sources.csv(spark, s"$dir/data.csv", schema)
    assert(df.schema == schema)
    assert(rowSet(df) == Set(Seq("1", "alpha", "1.5"), Seq("2", "beta", "2.5")))
  }

  test("jsonl with explicit schema prunes unlisted fields") {
    val dir = s"$tmp/jsonl"
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/data.jsonl"),
      """{"id":1,"keep":"a","noise":{"big":[1,2,3]}}
        |{"id":2,"keep":"b","noise":null}
        |""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType), StructField("keep", StringType)))
    val df = Sources.jsonl(spark, s"$dir/data.jsonl", schema)
    assert(df.columns.toSeq == Seq("id", "keep"))
    assert(rowSet(df) == Set(Seq("1", "a"), Seq("2", "b")))
  }

  test("orc with explicit schema round-trips types and pushes filters to the scan") {
    val dir = s"$tmp/orc"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", 2.5), (3L, "gamma", 3.5))
      .toDF("id", "name", "score")
    df.write.mode("overwrite").orc(dir)
    // file-based relations are nullable regardless of writer schema
    val schema = StructType(df.schema.map(_.copy(nullable = true)))
    val back = Sources.orc(spark, dir, schema)
    assert(back.schema == schema)
    assert(rowSet(back) == rowSet(df))
    val plan = Sources.orc(spark, dir, schema).filter($"id" > 1).select("name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"no pushed filter in ORC scan:\n$plan")
  }

  test("partitioned write produces hive-style dirs and prunes on read") {
    val dir = s"$tmp/part"
    val df = Seq((1, "a", "2024-01-01"), (2, "b", "2024-01-02"), (3, "c", "2024-01-02"))
      .toDF("id", "v", "day")
    Sources.writePartitioned(df, dir, Seq("day"))
    assert(new java.io.File(s"$dir/day=2024-01-01").isDirectory)
    val back = Sources.parquet(spark, dir).filter(col("day") === "2024-01-02")
    assert(back.count() == 2)
    // partition pruning: the pruned scan must not list the other partition
    val scanDesc = back.queryExecution.executedPlan.toString
    assert(!scanDesc.contains("2024-01-01"), scanDesc.take(400))
  }

  test("token-shard write: shard dirs, whole docs, balanced token mass") {
    val dir = s"$tmp/tokshards"
    val rnd = new scala.util.Random(5)
    val docs = (0 until 300).map(i => (i.toLong, (1 + rnd.nextInt(40)).toLong))
    val df = docs.toDF("id", "toks")
    val shardTokens = 500L
    Sources.writeTokenShards(df, dir, "id", col("toks"), shardTokens)
    assert(new java.io.File(s"$dir/shard=0").isDirectory)
    val back = Sources.parquet(spark, dir)
    // every doc exactly once, token mass conserved
    assert(back.count() == 300)
    assert(back.agg(sum("toks")).head().getLong(0) == docs.map(_._2).sum)
    // shard ids contiguous; every shard within one-doc drift of target
    val sums = back.groupBy("shard").agg(sum("toks").as("s"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(sums.keySet == (0L until sums.keySet.max + 1).toSet)
    val maxDoc = docs.map(_._2).max
    sums.filter(_._1 < sums.keySet.max).foreach { case (sh, s) =>
      assert(s >= shardTokens - maxDoc && s <= shardTokens + maxDoc,
        s"shard $sh mass $s target $shardTokens")
    }
    // assignment matches the operator (the write adds nothing)
    val direct = graft.operators.Sampling
      .assignTokenShards(df, "id", col("toks"), shardTokens)
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = back.select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(got == direct)
  }

  test("clustered write sorts within files so row-group stats enable skipping") {
    val dir = s"$tmp/clustered"
    val df = (0 until 1000).map(i => (i % 97, s"v$i")).toDF("k", "v")
    Sources.writeClustered(df, dir, Seq("k"), numFiles = 4)
    val back = Sources.parquet(spark, dir)
    assert(back.count() == 1000)
    // pushdown visible in the scan node
    val plan = back.filter(col("k") === 5).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(k)"), plan.take(600))
  }

  test("z-ordered write: every dimension's per-file min-max box is prunable") {
    // two independent uniform dims; the measure of layout quality is
    // how many FILES a range predicate on each dim could touch, judged
    // by per-file min-max (exactly what parquet row-group stats and
    // file skipping act on)
    val rnd = new scala.util.Random(11)
    val df = (0 until 60000)
      .map(_ => (rnd.nextInt(10000), rnd.nextInt(10000)))
      .toDF("a", "b")
    val zdir = s"$tmp/zorder"
    val ldir = s"$tmp/linear"
    Sources.writeZOrdered(df, zdir, Seq("a", "b"), numFiles = 32)
    Sources.writeClustered(df, ldir, Seq("a"), numFiles = 32)

    def filesTouching(dir: String, colName: String, lo: Int, hi: Int): Long = {
      val boxes = Sources.parquet(spark, dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(colName)).as("mn"), max(col(colName)).as("mx"))
      boxes.filter(col("mx") >= lo && col("mn") <= hi).count()
    }
    val zTotal = Sources.parquet(spark, zdir)
      .select(input_file_name()).distinct().count()
    assert(zTotal >= 16, s"expected ~32 z-files, got $zTotal")

    // a 5%-range predicate on EACH dim, same layout
    val zA = filesTouching(zdir, "a", 4000, 4499)
    val zB = filesTouching(zdir, "b", 4000, 4499)
    val lA = filesTouching(ldir, "a", 4000, 4499)
    val lB = filesTouching(ldir, "b", 4000, 4499)
    // linear-by-a prunes a tightly but cannot prune b at all
    assert(lA <= 4, s"linear layout should prune its own key, touched $lA")
    assert(lB >= 30, s"linear layout cannot prune b, touched $lB")
    // the z-order layout prunes BOTH dims substantially
    assert(zA <= zTotal / 2, s"z-order should prune a: $zA of $zTotal")
    assert(zB <= zTotal / 2, s"z-order should prune b: $zB of $zTotal")
    // round-trip integrity
    assert(Sources.parquet(spark, zdir).count() == 60000)
    assert(rowSet(Sources.parquet(spark, zdir)) == rowSet(df))
  }

  test("bucketed tables join without a shuffle (no Exchange in the plan)") {
    val a = (0 until 500).map(i => (i % 50, s"a$i")).toDF("k", "av")
    val b = (0 until 300).map(i => (i % 50, s"bv$i")).toDF("k", "bv")
    Sources.writeBucketed(a, "graft_bkt_a", Seq("k"), numBuckets = 8)
    Sources.writeBucketed(b, "graft_bkt_b", Seq("k"), numBuckets = 8)
    try {
      // disable broadcast so the co-located sort-merge path is exercised
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), plan.take(800))
        assert(j.count() == 500L * 300 / 50) // 50 keys, 10x6 rows each
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("parquet filter pushdown reaches the scan for testdata tables") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val df = Sources.parquet(spark, "/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 25.0).select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(l_quantity"),
      plan.take(600))
  }
}
