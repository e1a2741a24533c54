package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Diagnostic: measures the data-skipping value of [[Layout.zorderLayout]]
  * against the two naive layouts (unsorted; lexicographic sort) on the
  * orders table. Writes each layout as `nFiles` parquet files, then for a
  * point-ish predicate on EACH dimension counts how many files could
  * contain matches by their per-file min/max — exactly the row-group
  * pruning a 100 TB scan does with parquet statistics or a lakehouse
  * manifest.
  *
  * Expected shape: a lexicographic (a, b) sort prunes ~1/nFiles on `a`
  * but nothing on `b`; Z-order prunes ~1/√nFiles on BOTH.
  *
  * Usage: runMain graft.tools.ZorderCheck [sfDir] [nFiles]
  */
object ZorderCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey").cast("long").as("ck"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("days"))

    val base = java.nio.file.Files.createTempDirectory("graft_zorder_check")
    def write(df: DataFrame, name: String): String = {
      val p = s"$base/$name"
      df.write.mode("overwrite").parquet(p)
      p
    }
    val unsortedP = write(o.repartition(nFiles), "unsorted")
    val lexP = write(
      o.repartitionByRange(nFiles, col("ck"), col("days"))
        .sortWithinPartitions(col("ck"), col("days")), "lex")
    val zP = write(Layout.zorderLayout(o, Seq("ck", "days"), bits = 16,
      outPartitions = nFiles), "zorder")

    // per-file min/max footprint, read back through the parquet metadata
    // of the written files themselves (input_file_name groups rows by file
    // — equivalent to what a manifest or row-group index stores)
    def footprint(path: String): DataFrame =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("ck").as("ck_min"), max("ck").as("ck_max"),
          min("days").as("days_min"), max("days").as("days_max"))

    def prunedCount(fp: DataFrame, colMin: String, colMax: String,
        lo: Long, hi: Long): (Long, Long) = {
      val total = fp.count()
      val hit = fp.filter(col(colMax) >= lo && col(colMin) <= hi).count()
      (hit, total)
    }

    val stats = o.agg(min("ck"), max("ck"), min("days"), max("days")).head()
    val (ckLo, ckHi) = (stats.getLong(0), stats.getLong(1))
    val (dLo, dHi) = (stats.getLong(2), stats.getLong(3))
    // a 5%-wide range predicate on each dimension
    def band(lo: Long, hi: Long): (Long, Long) = {
      val mid = (lo + hi) / 2; val w = math.max(1L, (hi - lo) / 40)
      (mid - w, mid + w)
    }
    val (cka, ckb) = band(ckLo, ckHi)
    val (da, db) = band(dLo, dHi)

    for ((name, p) <- Seq("unsorted" -> unsortedP, "lex(ck,days)" -> lexP,
        "zorder" -> zP)) {
      val fp = footprint(p).cache()
      val (ckHit, n1) = prunedCount(fp, "ck_min", "ck_max", cka, ckb)
      val (dHit, n2) = prunedCount(fp, "days_min", "days_max", da, db)
      println(f"$name%-14s files=$n1 ck-range scan=$ckHit/$n1 " +
        f"days-range scan=$dHit/$n2")
      fp.unpersist()
    }
    spark.stop()
  }
}
