package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.SparkSession

/** Atomic publish/resolve for persisted index directories (MinHash
  * band index, BM25 inverted index, IVF / IVF-SQ8 cells).
  *
  * An index is several parquet tables written by separate jobs
  * (postings + sketches + meta, or centroids + cells); plain
  * `mode("overwrite")` into fixed subdirs means a mid-build failure —
  * or a rebuild racing a long-lived reader such as the streaming
  * dedup gate, whose static side re-lists files per batch — can
  * expose an index whose tables disagree about their own parameters.
  *
  * The fix is the standard log-pointer layout:
  *
  *   - every build writes ALL its tables under a fresh
  *     `<path>/v-<uuid>/` directory, invisible to readers;
  *   - the single-file pointer `<path>/_LATEST` (the uuid, written via
  *     create-temp + atomic rename-overwrite) is flipped LAST;
  *   - readers resolve `_LATEST` once and then read only that
  *     version's directory, so a concurrent rebuild never mutates
  *     files under a reader — it publishes a sibling version and
  *     flips the pointer for FUTURE resolves.
  *
  * A failed build leaves the pointer on the previous complete version;
  * a path with no pointer fails loudly at resolve time instead of
  * probing torn tables. Superseded versions are pruned on publish,
  * keeping the previous one for readers that resolved pre-flip.
  */
object IndexIO {

  private val Pointer = "_LATEST"

  /** Run `build` against a fresh version directory under `path`, then
    * atomically flip `<path>/_LATEST` to it. Returns the published
    * version directory.
    */
  def publish(spark: SparkSession, path: String)(build: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(path)
    val fs = base.getFileSystem(conf)
    val previous = currentVersion(spark, path)
    val version = java.util.UUID.randomUUID().toString.replace("-", "")
    val vdir = new Path(base, s"v-$version")
    build(vdir.toString)
    val tmp = new Path(base, s".$Pointer.$version")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes(StandardCharsets.UTF_8)) finally out.close()
    // FileContext.rename(OVERWRITE) is the atomic single-file swap on
    // HDFS-like stores (FileSystem.rename refuses an existing target)
    FileContext.getFileContext(base.toUri, conf)
      .rename(tmp, new Path(base, Pointer), Options.Rename.OVERWRITE)
    // prune versions superseded before `previous` — current readers can
    // hold at most the pre-flip version, never anything older
    val keep = Set(Some(version), previous).flatten.map(v => s"v-$v")
    fs.listStatus(base).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("v-") && !keep.contains(name))
        fs.delete(st.getPath, true)
    }
    vdir.toString
  }

  /** The committed version directory under `path`, or a loud error if
    * no build ever published (or the published version was removed).
    */
  def resolve(spark: SparkSession, path: String): String = {
    val version = currentVersion(spark, path).getOrElse(throw new IllegalStateException(
      s"no committed index at $path: $Pointer missing — " +
        "either no build ran or it failed before publish"))
    val vdir = new Path(new Path(path), s"v-$version")
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(vdir)) throw new IllegalStateException(
      s"index pointer at $path names missing version $version")
    vdir.toString
  }

  private def currentVersion(spark: SparkSession, path: String): Option[String] = {
    val ptr = new Path(new Path(path), Pointer)
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim).filter(_.nonEmpty)
      finally in.close()
    }
  }
}
