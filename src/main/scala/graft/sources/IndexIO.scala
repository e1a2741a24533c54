package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
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
  *   - the version's `_SEGMENTS` file lists the IMMUTABLE data
  *     directories that make up the index at that version — just
  *     itself for a full build, the parent's segments plus itself for
  *     an incremental append ([[publishDelta]]); readers scan the
  *     union, so "append" never rewrites or mutates existing data;
  *   - the single-file pointer `<path>/_LATEST` (the uuid, written via
  *     create-temp + atomic rename-overwrite) is flipped LAST;
  *   - readers resolve `_LATEST` once and then read only that
  *     version's segments, so a concurrent rebuild/append never
  *     mutates files under a reader — it publishes a sibling version
  *     and flips the pointer for FUTURE resolves.
  *
  * A failed build leaves the pointer on the previous complete version;
  * a path with no pointer fails loudly at resolve time instead of
  * probing torn tables. Version directories not referenced by the
  * current or pre-flip version's segments are pruned on publish.
  */
object IndexIO {

  private val Pointer = "_LATEST"
  private val SegmentsFile = "_SEGMENTS"

  /** Run `build` against a fresh version directory under `path`, then
    * atomically flip `<path>/_LATEST` to it. Returns the published
    * version directory.
    */
  def publish(spark: SparkSession, path: String)(build: String => Unit): String =
    publishInternal(spark, path, delta = false)(build)

  /** Like [[publish]], but the new version EXTENDS the current one:
    * its segment list is the parent's plus the fresh directory, so
    * readers see old + new data without any rewrite of the old — the
    * append lifecycle of a growing index. Requires a committed base.
    */
  def publishDelta(spark: SparkSession, path: String)(build: String => Unit): String =
    publishInternal(spark, path, delta = true)(build)

  private def publishInternal(
      spark: SparkSession, path: String, delta: Boolean)(build: String => Unit): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val base = new Path(path)
    val fs = base.getFileSystem(conf)
    val previous = currentVersion(spark, path)
    if (delta && previous.isEmpty) throw new IllegalStateException(
      s"cannot append to $path: no committed base index ($Pointer missing)")
    val parentSegments = previous.toSeq.flatMap(v => readSegments(fs, versionDir(base, v)))
    val version = java.util.UUID.randomUUID().toString.replace("-", "")
    val vdir = versionDir(base, version)
    build(vdir.toString)
    val newSegments =
      (if (delta) parentSegments else Seq.empty) :+ vdir.toString
    writeFile(fs, new Path(vdir, SegmentsFile), newSegments.mkString("\n"))
    val tmp = new Path(base, s".$Pointer.$version")
    writeFile(fs, tmp, version)
    // FileContext.rename(OVERWRITE) is the atomic single-file swap on
    // HDFS-like stores (FileSystem.rename refuses an existing target)
    FileContext.getFileContext(base.toUri, conf)
      .rename(tmp, new Path(base, Pointer), Options.Rename.OVERWRITE)
    // prune versions referenced by neither the new nor the pre-flip
    // version — current readers can hold at most the pre-flip segments
    val keep = (newSegments ++ parentSegments ++
      previous.map(v => versionDir(base, v).toString))
      .map(p => new Path(p).getName).toSet
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
    val vdir = versionDir(new Path(path), version)
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(vdir)) throw new IllegalStateException(
      s"index pointer at $path names missing version $version")
    vdir.toString
  }

  /** The immutable data directories making up the CURRENT index at
    * `path` (oldest first): one for a plain build, the whole append
    * chain for an incrementally-grown index. Readers union these.
    */
  def segments(spark: SparkSession, path: String): Seq[String] = {
    val vdir = new Path(resolve(spark, path))
    val fs = vdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    readSegments(fs, vdir)
  }

  private def versionDir(base: Path, version: String): Path =
    new Path(base, s"v-$version")

  private def readSegments(fs: FileSystem, vdir: Path): Seq[String] = {
    val f = new Path(vdir, SegmentsFile)
    if (!fs.exists(f)) Seq(vdir.toString) // pre-segments layout
    else readFile(fs, f).split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private def writeFile(fs: FileSystem, p: Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def readFile(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def currentVersion(spark: SparkSession, path: String): Option[String] = {
    val ptr = new Path(new Path(path), Pointer)
    val fs = ptr.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ptr)) None
    else Some(readFile(fs, ptr).trim).filter(_.nonEmpty)
  }
}
