package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract
  * / frame-sample as partition-batched transforms.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries): [[decodeImageStub]] derives deterministic fake metadata
  * from the bytes. Everything around the stub — schema handling, the
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas`:
  * iterator-of-rows in, iterator-of-rows out, one JVM-side batch per
  * partition), partitioning, and sampling — is real and tested, so
  * swapping in a real codec is a one-function change.
  */
object Multimodal {

  /** Metadata struct produced by the (stub) image decoder. */
  val ImageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("byte_len", LongType, nullable = false)))

  /** Attach a binary payload column (UTF-8 bytes of `srcCol`) — the
    * testdata has no real media, so documents' text stands in for image
    * bytes; at 100 TB this column would come straight from parquet
    * `binary` pages and never pass through a string.
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, encode(col(srcCol), "UTF-8"))

  /** STUB decoder (a real codec call goes here; none ships in this
    * container). The fake is deterministic in the payload bytes so tests
    * and oracles can predict it: width/height fold the byte length,
    * format sniffs a magic byte.
    */
  def decodeImageStub(bytes: Array[Byte]): Row = {
    val len = bytes.length.toLong
    val width = (len % 640L).toInt + 1
    val height = ((len / 640L) % 480L).toInt + 1
    val format = if (bytes.nonEmpty && (bytes(0) & 0xff) == 0x89) "png" else "raw"
    Row(width, height, format, len)
  }

  /** Decode metadata for every row, batched per partition
    * (`mapPartitions` keeps the codec instance alive across a partition —
    * the same reason `mapInPandas` batches arrow record-batches).
    * Output schema: input columns (minus the payload) + ImageMetaSchema.
    */
  def decodeMeta(df: DataFrame, binCol: String, keepCols: Seq[String]): DataFrame = {
    val outSchema = StructType(
      keepCols.map(c => df.schema(c)) ++ ImageMetaSchema.fields)
    val keepIdx = keepCols.map(df.schema.fieldIndex)
    val binIdx = df.schema.fieldIndex(binCol)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    df.mapPartitions { rows =>
      // per-partition setup (real codec init would go here, once)
      rows.map { row =>
        val meta = decodeImageStub(row.getAs[Array[Byte]](binIdx))
        Row.fromSeq(keepIdx.map(row.get) ++ meta.toSeq)
      }
    }
  }

  /** STUB feature extractor: a deterministic `dim`-bucket byte histogram
    * (L2-normalized) standing in for a real vision/audio embedding model.
    * The Spark-side contract is the real part: `binary -> array<float>`
    * per row, partition-batched so a real model would load once per
    * partition (the `mapInPandas` batch shape), output ready for the
    * SimilaritySearch / Dedup.embedding* operators.
    */
  def featureStub(df: DataFrame, binCol: String, dim: Int = 16,
      outCol: String = "features"): DataFrame = {
    require(dim > 0)
    val extract = org.apache.spark.sql.functions.udf { bytes: Array[Byte] =>
      val hist = new Array[Float](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      }
      val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
      if (norm > 0) hist.map(x => (x / norm).toFloat) else hist
    }
    df.withColumn(outCol, extract(org.apache.spark.sql.functions.col(binCol)))
  }

  /** STUB resize: a real codec would decode, scale, and re-encode; the
    * deterministic fake truncates/zero-pads the payload to `targetBytes`
    * — the plumbing (binary in, binary out, length contract) is what
    * downstream stages depend on.
    */
  def resizeStub(df: DataFrame, binCol: String, targetBytes: Int,
      outCol: String = "resized"): DataFrame = {
    require(targetBytes > 0)
    val resize = org.apache.spark.sql.functions.udf { bytes: Array[Byte] =>
      val src = if (bytes == null) Array.empty[Byte] else bytes
      java.util.Arrays.copyOf(src, targetBytes)
    }
    df.withColumn(outCol, resize(org.apache.spark.sql.functions.col(binCol)))
  }

  /** Deterministic frame sampling: split the payload into `n` equal
    * byte-range "frames" (a real video pipeline would seek keyframes; the
    * slicing/explode plumbing is identical). Output: one row per frame
    * with `(frame_idx, frame_bytes)`.
    */
  def frameSample(df: DataFrame, binCol: String, n: Int): DataFrame = {
    require(n > 0)
    val len = length(col(binCol))
    val step = greatest((len / n).cast(IntegerType), lit(1))
    df.select(
        col("*"),
        posexplode(
          transform(sequence(lit(0), lit(n - 1)),
            i => col(binCol).substr(i * step + 1, step)))
          .as(Seq("frame_idx", "frame_bytes")))
      .filter(length(col("frame_bytes")) > 0)
  }
}
