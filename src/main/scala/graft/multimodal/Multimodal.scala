package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal asset columns: image/audio/video as opaque `binary` plus
  * typed metadata, with the Spark-side plumbing (schema, partition-wise
  * batch decode, feature schema) real and tested.
  *
  * The actual codec work hides behind the pluggable [[Multimodal.Codec]]
  * trait; this container has no image/audio libraries, so the shipped
  * implementation is [[Multimodal.SeededHashCodec]], a deterministic
  * fake keyed on the bytes' hash. A real JNI/FFmpeg decoder implements
  * the same three methods and drops in; the distributed shape
  * (mapPartitions batching, per-partition codec lifecycle, no driver
  * collect, stable output schema) is what this module pins down.
  */
object Multimodal {

  /** Canonical asset schema for 100 TB-scale multimodal tables: assets
    * partitioned by modality; bytes kept out of every plan that doesn't
    * decode (column pruning does this for free when metadata lives in
    * its own columns, NOT inside the blob).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** The pluggable decode boundary: one blob in, `dim` features out.
    * Implementations ship to executors (must be Serializable) and run
    * inside a per-partition batch loop — a real JNI/FFmpeg/arrow codec
    * drops in without touching any pipeline plumbing (schema,
    * partitioning, batch shape are [[decode]]'s job, not the codec's).
    * `open()` runs once per partition before the batch (native context
    * acquisition); `close()` after it, crash or not.
    */
  trait Codec extends Serializable {
    def dim: Int
    /** Decode one asset's bytes (null = failed fetch / metadata-only
      * row) into exactly `dim` features.
      */
    def decode(modality: String, bytes: Array[Byte]): Array[Float]
    def open(): Unit = ()
    def close(): Unit = ()
  }

  /** Deterministic seeded-hash fake — the test implementation for a
    * container with no codec libraries (the real decoder is the one
    * absent piece; everything around it is real and tested). Features
    * are a pure function of the bytes, so dedup/near-dup semantics
    * behave like a perceptual codec's on identical content.
    */
  final case class SeededHashCodec(dim: Int = 8) extends Codec {
    def decode(modality: String, bytes: Array[Byte]): Array[Float] = {
      val seed =
        if (bytes == null) 0L
        else bytes.foldLeft(1125899906842597L)((h, b) => 31 * h + b)
      Array.tabulate(dim)(i => (((seed >>> (i % 48)) & 0xFFFF).toFloat / 65535f))
    }
  }

  /** Decode → feature vectors through a pluggable [[Codec]]: a
    * per-partition batch loop via mapPartitions — one task = one batch
    * of blobs, codec context opened once per partition, nothing
    * returns to the driver, output schema fixed regardless of codec.
    */
  def decode(assets: DataFrame, codec: Codec): DataFrame = {
    val outSchema = StructType(
      assetSchema.fields.filterNot(_.name == "bytes") :+
        StructField("features", ArrayType(FloatType), nullable = false))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    assets.select(col("asset_id"), col("modality"), col("bytes"), col("meta"))
      .mapPartitions { rows =>
        codec.open()
        val out = rows.map { r =>
          val feats = codec.decode(r.getAs[String]("modality"), r.getAs[Array[Byte]]("bytes"))
          require(feats.length == codec.dim,
            s"codec returned ${feats.length} features, declared dim=${codec.dim}")
          Row(r.getAs[Long]("asset_id"), r.getAs[String]("modality"), r.getAs[Row]("meta"), feats)
        }
        // close when the task drains the iterator OR dies — a native
        // codec's context must not leak on task failure
        org.apache.spark.TaskContext.get() match {
          case null => out // driver-side (local testing): nothing to hook
          case tc => tc.addTaskCompletionListener[Unit](_ => codec.close()); out
        }
      }(enc)
  }

  /** [[decode]] with the deterministic fake — kept as the named entry
    * the queries/tests use in this codec-less container.
    */
  def decodeStub(assets: DataFrame, dim: Int = 8): DataFrame =
    decode(assets, SeededHashCodec(dim))

  /** Resize metadata transform — pure projection; a real implementation
    * would pair this with a decode/encode in the partition loop.
    */
  def resizePlan(assets: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = least(lit(1.0), lit(maxSide) / greatest(w, h).cast("double"))
    assets
      .withColumn("target_width", ceil(w * scale).cast("int"))
      .withColumn("target_height", ceil(h * scale).cast("int"))
  }

  /** Frame sampling plan for video rows: one output row per sampled
    * frame timestamp (explode of a bounded sequence — output size is
    * n_frames per asset, never unbounded). A null/unknown duration
    * still yields the t=0 frame (explode of a null sequence would
    * silently DROP the whole asset); everyMs must be positive or the
    * sequence step fails inside every executor task — rejected here.
    */
  def frameSamplePlan(assets: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    assets.where(col("modality") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L),
          greatest(coalesce(col("meta.duration_ms"), lit(1L)) - 1, lit(0L)), lit(everyMs))))
  }

  /** Exact content dedup: one hash aggregation on a 256-bit sha2 digest
    * of the blob — bytes never shuffle, only their digest. A 64-bit key
    * would birthday-collide at billions of assets (~n²/2⁶⁵ expected
    * silent merges); 256 bits keeps the collision odds negligible at any
    * corpus size. The first multimodal curation pass (identical
    * re-crawled assets).
    */
  def dedupByContent(assets: DataFrame, idCol: String = "asset_id"): DataFrame =
    assets
      // null bytes (failed fetches, metadata-only rows) share no
      // content — without this filter they'd all hash to the null key
      // and collapse into one bogus "duplicate" cluster
      .where(col("bytes").isNotNull)
      .groupBy(sha2(col("bytes"), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Perceptual near-dup pairs over decoded feature vectors — composes
    * a [[Codec]] (the seeded-hash fake by default; pass a real one)
    * with the LSH-bucketed embedding near-dup operator: decode is a
    * partition-local batch pass, candidate pairing is bucketed (never
    * all-pairs), ids-only shuffles. The multimodal face of
    * Similarity.embeddingNearDup.
    */
  def nearDupByFeatures(assets: DataFrame, dim: Int = 8,
                        threshold: Double = 0.95, planes: Int = 8,
                        codec: Codec = null): DataFrame = {
    val c = Option(codec).getOrElse(SeededHashCodec(dim))
    graft.operators.Similarity.embeddingNearDup(
      decode(assets, c), dim = c.dim, threshold = threshold, planes = planes,
      idCol = "asset_id", vecCol = "features")
  }

  /** Synthetic asset table for tests/demo — deterministic bytes from
    * the id, no external data needed.
    */
  def syntheticAssets(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    spark.range(n.toLong).select(
      col("id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")), (col("id") % 3 + 1).cast("int")).as("modality"),
      sha2(col("id").cast("string"), 256).cast("binary").as("bytes"),
      struct(
        lit("synthetic").as("format"),
        (col("id") % 1920 + 16).cast("int").as("width"),
        (col("id") % 1080 + 16).cast("int").as("height"),
        (col("id") * 40 + 1000).as("duration_ms")).as("meta"))
  }
}
