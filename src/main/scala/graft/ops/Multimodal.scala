package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run per-partition over
  * iterator batches (the Scala analog of arrow-batched Python UDFs —
  * same batch shape, no per-row overhead).
  *
  * The actual codec calls are STUBBED behind `MediaCodec` with a
  * deterministic fake (no image/audio libraries in this environment); the
  * Spark-side contract — schema, partitioning, batch iteration, output
  * shape — is real and tested, and a production codec drops in without
  * touching the plumbing.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Int,
      payload_hash: Long,
      brightness: Double, // stub: derived deterministically from bytes
      n_frames_sampled: Int)

  /** STUB codec: a real implementation decodes pixels/samples; this one
    * derives deterministic features from the raw bytes so the pipeline is
    * testable end-to-end. Swap via the `decode` parameter of
    * `extractFeatures`.
    */
  object MediaCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val h = row.payload.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
      MediaFeatures(
        media_id = row.media_id,
        kind = row.kind,
        byte_len = row.payload.length,
        payload_hash = h,
        brightness =
          if (row.payload.isEmpty) 0.0
          else row.payload.map(b => (b & 0xFF).toDouble).sum / row.payload.length / 255.0,
        n_frames_sampled = if (row.kind == "video") math.max(1, (row.duration_ms / 1000).toInt) else 1)
    }
  }

  /** Per-partition feature extraction: one codec context per partition
    * (expensive decoder init amortized over the batch), rows streamed
    * through the iterator — constant memory per task at any scale.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      decode: MediaRow => MediaFeatures = MediaCodec.decode): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real codec would init its native context here, once per partition
      rows.map(decode)
    }
  }

  /** Deterministic synthetic media table for tests/demo: payload bytes are
    * seeded per id, so features are reproducible.
    */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new scala.util.Random(seed + i)
      val kind = Seq("image", "audio", "video")(rnd.nextInt(3))
      val payload = Array.fill(64 + rnd.nextInt(192))(rnd.nextInt(256).toByte)
      MediaRow(i, kind, payload,
        mime = kind match {
          case "image" => "image/png"; case "audio" => "audio/wav"; case _ => "video/mp4"
        },
        width = if (kind == "image" || kind == "video") 64 + rnd.nextInt(1024) else 0,
        height = if (kind == "image" || kind == "video") 64 + rnd.nextInt(1024) else 0,
        duration_ms = if (kind != "image") 1000L + rnd.nextInt(30000) else 0L)
    }
  }

  /** Feature summary per media kind — the downstream analytical shape. */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF().groupBy("kind").agg(
      count(lit(1)).as("n"),
      avg("byte_len").as("avg_bytes"),
      avg("brightness").as("avg_brightness"),
      sum("n_frames_sampled").as("total_frames"))
      .orderBy("kind")
}
