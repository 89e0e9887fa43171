package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque binary columns with typed
  * metadata, decoded by a batched kernel stage (the Scala analogue of
  * `mapInPandas` — one mapPartitions with fixed-size batches, the shape a
  * real image decoder / feature extractor wants).
  *
  * The decoder itself is a clearly-marked STUB (the sandbox ships no image
  * libs): it parses deterministic fake headers out of the bytes. Everything
  * Spark-side — binary schema, batching, partitioning, output schema — is
  * real and oracle-checked (the fake header is derivable in SQL from the
  * same md5 the payload was built from). */
object MediaStub {

  /** Typed decode result (what a real decoder would emit per media blob). */
  case class MediaMeta(doc_id: Long, width: Int, height: Int, format: String,
      n_bytes: Int)

  val BatchSize = 64 // rows per kernel batch (decoder batch shape)

  /** STUB decode kernel: byte-header parse standing in for image decode.
    * A real implementation decodes pixels here; the interface (batch in,
    * metadata out) is the contract. */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] =
    batch.map { case (id, bytes) =>
      // header layout of the synthetic payload: md5(doc_id) raw bytes
      val b = bytes
      val width = (((b(0) & 0xff) << 8) | (b(1) & 0xff)) % 1024 + 32
      val height = (((b(2) & 0xff) << 8) | (b(3) & 0xff)) % 1024 + 32
      val format = ((b(4) & 0xff) % 3) match {
        case 0 => "png"; case 1 => "jpg"; case 2 => "webp"
      }
      MediaMeta(id, width, height, format, b.length)
    }

  /** documents -> synthetic binary payload column -> batched kernel decode
    * -> typed metadata table. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        unhex(md5(col("doc_id").cast("string"))).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "decoder session"; fixed batch shape
        it.grouped(BatchSize).flatMap(decodeBatch)
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Frame-sampling plumbing: every media payload yields k deterministic
    * frame offsets (a video keyframe-sampler's output shape) — shows the
    * one-to-many kernel contract. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        unhex(md5(col("doc_id").cast("string"))).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.flatMap { case (id, b) =>
            val n = (b(5) & 0xff) % 4 + 1 // frames per doc: 1..4
            (0 until n).map(k => (id, k, ((b(6 + k) & 0xff) * 40).toLong))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "offset_ms")
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize plumbing: aspect-preserving fit into a 256px box, computed in
    * the batched kernel over the decoded dims — all-integer arithmetic
    * (scale in per-mille) so the oracle is bit-exact. A real implementation
    * resamples pixels here; the batch contract and the output schema are
    * the real surface. */
  def mediaResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        unhex(md5(col("doc_id").cast("string"))).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          decodeBatch(batch).map { m =>
            val mx = math.max(m.width, m.height)
            if (mx <= 256) (m.doc_id, m.width, m.height, 1000)
            else (m.doc_id, m.width * 256 / mx, m.height * 256 / mx, 256000 / mx)
          }
        }
      }
      .toDF("doc_id", "out_w", "out_h", "scale_pm")
      .orderBy("doc_id")
  }

  /** Feature-extract plumbing: payload -> fixed-width embedding (8 byte
    * dims), the batched encoder contract. The encoder is the STUB (real
    * deployments run an image tower here); dims are exact ints so the
    * oracle replays them. */
  def mediaEmbed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        unhex(md5(col("doc_id").cast("string"))).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.map { case (id, b) =>
            (id, (0 until 8).map(i => b(i) & 0xff).toArray)
          }
        }
      }
      .toDF("doc_id", "emb")
      .select(col("doc_id") +:
        (0 until 8).map(i => col("emb").getItem(i).as(s"e$i")): _*)
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_meta" -> mediaMeta _,
    "media_frame_sample" -> frameSample _,
    "media_resize" -> mediaResize _,
    "media_embed" -> mediaEmbed _,
  )

  val oracles: Map[String, String] = Map(
    "media_meta" ->
      """WITH m AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents)
        |SELECT doc_id,
        |  (('0x' || substr(h, 1, 4))::INT % 1024 + 32)::INT AS width,
        |  (('0x' || substr(h, 5, 4))::INT % 1024 + 32)::INT AS height,
        |  CASE ('0x' || substr(h, 9, 2))::INT % 3 WHEN 0 THEN 'png'
        |    WHEN 1 THEN 'jpg' ELSE 'webp' END AS format,
        |  16::INT AS n_bytes
        |FROM m ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      """WITH m AS (SELECT doc_id, md5(doc_id::VARCHAR) AS h,
        |  ('0x' || substr(h, 11, 2))::INT % 4 + 1 AS n FROM documents)
        |SELECT doc_id, (k - 1)::INT AS frame_idx,
        |  (('0x' || substr(h, 13 + (k - 1) * 2, 2))::INT * 40)::BIGINT AS offset_ms
        |FROM m, UNNEST(generate_series(1, n)) AS t(k)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "media_resize" ->
      """WITH m AS (SELECT doc_id,
        |  (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 1024 + 32) AS w,
        |  (('0x' || substr(md5(doc_id::VARCHAR), 5, 4))::INT % 1024 + 32) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, w, h, greatest(w, h) AS mx FROM m)
        |SELECT doc_id,
        |  (CASE WHEN mx <= 256 THEN w ELSE w * 256 // mx END)::INT AS out_w,
        |  (CASE WHEN mx <= 256 THEN h ELSE h * 256 // mx END)::INT AS out_h,
        |  (CASE WHEN mx <= 256 THEN 1000 ELSE 256000 // mx END)::INT AS scale_pm
        |FROM r ORDER BY doc_id""".stripMargin,
    "media_embed" ->
      ("""SELECT doc_id, """ + (0 until 8).map(i =>
        s"('0x' || substr(md5(doc_id::VARCHAR), ${1 + i * 2}, 2))::INT AS e$i")
        .mkString(", ") +
        """ FROM documents ORDER BY doc_id"""),
  )
}
