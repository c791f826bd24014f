package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, processed per-partition in batches — the shape an
  * image/audio feature-extraction stage has at 100 TB (brief: decode libs are
  * absent in this container, so the DECODE step is a clearly-marked
  * deterministic stub; the Spark-side plumbing — schema, partition batching,
  * feature signature — is real and tested).
  */
object Multimodal {

  /** Extracted per-media features. `fp` is a real digest of the bytes;
    * `feat` is the stubbed "decoded" feature vector. */
  final case class MediaFeature(doc_id: Long, n_bytes: Int, fp: String,
      feat: Array[Float])

  /** STUB DECODER — stands in for image/audio decode (JPEG/PNG/PCM...).
    * Deterministic: features derive from the payload digest, so tests and
    * oracles are stable. A real deployment swaps only this function. */
  private def decodeStub(digest: Array[Byte]): Array[Float] =
    digest.take(4).map(b => (b & 0xff) / 255.0f)

  /** Per-partition batch feature extraction over (id, bytes) rows — one
    * MessageDigest per partition, no per-row setup; this is the
    * mapPartitions batch shape a GPU/codec stage needs. */
  def extract(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, bytes) =>
        md.reset()
        val digest = md.digest(bytes)
        val hex = digest.map(b => f"${b & 0xff}%02x").mkString
        MediaFeature(id, bytes.length, hex, decodeStub(digest))
      }
    }
  }

  /** The documents table viewed as a media table (text bytes standing in for
    * an image/audio payload) → features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    extract(docs.select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]).toDF()
  }

  /** "Resize" plumbing — the downsample-every-media stage: the payload's
    * byte stream is stride-`factor` downsampled per partition batch (a real
    * pipeline decodes and resamples pixels here; the stride is the
    * deterministic stub) and re-fingerprinted. Output:
    * (doc_id, n_bytes_out, fp). */
  def resize(spark: SparkSession, docs: DataFrame, factor: Int = 2): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val out = bytes.indices.by(factor).map(bytes).toArray
          md.reset()
          (id, out.length, md.digest(out).map(b => f"${b & 0xff}%02x").mkString)
        }
      }.toDF("doc_id", "n_bytes_out", "fp")
  }

  /** DuckDB mirror of resize(factor = 2): keeping every 2nd byte of ASCII
    * text is the regex pair-reduction `(.).` → `\1` ('.' skips nothing here —
    * the docs are single-line ASCII). */
  def resizeOracleSql: String =
    """SELECT doc_id,
      |  length(regexp_replace(text, '(.).', '\1', 'g')) AS n_bytes_out,
      |  md5(regexp_replace(text, '(.).', '\1', 'g')) AS fp
      |FROM documents
      |""".stripMargin.replaceAll("\\s+", " ")

  /** Deterministic frame sampling over an opaque binary payload — the
    * video/audio "decode every Nth frame" plumbing: the payload is treated as
    * fixed-`frameLen`-byte frames and every `stride`-th frame index is
    * fingerprinted (a real pipeline would decode the frame here; md5 is the
    * stubbed extractor). Declarative (explode over a sequence + substring) so
    * frames of one document fan out across tasks — no per-doc driver loop.
    * Returns (doc_id, frame_idx, frame_fp). */
  def frameSample(docs: DataFrame, frameLen: Int = 64, stride: Int = 4): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))
      .filter(length(col("payload")) >= 1)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0),
          expr(s"CAST((length(payload) - 1) DIV $frameLen AS INT)"),
          lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(expr(s"substring(payload, frame_idx * $frameLen + 1, $frameLen)"))
          .as("frame_fp"))

  /** DuckDB mirror of frameSample over the `documents` view (docs are ASCII,
    * so varchar substring/md5 agree with the byte-level Spark path). */
  def frameSampleOracleSql(frameLen: Int = 64, stride: Int = 4): String =
    s"""SELECT doc_id, frame_idx,
       |  md5(substring(text, frame_idx * $frameLen + 1, $frameLen)) AS frame_fp
       |FROM documents,
       |  unnest(range(0, ((length(text) - 1) // $frameLen) + 1, $stride)) AS u(frame_idx)
       |WHERE length(text) >= 1
       |""".stripMargin.replaceAll("\\s+", " ")
}
