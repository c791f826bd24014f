package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads as opaque `binary` columns with
  * typed metadata, processed per-partition in batches — the shape an
  * image/audio feature-extraction stage has at 100 TB. The container has no
  * JPEG/PNG/PCM codecs, so the planted payload is a REAL image format the
  * JVM can decode bare-handed: binary PGM (P5), whose ASCII header
  * ("P5\n8 4\n255\n" — magic, dims, maxval; decodePgm parses it
  * positionally, not at a fixed offset) + raw pixel bytes exercise genuine
  * byte-level decoding (magic check, ASCII
  * dimension parse, bounds check, pixel extraction) in the same
  * mapPartitions batch shape a codec/GPU stage needs. A deployment swaps
  * `decodePgm` for its codec; every other line stays.
  */
object Multimodal {

  /** Minimal REAL decoder for binary PGM (P5): parses `P5`, whitespace-
    * separated ASCII width/height/maxval, one whitespace, then width×height
    * raw pixel bytes. Returns (width, height, pixels) or None for anything
    * malformed (bad magic, non-positive dims, maxval > 255, truncated
    * payload) — corrupt media must be droppable, not a task failure. */
  def decodePgm(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '5') return None
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\n' || b == '\t' || b == '\r'
    def readInt(): Int = {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      // accumulate in Long with a sane ceiling: a 32-bit wrap would turn a
      // huge malformed dimension into a small "valid" one
      var v = 0L; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = math.min(v * 10 + (bytes(i) - '0'), 1L << 40); i += 1; any = true
      }
      if (!any || v > 1000000) -1 else v.toInt
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    // exactly one whitespace byte separates maxval from pixel data; a
    // non-whitespace byte here means a malformed header, not pixel 0
    if (i >= bytes.length || !isWs(bytes(i))) return None
    i += 1
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255 ||
        i + w.toLong * h > bytes.length) return None
    Some((w, h, Array.tabulate(w * h)(j => bytes(i + j) & 0xff)))
  }

  /** Per-partition batch decode over (id, payload) rows → decoded pixel
    * stats (width, height, n_px, min/max/sum of pixel values). Rows whose
    * payload fails to decode are dropped (flatMap), the per-partition
    * iterator is the batch boundary a codec stage amortizes setup over. */
  def decodeFeatures(media: Dataset[(Long, Array[Byte])]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodePgm(bytes).map { case (w, h, px) =>
          (id, w, h, px.length, px.min, px.max, px.map(_.toLong).sum)
        }
      }
    }.toDF("doc_id", "width", "height", "n_px", "min_px", "max_px", "sum_px")
  }

  /** The documents table as a planted PGM corpus — the media relation
    * shared by every decode entry point: each doc's payload is a valid
    * 8×4 P5 image whose 32 pixels are the first 32 PRINTABLE-ASCII bytes
    * of the doc's text. The ASCII normalization is part of the planting
    * on BOTH engines, because the cross-check equates Spark's UTF-8
    * payload BYTES with the oracle's per-character code points, which
    * only coincide for ASCII (a 'ü' is two bytes but one code point).
    * Docs with fewer than 32 such bytes are skipped (no full image). */
  private def plantedMedia(spark: SparkSession,
      docs: DataFrame): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    docs
      .withColumn("px_src",
        substring(regexp_replace(col("text"), "[^\\x20-\\x7e]", ""), 1, 32))
      .filter(length(col("px_src")) >= 32)
      .select(col("doc_id"),
        concat(lit("P5\n8 4\n255\n").cast("binary"),
          col("px_src").cast("binary")).as("payload"))
      .as[(Long, Array[Byte])]
  }

  def documentFeatures(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(plantedMedia(spark, docs))
      .withColumn("mean_px", round(col("sum_px") / col("n_px"), 4))

  /** Perceptual AVERAGE-HASH dedup (the public aHash family: a pixel's bit
    * is 1 iff it exceeds the image mean) over the planted PGM corpus:
    * decode the binary payload (the real codec stage — mapPartitions is
    * the justified shape for codecs), emit the w·h-bit hash as a bit
    * string, and count each hash's occupancy — equal hashes are the
    * near-duplicate image groups (aHash is brightness/contrast-invariant
    * by construction: the threshold is the image's own mean). The
    * mean compare is exact integer math (px·n > Σpx), so no float
    * rounding can flip a bit on either engine. At 100 TB the hash is the
    * stored sidecar and dedup is one hash-partitioned count — the
    * image-side twin of dedup_exact's text hash groupBy.
    * Returns (doc_id, phash, n_dups). */
  def phashDedup(spark: SparkSession, docs: DataFrame): DataFrame =
    dupCounts(phashRows(spark, docs))

  /** The persistable (doc_id, phash) hash rows — the decode+hash
    * projection shared by the live entry, the materialized sidecar
    * (Catalog.phashStore), and the streamed ingest twin: media is hashed
    * ONCE at ingest; dedup is a read. */
  def phashRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    plantedMedia(spark, docs).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodePgm(bytes).map { case (_, _, px) => (id, aHashBits(px)) }
      }
    }.toDF("doc_id", "phash")
  }

  /** The dedup verb over hash rows (live or stored): each hash's
    * occupancy — one hash-partitioned window count. */
  def dupCounts(hashed: DataFrame): DataFrame =
    hashed.withColumn("n_dups", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy("phash")))

  /** The dHash gradient bits of one decoded image — bit i = pixel i
    * strictly above pixel i+1: brightness-shift invariant like aHash
    * ((p+c) > (q+c) ⇔ p > q), but sensitive to local structure where
    * aHash only sees the global mean. */
  private[graft] def dHashBits(px: Array[Int]): String =
    // iterator zip (not sliding(2)) so the helper is TOTAL: sliding yields
    // a final short window on a 1-pixel array, which the partial match
    // would MatchError on (ADVICE r18); zip just ends
    px.iterator.zip(px.iterator.drop(1))
      .map { case (a, b) => if (a > b) '1' else '0' }.mkString

  /** The 63-bit COMPOSITE hash rows (doc_id, ph = aHash ++ dHash,
    * sharpness) the Hamming near-dup index stores. The 32-bit aHash alone
    * is too short for radius search at corpus scale: its 8-bit bands have
    * only 256 values, so band buckets grow linearly with the corpus and
    * the candidate set quadratically (measured: 63 s at sf0.1). The
    * composite's ~16-bit bands keep buckets collision-sized — the same
    * reason production pHashes are 64+ bits. Sharpness (the exact-integer
    * scaled variance, see imageSharpness) rides the SAME decode pass as
    * one more column: media is decoded once at ingest, and keep-best
    * never touches the bytes again (r19). */
  def phashNearRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    plantedMedia(spark, docs).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodePgm(bytes).map { case (_, _, px) =>
          (id, aHashBits(px) + dHashBits(px), sharpnessOf(px)) }
      }
    }.toDF("doc_id", "ph", "sharpness")
  }

  /** The ONE sharpness law — exact-integer scaled pixel variance
    * n·Σx² − (Σx)² — shared by the store build (phashNearRows) and the
    * live scorer (imageSharpness), so a law change cannot drift between
    * the sidecar and the ad-hoc path. */
  private[graft] def sharpnessOf(px: Array[Int]): Long = {
    val s = px.map(_.toLong).sum
    val s2 = px.map(p => p.toLong * p).sum
    px.length.toLong * s2 - s * s
  }

  /** Hamming-RADIUS image near-dup over composite-hash rows (live or
    * stored) — exact-equal aHash (mm_phash_dedup) misses the few-bit
    * flips re-encoding/resizing produces; the scale answer is
    * multi-index hashing (Norouzi et al., CVPR 2012): split the hash
    * into B = 4 bands, and any pair within Hamming distance k ≤ B − 1 = 3
    * shares AT LEAST one band EXACTLY (pigeonhole), so candidates come
    * from band-bucket equi-joins — the banded-MinHash posture; no
    * all-pairs anywhere — and the exact distance verifies per candidate.
    * The B/k pair makes the recall guarantee EXACT, which is what the
    * brute-force oracle checks. Returns (doc_a, doc_b, hamming ≤ k). */
  def phashNearFrom(hashed: DataFrame, k: Int = 3,
      hashLen: Int = 63): DataFrame = {
    val bands = 4
    val width = hashLen / bands // last band absorbs the remainder
    val starts = (0 until bands).map(b => b * width + 1)
    val lens = starts.map(s =>
      if (s == starts.last) hashLen - s + 1 else width)
    val bandStructs = starts.zip(lens).zipWithIndex.map {
      case ((s, l), b) => s"struct($b AS band, substring(ph, $s, $l) AS bits)"
    }.mkString(", ")
    // the bit string folds to ONE long per row (63 bits fit signed
    // BIGINT), so the per-candidate verify is codegen'd integer xor +
    // popcount — the interpreted per-position higher-order string
    // compare this replaced was the whole cost of the entry (14 s → sub-
    // second statement work at sf0.1)
    val keyed = hashed.select(col("doc_id"),
        conv(col("ph"), 2, 10).cast("long").as("hl"),
        explode(expr(s"array($bandStructs)")).as("bk"))
      .select(col("doc_id"), col("hl"),
        col("bk.band").as("band"), col("bk.bits").as("bits"))
    keyed.select(col("doc_id").as("doc_a"), col("hl").as("la"),
        col("band"), col("bits"))
      .join(keyed.select(col("doc_id").as("doc_b"), col("hl").as("lb"),
        col("band"), col("bits")), Seq("band", "bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(expr("la ^ lb")).cast("long").as("hamming"))
      .filter(col("hamming") <= k)
      .distinct()
  }

  /** Per-image SHARPNESS score for keep-best image dedup: the scaled pixel
    * variance n·Σx² − (Σx)² — EXACT INTEGER math (no division, so no
    * float tree to match across engines; bounded: 8-bit pixels × 32 px
    * keep every term far under 2^63). A near-dup image cluster mixes the
    * original with blurred/flattened re-encodes; variance is the standard
    * cheap contrast/sharpness proxy, so keep-best keeps the crispest
    * copy. Decoded per-partition like every media stage. Returns
    * (doc_id, sharpness). */
  def imageSharpness(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    plantedMedia(spark, docs).mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        decodePgm(bytes).map { case (_, _, px) => (id, sharpnessOf(px)) }
      }
    }.toDF("doc_id", "sharpness")
  }

  /** Keep-BEST image near-dup removal: each phash cluster's survivor is
    * its SHARPEST member (scaled pixel variance; ties → lowest doc_id)
    * instead of its minimum doc_id — the image-side twin of
    * dedup_keep_best, riding the generic Clusters.keepBestScoredFrom
    * argmax over the stored cluster table. This live form re-decodes the
    * media (the ad-hoc/spec shape); `phashKeepBestStored` is the serving
    * shape. Returns the surviving doc_id set out of the hashed universe. */
  def phashKeepBestFrom(spark: SparkSession, hashed: DataFrame,
      clusters: DataFrame, docs: DataFrame): DataFrame =
    Clusters.keepBestScoredFrom(hashed.select("doc_id"), clusters,
      imageSharpness(spark, docs), "sharpness")

  /** Keep-best SERVED from the composite-hash store, whose sharpness
    * column rode the ingest decode (phashNearRows): the statement is
    * joins over (doc_id, cluster_id, sharpness) metadata — media bytes
    * are never re-read (the bm25_stored posture for image keep-best). */
  def phashKeepBestStored(store: DataFrame,
      clusters: DataFrame): DataFrame =
    Clusters.keepBestScoredFrom(store.select("doc_id"), clusters,
      store.select(col("doc_id"), col("sharpness")), "sharpness")

  /** DuckDB mirror of phashKeepBestFrom: the recursive-CTE closure over
    * the brute-force pair truth, sharpness recomputed from the planted
    * ASCII code points (the documentFeaturesOracleSql convention — a
    * decoder bug breaks the match), per-cluster winner via row_number
    * (sharpness DESC, doc_id ASC) ≡ max(struct(sharpness, −doc_id)). */
  def phashKeepBestOracleSql(k: Int = 3): String =
    (s"WITH RECURSIVE $phashNearCtesSql, ${phashDupCteSql(k)}, " +
      s"$phashClosureCtesSql, cl AS ($PhashClSelectSql), " +
      "q AS (SELECT doc_id, " +
      "32 * CAST(list_sum(list_transform(codes, c -> c * c)) AS BIGINT) - " +
      "CAST(list_sum(codes) AS BIGINT) * CAST(list_sum(codes) AS BIGINT) " +
      "AS sharpness FROM p), " +
      "rk AS (SELECT cl.doc_id AS doc_id, row_number() OVER (" +
      "PARTITION BY cl.cluster_id " +
      "ORDER BY q.sharpness DESC, cl.doc_id ASC) AS rk " +
      "FROM cl JOIN q ON q.doc_id = cl.doc_id) " +
      "SELECT doc_id FROM h WHERE doc_id NOT IN (" +
      "SELECT doc_id FROM rk WHERE rk > 1)")
      .replaceAll("\\s+", " ")

  /** The aHash bit string of one decoded image: bit = pixel strictly above
    * the image mean, as the exact integer compare px·n > Σpx. Uniform
    * brightness shifts cancel algebraically ((p+c)·n > Σ+c·n ⇔ p·n > Σ),
    * which MultimodalProps pins — the invariance aHash is FOR. */
  private[graft] def aHashBits(px: Array[Int]): String = {
    val s = px.map(_.toLong).sum
    px.map(p => if (p.toLong * px.length > s) '1' else '0').mkString
  }

  /** DuckDB mirror of the (doc_id, phash) hash rows — the shared CTE
    * chain of phashOracleSql without the occupancy window (the stream
    * twin's oracle). */
  def phashRowsOracleSql: String =
    """WITH d AS (SELECT doc_id,
      |  substring(regexp_replace(text, '[^\x20-\x7e]', '', 'g'), 1, 32) AS px
      |  FROM documents),
      |f AS (SELECT doc_id, px FROM d WHERE length(px) >= 32),
      |p AS (SELECT doc_id,
      |  list_transform(range(1, 33), i -> ascii(substring(px, i, 1))) AS codes
      |  FROM f)
      |SELECT doc_id, list_aggregate(list_transform(codes,
      |    c -> CASE WHEN c * 32 > list_sum(codes) THEN '1' ELSE '0' END),
      |    'string_agg', '') AS phash
      |FROM p""".stripMargin.replaceAll("\\s+", " ")

  /** DuckDB mirror of phashDedup — expectations derived from the planted
    * ASCII source chars, the documentFeaturesOracleSql convention (a
    * decoder or threshold bug breaks the match). */
  def phashOracleSql: String =
    """WITH d AS (SELECT doc_id,
      |  substring(regexp_replace(text, '[^\x20-\x7e]', '', 'g'), 1, 32) AS px
      |  FROM documents),
      |f AS (SELECT doc_id, px FROM d WHERE length(px) >= 32),
      |p AS (SELECT doc_id,
      |  list_transform(range(1, 33), i -> ascii(substring(px, i, 1))) AS codes
      |  FROM f),
      |h AS (SELECT doc_id, list_aggregate(list_transform(codes,
      |    c -> CASE WHEN c * 32 > list_sum(codes) THEN '1' ELSE '0' END),
      |    'string_agg', '') AS phash
      |  FROM p)
      |SELECT doc_id, phash,
      |  count(*) OVER (PARTITION BY phash) AS n_dups
      |FROM h""".stripMargin.replaceAll("\\s+", " ")

  /** The ONE DuckDB rendering of the composite-hash rows, as CTEs d/f/p/h
    * (h = (doc_id, ph), the 63-bit aHash ++ dHash string) — shared by the
    * near-pair, cluster, and removal oracles so the hash definition
    * cannot drift between them. */
  private def phashNearCtesSql: String =
    """d AS (SELECT doc_id,
      |  substring(regexp_replace(text, '[^\x20-\x7e]', '', 'g'), 1, 32) AS px
      |  FROM documents),
      |f AS (SELECT doc_id, px FROM d WHERE length(px) >= 32),
      |p AS (SELECT doc_id,
      |  list_transform(range(1, 33), i -> ascii(substring(px, i, 1))) AS codes
      |  FROM f),
      |h AS (SELECT doc_id, list_aggregate(list_transform(codes,
      |    c -> CASE WHEN c * 32 > list_sum(codes) THEN '1' ELSE '0' END),
      |    'string_agg', '')
      |  || list_aggregate(list_transform(range(1, 32),
      |    i -> CASE WHEN codes[i] > codes[i+1] THEN '1' ELSE '0' END),
      |    'string_agg', '') AS ph
      |  FROM p)""".stripMargin

  /** The brute-force verified pair CTE `dup` over `h` — all pairs + exact
    * Hamming distance (quadratic; exactly what the Spark side must NOT
    * do at scale — the oracle's ground-truth role). */
  private def phashDupCteSql(k: Int): String =
    s"""dup AS (SELECT doc_a, doc_b, hamming FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(len(list_filter(range(1, 64),
       |      i -> substring(a.ph, i, 1) <> substring(b.ph, i, 1)))
       |      AS BIGINT) AS hamming
       |  FROM h a JOIN h b ON a.doc_id < b.doc_id)
       |  WHERE hamming <= $k)""".stripMargin

  /** DuckDB mirror of phashNearFrom — deliberately BRUTE-FORCE (all pairs
    * + exact distance over the composite hash): with B = 4 bands and
    * k = 3 the banded plan's recall is exactly total by pigeonhole, so
    * the oracle checking the banded result against the unbanded ground
    * truth IS the check of that guarantee. */
  // NOTE: the composed oracles below concatenate ALREADY-stripped
  // fragments — a second outer stripMargin would eat the first pipe of
  // the `||` concat operators at fragment line starts
  def phashNearOracleSql(k: Int = 3): String =
    (s"WITH $phashNearCtesSql, ${phashDupCteSql(k)} " +
      "SELECT doc_a, doc_b, hamming FROM dup")
      .replaceAll("\\s+", " ")

  /** DuckDB mirror of the image duplicate-CLUSTER table: transitive
    * closure by recursive CTE over the brute-force verified pair set,
    * then component-min per node — the Clusters.oracleSql rendering over
    * the phash pair graph. */
  // closure + component-min renderings are Clusters' — ONE definition
  // across the text and image cluster families (review finding, r19)
  private def phashClosureCtesSql: String = Clusters.ClosureCtesSql
  private def PhashClSelectSql: String = Clusters.ComponentMinSql

  def phashClustersOracleSql(k: Int = 3): String =
    (s"WITH RECURSIVE $phashNearCtesSql, ${phashDupCteSql(k)}, " +
      s"$phashClosureCtesSql $PhashClSelectSql").replaceAll("\\s+", " ")

  /** DuckDB mirror of image near-dup REMOVAL: every hashed doc except the
    * clustered non-canonical members (the Clusters.removalOracleSql shape
    * with the hashed-media universe — docs too short to plant an image
    * have no phash and are out of scope on both engines). */
  def phashRemovalOracleSql(k: Int = 3): String =
    (s"WITH RECURSIVE $phashNearCtesSql, ${phashDupCteSql(k)}, " +
      s"$phashClosureCtesSql, cl AS ($PhashClSelectSql) " +
      "SELECT doc_id FROM h WHERE doc_id NOT IN (" +
      "SELECT doc_id FROM cl WHERE doc_id <> cluster_id)")
      .replaceAll("\\s+", " ")

  /** DuckDB mirror of documentFeatures: the oracle never sees the PGM bytes —
    * it derives the expected decoded stats straight from the (ASCII-
    * normalized) source chars the pixels were planted from (code point =
    * pixel value), so a decoder bug (off-by-one header skip, sign error on
    * bytes ≥ 0x80) breaks the match. */
  def documentFeaturesOracleSql: String =
    """WITH d AS (SELECT doc_id,
      |  substring(regexp_replace(text, '[^\x20-\x7e]', '', 'g'), 1, 32) AS px
      |  FROM documents),
      |f AS (SELECT doc_id, px FROM d WHERE length(px) >= 32),
      |p AS (SELECT doc_id,
      |  list_transform(range(1, 33), i -> ascii(substring(px, i, 1))) AS codes
      |  FROM f)
      |SELECT doc_id, 8 AS width, 4 AS height, 32 AS n_px,
      |  list_min(codes) AS min_px, list_max(codes) AS max_px,
      |  CAST(list_sum(codes) AS BIGINT) AS sum_px,
      |  round(CAST(list_sum(codes) AS BIGINT) * 1.0 / 32, 4) AS mean_px
      |FROM p""".stripMargin.replaceAll("\\s+", " ")

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

  // ---- Audio tier ----------------------------------------------------------

  /** Samples per audio frame. */
  val AudioFrame = 16
  /** A frame is "silent" when its mean square stays under SilentRms² —
    * i.e. energy < F·60² in exact integer math (60 ≈ the low end of the
    * planted 8-bit sample range, so space/punctuation-heavy frames read
    * as silence). */
  val SilentRms = 60

  /** Per-frame audio ENERGY over a planted 8-bit PCM corpus — the audio
    * modality's decode/feature stage (the real pipeline's codec is the
    * substring decode here; energy/silence math is the genuine part):
    * each doc's printable-ASCII bytes are its unsigned samples (the
    * plantedMedia code-point convention), consecutive `AudioFrame`-sample
    * windows (tail truncated) score Σ s² — EXACT integer math, so no
    * float rounding can flip a silence verdict on either engine.
    * Declarative explode: frames of one doc fan out across tasks; at
    * 100 TB this is a linear scan, no shuffle. Returns
    * (doc_id, frame_idx, energy, silent). */
  def audioEnergy(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        regexp_replace(col("text"), "[^\\x20-\\x7e]", "").as("pcm"))
      .filter(length(col("pcm")) >= AudioFrame)
      // decode the sample array ONCE per doc (split is linear; a
      // per-sample substring(pcm, k, 1) seeks from the string start and
      // makes the scan quadratic in doc length), then frame by slicing.
      // split("", -1) appends a trailing empty string — filtered.
      .select(col("doc_id"), expr(
        "transform(filter(split(pcm, ''), c -> c != ''), " +
          "c -> CAST(ascii(c) AS BIGINT))").as("s"))
      .select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, CAST(size(s) DIV $AudioFrame AS INT) - 1),
             |  i -> struct(CAST(i AS BIGINT) AS frame_idx,
             |    aggregate(slice(s, i * $AudioFrame + 1, $AudioFrame), 0L,
             |      (a, x) -> a + x * x) AS energy))"""
            .stripMargin)).as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.energy").as("energy"),
        (col("f.energy") < AudioFrame.toLong * SilentRms * SilentRms)
          .as("silent"))

  /** Silence TRIM report per document — the voice-activity-style
    * accounting an audio pipeline runs before feature extraction: frame
    * counts, silent-frame count, and the [first, last] active frame
    * window (−1/empty when everything is silent). One partial-aggregating
    * groupBy on doc_id over the energy rows. Returns (doc_id, n_frames,
    * n_silent, first_active, last_active, active_frames). */
  def audioTrim(docs: DataFrame): DataFrame =
    audioEnergy(docs)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"),
        coalesce(min(when(!col("silent"), col("frame_idx"))), lit(-1L))
          .as("first_active"),
        coalesce(max(when(!col("silent"), col("frame_idx"))), lit(-1L))
          .as("last_active"))
      .withColumn("active_frames",
        when(col("first_active") < 0, lit(0L))
          .otherwise(col("last_active") - col("first_active") + 1))

  private def audioCtesSql: String =
    s"""a AS (SELECT doc_id,
       |    regexp_replace(text, '[^\\x20-\\x7e]', '', 'g') AS pcm
       |  FROM documents),
       |e AS (SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
       |    CAST(list_aggregate(list_transform(
       |      string_split(substring(pcm, i * $AudioFrame + 1, $AudioFrame), ''),
       |      c -> ascii(c) * ascii(c)), 'sum') AS BIGINT) AS energy
       |  FROM a, unnest(range(0, length(pcm) // $AudioFrame)) AS u(i)
       |  WHERE length(pcm) >= $AudioFrame)""".stripMargin

  def audioEnergyOracleSql: String =
    s"""WITH $audioCtesSql
       |SELECT doc_id, frame_idx, energy,
       |  energy < ${AudioFrame.toLong * SilentRms * SilentRms} AS silent
       |FROM e""".stripMargin.replaceAll("\\s+", " ")

  def audioTrimOracleSql: String =
    s"""WITH $audioCtesSql,
       |s AS (SELECT doc_id, frame_idx,
       |    energy < ${AudioFrame.toLong * SilentRms * SilentRms} AS silent
       |  FROM e),
       |g AS (SELECT doc_id, count(*) AS n_frames,
       |    sum(CASE WHEN silent THEN 1 ELSE 0 END) AS n_silent,
       |    coalesce(min(CASE WHEN NOT silent THEN frame_idx END), -1)
       |      AS first_active,
       |    coalesce(max(CASE WHEN NOT silent THEN frame_idx END), -1)
       |      AS last_active
       |  FROM s GROUP BY doc_id)
       |SELECT doc_id, n_frames, CAST(n_silent AS BIGINT) AS n_silent,
       |  first_active, last_active,
       |  CASE WHEN first_active < 0 THEN 0
       |    ELSE last_active - first_active + 1 END AS active_frames
       |FROM g""".stripMargin.replaceAll("\\s+", " ")
}
