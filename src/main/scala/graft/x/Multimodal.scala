package graft.x

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.9 X5): image/audio/video
  * payloads as opaque `BinaryType` columns with a typed metadata struct,
  * plus the decode / feature-extract / frame-sample operators a training
  * pipeline runs over them.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * codecs — see the builder contract): [[decodeStub]] derives a
  * deterministic fake from the bytes so the Spark-side plumbing — schema,
  * partition-parallel `mapPartitions` batching, feature shapes — is real
  * and testable, and a production build swaps in a codec inside
  * `decodeImpl` without touching any plan shape.
  *
  * Scale notes: payloads stay in executor space end-to-end (no collect);
  * per-partition batch processing amortizes decoder init exactly like a
  * Python `mapInPandas` batch would; metadata-only operations (filtering
  * by width/duration) never deserialize the payload thanks to parquet
  * column pruning on the struct.
  */
object Multimodal {

  final case class MediaMeta(kind: String, mimeType: String, width: Int,
      height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      checksum: Long, features: Array[Float])
  final case class FrameFeatures(media_id: Long, frame_ms: Long,
      features: Array[Float])

  /** Build a media table from any frame with an id + binary column (the
    * fixture-free synthetic path: payloads derived from the documents
    * table's text bytes, making tests deterministic). */
  def synthesizeFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(
        when(pmod(col(idCol), lit(3)) === 0, "image")
          .when(pmod(col(idCol), lit(3)) === 1, "audio").otherwise("video").as("kind"),
        lit("application/octet-stream").as("mimeType"),
        (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
        pmod(col(idCol) * 137, lit(60000)).cast("long").as("durationMs")
      ).as("meta"),
      encode(col(textCol), "UTF-8").as("payload")
    )

  /** The decoder seam. Production: real codec here. This build: a
    * deterministic fake — features are a 16-dim projection of byte
    * statistics, so results are stable across runs/executors. */
  private def decodeImpl(bytes: Array[Byte]): Array[Float] =
    decodeFrameImpl(bytes, 0)

  /** The frame variant of the decoder seam: frame k of a payload decodes
    * the bytes from offset k — a deterministic stand-in for seeking to a
    * frame and decoding it (production swaps a real demux+decode here).
    * `skip = 0` is whole-payload decode.
    *
    * STUB(decode): stands in for image/audio decode + model featurizer.
    * Accumulates in DOUBLE with sequential order so the oracle's SQL fold
    * reproduces each feature bit-for-bit (float accumulation order would
    * diverge); each term (byte/255f) is itself an exact float value. */
  private def decodeFrameImpl(bytes: Array[Byte], skip: Int): Array[Float] = {
    val dim = 16
    val acc = new Array[Double](dim)
    var i = skip
    while (i < bytes.length) {
      acc((i - skip) % dim) += ((bytes(i) & 0xFF) / 255.0f).toDouble
      i += 1
    }
    val n = math.max(1, (bytes.length - skip) / dim)
    acc.map(a => (a / n).toFloat)
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    h
  }

  /** Feature extraction: partition-parallel batch decode. The per-partition
    * iterator is the batch boundary (same shape a `mapInPandas` batch has),
    * so a real decoder initializes once per partition, not per row. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.selectExpr("media_id", "meta.kind as kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // decoder/model init would happen here, once per partition
        rows.map { case (id, kind, payload) =>
          MediaFeatures(id, kind, payload.length, checksum(payload), decodeImpl(payload))
        }
      }
  }

  /** Metadata-only filter — never touches the payload column (parquet
    * struct-field pruning keeps the scan narrow). */
  def filterByMeta(media: DataFrame, kind: String, minWidth: Int): DataFrame =
    media.filter(col("meta.kind") === kind && col("meta.width") >= minWidth)
      .select(col("media_id"), col("meta"))

  /** 16-bit perceptual hash over a feature vector: bit i is set when
    * feature i sits above the vector's own mean — the classic pHash shape
    * (DCT coefficients vs median) applied to whatever the decoder seam
    * emits, so two renditions of the same media (re-encode, resize,
    * container change) that decode to near-identical features land at
    * small hamming distance even when their BYTES share nothing. Pure
    * builtin HOFs (aggregate/zip_with) — codegen'd, no UDF; the power-of-2
    * bit fold is exact double arithmetic (16 bits ≪ 2⁵³).
    *
    * The hash is 16 bits by contract ([[phashNearDupPairs]] chunks on 16):
    * wider feature vectors (production featurizers are 512+) use only the
    * FIRST 16 dims — without the slice the double fold would silently lose
    * exactness past ~53 bits and saturate the long cast past 62, collapsing
    * distinct vectors onto identical hashes (hamming 0 → false duplicates).
    * The mean threshold is computed over the same 16-dim slice so the bit
    * pattern depends only on the dims that are hashed. */
  def perceptualHash(features: Column): Column = {
    val f16 = slice(features, 1, 16)
    val mean = aggregate(f16, lit(0.0d), (a, x) => a + x.cast("double")) /
      size(f16).cast("double")
    aggregate(
      zip_with(f16, sequence(lit(0), size(f16) - 1), (f, i) =>
        when(f.cast("double") > mean, pow(lit(2.0), i.cast("double")))
          .otherwise(lit(0.0))),
      lit(0.0), (a, x) => a + x).cast("long")
  }

  /** Perceptual near-duplicate pairs over extracted features: pHash each
    * row, then the same pigeonhole trick as text SimHash — the 16-bit hash
    * splits into maxHamming+1 chunks, any pair within the bound shares an
    * identical chunk, so candidates come from a bucket join (never a
    * media × media cross join) and the hamming filter is exact. This is
    * the media-dedup step a multimodal pipeline runs where byte-level
    * dedup ([[graft.x.Dedup.exactByContent]]) stops working: re-encoded
    * copies have distinct bytes but the same perception. */
  def phashNearDupPairs(features: DataFrame, idCol: String, featCol: String,
      maxHamming: Int = 2,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8, s"maxHamming $maxHamming out of range")
    // staged: BOTH sides of the bucket self-join consume the signatures —
    // without truncation each side re-runs the upstream featurization
    // (typically a mapPartitions decode, the expensive stage by far)
    val sig = staging.stage(
      features.select(col(idCol), perceptualHash(col(featCol)).as("__ph")),
      "phash-signatures")
    // even bit split (see Dedup.pigeonholeChunks): a fixed-stride split
    // leaves chunk n−1 EMPTY past maxHamming 3 (⌈16/n⌉·(n−1) ≥ 16) — a
    // bucket every row shares, i.e. a hidden cross join
    val chunks = Dedup.pigeonholeChunks(16, maxHamming + 1, col("__ph"))
    val bucketed = sig.select(col(idCol), col("__ph"),
      explode(array(chunks: _*)).as("cb"))
      .select(col(idCol), col("__ph"), col("cb.chunk"), col("cb.ch"))
    val a = bucketed.select(col("chunk"), col("ch"),
      col(idCol).as("id_a"), col("__ph").as("ph_a"))
    val b = bucketed.select(col("chunk"), col("ch"),
      col(idCol).as("id_b"), col("__ph").as("ph_b"))
    a.join(b, Seq("chunk", "ch"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-frame feature extraction over a [[sampleFrames]] output: each
    * (video, frame) row decodes through the frame seam — same
    * partition-parallel batch shape as [[extractFeatures]], so a real
    * decoder initializes once per partition and seeks per frame. */
  def extractFrameFeatures(spark: SparkSession, frames: DataFrame,
      everyMs: Long): Dataset[FrameFeatures] = {
    import spark.implicits._
    frames.selectExpr("media_id", "frame_ms", "payload")
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, ms, payload) =>
          FrameFeatures(id, ms, decodeFrameImpl(payload, (ms / everyMs).toInt))
        }
      }
  }

  /** Audit surface for [[videoNearDupPairs]]' `maxBucket` guard: the
    * (frame_ms, chunk, chunk-value) buckets whose occupancy exceeds the
    * cap — the all-black-intro / station-ident frames that would otherwise
    * re-create the quadratic — hottest first. */
  def oversizedFrameBuckets(spark: SparkSession, media: DataFrame,
      everyMs: Long, maxHamming: Int, maxBucket: Int): DataFrame =
    frameSignatures(spark, media, everyMs, maxHamming)
      .groupBy(col("frame_ms"), col("chunk"), col("ch"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > maxBucket)
      .orderBy(col("n").desc)

  /** (media_id, frame_ms, __ph, chunk, ch): per-frame perceptual hashes
    * with their pigeonhole chunk memberships. */
  private def frameSignatures(spark: SparkSession, media: DataFrame,
      everyMs: Long, maxHamming: Int): DataFrame = {
    val feats = extractFrameFeatures(spark, sampleFrames(media, everyMs), everyMs).toDF()
    val sig = feats.select(col("media_id"), col("frame_ms"),
      perceptualHash(col("features")).as("__ph"))
    val chunks = Dedup.pigeonholeChunks(16, maxHamming + 1, col("__ph"))
    sig.select(col("media_id"), col("frame_ms"), col("__ph"),
        explode(array(chunks: _*)).as("cb"))
      .select(col("media_id"), col("frame_ms"), col("__ph"),
        col("cb.chunk"), col("cb.ch"))
  }

  /** The composed video-dedup pipeline: frame-sample → per-frame decode
    * (stub seam) → per-frame pHash → ALIGNED-frame pigeonhole join →
    * per-pair matched-frame fraction. Two videos are near-duplicates when
    * ≥ `minMatchFrac` of their aligned sampled frames match at hamming ≤
    * `maxHamming` — the re-encoded-copy detector for the rendition case
    * where byte dedup sees nothing and even whole-payload pHash drifts
    * (container metadata, re-muxing) but frame CONTENT survives.
    *
    * Plan shape: candidates come from a bucket join keyed on
    * (frame_ms, chunk, value) — frames only ever meet frames at the SAME
    * timestamp, so the blowup surface is per-aligned-frame, and the same
    * `maxBucket` guard as the text/embedding paths bounds the
    * mass-duplicate case (every video opening on the same black frame —
    * audit via [[oversizedFrameBuckets]]). Per-video frame counts join the
    * (small) matched-pair aggregate WITHOUT a broadcast hint: the count
    * frame is linear in corpus videos, so it must stay a shuffle join.
    * `match_frac = n_matched / min(frames_a, frames_b)` is one IEEE
    * division of two exact longs — oracle-replayable.
    *
    * Hash-width design rule (measured in ScaleProbe): organic collisions
    * per aligned frame grow ~n²/2^B for a B-bit hash, so B must be at
    * least 2·log₂(corpus videos). The STUB featurizer yields 16 usable
    * bits ([[perceptualHash]]'s contract) — saturated by ~10⁴ videos; a
    * production 512-dim featurizer feeds a 64-bit fold (swap the slice
    * width and the pigeonhole total together), with headroom to ~10⁹,
    * exactly like the 64-bit text simhash. */
  def videoNearDupPairs(spark: SparkSession, media: DataFrame, everyMs: Long,
      maxHamming: Int = 2, minMatchFrac: Double = 0.5, maxBucket: Int = 10000,
      staging: graft.util.Staging = graft.util.Staging.LocalCheckpoint): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 8, s"maxHamming $maxHamming out of range")
    val bucketed = staging.stage(
      frameSignatures(spark, media, everyMs, maxHamming), "video-frame-buckets")
    val counts = bucketed.filter(col("chunk") === 0)
      .groupBy(col("media_id")).agg(count(lit(1)).as("__nf"))
    val hot = bucketed.groupBy(col("frame_ms"), col("chunk"), col("ch"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBucket).select("frame_ms", "chunk", "ch")
    val capped = bucketed.join(broadcast(hot), Seq("frame_ms", "chunk", "ch"), "left_anti")
    val a = capped.select(col("frame_ms"), col("chunk"), col("ch"),
      col("media_id").as("id_a"), col("__ph").as("ph_a"))
    val b = capped.select(col("frame_ms"), col("chunk"), col("ch"),
      col("media_id").as("id_b"), col("__ph").as("ph_b"))
    val matched = a.join(b, Seq("frame_ms", "chunk", "ch"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("frame_ms"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_matched"))
    matched
      .join(counts.select(col("media_id").as("id_a"), col("__nf").as("__nfa")), Seq("id_a"))
      .join(counts.select(col("media_id").as("id_b"), col("__nf").as("__nfb")), Seq("id_b"))
      .withColumn("match_frac", col("n_matched").cast("double") /
        least(col("__nfa"), col("__nfb")).cast("double"))
      .filter(col("match_frac") >= minMatchFrac)
      .select(col("id_a"), col("id_b"), col("n_matched"), col("match_frac"))
  }

  /** Scene-cut detection: a cut is a sampled frame whose perceptual hash
    * jumps ≥ `minHamming` bits from the previous frame — the shot-boundary
    * primitive a video curation pipeline runs before per-scene sampling /
    * captioning (one keyframe per scene instead of one per N ms). Same
    * decode seam and pHash as [[videoNearDupPairs]]; the comparison is a
    * per-video `lag` window over sampled frames — frames never leave
    * their video, so the cost is one video-keyed window over
    * corpus-frames rows, no join surface at all.
    *
    * The 16-bit stub hash makes `minHamming` coarse here (production:
    * 64-bit hash, threshold ~10 — the [[videoNearDupPairs]] width rule). */
  def sceneCuts(spark: SparkSession, media: DataFrame, everyMs: Long,
      minHamming: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = extractFrameFeatures(spark, sampleFrames(media, everyMs), everyMs).toDF()
    val sig = feats.select(col("media_id"), col("frame_ms"),
      perceptualHash(col("features")).as("__ph"))
    val w = Window.partitionBy("media_id").orderBy("frame_ms")
    sig.withColumn("__prev", lag(col("__ph"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("hamming",
        bit_count(col("__ph").bitwiseXOR(col("__prev"))).cast("long"))
      .filter(col("hamming") >= minHamming)
      .select(col("media_id"), col("frame_ms").as("cut_ms"), col("hamming"))
  }

  /** Audio activity segmentation (a VAD stand-in): sample windows every
    * `everyMs` of each AUDIO payload, decode each window through the stub
    * seam, score it by mean feature energy, flag windows above their
    * media's mean energy, and merge consecutive active windows into
    * segments (gaps-and-islands) — the speech/music extent detector an
    * audio curation pipeline runs before transcription, expressed with
    * the same decode seam as the video path (production swaps a real
    * frame decoder + energy/VAD model into `decodeFrameImpl`).
    *
    * Determinism: the per-window energy is the FIXED left fold over the
    * 16 features (the mm6 oracle's list_reduce shape), then quantized to
    * DECIMAL(18,9) so the per-media mean threshold is EXACT — the
    * active test is the cross-multiplied `e·n > Σe` (no double sum ever
    * crosses windows). Islands need no second window pass: with fixed
    * `everyMs` sampling, group = frame_idx − row_number(active) is
    * constant per run. One media-keyed exchange shared by the window
    * sort, the threshold agg, and the segment rollup. */
  def audioActivitySegments(spark: SparkSession, media: DataFrame,
      everyMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = extractFrameFeatures(spark,
      sampleFrames(media, everyMs, kind = "audio"), everyMs).toDF()
    val energy = feats.select(col("media_id"), col("frame_ms"),
      (aggregate(col("features"), lit(0.0d), (a, x) => a + x.cast("double"))
        / lit(16.0)).cast("decimal(18,9)").as("__e"))
    val wm = Window.partitionBy("media_id")
    val flagged = energy
      .withColumn("__sum", sum(col("__e")).over(wm))
      .withColumn("__n", count(lit(1)).over(wm))
      .filter(col("__e") * col("__n") > col("__sum"))
    val wa = Window.partitionBy("media_id").orderBy("frame_ms")
    flagged
      .withColumn("__grp",
        (col("frame_ms") / everyMs).cast("long") - row_number().over(wa))
      .groupBy(col("media_id"), col("__grp"))
      .agg(min("frame_ms").as("seg_start_ms"),
        max("frame_ms").as("seg_end_ms"),
        count(lit(1)).as("n_windows"),
        sum(col("__e")).as("__s")) // exact decimal; ONE double div below
      .select(col("media_id"), col("seg_start_ms"), col("seg_end_ms"),
        col("n_windows"),
        round(col("__s").cast("double") / col("n_windows"), 6)
          .as("avg_energy"))
  }

  /** Frame sampling for video rows: emit one row per sampled frame index
    * (every `everyMs` of duration) — the explode-shaped fan-out a video
    * pipeline feeds to the image path. Payload rides along so a frame
    * decoder ([[extractFrameFeatures]]) can run without re-joining the
    * media table; metadata-only consumers just don't select it (parquet
    * column pruning keeps their scans narrow). */
  def sampleFrames(media: DataFrame, everyMs: Long,
      kind: String = "video"): DataFrame =
    media.filter(col("meta.kind") === kind)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.durationMs"), lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("meta"), col("payload"))
}
