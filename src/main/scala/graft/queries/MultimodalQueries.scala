package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Driver-checkable multimodal plumbing queries (documents stand in for a
  * media corpus; see [[graft.multimodal.Multimodal]] for the stub contract). */
object MultimodalQueries {

  private def media(s: SparkSession, d: String) =
    Multimodal.asMediaTable(Tables.documents(s, d))

  /** Codec-entry input: the real-codec round-trips encode/decode PER ROW
    * inside the scan stage, and the single-row-group testdata file makes
    * that stage ONE task — every mm_real_* / phash entry ran its whole
    * codec pass on one core of 32 (r16 stage profile: mm_phash 0.95 s,
    * all of it in two 1-task stages). Widened per Tables.widened: a
    * round-robin spread of the (doc_id-only) rows, no-op on any input
    * that already has >= core-count partitions. */
  private def codecDocs(s: SparkSession, d: String) =
    Tables.widened(s, Tables.documents(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // batched feature extraction: 16-bin byte histogram per payload
    "mm_features" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.asMediaTable(codecDocs(s, d)))
      val bins = (0 until 16).map(b =>
        round(element_at(col("features"), b + 1), 6).as(s"bin_$b"))
      feats.select(col("media_id") +: bins: _*).orderBy("media_id")
    }),

    // deterministic frame sampling from "video" payloads
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(media(s, d), stride = 4)
        .select(col("media_id"), col("frame_idx"), col("container"),
          length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy("media_id", "frame_idx")),

    // REAL codec round-trip: JDK ImageIO PNG encode -> decode on executors,
    // luminance histogram checked against the pixel formula in pure SQL
    "mm_real_decode" -> ((s, d) =>
      Multimodal.realDecodeRoundtrip(codecDocs(s, d))
        .orderBy("media_id")),

    // REAL frame demux: animated GIF encode -> JDK demux, row per frame
    "mm_real_frames" -> ((s, d) =>
      Multimodal.realFramesRoundtrip(codecDocs(s, d))
        .orderBy("media_id", "frame_idx")),

    // REAL audio round-trip: PCM -> WAV encode -> JDK codec decode
    "mm_real_audio" -> ((s, d) =>
      Multimodal.realAudioRoundtrip(codecDocs(s, d))
        .orderBy("media_id")),

    // REAL pixel resize round-trip: decode -> nearest-neighbor -> re-encode
    "mm_real_resize" -> ((s, d) =>
      Multimodal.realResizeRoundtrip(codecDocs(s, d))
        .orderBy("media_id")),

    // metadata-level resize with aspect-preserving scale
    "mm_resize" -> ((s, d) =>
      Multimodal.resizeMeta(media(s, d), maxW = 320, maxH = 240)
        .select(col("media_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("scale"))
        .orderBy("media_id")),

    // REAL-codec perceptual hash per media item (bit-predicted by the oracle)
    "mm_phash" -> ((s, d) =>
      Multimodal.perceptualHash(codecDocs(s, d)).orderBy("media_id")),

    // ---- image near-dup certificate: segment-blocked pHash pairs ----
    // The scale path for image dedup: pairs come from 16-bit segment
    // equality (lossless at hamming<=3 by pigeonhole — same blocking as
    // dedup_simhash), exact hamming verifies candidates only, and the gate
    // emits (n_media, n_pairs) that the oracle recomputes via all-pairs
    // over its formula-predicted hashes — so blocking losses, codec drift,
    // or hash drift all break the compare. The hash table is the index
    // artifact (one codec pass per media item).
    "mm_phash_dedup_gate" -> ((s, d) => {
      // r16: the old form re-derived the pHash table FIVE times (two
      // blocking sides, two verify-join sides, the n_media count) — five
      // full codec passes per execution, each a 1-task stage on this
      // testdata (mapPartitions is opaque, so Catalyst shares nothing).
      // The signature rows now CARRY their four segments through the
      // segment-equality join (the verify needs no join back), n_media
      // counts documents directly (perceptualHash emits exactly one row
      // per document), and the codec input is widened — 5 codec passes
      // -> 2, each parallel. Values unchanged: the candidate pair set,
      // the hamming verify, and both counts are identical.
      val ph = Multimodal.perceptualHash(codecDocs(s, d))
      val sig = ph.select(col("media_id"), col("seg0"), col("seg1"),
        col("seg2"), col("seg3"),
        expr("stack(4, 0, seg0, 1, seg1, 2, seg2, 3, seg3) AS (seg_idx, seg_val)"))
      val nPairs = sig.as("x").join(sig.as("y"), Seq("seg_idx", "seg_val"))
        .filter(col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
          col("x.seg0").as("a0"), col("x.seg1").as("a1"),
          col("x.seg2").as("a2"), col("x.seg3").as("a3"),
          col("y.seg0").as("b0"), col("y.seg1").as("b1"),
          col("y.seg2").as("b2"), col("y.seg3").as("b3"))
        .distinct()
        .filter(expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1)" +
          " + bit_count(a2 ^ b2) + bit_count(a3 ^ b3)") <= 3)
        .agg(count(lit(1)).cast("long").as("n_pairs"))
      Tables.documents(s, d).agg(count(lit(1)).cast("long").as("n_media"))
        .crossJoin(broadcast(nPairs))
    })
  )

  // Shared CTE chain predicting the average-hash segments from the pixel
  // formula perceptualHash encodes (base = id/2 block-hash levels, odd ids
  // perturb pixel 0). All means are exact in binary, so each bit — and
  // therefore each 16-bit segment — is bit-predictable without a codec.
  private val PhashSegsSql: String =
    """WITH px AS (
      |  SELECT doc_id AS media_id, doc_id // 2 AS base, doc_id % 2 AS flip,
      |         unnest(range(0, 256)) AS i
      |  FROM documents),
      |pv AS (
      |  SELECT media_id, i,
      |    CAST((((base + 1) * 2654435761
      |           + (((i // 16) // 2) * 8 + ((i % 16) // 2) + 1) * 40503
      |             * (base % 251 + 1)) % 256
      |          + CASE WHEN flip = 1 AND i = 0 THEN 128 ELSE 0 END) % 256
      |      AS DOUBLE) AS v
      |  FROM px),
      |bm AS (
      |  SELECT media_id, ((i // 16) // 2) * 8 + ((i % 16) // 2) AS blk,
      |         avg(v) AS bmean
      |  FROM pv GROUP BY media_id, blk),
      |gm AS (SELECT media_id, avg(v) AS gmean FROM pv GROUP BY media_id),
      |bits AS (
      |  SELECT bm.media_id, blk,
      |         CASE WHEN bmean > gmean THEN 1 ELSE 0 END AS bit
      |  FROM bm JOIN gm USING (media_id)),
      |segs AS (
      |  SELECT media_id,
      |    CAST(sum(CASE WHEN blk // 16 = 0 THEN bit * (1 << (blk % 16)) ELSE 0 END) AS BIGINT) AS seg0,
      |    CAST(sum(CASE WHEN blk // 16 = 1 THEN bit * (1 << (blk % 16)) ELSE 0 END) AS BIGINT) AS seg1,
      |    CAST(sum(CASE WHEN blk // 16 = 2 THEN bit * (1 << (blk % 16)) ELSE 0 END) AS BIGINT) AS seg2,
      |    CAST(sum(CASE WHEN blk // 16 = 3 THEN bit * (1 << (blk % 16)) ELSE 0 END) AS BIGINT) AS seg3
      |  FROM bits GROUP BY media_id)
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "mm_features" -> {
      // byte-exact: histogram the UTF-8 payload's high nibbles via the hex
      // encoding (odd positions = high nibble chars), like the Spark side
      val bins = (0 until 16).map { b =>
        val nib = Integer.toHexString(b).toUpperCase
        s"round(len(list_filter(range(0, n), i -> substring(hx, 2*i + 1, 1) = '$nib'))::DOUBLE / greatest(n, 1), 6) AS bin_$b"
      }.mkString(",\n  ")
      s"""WITH t AS (
         |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         |         octet_length(encode(text)) AS n
         |  FROM documents)
         |SELECT media_id,
         |  $bins
         |FROM t ORDER BY media_id""".stripMargin
    },
    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, encode(text) AS payload,
        |         CAST(n_chars % 16 + 1 AS INT) AS nf
        |  FROM documents),
        |f AS (
        |  SELECT media_id, payload, nf,
        |         unnest(range(0, nf)) AS frame_idx
        |  FROM m)
        |SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |  'fake' AS container,
        |  CAST(octet_length(payload) // nf AS BIGINT) AS frame_len
        |FROM f WHERE frame_idx % 4 = 0
        |ORDER BY media_id, frame_idx""".stripMargin,
    "mm_real_decode" -> {
      // the same (7*id + i^2) mod 256 pixels the Spark side encodes; PNG is
      // lossless and gray-pixel luma is exact, so counts/256 match bit-wise
      val bins = (0 until 16).map(b =>
        s"sum(CASE WHEN bin = $b THEN 1 ELSE 0 END)::DOUBLE / 256 AS bin_$b")
        .mkString(",\n  ")
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, unnest(range(0, 256)) AS i
         |  FROM documents),
         |b AS (
         |  SELECT media_id, ((7 * media_id + i * i) % 256) // 16 AS bin
         |  FROM v)
         |SELECT media_id, 16::BIGINT AS width, 16::BIGINT AS height,
         |  true AS decoded,
         |  $bins
         |FROM b GROUP BY media_id ORDER BY media_id""".stripMargin
    },
    "mm_real_frames" -> {
      // (7*id + 11*f + i^2) mod 256 per frame f, pixel i; GIF with a full
      // gray palette is lossless so frame order and pixels are exact
      val bins = (0 until 16).map(b =>
        s"sum(CASE WHEN bin = $b THEN 1 ELSE 0 END)::DOUBLE / 64 AS bin_$b")
        .mkString(",\n  ")
      s"""WITH f AS (
         |  SELECT doc_id AS media_id, unnest(range(0, 4)) AS frame_idx
         |  FROM documents),
         |v AS (
         |  SELECT media_id, frame_idx, unnest(range(0, 64)) AS i
         |  FROM f),
         |b AS (
         |  SELECT media_id, frame_idx,
         |    ((7 * media_id + 11 * frame_idx + i * i) % 256) // 16 AS bin
         |  FROM v)
         |SELECT media_id, frame_idx::BIGINT AS frame_idx,
         |  8::BIGINT AS width, 8::BIGINT AS height,
         |  $bins
         |FROM b GROUP BY media_id, frame_idx
         |ORDER BY media_id, frame_idx""".stripMargin
    },
    "mm_real_audio" -> {
      // same (7*id + i^2) mod 256 samples; PCM is lossless
      val bins = (0 until 16).map(b =>
        s"sum(CASE WHEN bin = $b THEN 1 ELSE 0 END)::DOUBLE / 256 AS bin_$b")
        .mkString(",\n  ")
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, unnest(range(0, 256)) AS i
         |  FROM documents),
         |b AS (
         |  SELECT media_id, ((7 * media_id + i * i) % 256) // 16 AS bin
         |  FROM v)
         |SELECT media_id, 256::BIGINT AS n_samples, 8000.0 AS sample_rate,
         |  true AS decoded,
         |  $bins
         |FROM b GROUP BY media_id ORDER BY media_id""".stripMargin
    },
    "mm_real_resize" -> {
      // nearest-neighbor 16->8 at factor 2 keeps source pixels i = 32y+2x
      val src = "(32 * (j // 8) + 2 * (j % 8))"
      val bins = (0 until 16).map(b =>
        s"sum(CASE WHEN bin = $b THEN 1 ELSE 0 END)::DOUBLE / 64 AS bin_$b")
        .mkString(",\n  ")
      s"""WITH v AS (
         |  SELECT doc_id AS media_id, unnest(range(0, 64)) AS j
         |  FROM documents),
         |b AS (
         |  SELECT media_id,
         |    ((7 * media_id + $src * $src) % 256) // 16 AS bin
         |  FROM v)
         |SELECT media_id, 8::BIGINT AS width, 8::BIGINT AS height,
         |  true AS resized,
         |  $bins
         |FROM b GROUP BY media_id ORDER BY media_id""".stripMargin
    },
    "mm_phash" -> (PhashSegsSql + """
      |SELECT media_id, seg0, seg1, seg2, seg3 FROM segs
      |ORDER BY media_id""".stripMargin),
    "mm_phash_dedup_gate" -> (PhashSegsSql + """
      |SELECT (SELECT count(*) FROM segs) AS n_media,
      |  (SELECT count(*) FROM segs a JOIN segs b ON a.media_id < b.media_id
      |   WHERE bit_count(xor(a.seg0, b.seg0)) + bit_count(xor(a.seg1, b.seg1))
      |       + bit_count(xor(a.seg2, b.seg2)) + bit_count(xor(a.seg3, b.seg3))
      |     <= 3) AS n_pairs""".stripMargin),
    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |         CAST(n_chars % 640 + 1 AS INT) AS width,
        |         CAST((n_chars * 7) % 480 + 1 AS INT) AS height
        |  FROM documents),
        |s AS (
        |  SELECT media_id, width, height,
        |         least(1.0, 320 / CAST(width AS DOUBLE),
        |                    240 / CAST(height AS DOUBLE)) AS scale
        |  FROM m)
        |SELECT media_id,
        |  CAST(ceil(width * scale) AS INT) AS width,
        |  CAST(ceil(height * scale) AS INT) AS height,
        |  round(scale, 6) AS scale
        |FROM s ORDER BY media_id""".stripMargin
  )
}
