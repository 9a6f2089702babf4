package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import Tables._

/** Multimodal-column queries over the media table derived from `documents`
  * (graft.operators.Multimodal). The decode step is stubbed (no codecs in
  * this container); schema/partitioning/rollup are the real surface.
  */
object MultimodalQueries {

  val queries: Map[String, Q] = Map(
    // Per-modality ingest rollup — integer arithmetic, oracle-exact.
    "mm_media_stats" -> ((s, dir) =>
      Multimodal.mediaStats(
        Multimodal.fromDocuments(load(s, dir, "documents")))
        .orderBy(col("kind"))),

    // Typed metadata projection — binary payload size vs declared meta.
    "mm_media_catalog" -> ((s, dir) =>
      Multimodal.fromDocuments(load(s, dir, "documents"))
        .select(col("media_id"), col("kind"),
          length(col("content")).cast("bigint").as("payload_bytes"),
          col("meta.width").cast("bigint").as("width"),
          col("meta.height").cast("bigint").as("height"),
          col("meta.durationMs").as("duration_ms"),
          col("meta.format").as("format"))
        .orderBy(col("media_id"))),

    // Stubbed decode → feature vectors; the mapPartitions batch shape is
    // the product path. The md5-derived fake is ANSI-reproducible, so the
    // decode output itself is hash-checked bit-exactly (f0 is the float32
    // feature widened to double — no rounding; both engines compute
    // v/2^52*2-1 in double then narrow to REAL, IEEE-identical).
    "mm_features_sample" -> ((s, dir) => {
      val media = Multimodal.fromDocuments(load(s, dir, "documents"))
      Multimodal.extractFeatures(s, media, dim = 16).toDF()
        .select(col("media_id"), col("kind"), col("dim"),
          expr("cast(element_at(features, 1) as double)").as("f0"))
        .orderBy(col("media_id"))
    }),

    // Resize declaration audit (round 6): the typed-metadata rewrite that
    // Multimodal.resize performs, rolled up per modality — brings the
    // resize operator under the oracle gate (it was spec-only before).
    "mm_resize_audit" -> ((s, dir) =>
      Multimodal.resize(
        Multimodal.fromDocuments(load(s, dir, "documents")), 224, 224)
        .groupBy(col("kind"), col("meta.format").as("format"))
        .agg(count(lit(1)).as("n_media"),
          max(col("meta.width")).cast("bigint").as("width"),
          max(col("meta.height")).cast("bigint").as("height"),
          sum(col("meta.durationMs")).as("sum_duration_ms"))
        .orderBy(col("kind"))),

    // Frame sampling: 1 video → N frame fingerprints. md5 fingerprints ⇒
    // the explode + distinct-count is oracle-checked bit-exactly.
    "mm_frame_samples" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.fromDocuments(load(s, dir, "documents")))
        .groupBy(col("media_id")).agg(
          count(lit(1)).as("n_frames"),
          expr("count(distinct frame_fingerprint)").as("n_distinct"))
        .orderBy(col("media_id")))
  )

  val oracle: Map[String, String] = Map(
    "mm_media_stats" ->
      """SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
                COUNT(*) AS n_media,
                CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
                CAST(SUM(n_chars * 40) AS BIGINT) AS sum_duration_ms,
                MAX(CAST(64 + (doc_id % 16) * 8 AS INT)) AS max_width
         FROM documents GROUP BY 1 ORDER BY kind""",
    "mm_media_catalog" ->
      """SELECT doc_id AS media_id,
                (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
                CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
                CAST(64 + (doc_id % 16) * 8 AS BIGINT) AS width,
                CAST(64 + (doc_id % 9) * 16 AS BIGINT) AS height,
                CAST(n_chars * 40 AS BIGINT) AS duration_ms,
                (['png','wav','mp4'])[CAST(doc_id % 3 AS INT) + 1] AS format
         FROM documents ORDER BY media_id""",
    // Promoted from rows-only in round 6: the stub decode is md5-derived,
    // so both the feature value and the frame fingerprints replay in ANSI
    // SQL. f0: top 52 bits of md5 → v/2^52*2-1 in DOUBLE, narrowed to
    // REAL (float32) then widened — IEEE-identical to the Scala
    // (v.toDouble / (1L<<52) * 2 - 1).toFloat.
    "mm_features_sample" ->
      """SELECT doc_id AS media_id,
                (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
                CAST(16 AS INT) AS dim,
                CAST(CAST(
                  CAST(CAST(('0x' || substr(md5(text || ':0'), 1, 13)) AS BIGINT)
                       AS DOUBLE) / 4503599627370496 * 2 - 1
                  AS REAL) AS DOUBLE) AS f0
         FROM documents ORDER BY media_id""",
    "mm_resize_audit" ->
      """SELECT (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
                (['png','wav','mp4'])[CAST(doc_id % 3 AS INT) + 1] AS format,
                COUNT(*) AS n_media,
                CAST(MAX(224) AS BIGINT) AS width,
                CAST(MAX(224) AS BIGINT) AS height,
                CAST(SUM(n_chars * 40) AS BIGINT) AS sum_duration_ms
         FROM documents GROUP BY 1, 2 ORDER BY kind""",
    "mm_frame_samples" ->
      """WITH v AS (SELECT doc_id AS media_id, text, n_chars
                    FROM documents WHERE doc_id % 3 = 2),
              f AS (SELECT media_id,
                           unnest(RANGE(0, (n_chars * 40) // 1000 + 1)) AS fr,
                           text
                    FROM v)
         SELECT media_id, COUNT(*) AS n_frames,
                COUNT(DISTINCT md5(text || ':' || CAST(fr AS VARCHAR)))
                  AS n_distinct
         FROM f GROUP BY media_id ORDER BY media_id"""
  )
}
