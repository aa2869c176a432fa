package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column handling — SURVEY.md §2.B B47 plus the binary-payload
  * pipeline a training-data system needs: opaque `binary` columns with
  * typed metadata, batch decode via `mapPartitions`, and frame sampling.
  *
  * `multimodal_image_decode` is a REAL codec path: PNGs are encoded and
  * decoded with the JDK's own `javax.imageio` (no external libraries),
  * and the oracle verifies roundtrip fidelity. The generic
  * `multimodal_binary_decode` keeps a marked stub for codecs the
  * environment lacks (e.g. audio/video) — there the Spark-side plumbing
  * (binary column, per-partition batch processing, typed output schema)
  * is the part under test.
  */
object Multimodal {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B47: nested multimodal bundle — struct(text, embedding, meta map),
    // then field/element access through the nested column.
    "multimodal_struct" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id"),
          struct(col("text"), col("embedding"),
            map(lit("lang"), col("lang"), lit("source"), col("source"))
              .as("meta")).as("bundle"))
        .select(
          col("doc_id"),
          round(element_at(col("bundle.embedding"), 1).cast("double"), 4)
            .as("emb0"),
          length(col("bundle.text")).as("len"),
          element_at(col("bundle.meta"), "lang").as("meta_lang"))
        .orderBy("doc_id")
    }),

    // Binary decode plumbing: text → binary payload → per-partition batch
    // "decode" to typed features via mapPartitions (the shape a real
    // image/audio decoder runs in: partition-at-a-time, library client
    // initialized once per partition).
    "multimodal_binary_decode" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // --- STUB DECODER -------------------------------------------
          // Real impl would init an image/audio codec here (once per
          // partition) and decode each payload. Media libraries are not
          // available in this container, so emit deterministic fake
          // dimensions derived from the payload alone.
          it.map { case (id, bytes) =>
            val n = bytes.length
            (id, n, n % 64, (n * 7 + 13) % 64, 3)
          }
        // -------------------------------------------------------------
        }
        .toDF("doc_id", "n_bytes", "width", "height", "channels")
        .orderBy("doc_id")
    }),

    // REAL image decode (no stub): a deterministic PNG is synthesized per
    // document with the JDK's own codec (BufferedImage + ImageIO — no
    // external libraries), then a SEPARATE mapPartitions pass decodes the
    // binary payload back and reports the recovered dimensions. This is
    // the genuine multimodal shape end-to-end: opaque binary column in,
    // per-partition codec loop, typed features out — and the oracle
    // checks decode(encode(w,h)) == (w,h), i.e. real roundtrip fidelity.
    "multimodal_image_decode" -> ((s, d) => {
      import s.implicits._
      val png = t(s, d, "documents")
        // single-file source = one partition; the codec loops below must
        // run on every core, not one
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          (col("doc_id") % 16 + 1).cast("int").as("w"),
          (col("doc_id") % 12 + 1).cast("int").as("h"))
        .as[(Long, Int, Int)]
        .mapPartitions { it =>
          // in-memory stream cache: ImageIO defaults to a DISK-backed
          // cache file per image — 5000 temp files of pure overhead
          javax.imageio.ImageIO.setUseCache(false)
          it.map { case (id, w, h) =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            img.setRGB(0, 0, (id % 0xffffff).toInt) // deterministic pixel
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", baos)
            (id, baos.toByteArray)
          }
        }.toDF("doc_id", "png")
      png.as[(Long, Array[Byte])]
        .mapPartitions { it =>
          // codec "client" per partition, payloads decoded in a batch loop
          javax.imageio.ImageIO.setUseCache(false)
          it.map { case (id, bytes) =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            (id, img.getWidth, img.getHeight)
          }
        }.toDF("doc_id", "width", "height")
        .orderBy("doc_id")
    }),

    // Frame sampling: fixed 64-byte frames, keep every 2nd — the
    // explode(sequence(...)) shape used to fan a blob into per-frame rows.
    "multimodal_frame_sample" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("len"))
        // empty payloads yield no frames — and keep Spark's truncating
        // division in agreement with the oracle's floor division, which
        // disagree only at len = 0
        .filter(col("len") > 0)
        .select(col("doc_id"), col("len"),
          // Spark `/` is double division — floor back to long for sequence.
          explode(sequence(lit(0L), ((col("len") - 1) / 64).cast("long")))
            .as("frame_idx"))
        .filter(col("frame_idx") % 2 === 0)
        .select(col("doc_id"), col("frame_idx"),
          least(lit(64L), col("len") - col("frame_idx") * 64).cast("int")
            .as("frame_len"))
        .orderBy("doc_id", "frame_idx")),
  )

  val oracleSql: Map[String, String] = Map(
    "multimodal_struct" ->
      """SELECT doc_id,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS emb0,
        |       CAST(length(text) AS INT) AS len,
        |       lang AS meta_lang
        |FROM documents JOIN embeddings ON vec_id = doc_id
        |ORDER BY doc_id""".stripMargin,
    // the decoded dims must equal the encoded ones — the oracle checks
    // the codec roundtrip, not a copy of the Spark expression
    "multimodal_image_decode" ->
      """SELECT doc_id,
        |       CAST(doc_id % 16 + 1 AS INT) AS width,
        |       CAST(doc_id % 12 + 1 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // strlen = DuckDB's BYTE length — the Spark side measures the UTF-8
    // payload (bytes.length), and length(text) counts characters, which
    // only agrees on pure-ASCII input.
    "multimodal_binary_decode" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS INT) AS n_bytes,
        |       CAST(strlen(text) % 64 AS INT) AS width,
        |       CAST((strlen(text) * 7 + 13) % 64 AS INT) AS height,
        |       3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "multimodal_frame_sample" ->
      """SELECT doc_id, frame_idx,
        |       CAST(least(64, length(text) - frame_idx * 64) AS INT)
        |         AS frame_len
        |FROM (
        |  SELECT doc_id, text,
        |         unnest(range(0, (length(text) - 1) // 64 + 1))
        |           AS frame_idx
        |  FROM documents WHERE length(text) > 0
        |) WHERE frame_idx % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
