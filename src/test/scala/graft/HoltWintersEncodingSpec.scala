package graft

import org.apache.spark.sql.functions._

/** Batch 21 replays: Holt–Winters seasonal fold, encoding audit, and the
  * regexp surface.
  */
class HoltWintersEncodingSpec extends SparkSpec {

  test("resample_holt_winters replays the gap-filled seasonal recurrence " +
    "exactly") {
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hsec"))
      .agg(count(lit(1)).cast("double").as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val rows = q("resample_holt_winters").collect()
    val byType = hourly.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq === byType.keys.toSeq.sorted)
    rows.foreach { r =>
      val tpe = r.getString(0)
      val pts = byType(tpe).map(p => p._2 -> p._3).toMap
      val (h0, h1) = (pts.keys.min, pts.keys.max)
      val ys = (h0 to h1 by 3600L).map(h => pts.getOrElse(h, 0.0))
      assert(r.getAs[Long]("n_hours") === ys.length.toLong, tpe)
      assert(ys.length > 48, tpe) // the fold actually runs
      var l = ys.slice(0, 24).sum / 24.0
      var b = (ys.slice(24, 48).sum - ys.slice(0, 24).sum) / 576.0
      val sArr = ys.slice(0, 24).map(_ - l).toArray
      var i = 0L; var sae = 0.0; var n = 0L
      ys.drop(48).foreach { y =>
        val p = (i % 24).toInt
        sae += math.abs(y - (l + b + sArr(p)))
        val l2 = 0.3 * (y - sArr(p)) + 0.7 * (l + b)
        val b2 = 0.1 * (l2 - l) + 0.9 * b
        sArr(p) = 0.2 * (y - l2) + 0.8 * sArr(p)
        l = l2; b = b2; i += 1; n += 1
      }
      assert(math.abs(r.getAs[Double]("level") - l) <= 1.5e-3, tpe)
      assert(math.abs(r.getAs[Double]("trend") - b) <= 1.5e-3, tpe)
      assert(math.abs(r.getAs[Double]("forecast_next") -
        (l + b + sArr((i % 24).toInt))) <= 1.5e-3, tpe)
      assert(math.abs(r.getAs[Double]("one_step_mae") - sae / n)
        <= 1.5e-3, tpe)
    }
  }

  test("quality_encoding_audit is clean on the fixture and detects " +
    "planted mojibake") {
    val rows = q("quality_encoding_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ctl_docs") === 0L, r.getString(0))
      assert(r.getAs[Long]("n_replacement_docs") === 0L, r.getString(0))
      assert(r.getAs[Double]("max_nonascii_ratio") === 0.0, r.getString(0))
    }

    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("enc_spec").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    Seq(
      (1L, "clean ascii text", "en", "srcA", 16L),
      (2L, "bad  control", "en", "srcA", 13L),
      (3L, "lost � byte � here", "en", "srcB", 16L),
      (4L, "café au lait", "en", "srcB", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val planted = SparkEntry.queries("quality_encoding_audit")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_ctl_docs"), r.getAs[Long]("n_replacement_docs"),
          r.getAs[Double]("max_nonascii_ratio"))).toMap
    assert(planted("srcA") === ((1L, 0L, 0.0)))
    assert(planted("srcB")._1 === 0L)
    assert(planted("srcB")._2 === 1L)
    // "lost � byte � here" carries 2 non-ASCII chars over 18 — above
    // café's 1/12
    assert(math.abs(planted("srcB")._3 - 2.0 / 18) <= 1.5e-4)
  }

  test("fn_regexp_family replays extract/global-replace/count/match " +
    "against java.util.regex") {
    val parts = Tables(spark, sf, "part")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = q("fn_regexp_family").collect()
    assert(rows.length === parts.size)
    val word = "([a-z]+)".r
    rows.foreach { r =>
      val name = parts(r.getLong(0))
      assert(r.getString(1) ===
        word.findFirstMatchIn(name).map(_.group(1)).getOrElse(""))
      assert(r.getString(2) === name.replaceAll("[aeiou]", "_"))
      assert(r.getInt(3) === word.findAllIn(name).size)
      assert(r.getAs[Boolean]("starts_alpha") ===
        name.take(1).matches("[a-z]"))
    }
  }
}
