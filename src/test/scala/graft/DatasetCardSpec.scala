package graft

import org.apache.spark.sql.functions._

/** Batch 13g replays: the one-row dataset card and the langid confusion
  * matrix.
  */
class DatasetCardSpec extends SparkSpec {

  private def predLang(text: String): String =
    if (text == null) "und"
    else if (java.util.regex.Pattern.compile("[\\x{4e00}-\\x{9fff}]")
      .matcher(text).find()) "zh"
    else if (java.util.regex.Pattern.compile("[äöüß]")
      .matcher(text).find()) "de"
    else if (java.util.regex.Pattern.compile("[ñ¡¿]")
      .matcher(text).find()) "es"
    else if (java.util.regex.Pattern.compile("[éèêçà]")
      .matcher(text).find()) "fr"
    else "en"

  test("quality_langid_confusion: cells tile the corpus, recall rows " +
    "sum to ~100 per class, and cells replay the charset rules") {
    val out = q("quality_langid_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), predLang(r.getString(1))))
    assert(out.map(_._3).sum === docs.length.toLong)
    val expected = docs.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    assert(out.map(r => ((r._1, r._2), r._3)).toMap === expected)
    out.groupBy(_._1).foreach { case (actual, rows) =>
      val pctSum = rows.map(_._4).sum
      assert(math.abs(pctSum - 100.0) <= 0.05, s"$actual recall sum")
    }
    // the heuristic must not be WORSE than the majority-class baseline
    // (at sf0.001 it exactly ties it — short docs rarely carry the
    // accent markers, so only 'en' scores; the eval existing is the
    // point, the heuristic's weakness is the finding it publishes)
    val correct = out.filter(r => r._1 == r._2).map(_._3).sum.toDouble
    val majority = docs.groupBy(_._1).values.map(_.size).max.toDouble
    assert(correct / docs.length >= majority / docs.length)
  }

  test("pipeline_dataset_card replays every field from one driver pass") {
    val rows = q("pipeline_dataset_card").collect()
    assert(rows.length === 1)
    val r = rows.head
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("source"), col("n_chars"), col("text"))
      .collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getString(3)))
    val n = docs.length
    assert(r.getAs[Long]("n_docs") === n.toLong)
    assert(r.getAs[Long]("n_langs") === docs.map(_._1).distinct.length.toLong)
    assert(r.getAs[Long]("n_sources") ===
      docs.map(_._2).distinct.length.toLong)
    assert(r.getAs[Long]("total_chars") === docs.map(_._3).sum)
    assert(math.abs(r.getAs[Double]("avg_chars") -
      docs.map(_._3).sum.toDouble / n) <= 1.5e-2)
    def toks(t: String) = t.toLowerCase.split(" ", -1)
    assert(r.getAs[Long]("total_tokens") ===
      docs.map(d => toks(d._4).length.toLong).sum)
    val uniq = docs.map(d => d._4.toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim)
      .distinct.length
    assert(math.abs(r.getAs[Double]("dup_pct") -
      100.0 * (n - uniq) / n) <= 1.5e-2)
    val qok = docs.count { d =>
      val k = toks(d._4).length
      val avgLen = (d._4.length - (k - 1)).toDouble / k
      k >= 5 && k <= 5000 && avgLen >= 2.0 && avgLen <= 15.0
    }
    assert(math.abs(r.getAs[Double]("quality_pass_pct") -
      100.0 * qok / n) <= 1.5e-2)
    // internal consistency: the card's dup share matches the dedup key
    val survivors = q("dedup_exact_normalized")
      .filter(col("is_canonical")).count()
    assert(math.abs(r.getAs[Double]("dup_pct") -
      100.0 * (n - survivors).toDouble / n) <= 1.5e-2)
  }
}
