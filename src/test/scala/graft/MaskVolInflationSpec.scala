package graft

import org.apache.spark.sql.functions._

/** Batch 25 replays: masking surface, Parkinson volatility, and the
  * duplication inflation factor.
  */
class MaskVolInflationSpec extends SparkSpec {

  test("fn_mask masks class-by-class and preserves other characters") {
    val parts = Tables(spark, sf, "part")
      .select("p_partkey", "p_brand", "p_name").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    def m(s: String, up: Char = 'X') = s.map {
      case c if c.isUpper => up
      case c if c.isLower => 'x'
      case c if c.isDigit => 'n'
      case c => c
    }
    val rows = q("fn_mask").collect()
    assert(rows.length === parts.size)
    rows.foreach { r =>
      val (brand, name) = parts(r.getLong(0))
      assert(r.getString(1) === m(brand))
      assert(r.getString(2) === m(name))
      assert(r.getString(3) === m(brand, '*'))
      // format preserved: '#' separator survives in Brand#NN
      assert(r.getString(1).contains("#"))
    }
  }

  test("win_volatility_parkinson replays the daily-bar fold and is " +
    "non-negative") {
    val bars = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(max("value").as("h"), min("value").as("l")).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    val rows = q("win_volatility_parkinson").collect()
    val byType = bars.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSeq === byType.keys.toSeq.sorted)
    rows.foreach { r =>
      val bs = byType(r.getString(0))
      assert(r.getAs[Long]("n_days") === bs.length.toLong)
      val lr = bs.map(b => math.log(b._2 / b._3))
      val sigma = math.sqrt(lr.map(x => x * x).sum / lr.size /
        (4 * math.log(2.0)))
      assert(math.abs(r.getAs[Double]("parkinson_sigma") - sigma)
        <= 1.5e-3)
      assert(math.abs(r.getAs[Double]("mean_log_range") -
        lr.sum / lr.size) <= 1.5e-3)
      assert(r.getAs[Double]("parkinson_sigma") >= 0.0)
    }
  }

  test("agg_dedup_inflation reconciles with the weights key and is " +
    ">= 1 everywhere") {
    val weights = q("sample_dedup_aware_weights").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("weight")).toMap
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").length.toLong))
    val rows = q("agg_dedup_inflation").collect()
    val bySrc = docs.groupBy(_._2)
    assert(rows.map(_.getString(0)).toSeq === bySrc.keys.toSeq.sorted)
    rows.foreach { r =>
      val ds = bySrc(r.getString(0))
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      val raw = ds.map(_._3).sum
      assert(r.getAs[Long]("raw_tokens") === raw)
      val eff = ds.map(d => weights(d._1) * d._3).sum
      assert(math.abs(r.getAs[Double]("effective_tokens") - eff)
        <= 1.5e-2, r.getString(0))
      assert(math.abs(r.getAs[Double]("inflation") - raw / eff)
        <= 1.5e-3, r.getString(0))
      assert(r.getAs[Double]("inflation") >= 1.0 - 1e-9)
    }
  }
}
