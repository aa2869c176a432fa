package graft

import org.apache.spark.sql.functions._

/** Batch-12e additions: greedy k-center coreset (driver replay), n-gram
  * novelty (driver fold), and the bloom-filtered parquet layout (footer
  * really carries blooms + result fidelity).
  */
class KcenterNoveltySpec extends SparkSpec {

  test("sample_kcenter_diverse: picks and radii replay the greedy " +
    "farthest-point traversal, radii non-increasing") {
    val rows = q("sample_kcenter_diverse").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 8)
    assert(rows.map(_._1).toSeq === (1 to 8))
    rows.drop(1).sliding(2).foreach {
      case Array((_, _, ra), (_, _, rb)) => assert(rb <= ra + 1e-9)
      case _ =>
    }
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var acc = 0.0
      while (i < a.length) {
        val z = a(i).toDouble - b(i).toDouble; acc += z * z; i += 1
      }
      acc
    }
    val picked = scala.collection.mutable.ListBuffer(emb.head._1)
    var centers = List(emb.head._2)
    val radii = scala.collection.mutable.ListBuffer(0.0)
    (2 to 8).foreach { _ =>
      val cand = emb.filter(e => !picked.contains(e._1))
        .map { case (id, v) => (id, centers.map(c => d2(v, c)).min) }
      val far = cand.minBy { case (id, dm) => (-dm, id) }
      picked += far._1
      centers = emb.find(_._1 == far._1).get._2 :: centers
      radii += math.sqrt(far._2)
    }
    assert(rows.map(_._2).toSeq === picked.toSeq)
    rows.map(_._3).zip(radii).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-4, s"radius $got vs $exp")
    }
  }

  test("text_ngram_novelty: the first document is fully novel, ratios " +
    "replay a driver-side first-seen fold, and shares are in (0, 1]") {
    val rows = q("text_ngram_novelty").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.head._4 === 1.0) // lowest doc_id saw every bigram first
    rows.foreach { case (_, nSh, nNov, nov) =>
      assert(nNov <= nSh && nov >= 0.0 && nov <= 1.0)
    }
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    val expected = docs.flatMap { case (id, text) =>
      val t = text.toLowerCase.split(" ", -1)
      val gs = (0 until t.length - 1).map(i => t(i) + " " + t(i + 1))
        .distinct
      if (gs.isEmpty) None
      else {
        var novel = 0L
        gs.foreach { g =>
          if (!firstSeen.contains(g)) { firstSeen(g) = id; novel += 1 }
        }
        Some((id, gs.length.toLong, novel,
          BigDecimal(novel.toDouble / gs.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    assert(rows.toSeq === expected.toSeq)
  }

  test("scan_parquet_bloom: the staged footer carries a bloom filter " +
    "for o_custkey and the lookup equals the raw-table filter") {
    val got = q("scan_parquet_bloom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exp = Tables.orders(spark, sf)
      .filter(col("o_custkey") === 73L)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === exp.toSeq)
    assert(got.nonEmpty)

    val dir = new java.io.File(
      graft.Staging.dir("graft_phys_orders_bloom", sf))
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf))
    try {
      import scala.jdk.CollectionConverters._
      val cols = reader.getFooter.getBlocks.asScala.head
        .getColumns.asScala
      val ck = cols.find(_.getPath.toDotString == "o_custkey").get
      assert(ck.getBloomFilterOffset >= 0,
        "o_custkey column chunk carries no bloom filter offset")
      val other = cols.find(_.getPath.toDotString == "o_comment")
        .orElse(cols.find(_.getPath.toDotString == "o_orderstatus"))
      other.foreach(c => assert(c.getBloomFilterOffset < 0,
        "bloom unexpectedly enabled on a non-requested column"))
    } finally reader.close()
  }
}
