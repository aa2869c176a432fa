package graft

import org.apache.spark.sql.functions._

/** Batch 19 replays: DSIR importance scoring, blur detection, and the
  * struct-mutator surface.
  */
class DsirBlurSpec extends SparkSpec {

  test("sample_importance_resampling replays the smoothed log-ratio and " +
    "scores the target language above the rest") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split(" ").toSeq))
    val ca = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val ct = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    docs.foreach { case (_, lang, ts) =>
      ts.foreach { tk =>
        ca(tk) += 1; if (lang == "en") ct(tk) += 1
      }
    }
    val (nt, na, v) = (ct.values.sum, ca.values.sum, ca.size.toLong)
    def lr(tk: String) =
      math.log(((ct(tk) + 1).toDouble / (nt + v)) /
        ((ca(tk) + 1).toDouble / (na + v)))
    val rows = q("sample_importance_resampling").collect()
    assert(rows.length === docs.length)
    val byId = docs.map(d => d._1 -> d).toMap
    rows.foreach { r =>
      val (_, lang, ts) = byId(r.getLong(0))
      assert(r.getString(1) === lang)
      assert(r.getAs[Long]("n_toks") === ts.size.toLong)
      val mean = ts.map(lr).sum / ts.size
      assert(math.abs(r.getAs[Double]("avg_logratio") - mean) <= 1.5e-3)
      assert(r.getAs[Boolean]("selected") ===
        (BigDecimal(mean).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble > 0))
    }
    // the selector has signal: target-language docs score higher on
    // average than the rest
    val en = rows.filter(_.getString(1) == "en")
      .map(_.getAs[Double]("avg_logratio"))
    val rest = rows.filter(_.getString(1) != "en")
      .map(_.getAs[Double]("avg_logratio"))
    assert(en.sum / en.length > rest.sum / rest.length)
  }

  test("multimodal_blur_detect replays the decode + integer-moment " +
    "Laplacian variance bit-exactly") {
    javax.imageio.ImageIO.setUseCache(false)
    val rows = q("multimodal_blur_detect").collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === nDocs)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 16 + 1).toInt, (id % 12 + 1).toInt)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 31 + y * 17 + (id % 97)).toInt % 256
        img.setRGB(x, y, g << 16 | g << 8 | g)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      val dec = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(baos.toByteArray))
      assert(r.getInt(1) === dec.getWidth, id)
      assert(r.getInt(2) === dec.getHeight, id)
      def gray(x: Int, y: Int): Long = dec.getRGB(x, y) & 0xff
      var sl = 0L; var sl2 = 0L; var n = 0L
      for (y <- 1 until dec.getHeight - 1; x <- 1 until dec.getWidth - 1) {
        val l = gray(x - 1, y) + gray(x + 1, y) + gray(x, y - 1) +
          gray(x, y + 1) - 4 * gray(x, y)
        sl += l; sl2 += l * l; n += 1
      }
      val v = if (n == 0) 0.0
        else (sl2.toDouble - sl.toDouble * sl / n) / n
      val expect = BigDecimal(v).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getAs[Double]("lap_var") === expect, id)
      assert(r.getAs[Boolean]("is_sharp") === (v >= 50.0), id)
      assert(v >= 0.0, id)
    }
    // both classes occur (1×k and k×1 images have no interior → 0.0)
    assert(rows.exists(_.getAs[Boolean]("is_sharp")))
    assert(rows.exists(!_.getAs[Boolean]("is_sharp")))
  }

  test("fn_struct_family pins the mutated struct schema and its values") {
    val st2 = Tables(spark, sf, "customer")
      .select(struct(col("c_name").as("name"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg")).as("st"))
      .select(col("st")
        .withField("bal_tier", when(col("st.bal") >= 5000.0, "gold")
          .otherwise("std"))
        .dropFields("seg").as("st2"))
    val fields = st2.schema("st2").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(fields.toSeq === Seq("name", "bal", "bal_tier"))
    val rows = q("fn_struct_family").collect()
    val base = Tables(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (name, bal) = base(r.getLong(0))
      assert(r.getString(1) === name)
      assert(math.abs(r.getAs[Double]("bal") - bal) <= 5e-3)
      assert(r.getString(3) === (if (bal >= 5000.0) "gold" else "std"))
    }
    assert(rows.length === base.size)
  }
}
