package graft

import org.apache.spark.sql.functions._

/** Batch 28 replays: PK uniqueness census and datetime formatting. */
class PkFormatSpec extends SparkSpec {

  test("quality_duplicate_keys_audit is clean on the fixture and counts " +
    "a planted duplicate key") {
    val rows = q("quality_duplicate_keys_audit").collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_distinct_pk"),
        r.getString(0))
      assert(r.getAs[Long]("n_dup_rows") === 0L, r.getString(0))
    }

    // plant: re-append 10 orders under their existing keys
    val dir = java.nio.file.Files.createTempDirectory("pk_spec").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    Seq("customer", "documents", "embeddings", "events", "part",
      "supplier").foreach { n =>
      Tables(spark, sf, n).write.mode("overwrite")
        .parquet(s"$d/$n.parquet")
    }
    val ords = Tables(spark, sf, "orders")
    ords.unionAll(ords.orderBy("o_orderkey").limit(10))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val planted = SparkEntry
      .queries("quality_duplicate_keys_audit")(spark, d).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_dup_rows")).toMap
    assert(planted("orders") === 10L)
    assert(planted.filterNot(_._1 == "orders").values.forall(_ === 0L))
  }

  test("fn_datetime_format renders numeric patterns identically to " +
    "java.time and always round-trips") {
    val rows = q("fn_datetime_format").collect()
    val dates = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    assert(rows.length === dates.size)
    val doy = java.time.format.DateTimeFormatter.ofPattern("DDD")
    rows.foreach { r =>
      val ld = dates(r.getLong(0))
      assert(r.getString(1) === ld.toString)
      assert(r.getString(2) === ld.toString.replace("-", ""))
      assert(r.getString(3) === doy.format(ld), ld)
      assert(r.getAs[Boolean]("roundtrip_ok"))
    }
  }
}
