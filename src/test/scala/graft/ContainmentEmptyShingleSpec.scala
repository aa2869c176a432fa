package graft

import org.apache.spark.sql.Row

/** Zero-shingle agreement pin for the containment dedup family (r12
  * review): a <2-token document has an EMPTY bigram shingle set, and the
  * integer containment threshold `10·inter >= 9·min(la,lb)` passes
  * trivially at `min = 0` — so before the explicit filters, the guarded
  * all-pairs key could emit empty-set "pairs" that the prefix twin
  * (whose explode drops empty sets) can never produce. The sf fixtures
  * happen to contain no such docs, so only a planted fixture proves the
  * three representations (guarded, prefix, DuckDB oracle with
  * `least(la, lb) > 0`) agree by construction rather than by luck.
  */
class ContainmentEmptyShingleSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("ces_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Fixture: two zero-shingle docs (1 token → 0 bigrams), one exact
    * containment pair (doc 3 quoted whole inside doc 4), one unrelated
    * doc, and an empty-after-tokenize edge ("" splits to [""], still a
    * single token → zero shingles).
    */
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = freshDir()
    Seq(
      (1L, "solo", "en", "src0", 4L),
      (2L, "another", "en", "src0", 7L),
      (3L, "alpha beta gamma delta", "en", "src1", 22L),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "en", "src1", 57L),
      (5L, "nu xi omicron pi rho sigma", "en", "src2", 26L),
      (6L, "", "en", "src3", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(key: String): Set[(Long, Long, Double, Double)] =
    SparkEntry.queries(key)(spark, fixtureDir).collect().map {
      case Row(da: Long, db: Long, ca: Double, cb: Double) =>
        (da, db, ca, cb)
    }.toSet

  test("guarded and prefix containment emit IDENTICAL pairs on a fixture " +
    "with zero-shingle docs — and neither pairs the empty sets") {
    val guarded = rows("dedup_containment")
    val prefix = rows("dedup_containment_prefix")
    assert(guarded === prefix)
    // the planted containment pair IS found (c_ab = 1.0: doc 3's three
    // bigrams all occur in doc 4's nine)
    assert(guarded.exists { case (da, db, ca, _) =>
      da == 3L && db == 4L && ca == 1.0
    }, s"missing planted pair in $guarded")
    // no output row touches a zero-shingle doc (the min=0 trivial pass)
    val empties = Set(1L, 2L, 6L)
    assert(guarded.forall { case (da, db, _, _) =>
      !empties(da) && !empties(db)
    }, s"zero-shingle doc paired: $guarded")
  }

  test("guarded and prefix ngram-Jaccard agree on the same fixture " +
    "(0/0 = NaN fails j >= 0.5, so empties drop for free)") {
    def jrows(key: String): Set[(Long, Long, Double)] =
      SparkEntry.queries(key)(spark, fixtureDir).collect().map {
        case Row(da: Long, db: Long, j: Double) => (da, db, j)
      }.toSet
    val guarded = jrows("dedup_ngram_jaccard")
    val prefix = jrows("dedup_ngram_jaccard_prefix")
    assert(guarded === prefix)
    assert(guarded.forall { case (da, db, _) =>
      !Set(1L, 2L, 6L)(da) && !Set(1L, 2L, 6L)(db)
    })
  }
}
