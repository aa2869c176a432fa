package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The BM25 lexical ranker behind `search_hybrid_rrf`, judged on the
  * property BM25 exists for and the DuckDB twin cannot see: a query
  * carrying a rare term (the corpus's near-dup marker token, ~15× rarer
  * than the rest of the 31-word vocabulary) must rank fellow
  * marker-term docs ahead of docs that merely share common-token mass.
  * Raw unigram overlap — the ranker BM25 replaced — is the control: on
  * the same queries it must NOT saturate its top-20 with marker docs,
  * proving the idf weighting (not the fixture) does the work.
  */
class Bm25HybridSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf, "documents")
    .select(col("doc_id"),
      array_distinct(split(lower(col("text")), " ")).as("toks"))

  private lazy val dupDocs = docs
    .filter(array_contains(col("toks"), "dup"))
    .select("doc_id").collect().map(_.getLong(0)).toSet

  test("a rare-term query fills its BM25 top-20 with marker docs") {
    val dupQueries = dupDocs.filter(_ < 8)
    assert(dupQueries.nonEmpty,
      "fixture: at least one query doc must carry the marker token")
    assert(dupDocs.size > 20,
      "fixture: enough marker docs to fill a top-20")
    val bm = queries.SimSearch.bm25TopK(spark, sf, 20).collect()
    dupQueries.foreach { qid =>
      val top = bm.filter(_.getLong(0) == qid)
      assert(top.length === 20, s"query $qid: a full top-20")
      val markers = top.count(r => dupDocs.contains(r.getLong(1)))
      assert(markers === 20,
        s"query $qid: every top-20 doc must carry the rare term " +
          s"(got $markers/20) — the exact-identifier match outranks " +
          "common-token neighbors")
    }
  }

  test("raw unigram overlap does NOT saturate on the same queries — " +
    "idf, not the fixture, drives the ranking") {
    val dupQueries = dupDocs.filter(_ < 8)
    val qd = docs.filter(col("doc_id") < 8)
      .select(col("doc_id").as("q_id"), col("toks").as("qt"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("ov").desc, col("doc_id").asc)
    val ov = broadcast(qd).join(docs, col("q_id") =!= col("doc_id"))
      .select(col("q_id"), col("doc_id"),
        size(array_intersect(col("qt"), col("toks"))).as("ov"))
      .withColumn("rl", row_number().over(w))
      .filter(col("rl") <= 20)
      .collect()
    dupQueries.foreach { qid =>
      val markers = ov.count(r =>
        r.getLong(0) == qid && dupDocs.contains(r.getLong(1)))
      assert(markers < 20,
        s"query $qid: overlap ranked $markers/20 marker docs — if it " +
          "saturates too, this spec no longer isolates the idf effect")
    }
  }
}
