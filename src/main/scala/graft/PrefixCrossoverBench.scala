package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (PERF.md evidence, not part of the query surface):
  * measures the guarded all-pairs near-dup merge against the prefix-filter
  * twin on the SAME synthetic corpus at two sizes — below the n²
  * crossover (5k docs, where the broadcast merge wins) and above the
  * ScaleGuard ceiling (64k docs, where the brute path must REFUSE and the
  * prefix path is the only one that runs). Usage:
  *
  *   runMain graft.PrefixCrossoverBench [n5k] [nBig]
  *
  * Corpus shape (deterministic, no RNG): 30 tokens/doc — 15 from a
  * 500-token shared vocabulary (Zipf-ish df ~128 per common bigram, so
  * the rarest-first prefix selection has something to avoid) and 15
  * quasi-unique, plus a planted near-dup partner for every 10th doc
  * (one token changed → bigram Jaccard ≈ 0.87 ≥ 0.5). Both paths must
  * report the SAME pair count at 5k (checked), which pins that the
  * timing compares equal work.
  */
object PrefixCrossoverBench {

  private def corpus(s: SparkSession, n: Long): DataFrame = {
    val toks = transform(sequence(lit(0), lit(29)), j => {
      // every 10th doc gets a partner (d+1) equal except one position
      val src = when(col("id") % 10 === 1, col("id") - 1).otherwise(col("id"))
      val changed = col("id") % 10 === 1 && j === pmod(col("id"), lit(30))
      when(changed, concat(lit("x"), col("id")))
        .otherwise(when(j < 15,
          concat(lit("c"), pmod(src * 7 + j * 13, lit(500))))
          .otherwise(concat(lit("u"), pmod(src * 131 + j * 7, lit(100003)))))
    })
    s.range(n).select(col("id").as("doc_id"),
      array_join(toks, " ").as("text"))
  }

  private def shingled(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      array_sort(transform(
        graft.operators.Dedup.shingles(split(lower(col("text")), " "), 2),
        g => xxhash64(g))).as("g"))

  /** The guarded all-pairs path, same shape as `dedup_ngram_jaccard`:
    * ScaleGuard, broadcast collect, per-partition sorted-merge.
    */
  private def brutePairs(s: SparkSession, docsG: DataFrame): Long = {
    import s.implicits._
    graft.operators.ScaleGuard.requireAtMost(docsG.select("doc_id"), 50000,
      "crossover_brute", "prefix path (identical output, linear scale)")
    val ds = docsG.as[(Long, Array[Long])]
    val side = s.sparkContext.broadcast(ds.collect().sortBy(_._1))
    val n = ds.mapPartitions { it =>
      val all = side.value
      it.map { case (da, ga) =>
        var lo = 0; var hi = all.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (all(mid)._1 <= da) lo = mid + 1 else hi = mid
        }
        var cnt = 0L
        var idx = lo
        val la = ga.length
        while (idx < all.length) {
          val (_, gb) = all(idx)
          val lb = gb.length
          var i = 0; var j = 0; var inter = 0
          while (i < la && j < lb) {
            val x = ga(i); val y = gb(j)
            if (x == y) { inter += 1; i += 1; j += 1 }
            else if (x < y) i += 1
            else j += 1
          }
          // j = i/(la+lb-i) >= 0.5  ⇔  3i >= la+lb (integer-exact)
          if (3L * inter >= la + lb) cnt += 1
          idx += 1
        }
        cnt
      }
    }.reduce(_ + _)
    side.destroy()
    n
  }

  private def prefixPairs(s: SparkSession, docsG: DataFrame): Long = {
    graft.plans.GraftExtensions.register(s)
    val cand = graft.queries.TextOps.prefixCandidates(docsG,
      la => floor(la / lit(3)).cast("int") + lit(1), Some(2))
    val ga = docsG.select(col("doc_id").as("da"), col("g").as("ga"))
    val gb = docsG.select(col("doc_id").as("db"), col("g").as("gb"))
    cand.join(ga, "da").join(gb, "db")
      .select(call_function("graft_jaccard_sorted", col("ga"), col("gb"))
        .as("j"))
      .filter(col("j") >= 0.5)
      .count()
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val nSmall = args.headOption.map(_.toLong).getOrElse(5000L)
    val nBig = args.lift(1).map(_.toLong).getOrElse(64000L)
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-prefix-crossover")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val small = shingled(corpus(s, nSmall)).localCheckpoint(true)
    // warm both paths once (codegen/JIT), then measure
    prefixPairs(s, small); brutePairs(s, small)
    val (bp, tBruteSmall) = timed(brutePairs(s, small))
    val (pp, tPrefixSmall) = timed(prefixPairs(s, small))
    require(bp == pp, s"pair count mismatch at $nSmall: brute=$bp prefix=$pp")

    val big = shingled(corpus(s, nBig)).localCheckpoint(true)
    val refused =
      try { brutePairs(s, big); false }
      catch { case e: IllegalArgumentException =>
        System.err.println(s"[crossover] brute at $nBig docs refused: " +
          e.getMessage)
        true
      }
    val (ppBig, tPrefixBig) = timed(prefixPairs(s, big))

    println(
      s"""{"corpus_small":$nSmall,"pairs_small":$bp,""" +
        s""""brute_small_sec":${f"$tBruteSmall%.2f"},""" +
        s""""prefix_small_sec":${f"$tPrefixSmall%.2f"},""" +
        s""""corpus_big":$nBig,"brute_big_refused":$refused,""" +
        s""""pairs_big":$ppBig,""" +
        s""""prefix_big_sec":${f"$tPrefixBig%.2f"}}""")
    s.stop()
  }
}
