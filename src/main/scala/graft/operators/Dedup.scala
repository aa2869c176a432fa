package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document-scale corpora.
  *
  * Exact dedup is a keyed shuffle (hash on the dedup key only); near-dup
  * detection offers the exact O(n²) baseline (bounded corpora / oracle
  * checking) and sketch-based candidates (MinHash banding via MLlib,
  * SimHash banding natively) as the linear-scale paths.
  */
object Dedup {

  /** Keep exactly one row per `key`, the first by `tieBreak` ascending —
    * deterministic, unlike dropDuplicates (which keeps an arbitrary row).
    */
  def exact(df: DataFrame, key: Seq[Column], tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key: _*).orderBy(tieBreak.asc)
    df.withColumn("__dedup_rn", row_number().over(w))
      .filter(col("__dedup_rn") === 1)
      .drop("__dedup_rn")
  }

  /** Distinct token n-gram shingles of a token-array column. Arrays shorter
    * than n yield an empty shingle set — without the guard,
    * sequence(1, size-(n-1)) counts DOWN through 0 for short inputs and
    * element_at(tokens, 0) throws (ANSI mode is Spark 4's default).
    */
  def shingles(tokens: Column, n: Int): Column =
    if (n <= 1) array_distinct(tokens)
    else when(size(tokens) >= n,
      array_distinct(transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o)): _*))))
      .otherwise(array().cast("array<string>"))

  /** ALL token n-gram shingles, position-preserving: duplicates kept, one
    * element per starting offset — for span-level duplicate accounting,
    * where the same gram occurring twice is two spans (`shingles` above
    * dedups, which is right for set-similarity but wrong for span counts).
    * Same short-input guard.
    */
  def shinglesAll(tokens: Column, n: Int): Column =
    if (n <= 1) tokens
    else when(size(tokens) >= n,
      transform(sequence(lit(1), size(tokens) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(tokens, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** 64-bit SimHash fingerprint of an exploded (id, token-hash) frame:
    * per-bit ±1 votes over xxhash64(token), sign-packed into a long.
    * Input: df with columns (idCol, hashCol: long). Output: (idCol, fp).
    */
  def simhash(df: DataFrame, idCol: String, hashCol: String): DataFrame = {
    val votes = (0 until 64).map(i =>
      sum(when(shiftright(col(hashCol), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$i"))
    val fp = (0 until 64).map(i =>
      when(col(s"__b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
      .reduce(_ + _)
    df.groupBy(idCol).agg(votes.head, votes.tail: _*)
      .select(col(idCol), fp.as("fp"))
  }

  /** Candidate near-dup pairs from SimHash fingerprints via band bucketing
    * (`bands` bands of 64/bands bits → equi-join per band), filtered to
    * Hamming distance <= maxHamming. Pure shuffle joins — no n² anywhere.
    */
  def simhashPairs(fps: DataFrame, idCol: String, maxHamming: Int,
      bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0,
      s"bands must divide 64 (got $bands) — an uneven split would silently " +
        "exclude the top bits from banding and degrade recall")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = fps.select(col(idCol), col("fp"),
      explode(array((0 until bands).map(k =>
        struct(lit(k).as("band"),
          shiftright(col("fp"), k * width).bitwiseAND(mask).as("key"))): _*))
        .as("bk"))
      .select(col(idCol), col("fp"), col("bk.band"), col("bk.key"))
    val a = banded.select(col(idCol).as("da"), col("fp").as("fa"),
      col("band"), col("key"))
    val b = banded.select(col(idCol).as("db"), col("fp").as("fb"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
