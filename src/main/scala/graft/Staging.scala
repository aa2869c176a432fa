package graft

/** Shared idiom for idempotent per-(run, sfDir) staged layouts: a stable
  * temp path keyed by a prefix plus the sanitized sfDir, and the
  * write-once check via the committer's _SUCCESS marker. Every staged
  * layout (partitioned/bucketed/orc/z-order tables, streaming source
  * re-materializations, the persisted IVF index) goes through these two
  * so the sanitize/marker rules can't drift apart per module.
  */
object Staging {

  /** `/tmp/<prefix>_<sanitized sfDir>` — stable across runs for the same
    * inputs, distinct across scale factors.
    */
  def dir(prefix: String, sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/${prefix}_" +
      sfDir.replaceAll("[^a-zA-Z0-9]", "_")

  /** True iff a previous write completed (committer wrote _SUCCESS) —
    * a crashed partial write re-stages.
    */
  def isStaged(path: String): Boolean =
    new java.io.File(path, "_SUCCESS").exists()

  /** Metadata fingerprint of source paths: md5 over every data file's
    * (path, length, mtime), listed recursively through the Hadoop
    * FileSystem. O(#files) listing, never reads data — so a staged
    * index's currency check stays free even when the source table is
    * 100 TB. Parquet writers never modify files in place (new files or
    * new mtimes on rewrite), so (path, length, mtime) moving is exactly
    * "the source changed".
    */
  def fingerprint(s: org.apache.spark.sql.SparkSession,
      srcs: String*): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    srcs.foreach { src =>
      val p = new org.apache.hadoop.fs.Path(src)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      if (fs.exists(p)) {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          entries +=
            s"${f.getPath}:${f.getLen}:${f.getModificationTime}"
        }
      }
      entries.sorted.foreach(e => md.update(e.getBytes("UTF-8")))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  private def stampFile(path: String): java.io.File =
    new java.io.File(path, "_GRAFT_SRC_STAMP")

  /** True iff a previous write completed AND was built from sources whose
    * fingerprint equals `stamp` — a staged layout with a missing or
    * different stamp is STALE (the source table changed underneath it)
    * and must rebuild. This is the refresh contract for every derived
    * index (IVF cells, PQ codes, near-dup edges): serving codes trained
    * on a previous corpus is a silent-wrong-answer class, not a perf bug.
    */
  def isCurrent(path: String, stamp: String): Boolean =
    isStaged(path) && {
      val f = stampFile(path)
      f.exists() && new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8") == stamp
    }

  /** Record the source fingerprint AFTER the staged write committed —
    * written last, so a crash between data write and stamp leaves the
    * layout detectably stale, never falsely current.
    */
  def commitStamp(path: String, stamp: String): Unit =
    java.nio.file.Files.write(stampFile(path).toPath,
      stamp.getBytes("UTF-8"))

  /** The full commit for hand-written layouts (no Spark committer):
    * touch `_SUCCESS` (completion marker — what `isStaged` checks) and
    * THEN the source stamp, in that order, so every partial state is
    * detectably stale: crash before `_SUCCESS` → not staged; crash
    * between marker and stamp → stamp missing → `isCurrent` false →
    * rebuild. Parquet-committed layouts already have `_SUCCESS` and call
    * `commitStamp` directly; everything file-shaped (image dirs, packed
    * shards, XML corpora, serialized filters) must come through here —
    * a stamp without the marker is never `isCurrent`, so a stager that
    * skipped the marker would silently re-stage on EVERY call and bill
    * that write to whatever query runs it first.
    */
  def commitStamped(path: String, stamp: String): Unit = {
    new java.io.File(path, "_SUCCESS").createNewFile()
    commitStamp(path, stamp)
  }
}
