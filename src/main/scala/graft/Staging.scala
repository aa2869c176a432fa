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

  // All marker/stamp I/O below runs DRIVER-SIDE through the Hadoop
  // FileSystem resolved from the active session's conf — the same client
  // the staged data itself is written with. With java.io/java.nio here,
  // a remote staging dir would read/write its markers on driver-local
  // disk: isCurrent would never hold and every call would silently
  // re-stage (billed to whichever query runs first — the r11
  // scan_binaryfile failure mode, this time unfixable by a stamp).
  private def fsFor(path: String): (org.apache.hadoop.fs.FileSystem,
      org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    (p.getFileSystem(conf), p)
  }

  /** True iff a previous write completed (committer wrote _SUCCESS) —
    * a crashed partial write re-stages.
    */
  def isStaged(path: String): Boolean = {
    val (fs, p) = fsFor(path)
    fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
  }

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

  /** True iff a previous write completed AND was built from sources whose
    * fingerprint equals `stamp` — a staged layout with a missing or
    * different stamp is STALE (the source table changed underneath it)
    * and must rebuild. This is the refresh contract for every derived
    * index (IVF cells, PQ codes, near-dup edges): serving codes trained
    * on a previous corpus is a silent-wrong-answer class, not a perf bug.
    */
  def isCurrent(path: String, stamp: String): Boolean =
    isStaged(path) && {
      val (fs, p) = fsFor(path)
      val f = new org.apache.hadoop.fs.Path(p, "_GRAFT_SRC_STAMP")
      fs.exists(f) && {
        val buf = new Array[Byte](fs.getFileStatus(f).getLen.toInt)
        val in = fs.open(f)
        try { in.readFully(0, buf); new String(buf, "UTF-8") == stamp }
        finally in.close()
      }
    }

  /** Record the source fingerprint AFTER the staged write committed —
    * written last, so a crash between data write and stamp leaves the
    * layout detectably stale, never falsely current.
    */
  def commitStamp(path: String, stamp: String): Unit = {
    val (fs, p) = fsFor(path)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(p, "_GRAFT_SRC_STAMP"), true)
    try out.write(stamp.getBytes("UTF-8"))
    finally out.close()
  }

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
    val (fs, p) = fsFor(path)
    fs.create(new org.apache.hadoop.fs.Path(p, "_SUCCESS"), true).close()
    commitStamp(path, stamp)
  }
}
