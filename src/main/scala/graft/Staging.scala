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
}
