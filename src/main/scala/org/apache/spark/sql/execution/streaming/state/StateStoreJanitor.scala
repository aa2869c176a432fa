package org.apache.spark.sql.execution.streaming.state

/** Bench-only hatch into the package-private [[StateStore]] coordinator:
  * unloads every loaded state-store provider on this JVM. A terminated
  * streaming query leaves its providers (one per shuffle partition) cached
  * until the maintenance thread's next slow cycle notices they're orphaned;
  * a back-to-back benchmark sweep of many stateful queries accumulates them
  * faster than that cycle drains them. Safe to call between queries — the
  * next streaming query reloads its providers from checkpoint on demand.
  */
object StateStoreJanitor {
  def unloadAll(): Unit = StateStore.unloadAll()
}
