package graft

/** Serializable carrier for the SESSION's Hadoop Configuration, for
  * executor-side FileSystem access inside mapPartitions/flatMapGroups
  * stagers. `new Configuration()` in a task silently drops every user
  * filesystem setting (s3a credentials, custom providers) — fine on
  * local disk, broken the first time a staging dir is remote. Hadoop's
  * Configuration is not java-serializable, so this writes it through its
  * own write/readFields Writable protocol (the same pattern Spark uses
  * internally for its private SerializableConfiguration).
  */
class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
  extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

object HadoopConf {
  /** The session's hadoopConfiguration as a broadcast — ship ONE copy per
    * executor, not one per task closure (the conf is ~100 KB of XML).
    */
  def broadcast(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.broadcast.Broadcast[SerializableHadoopConf] =
    s.sparkContext.broadcast(
      new SerializableHadoopConf(s.sparkContext.hadoopConfiguration))
}
