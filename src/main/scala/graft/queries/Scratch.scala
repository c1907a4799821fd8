package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-session scratch directories for queries that materialize an
  * artifact (index, shard set) as part of their round trip — single
  * owner of the concurrency rule: the path is keyed by query name +
  * data dir AND the session's applicationId, so two concurrent
  * sessions on one machine (parallel test/bench runs) cannot delete
  * and rebuild under each other mid-query. Wiped on every call: the
  * query IS the build+read round trip (rebuilt by design), but
  * repeated calls in one session must not accumulate copies.
  */
private[queries] object Scratch {

  def wiped(s: SparkSession, name: String, dir: String): String = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_" + s.sparkContext.applicationId + "_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")).toString
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    path
  }
}
