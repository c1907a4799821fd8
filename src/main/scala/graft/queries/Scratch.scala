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
private[graft] object Scratch {

  /** Paths this JVM created, removed by one shutdown hook: the appId
    * key means no OTHER live session's scratch is ever touched, so the
    * per-run copies would otherwise accumulate in tmpdir forever
    * (nightly bench cadence → a full index copy per run until the disk
    * fills). A kill -9 still leaks one run's worth — acceptable, and
    * the next same-session name+dir call wipes its own path anyway.
    */
  private val created = scala.collection.mutable.Set.empty[String]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      created.synchronized(created.toList).foreach { p =>
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        try rm(new java.io.File(p)) catch { case _: Throwable => () }
      }))

  def wiped(s: SparkSession, name: String, dir: String): String = {
    val local = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_${name}_" + s.sparkContext.applicationId + "_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_"))
    // explicit file: scheme — the scratch lives in the LOCAL tmpdir by
    // construction, and a bare path would resolve against fs.defaultFS
    // (HDFS on a real cluster), splitting the writes from the
    // java.io.File shutdown cleanup
    val path = "file:" + local.getAbsolutePath
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
    hookInstalled
    created.synchronized(created += local.getAbsolutePath)
    path
  }
}
