package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch main for profiling operator pieces. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    import graft.functions.Text

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    val docs = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), concat_ws("|", col("lang"), col("source")).as("blk"),
        Text.shingleSet(col("text"), 3).as("sh"))

    time("shingleSet")(docs.count())
    time("shingleSet2")(docs.count())
    val ex = docs.select(col("doc_id"), col("blk"), explode(col("sh")).as("shingle"))
    time("explode")(ex.count())
    val j = ex.as("a").join(ex.as("b"),
      col("a.blk") === col("b.blk") && col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
    time("selfjoin")(j.count())
    val pairs = j.groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    time("pairs")(pairs.count())
    time("full_d02")(graft.queries.DedupQueries.d02JaccardPairs(spark, dir).count())
    spark.stop()
  }
}
