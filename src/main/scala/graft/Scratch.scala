package graft

import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Text}

/** Dev-only scratch main for profiling operator pieces. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($n rows)")
    }

    val docs = Tables.t(spark, dir, "documents")

    // does Generate re-evaluate its child expression per output row?
    val exA = docs.select(col("doc_id"),
      explode_outer(Text.tokens(Text.normalize(col("text")))).as("tok"))
    time("explode_inline")(exA.count())
    time("explode_inline2")(exA.count())
    val toked = docs.select(col("doc_id"),
      Text.tokens(Text.normalize(col("text"))).as("toks")).cache()
    toked.count()
    val exB = toked.select(col("doc_id"), explode_outer(col("toks")).as("tok"))
    time("explode_cached")(exB.count())

    time("d05_simhashes")(queries.DedupQueries.d05Simhashes(spark, dir).count())
    time("v04")(queries.VectorQueries.v04EmbeddingNeardup(spark, dir).count())
    time("v04_again")(queries.VectorQueries.v04EmbeddingNeardup(spark, dir).count())
    spark.stop()
  }
}
