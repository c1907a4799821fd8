package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Ann, Pq}

/** Parameter sweep behind the shipped ANN configs: prints recall@5 and
  * wall time for a grid of LSH / IVF settings against brute force on
  * `embeddings`. This is the measurement loop [[RecallBoard]] pins the
  * winners of — run it when retuning, read the (recall, seconds) pairs,
  * move the chosen params into the oracle queries + RecallBoard + the
  * spec floors. Not part of any gate.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.t(spark, sfDir, "embeddings")
    val base = e.filter(col("vec_id") >= 10)
    val qs = e.filter(col("vec_id") < 10)
    val k = 5
    val exact = Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), k)
    exact.cache().count()

    def timeRecall(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = RecallBoard.recallAtK(exact, df, k)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] $name%-46s recall@5=$r%.3f  ${sec}%.2fs")
    }

    for {
      bits <- Seq(4, 5)
      tables <- Seq(4, 6)
      radius <- Seq(1, 2)
    } timeRecall(s"lsh bits=$bits tables=$tables radius=$radius",
      Ann.knnLsh(base, col("vec_id"), col("embedding"),
        qs, col("vec_id"), col("embedding"), k, bits, tables,
        multiprobe = true, probeRadius = radius))

    for ((nlist, nprobe) <- Seq((8, 6), (8, 7), (16, 10), (16, 12), (32, 20)))
      timeRecall(s"ivf nlist=$nlist nprobe=$nprobe",
        Ann.knnIvf(base, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k, nlist = nlist, nprobe = nprobe))

    for { kSub <- Seq(24, 32); shortlist <- Seq(100, 150, 200, 300, 400, 600) }
      timeRecall(s"pq m=8 kSub=$kSub shortlist=$shortlist",
        Pq.knnPq(base, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k,
          m = 8, kSub = kSub, shortlist = shortlist, maxFit = 20000L))

    for { (nlist, nprobe) <- Seq((8, 6), (8, 7), (16, 12)); shortlist <- Seq(150, 200, 300, 400) }
      timeRecall(s"ivfpq nlist=$nlist nprobe=$nprobe m=8 kSub=32 shortlist=$shortlist",
        Pq.knnIvfPq(base, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k,
          nlist = nlist, nprobe = nprobe, m = 8, kSub = 32,
          shortlist = shortlist, maxFit = 20000L))

    for { (nlist, nprobe) <- Seq((8, 6), (8, 7), (16, 12)); shortlist <- Seq(50, 100, 200) }
      timeRecall(s"ivfsq8 nlist=$nlist nprobe=$nprobe shortlist=$shortlist",
        graft.operators.Sq.knnIvfSq8(base, col("vec_id"), col("embedding"),
          qs, col("vec_id"), col("embedding"), k,
          nlist = nlist, nprobe = nprobe, shortlist = shortlist))

    spark.stop()
  }
}
