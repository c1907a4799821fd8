package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch main for profiling/debugging operator pieces. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    import spark.implicits._

    val dim = 16
    def vec(cluster: Int, j: Int): Array[Float] = {
      val a = new Array[Float](dim)
      a(cluster * 2) = 1.0f
      a(cluster * 2 + 1) = 0.5f
      a((cluster + j) % dim) = a((cluster + j) % dim) + 0.05f * ((j % 5) + 1)
      a
    }
    val rows = for (c <- 0 until 8; j <- 0 until 25) yield (c.toLong * 100 + j, vec(c, j))
    val df = rows.toDF("vec_id", "embedding")
    val base = df.filter(col("vec_id") % 100 >= 5)
    val qs = df.filter(col("vec_id") % 100 < 5)

    // replicate knnIvf internals with diagnostics
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val b = base.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      .withColumn("feat", array_to_vector(col("b_emb").cast("array<double>")))
    val km = new KMeans().setK(8).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("feat").setPredictionCol("cell")
    val model = km.fit(b.select("feat"))
    val assigned = model.transform(b).select(col("b_id"), col("cell"))
    println("== assigned cells per true cluster:")
    assigned.withColumn("truec", (col("b_id") / 100).cast("int"))
      .groupBy("truec").agg(collect_set("cell")).orderBy("truec").show(false)

    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }.toSeq
    val centDf = centroids.toDF("cell", "centroid")
    val q = qs.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probed = q.crossJoin(broadcast(centDf))
      .withColumn("csim", graft.functions.Vectors.cosine(col("q_emb"), col("centroid")))
    println("== probe sims for q_id=0:")
    probed.filter(col("q_id") === 0).select("cell", "csim").orderBy(desc("csim")).show(false)

    val out = operators.Ann.knnIvf(base, col("vec_id"), col("embedding"),
      qs, col("vec_id"), col("embedding"), k = 5, nlist = 8, nprobe = 2)
    println("== ivf for q 0:")
    out.filter(col("q_id") === 0).show(false)

    def topSets(d: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      d.select("q_id", "b_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(operators.Ann.knnBruteForce(
      base, col("vec_id"), col("embedding"), qs, col("vec_id"), col("embedding"), 5))
    val ivf = topSets(out)
    exact.toSeq.sortBy(_._1).take(6).foreach { case (qid, ex) =>
      println(s"== q$qid exact=$ex ivf=${ivf.getOrElse(qid, Set.empty)}")
    }
    val recall = exact.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty) intersect exact(q)).size.toDouble / 5
    }.sum / exact.size
    println(s"== recall=$recall")
    spark.stop()
  }
}
