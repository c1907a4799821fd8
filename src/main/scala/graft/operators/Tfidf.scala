package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.Text

/** TF-IDF keyword extraction — the classic "what is this document
  * about" signal: per document, the top-k terms by
  * tf · ln((N+1)/(df+1)), with each score micro-rounded so the ranking
  * is engine-replayable (the t09 discipline applied to IDF).
  *
  * Scale shape: term frequencies aggregate map-side (hot boilerplate
  * terms collapse to one partial row per partition); the DF table is
  * the MODEL — one row per distinct term, vocabulary-bounded — and
  * joins back as a BROADCAST, so the corpus-side term stream never
  * repartitions by term key and hot-term join skew cannot exist (the
  * [[LangModel]] posture; a vocabulary past broadcast capacity needs
  * the [[Bm25]] bucketed-postings layout instead — that operator
  * already exists for the retrieval-scale case). The top-k window
  * partitions by doc_id — bounded by each document's own vocabulary,
  * never corpus-wide.
  */
object Tfidf {

  /** Top-k terms per document: (doc_id, rank, term, tf, df,
    * score_micro). Token-less documents produce no rows; N counts
    * documents with at least one token.
    */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = Dedup.scopedCache(
      docs.select(id.as("doc_id"), Text.tokens(Text.normalize(text)).as("toks"))
        .filter(col("toks").isNotNull && size(col("toks")) > 0)
        .select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val n = terms.select("doc_id").distinct().count()
    val dfT = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("score_micro").desc, col("term"))
    terms.join(broadcast(dfT), "term")
      .withColumn("score_micro",
        round(col("tf").cast("double") *
          log(lit((n + 1).toDouble) / (col("df").cast("double") + lit(1.0))) *
          lit(1000000.0)).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score_micro")
  }
}
