package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Trainable byte-pair-encoding tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909) — the real token-counting surface of a training
  * pipeline ([[Text.subwordCount]] is the regex approximation; this is
  * the learned one, with the fit/transform split every model here has).
  *
  * Division of labor:
  *
  *  - `fit` reduces the corpus to a WORD-FREQUENCY table in one
  *    distributed pass (tokenize → explode → count — the [[LangModel]]
  *    shape; shuffle carries (word, count), never documents), keeps the
  *    top `maxWords` rows (BPE training only needs the frequency dict,
  *    the Sennrich formulation), and runs the merge loop driver-side:
  *    count adjacent symbol pairs weighted by word frequency, merge the
  *    most frequent pair, repeat. Deterministic tie-break (max count,
  *    then lexicographically smallest pair) makes the fit a pure
  *    function of the word-count table.
  *  - `encode`/`tokenCount` apply the learned merges executor-side with
  *    the standard greedy-by-rank algorithm (always merge the
  *    lowest-rank pair present). The merge table is closure-shipped
  *    (bounded by `numMerges` — kilobytes), and a per-JVM memo caches
  *    word → segmentation: corpora are Zipfian, so the cache hit rate
  *    approaches 1 and per-row work approaches a hash lookup.
  *
  * Words end with the `</w>` marker symbol, so merges can learn
  * word-final units ("ing</w>") distinct from word-internal ones — the
  * reference formulation. Correctness gates: t11 dumps the merge table
  * AND the segmentations, and its oracle re-proves in SQL that every
  * segmentation concatenates back to EXACTLY the tokenized source text,
  * that every emitted multi-char token is a merge output, and that the
  * merge table is closed under its own ranks; the greedy-apply order
  * itself is pinned by hand-computed BpeSpec cases.
  */
object Bpe {

  val EndOfWord = "</w>"

  final case class BpeModel(merges: IndexedSeq[(String, String)]) {
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    def vocabSize: Int = merges.size
    // driver-assigned memo identity: a 32-bit CONTENT hash of the merge
    // table could collide across two different models inside one
    // long-lived executor JVM and silently cross-contaminate cached
    // segmentations; a process-unique counter cannot. (Two model
    // instances with identical merges get distinct uids — only cache
    // sharing is lost, never correctness.)
    val uid: Long = BpeModel.nextUid.getAndIncrement()
  }

  object BpeModel {
    private val nextUid = new java.util.concurrent.atomic.AtomicLong(0L)
  }

  /** Learn `numMerges` merges from the corpus. `maxWords` caps the
    * driver-side frequency dict (top rows by count — the tail
    * contributes negligible pair mass); `minPairCount` stops early when
    * no pair repeats enough to matter.
    */
  def fit(
      df: DataFrame, text: Column, numMerges: Int,
      maxWords: Int = 30000, minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val words = df
      .select(explode(Text.tokens(Text.normalize(text))).as("w"))
      .filter(col("w").isNotNull && col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    fitFromWordCounts(words, numMerges, minPairCount)
  }

  /** The driver-side merge loop over an explicit word-frequency table —
    * split out so specs can pin exact merge sequences on hand counts.
    */
  def fitFromWordCounts(
      words: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long = 2L): BpeModel = {
    var seqs: Array[(Array[String], Long)] = words.map { case (w, n) =>
      (w.map(_.toString).toArray :+ EndOfWord, n)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        // deterministic argmax: max count, then smallest pair
        val best = counts.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
            (b._2 == a._2 &&
              (b._1._1 < a._1._1 ||
                (b._1._1 == a._1._1 && b._1._2 < a._1._2)))) b
          else a
        }
        if (best._2 < minPairCount) continue = false
        else {
          merges += best._1
          seqs = seqs.map { case (syms, n) =>
            (mergeOnce(syms, best._1._1, best._1._2), n)
          }
        }
      }
    }
    require(merges.nonEmpty,
      "BPE fit produced no merges -- corpus too small or minPairCount too high")
    BpeModel(merges.toIndexedSeq)
  }

  /** Merge every (left-to-right, non-overlapping) occurrence of the
    * adjacent pair (a, b) in one pass.
    */
  private def mergeOnce(
      syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy-by-rank segmentation of one word (chars + `</w>`; always
    * merge the LOWEST-rank pair present, all its occurrences, repeat) —
    * the standard BPE apply, a pure function of (word, merge table).
    */
  private[graft] def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestA = syms(i); bestB = syms(i + 1) }
        }
        i += 1
      }
      if (bestA == null) done = true
      else syms = mergeOnce(syms, bestA, bestB)
    }
    syms
  }

  // per-JVM Zipf memo: word → segmentation, shared across tasks of the
  // same model (keyed by the model's driver-assigned unique uid so two
  // models never cross-contaminate — a content hashCode could collide);
  // bounded by wipe-on-overflow
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Array[String]]()
  private val MemoCap = 1 << 20

  private def encodeCached(
      word: String, modelKey: Long,
      ranks: Map[(String, String), Int]): Array[String] = {
    val k = (modelKey, word)
    val hit = memo.get(k)
    if (hit != null) hit
    else {
      val seg = encodeWord(word, ranks)
      if (memo.size() > MemoCap) memo.clear()
      memo.put(k, seg)
      seg
    }
  }

  /** Append `outCol` = the BPE token array of `text` (normalized,
    * whitespace-tokenized, each word segmented). Null text → empty
    * array (the tokenless contract of [[Text.tokens]]).
    */
  def encode(
      df: DataFrame, text: Column, model: BpeModel,
      outCol: String = "bpe_tokens"): DataFrame = {
    val ranks = model.ranks
    val modelKey = model.uid
    val enc = udf { words: Seq[String] =>
      if (words == null) Seq.empty[String]
      else words.flatMap(w =>
        if (w == null || w.isEmpty) Nil
        else encodeCached(w, modelKey, ranks).toSeq)
    }
    df.withColumn(outCol, enc(Text.tokens(Text.normalize(text))))
  }

  /** Learned-subword token count — the budget column shard packing and
    * sampling consume at the fidelity a real tokenizer gives.
    */
  def tokenCount(
      df: DataFrame, text: Column, model: BpeModel,
      outCol: String = "bpe_count"): DataFrame =
    encode(df, text, model, "__bpe_toks")
      .withColumn(outCol, size(col("__bpe_toks")))
      .drop("__bpe_toks")

  /** Persist the merge table (rank, a, b) — kilobytes, one write. */
  def saveModel(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted merge table, refusing non-contiguous ranks (a
    * half-written lake would silently change every segmentation).
    */
  def loadModel(spark: SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .select("rank", "a", "b").collect().sortBy(_.getInt(0))
    require(rows.nonEmpty && rows.map(_.getInt(0)).toSeq == (0 until rows.length),
      s"$path merge ranks are not contiguous 0..${rows.length - 1} -- " +
        "refusing a half-written model; re-run saveModel")
    BpeModel(rows.map(r => (r.getString(1), r.getString(2))).toIndexedSeq)
  }
}
