package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic shuffle + token-budget shard packing — the "write
  * training shards" tail of a data pipeline.
  *
  * Training runs want the corpus (a) in a reproducible pseudo-random
  * order (data order is part of the training recipe) and (b) chopped
  * into fixed-token-budget shards (concatenate-and-chop packing). Both
  * must be deterministic under task retries and re-runs, so ordering by
  * `rand()` or `monotonically_increasing_id()` is wrong — the order key
  * is `h60(salt:id)`: changing `salt` draws an independent permutation,
  * same salt reproduces the same shards bit-for-bit on any cluster
  * (same argument as [[Sampling]]).
  *
  * Scale shape: one shuffle. Docs are hash-bucketed into `nBuckets`
  * independent streams (bucket = key mod nBuckets); within a bucket the
  * prefix-token sum runs as a window over (bucket) ordered by the
  * shuffle key — a distributed sort + per-partition running sum that
  * spills. A doc starts in shard `floor(prefixTokens / budget)` of its
  * bucket. `nBuckets` bounds both parallelism and the sequential stream
  * length: size it to the cluster (thousands at 100 TB), not to the
  * shard count — shards are unbounded per bucket.
  */
object Packing {

  /** Assign every doc a (bucket, shard, start_tok) under
    * concatenate-and-chop packing in deterministic shuffled order.
    *
    * Null token counts propagate as null start_tok/shard for THAT row
    * (window sum skips nulls, so later docs in the bucket are unaffected)
    * — garbage in, visibly-null out, never a silently shifted shard
    * boundary.
    *
    * Returns one row per input doc: doc_id, n_tokens, bucket, shard,
    * start_tok (token offset of the doc within its bucket's stream).
    */
  def packShards(
      df: DataFrame,
      id: Column,
      tokens: Column,
      budget: Long,
      nBuckets: Int,
      salt: String): DataFrame = {
    require(budget > 0, s"shard token budget must be positive, got $budget")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val key = Hashing.h60(concat(lit(salt + ":"), id.cast("string")))
    // doc_id tiebreak: h60 collisions must not make the order ambiguous
    val w = Window.partitionBy("bucket").orderBy(col("__key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(id.as("doc_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("__key", key)
      .withColumn("bucket", pmod(col("__key"), lit(nBuckets.toLong)))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard", floor(col("start_tok") / budget))
      .drop("__key")
  }
}
