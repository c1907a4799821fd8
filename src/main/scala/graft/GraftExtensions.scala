package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.expr.{MinHashSig, RollingHash, SignLsh, SimHash60, VecDot, VideoHash60, WordNgrams}

/** Engine extensions, installed via
  * `spark.sql.extensions=graft.GraftExtensions`: registers native
  * Catalyst expressions into the session FunctionRegistry so they are
  * first-class in SQL (`SELECT rolling_hash(text) FROM docs`) as well as
  * the Column API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(
        classOf[RollingHash].getName, null, "rolling_hash",
        "rolling_hash(str) - polynomial rolling hash of str's code points (base 31, mod 2^31-1)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"rolling_hash expects exactly 1 argument, got ${children.size}")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(
        classOf[VecDot].getName, null, "vec_dot",
        "vec_dot(a, b) - double-precision dot product of two float/double arrays " +
          "(strict left-to-right fold; NULL on length mismatch or null elements)",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"vec_dot expects exactly 2 arguments, got ${children.size}")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_lsh"),
      new ExpressionInfo(
        classOf[SignLsh].getName, null, "sign_lsh",
        "sign_lsh(vec, bits[, table]) - sign-hyperplane LSH bucket id (long) of a " +
          "float/double array; bits and table must be int literals",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2 || children.size == 3,
          s"sign_lsh expects 2 or 3 arguments, got ${children.size}")
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"sign_lsh $name must be an INT literal, got $other")
        }
        SignLsh(
          children.head,
          intLit(children(1), "bits"),
          if (children.size == 3) intLit(children(2), "table") else 0)
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(
        classOf[MinHashSig].getName, null, "minhash_sig",
        "minhash_sig(shingles, k) - k-permutation MinHash signature (array<long>) of an " +
          "array<string> shingle set; k must be an int literal; NULL for empty/all-null sets",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"minhash_sig expects exactly 2 arguments, got ${children.size}")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig k must be an INT literal, got $other")
        }
        MinHashSig(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash60"),
      new ExpressionInfo(
        classOf[SimHash60].getName, null, "simhash60",
        "simhash60(tokens) - 60-bit frequency-weighted SimHash (long) of an array<string> " +
          "token list; NULL/empty token arrays code to 0",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"simhash60 expects exactly 1 argument, got ${children.size}")
        SimHash60(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("video_hash60"),
      new ExpressionInfo(
        classOf[VideoHash60].getName, null, "video_hash60",
        "video_hash60(content[, nFrames]) - 60-bit temporal perceptual hash of a BINARY " +
          "payload (frame-sample, per-frame average-hash, per-bit majority vote); nFrames " +
          "must be an int literal (default 8); NULL/empty payloads hash to 0",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1 || children.size == 2,
          s"video_hash60 expects 1 or 2 arguments, got ${children.size}")
        val n = if (children.size == 2) children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"video_hash60 nFrames must be an INT literal, got $other")
        } else 8
        VideoHash60(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(
        classOf[WordNgrams].getName, null, "word_ngrams",
        "word_ngrams(tokens, n) - space-joined word n-grams (array<string>) of an " +
          "array<string> token list; n must be an int literal; <n tokens fall back to " +
          "one whole-text shingle",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"word_ngrams expects exactly 2 arguments, got ${children.size}")
        val n = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an INT literal, got $other")
        }
        WordNgrams(children.head, n)
      }))
  }
}
