package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(tokens, n)` — space-joined word n-gram array of an
  * `array<string>` token list as ONE native pass, replacing the
  * n−1-chained `zip_with` folds of
  * [[graft.functions.Text.shinglesOfToks]]: those higher-order
  * functions are CodegenFallback, so every shingle construction paid
  * (n−1) interpreted boxed-lambda walks of the token array — the shared
  * cost under EVERY shingle consumer (n-gram Jaccard, MinHash,
  * decontamination, fingerprint stats, bigram repetition). Same
  * disease/cure as [[MinHashSig]]/[[SimHash60]].
  *
  * Exact semantics parity with the HOF form (asserted by a differential
  * property spec):
  *   - NULL token array → `[""]` (the degenerate single-shingle set the
  *     HOF's `otherwise(array(concat_ws(" ", toks)))` produces when the
  *     `size >= n` condition evaluates NULL);
  *   - fewer than n tokens (including empty) → one shingle joining all
  *     NON-NULL tokens with single spaces (`concat_ws` semantics);
  *   - otherwise m−n+1 shingles, where shingle i joins tokens
  *     [i, i+n) with single spaces and is NULL if ANY token in its
  *     window is NULL (`concat` propagation through the zip_with fold).
  * Hence `nullable = false` (the ARRAY itself is never null) with
  * `containsNull = true` elements.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1 && n <= 64, s"word_ngrams n must be in [1, 64], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires an ARRAY<STRING> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    WordNgrams.grams(if (v == null) null else v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.expr.WordNgrams.grams(
            ${childGen.isNull} ? null : ${childGen.value}, $n);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  /** Static hot-path entry used by both interpreted eval and codegen. */
  def grams(a: ArrayData, n: Int): ArrayData = {
    if (a == null) return new GenericArrayData(Array[Any](Empty))
    val m = a.numElements()
    // materialize once: ArrayData.getUTF8String is a per-call decode
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    if (m < n) {
      // concat_ws semantics: join all non-null tokens with single spaces
      return new GenericArrayData(Array[Any](UTF8String.concatWs(Space, toks: _*)))
    }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      var hasNull = false
      var j = i
      while (j < i + n && !hasNull) { hasNull = toks(j) == null; j += 1 }
      out(i) =
        if (hasNull) null // concat propagation through the fold
        else if (n == 1) toks(i)
        else {
          val win = new Array[UTF8String](n)
          System.arraycopy(toks, i, win, 0, n)
          UTF8String.concatWs(Space, win: _*)
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}
