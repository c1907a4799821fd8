package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unicode_norm(text, form)` — Unicode normalization (NFC/NFD/NFKC/
  * NFKD) as a native Catalyst expression with `doGenCode`.
  *
  * Training-data pipelines normalize text BEFORE hashing, shingling, or
  * tokenizing: the same visible string in composed ("é") and decomposed
  * ("e" + U+0301) encodings would otherwise fingerprint as two distinct
  * documents and defeat exact dedup. The reference normalizes content
  * strings before hashing (see /root/reference/src/etl.py string
  * cleaning); this expression is the corpus-scale form of that step.
  *
  * Spark ships no normalization function, and a Scala UDF would box a
  * String per row. This expression stays inside whole-stage codegen and
  * takes an ASCII fast path: `UTF8String.isFullAscii` is a vectorized
  * byte scan, and every normalization form is the identity on ASCII, so
  * the overwhelmingly-ASCII bulk of a web corpus pays one scan and ZERO
  * allocation per row; only rows that actually contain multi-byte
  * sequences pay the JDK normalizer round trip.
  *
  * Engine parity: `java.text.Normalizer` implements UAX #15 canonical/
  * compatibility normalization, the same standard DuckDB's
  * `nfc_normalize` (utf8proc) implements — the t15 oracle pins the NFC
  * form bit-for-bit against it on synthesized decomposed text.
  */
case class UnicodeNorm(child: Expression, form: String) extends UnaryExpression {
  require(UnicodeNorm.Forms.contains(form),
    s"unicode_norm form must be one of ${UnicodeNorm.Forms.mkString("/")}, got $form")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_norm requires a STRING input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.norm(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.expr.UnicodeNorm.norm($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNorm =
    copy(child = newChild)
}

object UnicodeNorm {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static hot-path entry shared by interpreted eval and codegen. */
  def norm(s: UTF8String, form: String): UTF8String = {
    // every form is the identity on pure-ASCII input; isFullAscii is a
    // word-at-a-time byte scan with no allocation
    if (s.isFullAscii) s
    else {
      val f = Normalizer.Form.valueOf(form)
      val str = s.toString
      // isNormalized is a cheap quick-check pass; skip the rebuild when
      // the (non-ASCII) string is already in normal form
      if (Normalizer.isNormalized(str, f)) s
      else UTF8String.fromString(Normalizer.normalize(str, f))
    }
  }
}
