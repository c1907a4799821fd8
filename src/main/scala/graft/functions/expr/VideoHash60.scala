package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** `video_hash60(content[, nFrames])` — the temporal perceptual hash of
  * [[graft.multimodal.Media.videoHash60]] as a native codegen
  * expression: frame-sample the payload into `nFrames` byte windows
  * (the codec-dependent frame grab, deterministically stubbed — see the
  * Media scaladoc), average-hash each window (64-pixel even-stride
  * resample, bit j set iff pixel j > integer mean), majority-vote per
  * bit across frames. 60-bit so the value stays positive in any SQL
  * BIGINT ([[SimHash60]]'s convention).
  *
  * A plain Scala UDF would block whole-stage codegen around the m04
  * projection and pay serialization per row; this form is one static
  * call inside the generated code — the X4 preference order (native
  * Expression > Scala UDF) applied to the multimodal column family's
  * only pure-integer member. Bit-parity with
  * [[graft.multimodal.Media.videoHash60]] is asserted by a differential
  * property spec; the m04 DuckDB oracle replays the same arithmetic
  * from the blob hex dump.
  *
  * Null contract: NULL payload → 0 (the Media form's empty contract),
  * hence `nullable = false`. ImplicitCastInputTypes (not a bare
  * BinaryType check) so an UNTYPED SQL NULL — `video_hash60(NULL)` —
  * analyzes to the documented 0 instead of failing type check, and
  * string payloads coerce through the standard string→binary cast.
  */
case class VideoHash60(child: Expression, nFrames: Int = 8)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(nFrames >= 1, s"video_hash60 nFrames must be >= 1, got $nFrames")

  // return type inferred: AbstractDataType is private[sql], but the
  // inferred Seq[BinaryType.type] conforms to the parent signature
  override def inputTypes = Seq(BinaryType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "video_hash60"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else graft.multimodal.Media.videoHash60(v.asInstanceOf[Array[Byte]], nFrames)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = ${childGen.isNull} ? 0L :
          graft.multimodal.Media.videoHash60(${childGen.value}, $nFrames);
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): VideoHash60 =
    copy(child = newChild)
}
