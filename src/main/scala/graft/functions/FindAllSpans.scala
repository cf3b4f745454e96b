package graft.functions

import graft.text.PyStr
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Python-`str.find`-resume span grounding
  * (`ref: ai/extractor_ner.py:104-112` semantics: scan left-to-right,
  * resume at the END of each match — non-overlapping occurrences).
  *
  * This is tier (b) of the extension preference order (a custom
  * `Expression` with `doGenCode`, not a Scala UDF): the generated code
  * calls a static helper and the value stays inside the whole-stage-codegen
  * pipeline — no ScalaUDF boxing, no `BatchEvalPython`, null-safety
  * compiled in. Returns `ARRAY<STRUCT<begin_c INT, end_c INT>>`.
  */
case class FindAllSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = FindAllSpans.SpanArrayType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"find_all_native expects (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(text: Any, needle: Any): Any =
    FindAllSpans.compute(text.asInstanceOf[UTF8String], needle.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) =>
      s"graft.functions.FindAllSpans.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FindAllSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "find_all_native"
}

object FindAllSpans {

  val SpanArrayType: ArrayType = ArrayType(StructType(Seq(
    StructField("begin_c", IntegerType, nullable = false),
    StructField("end_c", IntegerType, nullable = false))), containsNull = false)

  /** Static entry the generated code calls — the find-resume loop itself
    * is the proven [[PyStr.findAll]] (500-case differential fuzz vs the
    * reference implementation). Offsets are CHARACTER offsets, matching
    * Python string indexing (UTF8String → String conversion). */
  def compute(text: UTF8String, needle: UTF8String): ArrayData = {
    val t = text.toString
    val n = needle.toString
    if (n.isEmpty) return new GenericArrayData(Array.empty[Any])
    val spans = PyStr.findAll(t, n)
    new GenericArrayData(spans.map { case (b, e) =>
      InternalRow(b, e)
    }.toArray[Any])
  }
}
