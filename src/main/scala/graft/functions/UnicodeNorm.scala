package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.text.Normalizer

/** Unicode normalization kernels — text-cleaning primitives for
  * multilingual corpora that Spark has no built-ins for. Modes:
  *  - "nfc"/"nfd"/"nfkc"/"nfkd": canonical/compat (de)composition
  *  - "strip_accents": NFD + drop combining marks ("café" -> "cafe")
  * Matches DuckDB's nfc_normalize / strip_accents (the oracle). */
object UnicodeNormAlgo {
  def normalize(s: UTF8String, mode: UTF8String): UTF8String = {
    val str = s.toString
    val out = mode.toString match {
      case "nfc" => Normalizer.normalize(str, Normalizer.Form.NFC)
      case "nfd" => Normalizer.normalize(str, Normalizer.Form.NFD)
      case "nfkc" => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case "nfkd" => Normalizer.normalize(str, Normalizer.Form.NFKD)
      case "strip_accents" =>
        Normalizer.normalize(str, Normalizer.Form.NFD)
          .replaceAll("\\p{M}+", "")
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    }
    UTF8String.fromString(out)
  }
}

/** unicode_norm(text, mode) -> normalized text. */
case class UnicodeNorm(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def nullSafeEval(l: Any, r: Any): Any =
    UnicodeNormAlgo.normalize(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.UnicodeNormAlgo.normalize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNorm =
    copy(left = newLeft, right = newRight)
}

object UnicodeNorm {
  def unicode_norm(text: Column, mode: String): Column =
    GraftBridge.column(UnicodeNorm(GraftBridge.expression(text),
      GraftBridge.expression(org.apache.spark.sql.functions.lit(mode))))
}
