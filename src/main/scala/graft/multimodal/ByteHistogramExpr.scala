package graft.multimodal

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** High-nibble histogram of a binary payload as one native pass: a 16-long
  * array where slot v counts bytes whose high nibble is v. Replaces the
  * composed hex + 16-higher-order-filter form (kept as the cross-check in
  * [[Multimodal.withByteFeaturesHof]]), which re-scanned the nibble array
  * 16 times per row.
  */
case class ByteHistogram16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_histogram16"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) >> 4) & 0xf) += 1
      i += 1
    }
    new GenericArrayData(counts.map(Long.box(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): ByteHistogram16 =
    copy(child = newChild)
}
