package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.types.StructType

/** Shared Row→InternalRow partition reader for the DSv2 faces of the
  * function-style sources (FlatGeobuf / Shapefile / Arrow IPC): projects a
  * full-width decoded [[Row]] stream down to the required columns
  * (`outIdx` into the full schema) and converts each value to its Catalyst
  * representation via [[CatalystTypeConverters]] (String→UTF8String,
  * Decimal, date/time, …). One implementation, three sources — a
  * conversion fix lands everywhere at once. */
private[sources] final class RowPartitionReader(
    rows: Iterator[Row],
    outIdx: Array[Int],
    required: StructType) extends PartitionReader[InternalRow] {

  private val conv = required.fields.map(f =>
    CatalystTypeConverters.createToCatalystConverter(f.dataType))
  private var row: Row = _

  override def next(): Boolean = { val h = rows.hasNext; if (h) row = rows.next(); h }

  override def get(): InternalRow = {
    val vals = new Array[Any](outIdx.length)
    var i = 0
    while (i < outIdx.length) {
      val v = row.get(outIdx(i))
      vals(i) = if (v == null) null else conv(i)(v)
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = ()
}
