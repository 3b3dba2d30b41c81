package graft.hll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/**
 * xxHash64-based hash over Spark internal values, specialized for
 * cardinality sketching.
 *
 * Spark's built-in hash expressions are unsuitable for distinct counting in
 * two ways, both fixed here (semantics follow the reference library, see
 * reference alchemy/src/main/scala/com/swoop/alchemy/spark/expressions/hll/CardinalityHashFunction.scala:13-34):
 *
 *  1. Built-in hashing passes the seed through unchanged for `null`, so
 *     `[]`, `[null]` and `[null, null]` all hash alike. Here `null`
 *     contributes `hashLong(seed, seed)` instead.
 *  2. Built-in hashing gives the same hash to e.g. `0L` and `false` at the
 *     same seed. Here every container/variable-width runtime class mixes a
 *     distinct type tag into the seed, so `null` ≠ `""` ≠ empty array ≠
 *     empty map at any position, and struct field order matters.
 *
 * Tag constants and the non-zero default seed are kept identical to the
 * reference (CardinalityHashFunction.scala:23-28, HLLFunctions.scala:82-86)
 * so sketches built by either library over the same rows agree bit-for-bit.
 */
object SketchHash {

  /** Non-zero default seed: seeding with 0 makes the hash of an empty byte
   * sequence 0, whose 64 leading zeros wreck small HLL estimates. */
  val DefaultSeed: Long = 6705405522910076594L

  private final val BinaryTag = -3698894927619418744L
  private final val StringTag = -8468821688391060513L
  private final val ArrayTag = -1666055126678331734L
  private final val MapTag = 5587693012926141532L
  private final val StructTag = -891294170547231607L

  /** Hash with the default sketch seed. */
  def hashValue(value: Any, dataType: DataType): Long = hash(value, dataType, DefaultSeed)

  def hash(value: Any, dataType: DataType, seed: Long): Long = value match {
    case null => XXH64.hashLong(seed, seed)
    case b: Boolean => XXH64.hashInt(if (b) 1 else 0, seed)
    case b: Byte => XXH64.hashInt(b.toInt, seed)
    case s: Short => XXH64.hashInt(s.toInt, seed)
    case i: Int => XXH64.hashInt(i, seed)
    case l: Long => XXH64.hashLong(l, seed)
    case f: Float =>
      XXH64.hashInt(java.lang.Float.floatToIntBits(if (f == -0.0f) 0.0f else f), seed)
    case d: Double =>
      XXH64.hashLong(java.lang.Double.doubleToLongBits(if (d == -0.0d) 0.0d else d), seed)
    case d: Decimal => hashDecimal(d, dataType, seed)
    case c: CalendarInterval =>
      XXH64.hashInt(c.months, XXH64.hashInt(c.days, XXH64.hashLong(c.microseconds, seed)))
    case bytes: Array[Byte] =>
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length,
        XXH64.hashLong(BinaryTag, seed))
    case str: UTF8String =>
      XXH64.hashUnsafeBytes(str.getBaseObject, str.getBaseOffset, str.numBytes(),
        XXH64.hashLong(StringTag, seed))
    case arr: ArrayData =>
      val et = elementType(dataType)
      var acc = XXH64.hashLong(ArrayTag, seed)
      var i = 0
      while (i < arr.numElements()) {
        acc = hash(arr.get(i, et), et, acc)
        i += 1
      }
      acc
    case map: MapData =>
      val (kt, vt) = keyValueTypes(dataType)
      val keys = map.keyArray()
      val values = map.valueArray()
      var acc = XXH64.hashLong(MapTag, seed)
      var i = 0
      while (i < map.numElements()) {
        acc = hash(keys.get(i, kt), kt, acc)
        acc = hash(values.get(i, vt), vt, acc)
        i += 1
      }
      acc
    case row: InternalRow =>
      val fieldTypes = structFieldTypes(dataType)
      var acc = XXH64.hashLong(StructTag, seed)
      var i = 0
      while (i < row.numFields) {
        acc = hash(row.get(i, fieldTypes(i)), fieldTypes(i), acc)
        i += 1
      }
      acc
    case other =>
      throw new UnsupportedOperationException(
        s"Cannot hash ${other.getClass.getName} of type ${dataType.catalogString} for sketching")
  }

  private def hashDecimal(d: Decimal, dataType: DataType, seed: Long): Long = {
    val precision = dataType match {
      case dt: DecimalType => dt.precision
      case _ => DecimalType.MAX_PRECISION
    }
    if (precision <= Decimal.MAX_LONG_DIGITS) {
      XXH64.hashLong(d.toUnscaledLong, seed)
    } else {
      val bytes = d.toJavaBigDecimal.unscaledValue().toByteArray
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)
    }
  }

  private def elementType(dataType: DataType): DataType = dataType match {
    case ArrayType(et, _) => et
    case udt: UserDefinedType[_] => elementType(udt.sqlType)
    case other => throw new UnsupportedOperationException(s"Not an array type: $other")
  }

  private def keyValueTypes(dataType: DataType): (DataType, DataType) = dataType match {
    case MapType(kt, vt, _) => (kt, vt)
    case udt: UserDefinedType[_] => keyValueTypes(udt.sqlType)
    case other => throw new UnsupportedOperationException(s"Not a map type: $other")
  }

  private def structFieldTypes(dataType: DataType): Array[DataType] = dataType match {
    case st: StructType => st.fields.map(_.dataType)
    case udt: UserDefinedType[_] => structFieldTypes(udt.sqlType)
    case other => throw new UnsupportedOperationException(s"Not a struct type: $other")
  }
}
