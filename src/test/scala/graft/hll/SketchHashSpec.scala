package graft.hll

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Distinctness properties the sketches depend on (expected behavior from
 * the reference's hash tests, reference: CardinalityHashFunctionTest.scala:13-62). */
class SketchHashSpec extends AnyFunSuite {

  private val a = UTF8String.fromString("a")

  private def assertAllDistinct(values: Seq[Any], dataType: DataType): Unit = {
    val hashes = values.map(v => SketchHash.hash(v, dataType, 0L))
    assert(hashes.distinct.length == hashes.length,
      s"hash collisions among $values: $hashes")
  }

  test("null, empty binary, and one-byte binary all differ") {
    assertAllDistinct(Seq(null, Array.empty[Byte], Array(1.toByte)), BinaryType)
  }

  test("null, empty string, and 'a' all differ") {
    assertAllDistinct(Seq(null, UTF8String.fromString(""), a), StringType)
  }

  test("null array vs empty vs [null] vs [null,null] vs [a,null] vs [null,a]") {
    assertAllDistinct(Seq(
      null,
      ArrayData.toArrayData(Array.empty),
      ArrayData.toArrayData(Array(null)),
      ArrayData.toArrayData(Array(null, null)),
      ArrayData.toArrayData(Array(a, null)),
      ArrayData.toArrayData(Array(null, a))
    ), ArrayType(StringType))
  }

  test("null map vs empty map vs {null: null}") {
    assertAllDistinct(Seq(
      null,
      ArrayBasedMapData(Map.empty),
      ArrayBasedMapData(Map(null.asInstanceOf[String] -> null))
    ), MapType(StringType, StringType))
  }

  test("null struct vs struct(null) vs struct(a)") {
    assertAllDistinct(Seq(null, InternalRow(null), InternalRow(a)),
      new StructType().add("foo", StringType))
  }

  test("struct field order matters") {
    assertAllDistinct(Seq(InternalRow(null, a), InternalRow(a, null)),
      new StructType().add("foo", StringType).add("bar", StringType))
  }

  test("tagged types differ from primitives at the same position") {
    // Primitives intentionally share the reference's untagged hashing
    // (0 and false DO collide, as in the reference); only variable-width /
    // container runtime classes are tagged.
    val asInt = SketchHash.hash(0, IntegerType, 0L)
    val asStr = SketchHash.hash(UTF8String.fromString(""), StringType, 0L)
    val asBin = SketchHash.hash(Array.empty[Byte], BinaryType, 0L)
    val asArr = SketchHash.hash(ArrayData.toArrayData(Array.empty), ArrayType(IntegerType), 0L)
    assert(Seq(asInt, asStr, asBin, asArr).distinct.length == 4)
  }

  test("map entries chain key hash into value hash") {
    val m1 = ArrayBasedMapData(Map(UTF8String.fromString("a") -> UTF8String.fromString("B")))
    val m2 = ArrayBasedMapData(Map(UTF8String.fromString("b") -> UTF8String.fromString("A")))
    val t = MapType(StringType, StringType)
    assert(SketchHash.hash(m1, t, 0L) != SketchHash.hash(m2, t, 0L))
  }

  test("default seed is stable across calls") {
    assert(SketchHash.hashValue(42L, LongType) == SketchHash.hashValue(42L, LongType))
  }
}
