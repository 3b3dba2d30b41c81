package graft.queries

import org.apache.spark.sql.types._

/**
 * Engine-side enforcement of the output-type contract (FIXTURES.md §4):
 * no harness query may ship a `DecimalType` column in its FINAL schema,
 * top-level or nested — wide decimals diverge in physical representation
 * across engine boundaries (Spark parquet DECIMAL vs DuckDB HUGEINT
 * renderings), which is exactly the class that cost 8 driver-hash rows
 * in round 14. Exact decimal(38,0) arithmetic stays INTERNAL; final
 * projections narrow to BIGINT, or STRING where true int128 headroom is
 * required.
 *
 * Until this object existed the contract was enforced only in the
 * Python replica (`tools/check_oracle.py`), i.e. post-hoc: a new query
 * registering a wide final projection sailed through `sbt test` and
 * failed at the driver. [[graft.Verify]] now refuses to dump such a
 * query (gate 3 goes red locally), and OutputTypeContractSpec pins the
 * detector itself red-then-green.
 */
object OutputTypeContract {

  /** Every path inside `schema` typed as a decimal — struct fields,
   * array elements, and map keys/values included. Empty = compliant. */
  def decimalPaths(schema: StructType): Seq[String] = {
    def walk(dt: DataType, path: String): Seq[String] = dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f => walk(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => walk(a.elementType, s"$path[]")
      case m: MapType =>
        walk(m.keyType, s"$path<key>") ++ walk(m.valueType, s"$path<value>")
      case _ => Nil
    }
    schema.fields.toSeq.flatMap(f => walk(f.dataType, f.name))
  }

  /** Hard-fail form: throws with every offending path named, so the
   * author sees the full repair list in one run. */
  def assertNoDecimals(name: String, schema: StructType): Unit = {
    val bad = decimalPaths(schema)
    if (bad.nonEmpty) throw new IllegalStateException(
      s"output-type contract violation in $name: DecimalType in the " +
        s"final schema at [${bad.mkString(", ")}] — narrow to BIGINT " +
        "(or STRING for int128 headroom) before the final projection; " +
        "see FIXTURES.md §4")
  }
}
