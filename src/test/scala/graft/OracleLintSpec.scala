package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-type lint (VERDICT r9 task #2, widened per r10 task #2):
  * every `SparkEntry.oracleSql` entry must bind in DuckDB and must not
  * emit ANY output column wider than 64 bits — HUGEINT/UHUGEINT (the
  * r9 `graph_hits` red row) or DECIMAL precision > 18 (the r10
  * `q9`/`events_rate_outliers` red rows). The driver's Arrow
  * canonicalization hashes 128-bit values differently from the local
  * Python fetch, so rows/schema match while the hash flips; 128-bit
  * arithmetic must stay internal and the final projection cast down.
  * Running `DESCRIBE` over each oracle catches the whole class, plus
  * plain SQL syntax/binding errors, without materializing results.
  * The SPARK side of the same contract is enforced in-JVM below: no
  * `queries` result schema may carry a DecimalType wider than 18
  * digits anywhere in its output tree.
  *
  * Shells out to python3+duckdb (the same stack as the driver's
  * compare); cancels rather than fails if that stack is absent.
  */
class OracleLintSpec extends AnyFunSuite {

  private def pythonOk: Boolean =
    try Seq("python3", "-c", "import duckdb").! == 0
    catch { case _: Throwable => false }

  private def runLint(json: String): (Int, String) = {
    val out = new StringBuilder
    val code = Seq("python3", "tools/lint_oracle_types.py",
      SharedSpark.sfDir, json)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    (code, out.toString)
  }

  test("all oracles bind in DuckDB with no >64-bit output columns") {
    assume(pythonOk, "python3+duckdb not available in this environment")
    val json = Files.createTempFile("oracle_sql", ".json")
    try {
      Files.writeString(json, Verify.oracleJson())
      val (code, out) = runLint(json.toString)
      assert(code == 0, s"oracle type lint failed:\n$out")
    } finally Files.deleteIfExists(json)
  }

  test("lint rejects a planted DECIMAL(38,0) output column") {
    assume(pythonOk, "python3+duckdb not available in this environment")
    val json = Files.createTempFile("oracle_sql_neg", ".json")
    try {
      Files.writeString(json,
        """{"planted_decimal128": "SELECT CAST(sum(l_quantity) AS DECIMAL(38,0)) AS s FROM lineitem"}""")
      val (code, out) = runLint(json.toString)
      assert(code != 0, "lint must fail on a decimal128 output column")
      assert(out.contains("planted_decimal128"), s"unexpected output:\n$out")
    } finally Files.deleteIfExists(json)
  }

  test("lint rejects a planted HUGEINT output column") {
    assume(pythonOk, "python3+duckdb not available in this environment")
    val json = Files.createTempFile("oracle_sql_neg2", ".json")
    try {
      Files.writeString(json,
        """{"planted_int128": "SELECT sum(CAST(l_quantity AS BIGINT)) AS s FROM lineitem"}""")
      val (code, out) = runLint(json.toString)
      assert(code != 0, "lint must fail on an int128 output column")
    } finally Files.deleteIfExists(json)
  }

  test("no Spark query result schema carries a >64-bit column") {
    import org.apache.spark.sql.types._
    def wide(dt: DataType): Boolean = dt match {
      case d: DecimalType => d.precision > 18
      case a: ArrayType => wide(a.elementType)
      case m: MapType => wide(m.keyType) || wide(m.valueType)
      case s: StructType => s.fields.exists(f => wide(f.dataType))
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val schema = fn(SharedSpark.spark, SharedSpark.sfDir).schema
        val cols = schema.fields.filter(f => wide(f.dataType))
        if (cols.isEmpty) None
        else Some(s"$name: ${cols.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      "decimal128 outputs hash-flip under the driver's Arrow canon — " +
        "cast the final projection to long/double/string:\n" +
        offenders.mkString("\n"))
  }
}
