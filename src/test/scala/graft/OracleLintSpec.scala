package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-type lint (VERDICT r9 task #2): every `SparkEntry.oracleSql`
  * entry must bind in DuckDB and must not emit an int128 output column.
  * DuckDB widens sum(BIGINT) to HUGEINT, which the driver's Arrow
  * canonicalization stringifies as a float — flipping the hash while
  * rows/schema still match (the r9 `graph_hits` red row). Running
  * `DESCRIBE` over each oracle catches the whole class, plus plain SQL
  * syntax/binding errors, without materializing any results.
  *
  * Shells out to python3+duckdb (the same stack as the driver's
  * compare); cancels rather than fails if that stack is absent.
  */
class OracleLintSpec extends AnyFunSuite {

  test("all oracles bind in DuckDB with no HUGEINT output columns") {
    val probe =
      try Seq("python3", "-c", "import duckdb").! == 0
      catch { case _: Throwable => false }
    assume(probe, "python3+duckdb not available in this environment")

    val json = Files.createTempFile("oracle_sql", ".json")
    try {
      Files.writeString(json, Verify.oracleJson())
      val out = new StringBuilder
      val code = Seq("python3", "tools/lint_oracle_types.py",
        SharedSpark.sfDir, json.toString)
        .!(ProcessLogger(l => out.append(l).append('\n')))
      assert(code == 0, s"oracle type lint failed:\n$out")
    } finally Files.deleteIfExists(json)
  }
}
