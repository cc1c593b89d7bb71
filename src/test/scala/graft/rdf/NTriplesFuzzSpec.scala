package graft.rdf

import graft.SharedSpark
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test: format→parse is the identity on arbitrary literal
  * content, including every escaping corner (backslash before 'n',
  * trailing backslashes, embedded quotes/newlines/tabs).
  */
class NTriplesFuzzSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val nastyChar: Gen[Char] =
    Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('\\', '"', '\n', '\r', '\t', ' ', 'n', 't', '<', '>'))
  private val literal: Gen[String] =
    Gen.nonEmptyListOf(nastyChar).map(_.mkString)

  test("format/parse round-trips fuzzed literals exactly") {
    import spark.implicits._
    val samples = Gen.listOfN(300, literal).sample.get.distinct
    val df = samples.zipWithIndex
      .map { case (text, i) =>
        (s"s:$i", ":p", text, Option.empty[Double], false, Option.empty[String])
      }
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = NTriples.parse(NTriples.format(df))
      .select("s", "o").as[(String, String)].collect().toMap
    val want = samples.zipWithIndex.map { case (t, i) => s"s:$i" -> t }.toMap
    assert(back == want)
  }
}
