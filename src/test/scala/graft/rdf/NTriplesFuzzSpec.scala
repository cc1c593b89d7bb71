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
      1 -> Gen.oneOf('\\', '"', '\n', '\r', '\t', ' ', 'n', 't', '<', '>',
        '{', '}', '.', '@'))
  private val literal: Gen[String] =
    Gen.nonEmptyListOf(nastyChar).map(_.mkString)

  test("blank-node terms round-trip; malformed objects drop the line") {
    import spark.implicits._
    val lines = Seq(
      "_:b0 <:p> <s:1> .",
      "<s:1> <:p> _:b0 .",
      "<s:2> <:p> b0gus .", // neither IRI, literal nor bnode: dropped
      "<s:3> <:p> _:x9.cafe .",
      "<s:4> <:p> \"lit\" .").toDF("line")
    val got = NTriples.parse(lines)
    assert(got.count() == 4)
    val asObj = got.filter($"o" === "_:b0").collect()
    assert(asObj.length == 1 && asObj(0).getAs[Boolean]("o_is_iri"))
    assert(got.filter($"s" === "_:b0").count() == 1)
    val back = NTriples.parse(NTriples.format(got))
    assert(back.count() == 4)
    assert(back.filter($"s" === "_:b0").count() == 1 &&
      back.filter($"o" === "_:x9.cafe" && $"o_is_iri").count() == 1)
  }

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

  test("TriG round-trips fuzzed literals under graph wrappers exactly") {
    import spark.implicits._
    val samples = Gen.listOfN(150, literal).sample.get.distinct
    val df = samples.zipWithIndex
      .map { case (text, i) =>
        (s"g:${i % 5}", s"s:$i", ":p", text,
          Option.empty[Double], false, Option.empty[String])
      }
      .toDF("g", "s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = graft.rdf.TriG.parse(graft.rdf.TriG.format(df))
      .select("g", "s", "o").as[(String, String, String)].collect().toSet
    val want = samples.zipWithIndex
      .map { case (t, i) => (s"g:${i % 5}", s"s:$i", t) }.toSet
    assert(back == want)
  }

  test("N-Quads round-trips fuzzed literals under graph terms exactly") {
    import spark.implicits._
    val samples = Gen.listOfN(150, literal).sample.get.distinct
    val df = samples.zipWithIndex
      .map { case (text, i) =>
        (s"g:${i % 5}", s"s:$i", ":p", text,
          Option.empty[Double], false, Option.empty[String])
      }
      .toDF("g", "s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = NQuads.parse(NQuads.format(df))
      .select("g", "s", "o").as[(String, String, String)].collect().toSet
    val want = samples.zipWithIndex
      .map { case (t, i) => (s"g:${i % 5}", s"s:$i", t) }.toSet
    assert(back == want)
  }

  test("Turtle round-trips fuzzed literals exactly") {
    import spark.implicits._
    val samples = Gen.listOfN(150, literal).sample.get.distinct
    val df = samples.zipWithIndex
      .map { case (text, i) =>
        (s"s:$i", ":p", text, Option.empty[Double], false, Option.empty[String])
      }
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = Turtle.parse(spark, Turtle.format(df))
      .select("s", "o").as[(String, String)].collect().toMap
    val want = samples.zipWithIndex.map { case (t, i) => s"s:$i" -> t }.toMap
    assert(back == want)
  }

  test("RDF/XML round-trips fuzzed literals exactly") {
    import spark.implicits._
    val samples = Gen.listOfN(120, literal).sample.get.distinct
    val df = samples.zipWithIndex
      .map { case (text, i) =>
        (s"s:$i", ":p", text, Option.empty[Double], false, Option.empty[String])
      }
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = RdfXml.parse(spark, RdfXml.formatString(df))
      .select("s", "o").as[(String, String)].collect().toMap
    val want = samples.zipWithIndex.map { case (t, i) => s"s:$i" -> t }.toMap
    assert(back == want)
  }

  test("JSON-LD round-trips fuzzed literals exactly") {
    import spark.implicits._
    val samples = Gen.listOfN(150, literal).sample.get.distinct
    val df = samples.zipWithIndex
      .map { case (text, i) =>
        (s"s:$i", ":p", text, Option.empty[Double], false, Option.empty[String])
      }
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = JsonLd.parse(spark, JsonLd.format(df))
      .select("s", "o").as[(String, String)].collect().toMap
    val want = samples.zipWithIndex.map { case (t, i) => s"s:$i" -> t }.toMap
    assert(back == want)
  }
}
