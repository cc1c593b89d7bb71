package graft.rdf

import graft.SharedSpark
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the Turtle subset: format→parse is the identity
  * on arbitrary literal content (the NTriplesFuzzSpec posture, but
  * through the richer writer — prefix compaction, `;` predicate-object
  * chains, @lang tags and ^^xsd:double annotations all ride the same
  * round trip).
  */
class TurtleFuzzSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val nastyChar: Gen[Char] =
    Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('\\', '"', '\n', '\r', '\t', ' ', 'n', 't', ';',
        '.', '@', '<', '>', '^'))
  private val literal: Gen[String] =
    Gen.nonEmptyListOf(nastyChar).map(_.mkString)

  test("turtle format/parse round-trips fuzzed literals, langs, doubles") {
    import spark.implicits._
    val samples = Gen.listOfN(200, literal)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
      .distinct
    // three shapes share subjects so `;` chains genuinely form:
    // plain literal, @lang literal, numeric ^^xsd:double
    val rows = samples.zipWithIndex.flatMap { case (text, i) =>
      Seq(
        (s"s:${i % 50}", s":p$i", text,
          Option.empty[Double], false, Option.empty[String]),
        (s"s:${i % 50}", s":q$i", text,
          Option.empty[Double], false, Some("fr")),
        (s"s:${i % 50}", s":n$i", (i * 1.5).toString,
          Some(i * 1.5), false, Option.empty[String]))
    }
    val df = rows.toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val back = Turtle.parse(spark, Turtle.format(df))
    val want = rows.map(r => (r._1, r._2, r._3, r._6.orNull)).toSet
    val got = back.select("s", "p", "o", "lang")
      .as[(String, String, String, String)].collect()
      .map(t => (t._1, t._2, t._3, Option(t._4).orNull)).toSet
    assert(got == want)
    // numeric annotations survive as o_num
    assert(back.filter($"o_num".isNotNull).count() == samples.size.toLong)
  }

  test("trig format/parse round-trips fuzzed quads with graph labels") {
    import spark.implicits._
    val samples = Gen.listOfN(150, literal)
      .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(11L))
      .distinct
    val rows = samples.zipWithIndex.map { case (text, i) =>
      (s"g:${i % 4}", s"s:$i", ":p", text,
        Option.empty[Double], false, Option.empty[String])
    }
    val df = rows.toDF("g", "s", "p", "o", "o_num", "o_is_iri", "lang")
    val got = TriG.parse(TriG.format(df))
      .select("g", "s", "o").as[(String, String, String)].collect().toSet
    assert(got == rows.map(r => (r._1, r._2, r._4)).toSet)
  }
}
