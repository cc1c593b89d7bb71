package graft.rdf

import graft.SharedSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RdfSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val nasty = Seq(
    ("s:1", ":quote", "say \"hi\"", Option.empty[Double], false, Option.empty[String]),
    ("s:1", ":multi", "a\nb\tc\\d", None, false, None),
    ("s:1", ":num", "2.5", Some(2.5), false, None),
    ("s:1", ":tagged", "bonjour", None, false, Some("fr")),
    ("s:1", ":ref", "s:2", None, true, None))
    .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")

  test("N-Triples round-trips escaping, datatypes, language tags") {
    val back = NTriples.parse(NTriples.format(nasty))
    val got = back.orderBy("p").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2),
        Option(r.get(3)), r.getBoolean(4), Option(r.getString(5)))).toSet
    val want = nasty.collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2),
        Option(r.get(3)), r.getBoolean(4), Option(r.getString(5)))).toSet
    assert(got == want)
  }

  test("N-Triples file write/read round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("nt").toString + "/out"
    NTriples.write(nasty, dir)
    assert(NTriples.read(spark, dir).count() == 5)
  }

  test("N-Triples parse handles multi-space separators and unicode escapes") {
    val lines = Seq(
      "<s:1>  <:p>\t<s:2> .",                 // grammar allows 1+ spaces/tabs
      "<s:1> <:q> \"caf\\u00E9\" .",          // \uXXXX numeric escape
      "<s:1> <:r> \"plain\"  .").toDF("line")
    val got = NTriples.parse(lines).orderBy("p").collect()
    assert(got.length == 3)
    assert(got(0).getString(2) == "s:2" && got(0).getBoolean(4))
    assert(got(1).getString(2) == "café")
    assert(got(2).getString(2) == "plain")
  }

  test("Turtle tolerates attached terminators and malformed doubles") {
    val lines = Seq(
      "@prefix n: <nat:> .",
      "n:1 n:p \"x\"@en.",                    // no space before '.'
      "n:2 n:q \"zz\"^^<http://www.w3.org/2001/XMLSchema#double> .")
      .toDF("line")
    val got = Turtle.parse(SharedSpark.spark, lines).orderBy("s").collect()
    assert(got.length == 2)
    assert(got(0).getString(5) == "en")
    assert(got(1).isNullAt(3) && got(1).getString(2) == "zz") // degraded literal
  }

  test("multi-valued numeric props keep (lex, num) from one triple") {
    val t = Seq(
      ("n:1", ":x", "9", Some(9.0), false, Option.empty[String]),
      ("n:1", ":x", "10", Some(10.0), false, Option.empty[String]))
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val n = PropertyGraph.nodes(t).head()
    val lex = n.getMap[String, String](2)(":x")
    val num = n.getMap[String, Double](3)(":x")
    // "10" < "9" lexicographically, and its numeric twin must be 10.0
    assert(lex == "10" && num == 10.0)
  }

  test("Turtle round-trips via prefix table") {
    val back = Turtle.parse(spark, Turtle.format(nasty))
    assert(back.count() == 5)
    val num = back.filter(col("p") === ":num").head()
    assert(num.getDouble(3) == 2.5)
    val tagged = back.filter(col("p") === ":tagged").head()
    assert(tagged.getString(5) == "fr")
    val ref = back.filter(col("p") === ":ref").head()
    assert(ref.getBoolean(4) && ref.getString(2) == "s:2")
  }

  test("Turtle tokenizer splits quoted literals and chains") {
    val toks = Turtle.tokenize("""ns0:1 ns0:p "a b ; c" ; ns0:q ns0:2 .""")
    assert(toks == Vector("ns0:1", "ns0:p", "\"a b ; c\"", ";", "ns0:q", "ns0:2", "."))
  }

  test("PropertyGraph splits labels, props, edges; dedups edges") {
    val t = Seq(
      ("n:1", "rdf:type", ":A", Option.empty[Double], true, Option.empty[String]),
      ("n:1", "rdf:type", ":B", Option.empty[Double], true, Option.empty[String]),
      ("n:1", ":size", "3", Some(3.0), false, None),
      ("n:1", ":to", "n:2", None, true, None),
      ("n:1", ":to", "n:2", None, true, None))
      .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
    val nodes = PropertyGraph.nodes(t).filter(col("uri") === "n:1").head()
    assert(nodes.getSeq[String](1) == Seq(":A", ":B"))
    assert(PropertyGraph.edges(t).count() == 1)
  }

  test("URI functions split on the last separator") {
    val df = Seq("http://ex.org/path#Frag", "cust:42", "plain")
      .toDF("u")
      .select(UriFunctions.namespace(col("u")).as("ns"),
        UriFunctions.localName(col("u")).as("l"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == ("http://ex.org/path#", "Frag"))
    assert(rows(1) == ("cust:", "42"))
    assert(rows(2) == ("", "plain"))
  }

  test("namespace registry is deterministic and shortens URIs") {
    val df = Seq("b:1", "a:2", "b:3").toDF("u")
    val reg = Namespaces.registry(df, col("u"))
    val m = reg.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(m == Map("a:" -> "ns0", "b:" -> "ns1"))
    val short = Namespaces.shorten(df, reg, "u").collect().map(_.getString(0)).toSet
    assert(short == Set("ns1:1", "ns0:2", "ns1:3"))
  }
}
