package graft.sparql

import graft.SharedSpark
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven robustness for the SPARQL front end: every
  * grammatically well-formed query a small generator can produce must
  * parse, compile, and EXECUTE without throwing, and two executions
  * must agree (determinism — the property the oracle gate relies on).
  * The complement of the per-feature specs: those pin semantics on
  * hand-picked queries, this sweeps the combination space (pattern
  * kinds × filters × modifiers) where front-end bugs actually live.
  */
class SparqlFuzzSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val triples = Seq(
    ("p:1", "rdf:type", ":Person", Option.empty[Double], true, Option.empty[String]),
    ("p:2", "rdf:type", ":Person", None, true, None),
    ("p:3", "rdf:type", ":Robot", None, true, None),
    ("p:1", ":name", "ann", None, false, None),
    ("p:2", ":name", "bob", None, false, None),
    ("p:3", ":name", "r2", None, false, None),
    ("p:1", ":age", "30", Some(30.0), false, None),
    ("p:2", ":age", "40", Some(40.0), false, None),
    ("p:1", ":knows", "p:2", None, true, None),
    ("p:2", ":knows", "p:3", None, true, None))
    .toDF("s", "p", "o", "o_num", "o_is_iri", "lang")

  private val pred: Gen[String] = Gen.oneOf(":name", ":age", ":knows", "a")
  private val term: Gen[String] =
    Gen.oneOf("?x", "?y", "?z", "<p:1>", "\"ann\"", "\"30\"")

  private val triple: Gen[String] = for {
    s <- Gen.oneOf("?x", "?y", "<p:1>", "<p:2>")
    p <- pred
    o <- term
  } yield s"$s $p $o ."

  private val pathTriple: Gen[String] = for {
    s <- Gen.oneOf("?x", "<p:1>")
    path <- Gen.oneOf(":knows+", "(:knows|:name)+", ":knows*",
      "(:knows/:name)?", ":knows/:name", "^:knows", "(:knows){1,2}",
      "!(:name)", "(:knows/:knows)+")
    o <- Gen.oneOf("?y", "?z")
  } yield s"$s $path $o ."

  private val filter: Gen[String] = Gen.oneOf(
    "FILTER(?x != ?y)", "FILTER(BOUND(?y))", "FILTER(!BOUND(?z))",
    "FILTER(STRSTARTS(STR(?x), \"p:\"))", "FILTER(?x IN (<p:1>, <p:2>))",
    // r11 grammar: bare builtin constraints (no outer parens) and
    // REGEX's flags argument
    "FILTER BOUND(?x)", "FILTER REGEX(?x, \"^p\", \"i\")",
    "FILTER CONTAINS(STR(?x), \":\")", "FILTER !BOUND(?z)",
    "FILTER isIRI(?x)")

  private val elem: Gen[String] = Gen.frequency(
    5 -> triple,
    2 -> pathTriple,
    2 -> triple.map(t => s"OPTIONAL { $t }"),
    1 -> (for {a <- triple; b <- triple} yield s"{ $a } UNION { $b }"),
    1 -> triple.map(t => s"MINUS { $t }"),
    1 -> filter)

  private val query: Gen[String] = for {
    n <- Gen.choose(1, 4)
    first <- triple // guarantee ?x is bindable
    body <- Gen.listOfN(n, elem)
    dist <- Gen.oneOf("", "DISTINCT ")
    lim <- Gen.oneOf("", " LIMIT 7")
  } yield s"SELECT ${dist}?x WHERE { $first ${body.mkString(" ")} }$lim"

  /** Subject pinned to ?x so grouping keys are always bound. */
  private val tripleX: Gen[String] = for {
    p <- pred
    o <- Gen.oneOf("?y", "?z", "<p:2>", "\"ann\"", "\"30\"")
  } yield s"?x $p $o ."

  /** r11 grammar sweep: GROUP BY var/(expr AS ?v) × direct-aggregate
    * vs alias HAVING × ORDER BY var/DESC/bracketed-expression forms.
    */
  private val aggQuery: Gen[String] = for {
    first <- tripleX
    extra <- Gen.oneOf("", "?x :age ?v .", "OPTIONAL { ?x :name ?nm }")
    g <- Gen.oneOf("?x" -> "?x", "(STRLEN(STR(?x)) AS ?g)" -> "?g")
    hav <- Gen.oneOf("", " HAVING (?n >= 1)", " HAVING (COUNT(?x) >= 1)")
    lim <- Gen.oneOf("", " LIMIT 5")
  } yield s"SELECT ${g._2} (COUNT(?x) AS ?n) " +
    s"WHERE { $first $extra } GROUP BY ${g._1}$hav$lim"

  test("generated aggregate queries parse, compile, and run deterministically") {
    val seed = rng.Seed(1142L)
    val queries = Gen.listOfN(60, aggQuery)
      .pureApply(Gen.Parameters.default, seed)
    queries.foreach { q =>
      val parsed =
        try SparqlParser.parse(q)
        catch { case e: Throwable =>
          fail(s"parse threw on well-formed aggregate query:\n$q\n${e.getMessage}")
        }
      val run1 =
        try Compiler.run(triples, parsed).collect().map(_.toString).sorted.toSeq
        catch { case e: Throwable =>
          fail(s"compile/execute threw:\n$q\n${e.getMessage}")
        }
      val run2 = Compiler.run(triples, parsed)
        .collect().map(_.toString).sorted.toSeq
      assert(run1 == run2, s"nondeterministic results for:\n$q")
    }
  }

  test("generated queries parse, compile, run, and run deterministically") {
    val seed = rng.Seed(42L)
    val queries = Gen.listOfN(120, query)
      .pureApply(Gen.Parameters.default, seed)
    var ran = 0
    queries.foreach { q =>
      val parsed =
        try SparqlParser.parse(q)
        catch { case e: Throwable =>
          fail(s"parse threw on well-formed query:\n$q\n${e.getMessage}")
        }
      val run1 =
        try Compiler.run(triples, parsed).collect().map(_.toString).sorted.toSeq
        catch { case e: Throwable =>
          fail(s"compile/execute threw:\n$q\n${e.getMessage}")
        }
      val run2 = Compiler.run(triples, parsed)
        .collect().map(_.toString).sorted.toSeq
      assert(run1 == run2, s"nondeterministic results for:\n$q")
      ran += 1
    }
    assert(ran == 120)
  }
}
