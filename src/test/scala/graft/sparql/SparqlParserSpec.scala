package graft.sparql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

class SparqlParserSpec extends AnyFunSuite {

  test("parses BGP with ';' chains, 'a' keyword, and modifiers") {
    val q = SparqlParser.parse(
      """SELECT ?c ?b WHERE {
        |  ?c a :Customer ; :acctbal ?b .
        |} ORDER BY DESC(?b) LIMIT 5 OFFSET 2""".stripMargin)
    assert(q.projection == Seq("c", "b"))
    assert(q.where == Bgp(Seq(
      TriplePattern(Var("c"), Iri("rdf:type"), Iri(":Customer")),
      TriplePattern(Var("c"), Iri(":acctbal"), Var("b")))))
    assert(q.orderBy == Seq(("b", false)))
    assert(q.limit == 5L && q.offset == 2L)
  }

  test("parses FILTER expressions with precedence and literals") {
    val q = SparqlParser.parse(
      """SELECT ?x WHERE { ?x :age ?a . ?x :name ?n .
        |  FILTER(?a >= 30 && ?n != "bob" || ?a < 10) }""".stripMargin)
    val Filter(Seq(expr), _) = q.where: @unchecked
    assert(expr == Or(
      And(Cmp(Ge, Var("a"), Lit("30", Some(30.0))),
        Cmp(Ne, Var("n"), Lit("bob", None))),
      Cmp(Lt, Var("a"), Lit("10", Some(10.0)))))
  }

  test("parses OPTIONAL, UNION, EXISTS, aggregates, DISTINCT") {
    val q = SparqlParser.parse(
      """SELECT DISTINCT ?g (COUNT(DISTINCT ?x) AS ?n) WHERE {
        |  { ?x :in ?g } UNION { ?x :at ?g }
        |  OPTIONAL { ?x :label ?l }
        |  FILTER EXISTS { ?x :ok "yes" }
        |} GROUP BY ?g""".stripMargin)
    assert(q.distinct)
    assert(q.groupBy == Seq("g"))
    assert(q.aggregates == Seq(Agg(CountDistinct, Some(Var("x")), "n")))
    val Filter(Seq(Exists(_)), LeftJoin(Union(_, _), Bgp(_))) = q.where: @unchecked
  }

  test("parses property paths into PathPlus") {
    val q = SparqlParser.parse(
      "SELECT ?x ?y WHERE { ?x (:hasNation|:inRegion)+ ?y . ?x a :Customer . }")
    val Join(PathPlus(Var("x"), preds, Var("y")), Bgp(_)) = q.where: @unchecked
    assert(preds == Seq(":hasNation", ":inRegion"))
  }

  test("parses a modifier over a parenthesized sequence into PathSeqMod") {
    val q = SparqlParser.parse(
      "SELECT ?x ?y WHERE { ?x (:f/^:g)+ ?y }")
    val PathSeqMod(Var("x"), steps, '+', Var("y")) = q.where: @unchecked
    assert(steps == Seq(PathStep(":f", false), PathStep(":g", true)))
    val st = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f/:g)* ?y }")
    val PathSeqMod(_, _, '*', _) = st.where: @unchecked
    val zo = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f/:g)? ?y }")
    val PathSeqMod(_, _, '?', _) = zo.where: @unchecked
    // alternation under a modifier still takes the PathPlus route
    val alt = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f|:g)+ ?y }")
    val PathPlus(_, _, _) = alt.where: @unchecked
    // range over a sequence
    val rg = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f/:g){1,2} ?y }")
    val PathSeqRange(_, rsteps, 1, 2, _) = rg.where: @unchecked
    assert(rsteps == Seq(PathStep(":f", false), PathStep(":g", false)))
    // range over an alternation still takes the PathRange route
    val ar = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f|:g){1,2} ?y }")
    val PathRange(_, _, 1, 2, _) = ar.where: @unchecked
    // whitespace between ')' and the modifier is legal (SPARQL
    // tokenizes them separately; r10 ADVICE — both nesting forms now
    // share the two-token treatment)
    val ws = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f/:g) + ?y }")
    val PathSeqMod(_, _, '+', _) = ws.where: @unchecked
    // ...but a bare `?` that is really the sigil of the object
    // variable must NOT be taken as a zero-or-one modifier
    val qv = SparqlParser.parse("SELECT ?x ?y WHERE { ?x (:f/:g)? ?y }")
    val PathSeqMod(_, _, '?', Var("y")) = qv.where: @unchecked
  }

  test("parses sequence and inverse paths into PathSeq") {
    val q = SparqlParser.parse(
      "SELECT ?x ?n WHERE { ?x :knows/^:likes/:name ?n . ?x a :Person . }")
    val Join(PathSeq(Var("x"), steps, Var("n")), Bgp(_)) = q.where: @unchecked
    assert(steps == Seq(PathStep(":knows", false), PathStep(":likes", true),
      PathStep(":name", false)))
    // a single plain step stays an ordinary triple pattern
    val plain = SparqlParser.parse("SELECT ?x WHERE { ?x :knows ?y . }")
    assert(plain.where == Bgp(Seq(
      TriplePattern(Var("x"), Iri(":knows"), Var("y")))))
  }

  test("string literals keep leading whitespace and '#'") {
    val q = SparqlParser.parse(
      """SELECT ?x WHERE { ?x :name ?n . FILTER(?n = " # BUILDING") }""")
    val Filter(Seq(Cmp(Eq, _, lit)), _) = q.where: @unchecked
    assert(lit == Lit(" # BUILDING", None))
  }

  test("string literals decode ECHAR escapes (\\\" \\\\ \\t \\n)") {
    val q = SparqlParser.parse(
      "SELECT ?x WHERE { ?x :name ?n . FILTER(?n = \"a\\\"b\\\\c\\td\\ne\") }")
    val Filter(Seq(Cmp(Eq, _, lit)), _) = q.where: @unchecked
    assert(lit == Lit("a\"b\\c\td\ne", None))
  }

  test("OFFSET before LIMIT parses (either order is legal)") {
    val q = SparqlParser.parse(
      "SELECT ?x WHERE { ?x a :Customer } OFFSET 5 LIMIT 10")
    assert(q.offset == 5L && q.limit == 10L)
  }

  test("integer followed by statement dot does not swallow the terminator") {
    val q = SparqlParser.parse("SELECT ?x WHERE { ?x :size 5. ?x :name ?n . }")
    val Bgp(ps) = q.where: @unchecked
    assert(ps.size == 2 && ps.head.o == Lit("5", Some(5.0)))
  }

  test("'a' with an 'a:' prefix is a prefixed name, not rdf:type") {
    val q = SparqlParser.parse("SELECT ?s WHERE { ?s a:knows ?o . }")
    val Bgp(Seq(tp)) = q.where: @unchecked
    assert(tp.p == Iri("a:knows"))
  }

  test("MAX(*) is rejected with a clear message") {
    val e = intercept[IllegalArgumentException](SparqlParser.parse(
      "SELECT (MAX(*) AS ?m) WHERE { ?s ?p ?o }"))
    assert(e.getMessage.contains("parse error"))
  }

  test("rejects malformed input with a position") {
    val e = intercept[IllegalArgumentException](
      SparqlParser.parse("SELECT ?x WHERE { ?x :p }"))
    assert(e.getMessage.contains("parse error"))
  }

  test("parses MINUS against the preceding group") {
    val q = SparqlParser.parse(
      "SELECT ?x WHERE { ?x :name ?n . MINUS { ?x :knows <p:2> } }")
    val Minus(Bgp(_), Bgp(Seq(tp))) = q.where: @unchecked
    assert(tp == TriplePattern(Var("x"), Iri(":knows"), Iri("p:2")))
  }

  test("parses BIND with arithmetic precedence and function calls") {
    val q = SparqlParser.parse(
      """SELECT ?y WHERE { ?x :age ?a . BIND(?a + ?a * 2 AS ?y) }""")
    val Bind(Bgp(_), e, "y") = q.where: @unchecked
    assert(e == Arith(AddOp, VVar("a"), Arith(MulOp, VVar("a"), VNum(2.0))))
    val s = SparqlParser.parse(
      """SELECT ?u WHERE { ?x :name ?n . BIND(CONCAT(UCASE(?n), "!") AS ?u) }""")
    val Bind(Bgp(_), fe, "u") = s.where: @unchecked
    assert(fe == FnCall("CONCAT", Seq(FnCall("UCASE", Seq(VVar("n"))), VStr("!"))))
  }

  test("parses string-builtin filters") {
    val q = SparqlParser.parse(
      """SELECT ?n WHERE { ?x :name ?n .
        |  FILTER(REGEX(?n, "^a") || STRSTARTS(?n, "b") && CONTAINS(?n, "o"))
        |  FILTER(STRENDS(?n, "b")) }""".stripMargin)
    val Filter(Seq(first, second), _) = q.where: @unchecked
    assert(first == Or(StrFilter(RegexMatch, Var("n"), "^a"),
      And(StrFilter(StrStarts, Var("n"), "b"), StrFilter(StrContains, Var("n"), "o"))))
    assert(second == StrFilter(StrEnds, Var("n"), "b"))
  }

  test("PREFIX declarations expand prefixed names everywhere") {
    val q = SparqlParser.parse(
      """PREFIX ex: <http://ex.org/>
        |PREFIX : <urn:base#>
        |SELECT ?x WHERE {
        |  ?x ex:knows/:likes ?y .
        |  { ?x a ex:Person } UNION { ?x ex:tag :thing }
        |  FILTER NOT EXISTS { ?x ex:banned ?b }
        |}""".stripMargin)
    val Filter(Seq(NotExists(Bgp(Seq(ne)))), Join(path, Union(l, _))) =
      q.where: @unchecked
    assert(ne.p == Iri("http://ex.org/banned"))
    val PathSeq(_, steps, _) = path: @unchecked
    assert(steps.map(_.pred) ==
      Seq("http://ex.org/knows", "urn:base#likes"))
    val Bgp(Seq(tpl)) = l: @unchecked
    assert(tpl.o == Iri("http://ex.org/Person"))
    // undeclared prefixes pass through verbatim
    val raw = SparqlParser.parse("SELECT ?x WHERE { ?x :name ?n }")
    val Bgp(Seq(t2)) = raw.where: @unchecked
    assert(t2.p == Iri(":name"))
  }

  test("parses * and ? path modifiers, bare and parenthesized") {
    val star = SparqlParser.parse("SELECT ?y WHERE { <cust:7> (:a|:b)* ?y }")
    val PathStar(Iri("cust:7"), sp, Var("y")) = star.where: @unchecked
    assert(sp == Seq(":a", ":b"))
    val zo = SparqlParser.parse("SELECT ?y WHERE { ?x :knows? ?y }")
    val PathZeroOne(Var("x"), Seq(":knows"), Var("y")) = zo.where: @unchecked
    val plus = SparqlParser.parse("SELECT ?y WHERE { ?x :knows+ ?y }")
    val PathPlus(Var("x"), Seq(":knows"), Var("y")) = plus.where: @unchecked
    // no modifier: still a plain triple, the object's '?' is not a
    // path modifier (the modifier must touch the predicate)
    val plain = SparqlParser.parse("SELECT ?y WHERE { ?x :knows ?y }")
    assert(plain.where == Bgp(Seq(
      TriplePattern(Var("x"), Iri(":knows"), Var("y")))))
  }

  test("parses bare path alternation, prefers modifier forms") {
    val alt = SparqlParser.parse("SELECT ?y WHERE { ?x (:a|:b) ?y }")
    val PathAlt(Var("x"), ap, Var("y")) = alt.where: @unchecked
    assert(ap == Seq(":a", ":b"))
    // prefixes expand inside the alternation list
    val pfx = SparqlParser.parse(
      "PREFIX ex: <http://e/> SELECT ?y WHERE { ?x (ex:a|:b) ?y }")
    val PathAlt(_, pp, _) = pfx.where: @unchecked
    assert(pp == Seq("http://e/a", ":b"))
    // a modifier after the parens still parses as the modifier form
    val star = SparqlParser.parse("SELECT ?y WHERE { ?x (:a|:b)* ?y }")
    assert(star.where.isInstanceOf[PathStar])
  }

  test("parses IN / NOT IN, BOUND, and !-negation") {
    val q = SparqlParser.parse(
      """SELECT ?x WHERE {
        |  ?x :seg ?m . OPTIONAL { ?x :p ?y }
        |  FILTER(?m IN ("A", "B"))
        |  FILTER(?x NOT IN (<n:1>, 5))
        |  FILTER(!BOUND(?y))
        |}""".stripMargin)
    val Filter(es, _) = q.where: @unchecked
    assert(es.contains(In(Var("m"), Seq(Lit("A", None), Lit("B", None)), neg = false)))
    assert(es.contains(In(Var("x"), Seq(Iri("n:1"), Lit("5", Some(5.0))), neg = true)))
    assert(es.contains(Not(Bound(Var("y")))))
    // '!=' still lexes as the comparator, not '!' + '='
    val ne = SparqlParser.parse("SELECT ?x WHERE { ?x :p ?v . FILTER(?v != 3) }")
    val Filter(Seq(Cmp(Ne, Var("v"), _)), _) = ne.where: @unchecked
  }

  test("parses IF, COALESCE, and the substring builtins in BIND") {
    val q = SparqlParser.parse(
      """SELECT ?t WHERE {
        |  ?x :age ?a .
        |  BIND(IF(?a >= 10, "big", "small") AS ?t)
        |  BIND(COALESCE(?zz, "d") AS ?u)
        |  BIND(SUBSTR(?t, 1, 2) AS ?v)
        |  BIND(STRAFTER(?t, "-") AS ?w)
        |}""".stripMargin)
    def binds(p: Ast.Pattern): Seq[(String, VExpr)] = p match {
      case Bind(in, e, as) => binds(in) :+ (as -> e)
      case _ => Seq.empty
    }
    val bs = binds(q.where).toMap
    assert(bs("t") == VIf(Cmp(Ge, Var("a"), Lit("10", Some(10.0))),
      VStr("big"), VStr("small")))
    assert(bs("u") == FnCall("COALESCE", Seq(VVar("zz"), VStr("d"))))
    assert(bs("v") == FnCall("SUBSTR", Seq(VVar("t"), VNum(1), VNum(2))))
    assert(bs("w") == FnCall("STRAFTER", Seq(VVar("t"), VStr("-"))))
  }

  test("parses negated property sets, bare and parenthesized") {
    val q = SparqlParser.parse("SELECT ?o WHERE { ?s !(:a|rdf:type) ?o }")
    val Bgp(_) = SparqlParser.parse("SELECT ?o WHERE { ?s :a ?o }").where: @unchecked
    assert(q.where == NegPath(Var("s"), Seq(":a", "rdf:type"), Var("o")))
    val bare = SparqlParser.parse("SELECT ?o WHERE { ?s !:a ?o . ?s :b ?o }")
    val Join(NegPath(Var("s"), Seq(":a"), Var("o")), _) = bare.where: @unchecked
  }

  test("parses a nested SELECT subquery joined with outer triples") {
    val q = SparqlParser.parse(
      """SELECT ?nm ?cnt WHERE {
        |  { SELECT ?n (COUNT(?c) AS ?cnt) WHERE { ?c :in ?n } GROUP BY ?n }
        |  ?n :name ?nm .
        |}""".stripMargin)
    val Join(SubSelect(inner), Bgp(_)) = q.where: @unchecked
    assert(inner.groupBy == Seq("n") &&
      inner.aggregates == Seq(Agg(Count, Some(Var("c")), "cnt")))
    // SAMPLE parses as an aggregate
    val s = SparqlParser.parse(
      "SELECT ?m (SAMPLE(?c) AS ?r) WHERE { ?c :seg ?m } GROUP BY ?m")
    assert(s.aggregates == Seq(Agg(Sample, Some(Var("c")), "r")))
  }

  test("parses LOAD forms to their ops (§3.1.31)") {
    assert(SparqlParser.parseUpdate("LOAD <file:///data/x.nt>") ==
      Update.Load("file:///data/x.nt"))
    assert(SparqlParser.parseUpdate(
      "load silent <http://ex.org/v.ttl> INTO GRAPH <urn:g1>") ==
      Update.Load("http://ex.org/v.ttl", Some("urn:g1"), silent = true))
    // prologue prefixes expand in the destination graph, never in
    // the source IRI
    assert(SparqlParser.parseUpdate(
      "PREFIX ex: <http://x/> LOAD <file:///d/y.trig> INTO GRAPH ex:g") ==
      Update.Load("file:///d/y.trig", Some("http://x/g")))
  }

  test("parses graph-management update forms to their ops") {
    assert(SparqlParser.parseUpdate("CLEAR GRAPH <urn:g1>") ==
      Update.ClearGraph("urn:g1"))
    // DROP normalizes to CLEAR: graphs exist iff non-empty over quads
    assert(SparqlParser.parseUpdate("DROP SILENT GRAPH g:a") ==
      Update.ClearGraph("g:a"))
    assert(SparqlParser.parseUpdate("create graph g:fresh") ==
      Update.CreateGraph("g:fresh"))
    // GRAPH keyword optional on the COPY/MOVE/ADD operands
    assert(SparqlParser.parseUpdate("COPY g:a TO GRAPH g:b") ==
      Update.CopyGraph("g:a", "g:b"))
    assert(SparqlParser.parseUpdate("MOVE GRAPH g:a TO g:b") ==
      Update.MoveGraph("g:a", "g:b"))
    assert(SparqlParser.parseUpdate("ADD SILENT <urn:a> TO <urn:b>") ==
      Update.AddToGraph("urn:a", "urn:b"))
    // prologue prefixes expand inside graph names
    assert(SparqlParser.parseUpdate(
      "PREFIX ex: <http://x/> ADD ex:src TO ex:dst") ==
      Update.AddToGraph("http://x/src", "http://x/dst"))
    // the management keyword must carry a graph operand
    intercept[IllegalArgumentException] {
      SparqlParser.parseUpdate("CLEAR GRAPH")
    }
  }

  test("DESCRIBE grammar covers VarOrIri+ with optional WHERE (§16.4)") {
    // single constant, no WHERE — the endpoint-lookup form
    assert(SparqlParser.parseDescribeQuery("DESCRIBE nat:1") ==
      (Seq(Left("nat:1")), None))
    // multiple mixed targets
    val (ts, w) = SparqlParser.parseDescribeQuery(
      "DESCRIBE <urn:a> ?x reg:2 WHERE { ?x a :Nation }")
    assert(ts == Seq(Left("urn:a"), Right("x"), Left("reg:2")))
    assert(w.isDefined)
    // the WHERE keyword itself is optional (spec grammar)
    val (ts2, w2) = SparqlParser.parseDescribeQuery(
      "DESCRIBE ?x { ?x a :Region }")
    assert(ts2 == Seq(Right("x")) && w2.isDefined)
    // a bare variable with no pattern is grammatical (binds nothing)
    assert(SparqlParser.parseDescribeQuery("DESCRIBE ?x") ==
      (Seq(Right("x")), None))
    // prologue prefixes expand constant targets
    assert(SparqlParser.parseDescribeQuery(
      "PREFIX ex: <http://x/> DESCRIBE ex:n")._1 == Seq(Left("http://x/n")))
  }

  test("parses aggregates over expressions; plain vars keep the var form") {
    val q = SparqlParser.parse(
      """SELECT ?b (SUM(?x * ?y) AS ?s) (COUNT(?x) AS ?n)
        |WHERE { ?p :a ?x ; :b ?y ; :c ?b } GROUP BY ?b""".stripMargin)
    assert(q.aggregates == Seq(
      Agg(Sum, None, "s", expr = Some(Arith(MulOp, VVar("x"), VVar("y")))),
      Agg(Count, Some(Var("x")), "n")))
  }
}
