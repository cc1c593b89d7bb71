package graft.sparql

import scala.util.parsing.combinator.RegexParsers
import Ast._

/** Textual SPARQL SELECT parser for the algebra subset the reference
  * compiler accepts (reference parses with Jena:
  * pidb-rdf-engine/src/main/java/sparql/SparqlToGremlinCompiler.java:66-78;
  * algebra coverage per SparqlToGremlinCompiler.java:235-317).
  *
  * Grammar subset: SELECT [DISTINCT] (?var | (AGG(?v) AS ?alias))* | *
  * WHERE { triples ('.'|';' chains), FILTER(cmp &&/|| ...),
  * FILTER [NOT] EXISTS {..}, OPTIONAL {..}, {..} UNION {..} }
  * GROUP BY / ORDER BY [ASC|DESC] / LIMIT / OFFSET. `a` is rdf:type.
  */
object SparqlParser extends RegexParsers {

  override val whiteSpace = """(\s|#[^\n]*)+""".r

  // ---- terms -------------------------------------------------------
  // the `__` prefix is the compiler's reserved namespace (synthesized
  // helper columns: __bn_*, __hv*, __ord*, __cr_*) — a user variable
  // there would be silently dropped by SELECT *'s star convention and
  // could mis-bind against a synthesized helper, so it is a hard
  // parse error (err, not failure: no alternative may swallow it)
  private def varTerm: Parser[Var] =
    """\?[A-Za-z_][A-Za-z0-9_]*""".r >> { s =>
      if (s.startsWith("?__"))
        err(s"variable name '$s' uses the reserved '__' prefix")
      else success(Var(s.tail))
    }
  private def iriRef: Parser[Iri] =
    """<[^<>\s]*>""".r ^^ (s => Iri(s.substring(1, s.length - 1)))
  // W3C PN_LOCAL permits a leading digit (`reg:2` is a valid prefixed
  // name); the prefix part still requires a letter start. Dots may
  // appear INSIDE a local name but not at its end (grammar [169]):
  // `:Person. ?x` is name + triple terminator, not a dotted name
  private def pname: Parser[Iri] =
    """[A-Za-z][A-Za-z0-9_.-]*:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?|:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?""".r ^^ Iri.apply
  // negative lookahead: `a:knows` is a prefixed name, not the keyword
  private def rdfTypeKw: Parser[Iri] = """a(?![\w:])""".r ^^^ Iri("rdf:type")
  // DECIMAL needs digits after the dot, so `5.` lexes as 5 + terminator
  private def numLit: Parser[Lit] =
    """[+-]?(\d+\.\d+|\.\d+|\d+)([eE][+-]?\d+)?""".r ^^ (s => Lit(s, Some(s.toDouble)))
  // one token including the quotes — tokenizing the body separately
  // would let whitespace/comment skipping mangle literal content.
  // ECHAR escapes per the SPARQL grammar: \t \b \n \r \f \" \' \\
  // Both quote styles (grammar rules [156]/[157]); an optional
  // LANGTAG ([145]) or `^^` datatype ([128]) suffix completes the
  // RDFLiteral production — a numeric XSD datatype sets the numeric
  // companion so `"30"^^xsd:integer` matches a stored number.
  private def strTok: Parser[String] =
    """"(?:[^"\\]|\\[tbnrf"'\\])*"""".r ^^ (s => s.substring(1, s.length - 1)) |
    """'(?:[^'\\]|\\[tbnrf"'\\])*'""".r ^^ (s => s.substring(1, s.length - 1))
  private val numericXsd = Set("integer", "decimal", "double", "float",
    "int", "long", "short", "byte", "nonNegativeInteger",
    "nonPositiveInteger", "negativeInteger", "positiveInteger",
    "unsignedInt", "unsignedLong", "unsignedShort", "unsignedByte")
  private def strLit: Parser[Lit] =
    strTok ~ opt(
      "@" ~> """[A-Za-z]+(-[A-Za-z0-9]+)*""".r ^^ (t => Left(t)) |
      "^^" ~> (iriRef | pname) ^^ (dt => Right(dt.value))) ^^ {
      case body ~ suffix =>
        val lex = unescapeEchar(body)
        suffix match {
          case Some(Left(tag)) => Lit(lex, None, Some(tag))
          case Some(Right(dt)) =>
            val local = dt.substring(dt.lastIndexOf(':') + 1)
              .replaceFirst("^.*[#/]", "")
            val num = if (numericXsd.contains(local))
              scala.util.Try(lex.toDouble).toOption else None
            Lit(lex, num)
          case None => Lit(lex, None)
        }
    }

  private def unescapeEchar(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        b += (s.charAt(i + 1) match {
          case 't' => '\t'
          case 'b' => '\b'
          case 'n' => '\n'
          case 'r' => '\r'
          case 'f' => '\f'
          case q => q // " ' \
        })
        i += 2
      } else { b += c; i += 1 }
    }
    b.result()
  }

  // a blank node label (`_:b0`) is a non-distinguished variable
  // (SPARQL 1.1 §4.1.4): same label = same value within the query,
  // never projected (the compiler's star projection skips the `__bn`
  // namespace, and explicit projections can't name it)
  // a trailing '.' is the triple terminator, not part of the label
  // (grammar BLANK_NODE_LABEL forbids it): `_:b0. ?s :p ?o` must read
  // the same label as a later `_:b0`, and a dotted column name would
  // trip Spark column resolution
  private def bnodeLabel: Parser[Var] =
    """_:[A-Za-z0-9](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?""".r ^^ (s => Var("__bn_" + s.substring(2)))

  private def term: Parser[Term] =
    varTerm | iriRef | rdfTypeKw | pname | numLit | strLit | bnodeLabel

  // ---- triples -----------------------------------------------------
  private val bnCounter = new java.util.concurrent.atomic.AtomicLong

  /** `[ p o ; … ]` / `[]` — a blank node property list (grammar rules
    * [99]/[102]) desugars to a fresh non-distinguished variable plus
    * the triples rooted at it; `[]` alone is just the fresh variable.
    */
  private def bnodePropList: Parser[(Term, Seq[TriplePattern])] =
    "[" ~ "]" ^^ { _ => (Var("__bn" + bnCounter.getAndIncrement()), Nil) } |
    "[" ~> rep1sep(term ~ rep1sep(objTerm, ","), ";") <~ opt(";") <~ "]" ^^ {
      pos =>
        val bn = Var("__bn" + bnCounter.getAndIncrement())
        (bn, pos.flatMap { case p ~ objs =>
          objs.flatMap { case (o, extra) => TriplePattern(bn, p, o) +: extra }
        })
    }

  /** RDF collection `( o1 o2 … )` (grammar rules [102]/[103]):
    * desugars to the rdf:first / rdf:rest cons chain over fresh
    * non-distinguished `__bn` variables — in a WHERE pattern those
    * match existing list structure; in a CONSTRUCT / update template
    * [[Compiler.mintTemplateBnodes]] mints them as fresh blank nodes
    * per solution. `()` alone is the term rdf:nil.
    */
  private def collection: Parser[(Term, Seq[TriplePattern])] =
    "(" ~ ")" ^^^ ((Iri("rdf:nil"): Term, Seq.empty[TriplePattern])) |
    "(" ~> rep1(objTerm) <~ ")" ^^ { objs =>
      val cells: Seq[Term] =
        objs.map(_ => Var("__bn" + bnCounter.getAndIncrement()))
      val triples = cells.zip(objs).zipWithIndex.flatMap {
        case ((cell, (o, extra)), i) =>
          Seq(TriplePattern(cell, Iri("rdf:first"), o),
            TriplePattern(cell, Iri("rdf:rest"),
              if (i == cells.size - 1) Iri("rdf:nil") else cells(i + 1))) ++
            extra
      }
      (cells.head, triples)
    }

  /** An object position: a plain term, a nested blank node property
    * list, or an RDF collection — the latter two contribute their own
    * triples.
    */
  private def objTerm: Parser[(Term, Seq[TriplePattern])] =
    bnodePropList | collection | term ^^ (t => (t, Seq.empty[TriplePattern]))

  /** `s p1 o1 , o2 ; p2 o3 .` — object lists share the (s, p) pair and
    * predicate-object chains share the subject (grammar rules
    * [77]/[79]); a blank node property list may stand as subject or
    * object.
    */
  private def triplesSameSubject: Parser[Seq[TriplePattern]] =
    // a blank node property list subject may stand alone (rule [78]
    // allows its PropertyListPath to be empty: `{ [ :p ?o ] }`); a
    // collection may also stand as subject (rule [98] TriplesNode)
    (bnodePropList | collection) ~
      repsep(term ~ rep1sep(objTerm, ","), ";") <~ opt(".") ^^ {
      case ((s, sExtra)) ~ pos => sExtra ++ flattenPo(s, pos)
    } |
    term ~ rep1sep(term ~ rep1sep(objTerm, ","), ";") <~ opt(".") ^^ {
      case s ~ pos => flattenPo(s, pos)
    }

  private def flattenPo(s: Term,
      pos: Seq[SparqlParser.~[Term, Seq[(Term, Seq[TriplePattern])]]]): Seq[TriplePattern] =
    pos.flatMap { case p ~ objs =>
      objs.flatMap { case (o, extra) => TriplePattern(s, p, o) +: extra }
    }

  // ---- filter expressions ------------------------------------------
  private def cmpOp: Parser[CmpOp] =
    "!=" ^^^ Ne | "<=" ^^^ Le | ">=" ^^^ Ge | "=" ^^^ Eq | "<" ^^^ Lt | ">" ^^^ Gt
  /** Comparison: a bare variable keeps the companion-aware Cmp path;
    * any computed left side (arithmetic, STRLEN, CONCAT, …) becomes a
    * typed ExprCmp.
    */
  private def cmp: Parser[Expr] =
    vAdditive ~ cmpOp ~ (numLit | strLit) ^^ {
      case VVar(n) ~ op ~ l => Cmp(op, Var(n), l)
      case e ~ op ~ l => ExprCmp(op, e, l)
    } |
    // term equality against an IRI constant (`?x = <iri>` /
    // `?x != :name`): desugars to the single-element IN machinery,
    // which checks the is-IRI companion where present — ordering
    // operators on IRIs are a §17.3 type error and stay unparsed
    varTerm ~ ("!=" | "=") ~ (iriRef | pname) ^^ {
      case v ~ op ~ i => In(v, Seq(i), op == "!=")
    } |
    // var-var / expr-expr form: both sides computed
    vAdditive ~ cmpOp ~ vAdditive ^^ {
      case l ~ op ~ r => CmpVV(op, l, r)
    }
  private def langCmp: Parser[Expr] =
    ("(?i)LANG".r ~> "(" ~> varTerm <~ ")") ~ ("!=" | "=") ~ strLit ^^ {
      case v ~ op ~ tag => LangCmp(op == "=", v, tag.lexical)
    }
  private def langMatches: Parser[Expr] =
    ("(?i)LANGMATCHES".r ~> "(" ~> "(?i)LANG".r ~> "(" ~> varTerm <~ ")") ~
      ("," ~> strLit <~ ")") ^^ {
      case v ~ range => LangMatches(v, range.lexical)
    }
  private def strOp: Parser[StrOp] =
    "(?i)REGEX".r ^^^ RegexMatch | "(?i)STRSTARTS".r ^^^ StrStarts |
    "(?i)STRENDS".r ^^^ StrEnds | "(?i)CONTAINS".r ^^^ StrContains
  // STR(?v) unwraps to the var: bindings are stored as lexical
  // strings, so SPARQL's STR() is the identity on them
  private def varOrStrVar: Parser[Var] =
    ("(?i)STR".r ~> "(" ~> varTerm <~ ")") | varTerm
  private def strFilter: Parser[Expr] =
    strOp ~ ("(" ~> varOrStrVar) ~ ("," ~> strLit) ~
      (opt("," ~> strLit) <~ ")") >> {
      case op ~ v ~ l ~ fl =>
        // the optional third argument is REGEX's XPath flags string
        if (fl.isDefined && op != RegexMatch)
          failure("only REGEX takes a flags argument")
        else success(StrFilter(op, v, l.lexical,
          fl.map(_.lexical).getOrElse("")))
    }
  private def inFilter: Parser[Expr] =
    varTerm ~ (opt("(?i)NOT".r) <~ "(?i)IN".r) ~
      // repsep, not rep1sep: ExpressionList admits NIL (`?x IN ()`)
      ("(" ~> repsep(
        valuesConst ^^ (Left(_): Either[Term, VExpr]) |
          vAdditive ^^ (Right(_): Either[Term, VExpr]), ",") <~ ")") ^^ {
      case v ~ neg ~ elems if elems.forall(_.isLeft) =>
        In(v, elems.map(_.left.get), neg.isDefined)
      case v ~ neg ~ elems =>
        // expression elements: §17.4.1.9 defines IN as the ||-chain
        // of = — desugar so errors propagate by the || algebra
        // (TRUE || error = TRUE keeps rows whose earlier constant
        // matched; error otherwise drops the row). NOT IN is the
        // &&-chain of != (De Morgan over the same 3-valued logic).
        val eqs: Seq[Expr] = elems.map {
          case Left(i @ Iri(_)) => In(v, Seq(i), neg = false)
          case Left(l: Lit) => Cmp(Eq, v, l)
          case Left(_) =>
            throw new IllegalArgumentException("IN elements must be constants or expressions")
          case Right(e) => CmpVV(Eq, VVar(v.name), e)
        }
        val chain = eqs.reduceLeft(Or.apply)
        if (neg.isDefined) Not(chain) else chain
    }
  private def boundExpr: Parser[Expr] =
    "(?i)BOUND".r ~> "(" ~> varTerm <~ ")" ^^ Bound.apply
  // isIRI (and its isURI synonym) before isLiteral/isBlank is fine:
  // regex alternation tries each full keyword
  private def termTest: Parser[Expr] =
    ("(?i)isIRI".r | "(?i)isURI".r) ~> "(" ~> varTerm <~ ")" ^^ IsIri.apply |
    "(?i)isLiteral".r ~> "(" ~> varTerm <~ ")" ^^ IsLiteral.apply |
    "(?i)isBlank".r ~> "(" ~> varTerm <~ ")" ^^ IsBlank.apply |
    "(?i)isNumeric".r ~> "(" ~> varTerm <~ ")" ^^ IsNumeric.apply |
    "(?i)sameTerm".r ~> "(" ~> (varTerm ~ ("," ~> varTerm)) <~ ")" ^^ {
      case a ~ b => SameTerm(a, b)
    }
  private def notExpr: Parser[Expr] =
    "!" ~> primaryExpr ^^ Not.apply
  /** EXISTS / NOT EXISTS as an operand inside a compound filter
    * expression (W3C ExistsFunc/NotExistsFunc — they are ordinary
    * BuiltInCalls, so `FILTER(EXISTS { … } && ?x > 5)` is legal);
    * bodies are FULL group patterns (r12).
    */
  private def existsExpr: Parser[Expr] =
    "(?i)NOT\\s+EXISTS".r ~> groupGraphPattern ^^ (p => NotExists(p)) |
    "(?i)EXISTS".r ~> groupGraphPattern ^^ (p => Exists(p))
  private def primaryExpr: Parser[Expr] =
    ("(" ~> orExpr <~ ")") | notExpr | langMatches | langCmp | strFilter | boundExpr |
      termTest | inFilter | existsExpr | cmp
  private def andExpr: Parser[Expr] =
    rep1sep(primaryExpr, "&&") ^^ (_.reduceLeft(And.apply))
  private def orExpr: Parser[Expr] =
    rep1sep(andExpr, "||") ^^ (_.reduceLeft(Or.apply))

  private def bgpOnly: Parser[Seq[TriplePattern]] =
    "{" ~> rep(triplesSameSubject) <~ "}" ^^ (_.flatten)

  private def filterElem: Parser[GroupElem] =
    "(?i)FILTER".r ~> (
      "(?i)NOT\\s+EXISTS".r ~> groupGraphPattern ^^ (p => FilterElem(NotExists(p))) |
      "(?i)EXISTS".r ~> groupGraphPattern ^^ (p => FilterElem(Exists(p))) |
      "(" ~> orExpr <~ ")" ^^ FilterElem.apply |
      // W3C Constraint ::= BrackettedExpression | BuiltInCall — a
      // builtin call may follow FILTER with no extra parens
      // (`FILTER REGEX(?n, "^a")`); bare comparisons/IN still
      // require the brackets, exactly as in the spec grammar (r11,
      // found by the conformance suite)
      (langMatches | langCmp | strFilter | boundExpr | termTest |
        notExpr) ^^ FilterElem.apply)

  // ---- group graph pattern -----------------------------------------
  private sealed trait GroupElem
  private case class TriplesElem(ps: Seq[TriplePattern]) extends GroupElem
  private case class FilterElem(e: Expr) extends GroupElem
  private case class OptionalElem(p: Pattern) extends GroupElem
  private case class MinusElem(p: Pattern) extends GroupElem
  private case class BindElem(e: VExpr, as: String) extends GroupElem
  private case class GroupOrUnionElem(p: Pattern) extends GroupElem

  /** Property path triple with a `+`/`*`/`?` modifier:
    * `term (p1|p2|…)+ term .` or the bare form `term p+ term .` —
    * the modifier must touch the predicate (no whitespace), otherwise
    * `?s :p ?o` would lex its object's `?` as a modifier.
    */
  private def parenPathPreds: Parser[(Seq[String], Char)] =
    ("(" ~> rep1sep(iriRef | pname, "|")) ~ """\)[+*?]""".r ^^ {
      case ps ~ close => (ps.map(_.value), close.charAt(1))
    }
  private def barePathPred: Parser[(Seq[String], Char)] =
    """(<[^<>\s]*>|[A-Za-z][A-Za-z0-9_.-]*:[A-Za-z_][A-Za-z0-9_.-]*|:[A-Za-z_][A-Za-z0-9_.-]*)[+*?]""".r ^^ { tok =>
      val raw = tok.init
      val iri = if (raw.startsWith("<")) raw.substring(1, raw.length - 1) else raw
      (Seq(iri), tok.last)
    }
  private def pathTriple: Parser[GroupElem] =
    term ~ (parenPathPreds | barePathPred) ~ term <~ opt(".") ^^ {
      case s ~ ((preds, mod)) ~ o =>
        GroupOrUnionElem(mod match {
          case '+' => PathPlus(s, preds, o)
          case '*' => PathStar(s, preds, o)
          case '?' => PathZeroOne(s, preds, o)
        })
    }

  /** Fixed-range repetition path `term (p1|p2){n,m} term .` (also the
    * `{n}` exact and bare-predicate `p{n,m}` forms) — the Jena ARQ /
    * SPARQL 1.1 draft repetition operator the reference accepts
    * through Jena. As with the other modifiers the `{` must touch the
    * predicate (no whitespace).
    */
  private def rangeSuffix: Parser[(Int, Int)] =
    """\{\d+,\d+\}""".r ^^ { t =>
      val parts = t.substring(1, t.length - 1).split(',')
      (parts(0).toInt, parts(1).toInt)
    } |
    // `{n,}` — unbounded above (the Jena ARQ extension the
    // reference's parser accepts): max = -1 sentinel, compiled as
    // n-1 exact hops composed with the one-or-more closure
    """\{\d+,\}""".r ^^ { t =>
      (t.substring(1, t.length - 2).toInt, -1)
    } |
    """\{\d+\}""".r ^^ { t =>
      val n = t.substring(1, t.length - 1).toInt; (n, n)
    }
  private def rangePathTriple: Parser[GroupElem] =
    term ~ ("(" ~> rep1sep(iriRef | pname, "|") <~ ")" |
            ((iriRef | pname) ^^ (Seq(_)))) ~ rangeSuffix ~ term <~ opt(".") >> {
      case s ~ preds ~ ((mn, mx)) ~ o =>
        if (mx >= 0 && mn > mx) failure(s"path range {$mn,$mx}: min exceeds max")
        else success(GroupOrUnionElem(PathRange(s, preds.map(_.value), mn, mx, o)))
    }

  /** Bare alternation path: `term (p1|p2|…) term .` — exactly one hop
    * over any listed predicate (SPARQL PathAlternative with no
    * repetition modifier; the modifier forms are handled by
    * [[parenPathPreds]]/[[rangePathTriple]], which this rule only
    * reaches after their suffix match fails). At least two
    * alternatives: a one-element parenthesized path is an ordinary
    * triple.
    */
  private def altPathTriple: Parser[GroupElem] =
    term ~ ("(" ~> rep1sep(iriRef | pname | rdfTypeKw, "|") <~ ")") ~
      term <~ opt(".") >> {
      case s ~ preds ~ o =>
        if (preds.size < 2) failure("single-predicate parens: plain triple")
        else success(GroupOrUnionElem(PathAlt(s, preds.map(_.value), o)))
    }

  /** Negated property set: `term !(p1|^p2|…) term .` or `term !p
    * term .` — one hop over any predicate outside the list, where a
    * `^`-prefixed member negates the INVERSE direction (§9.1). The
    * set splits into its forward and inverse parts: !(F…|^I…) is
    * NPS(F) path-alternated with the inverse of NPS(I), i.e. a
    * multiset UNION of the forward hop (p ∉ F) and the reversed hop
    * (p ∉ I with swapped endpoints); a one-sided set keeps the
    * single arm.
    */
  private def negPathMember: Parser[(Boolean, String)] =
    opt("^") ~ (iriRef | pname | rdfTypeKw) ^^ {
      case inv ~ p => (inv.isDefined, p.value)
    }
  private def negPathTriple: Parser[GroupElem] =
    term ~ ("!" ~> (("(" ~> rep1sep(negPathMember, "|") <~ ")") |
      (negPathMember ^^ (Seq(_))))) ~ term <~ opt(".") ^^ {
      case s ~ members ~ o =>
        val fwd = members.collect { case (false, p) => p }
        val inv = members.collect { case (true, p) => p }
        GroupOrUnionElem(
          if (inv.isEmpty) NegPath(s, fwd, o)
          else if (fwd.isEmpty) NegPath(o, inv, s)
          else Union(NegPath(s, fwd, o), NegPath(o, inv, s)))
    }

  /** Sequence path triple: `term step/step/… term .` where a step is
    * `p` or `^p`. A single non-inverse step backtracks to the plain
    * triple rule.
    */
  private def pathAtom: Parser[(String, Boolean)] =
    opt("^") ~ (iriRef | pname | rdfTypeKw) ^^ {
      case inv ~ p => (p.value, inv.isDefined)
    }
  // a step is one atom, a parenthesized ALTERNATION of atoms
  // (`(p1|^p2)`), or the INVERSE of such a group (`^(p1|p2)` ≡
  // `(^p1|^p2)` — §9.1 inverse distributes over alternation)
  private def pathStep: Parser[PathStep] =
    pathAtom ^^ (a => PathStep(Seq(a))) |
    "^" ~> "(" ~> rep1sep(pathAtom, "|") <~ ")" ^^
      (as => PathStep(as.map { case (p, i) => (p, !i) })) |
    "(" ~> rep1sep(pathAtom, "|") <~ ")" ^^ (as => PathStep(as))
  private def seqPathTriple: Parser[GroupElem] =
    term ~ rep1sep(pathStep, "/") ~ term <~ opt(".") >> {
      case s ~ steps ~ o =>
        // a single ALL-FORWARD step is an ordinary triple (one atom)
        // or PathAlt's domain (an alternation) — both backtrack; any
        // inverse atom (`^p`, `^(p1|p2)`, `(p1|^p2)`) stays here
        if (steps.size == 1 && steps.head.alts.forall(!_._2))
          failure("single step: ordinary triple / bare alternation")
        else success(GroupOrUnionElem(PathSeq(s, steps, o)))
    }

  /** Inverse of a parenthesized SEQUENCE: `term ^(p1/p2) term .` ≡
    * `term ^p2/^p1 term .` — §9.1 inv(seq) reverses the steps and
    * inverts each (alternation steps invert member-wise). Single-atom
    * parens stay `^p`'s domain.
    */
  private def invSeqPathTriple: Parser[GroupElem] =
    term ~ ("^" ~> "(" ~> rep1sep(pathStep, "/") <~ ")") ~ term <~ opt(".") >> {
      case s ~ steps ~ o =>
        if (steps.size < 2) failure("single-step inverse parens: use ^p")
        else success(GroupOrUnionElem(PathSeq(s,
          steps.reverse.map(st =>
            PathStep(st.alts.map { case (p, i) => (p, !i) })), o)))
    }

  /** Modifier over a parenthesized SEQUENCE: `term (p1/p2)+ term .`
    * (also `*` / `?`, steps optionally `^`-inverse) — SPARQL 1.1 §9.1
    * path nesting. Two or more steps required: a single step under a
    * modifier is [[parenPathPreds]]/[[barePathPred]]'s domain.
    */
  // ')' and the modifier are separate tokens (whitespace allowed
  // between them, matching seqRangePathTriple's treatment — ADVICE
  // r10); the `?` modifier takes a negative lookahead so it can never
  // swallow the sigil of a following `?var` object term.
  private def seqModPathTriple: Parser[GroupElem] =
    term ~ ("(" ~> rep1sep(pathStep, "/") <~ ")") ~
      """[+*]|\?(?![A-Za-z0-9_])""".r ~ term <~
      opt(".") >> {
      case s ~ steps ~ mod ~ o =>
        if (steps.size < 2) failure("single-step parens: use p+ form")
        else success(GroupOrUnionElem(
          PathSeqMod(s, steps, mod.charAt(0), o)))
    }

  /** Fixed-range repetition over a parenthesized SEQUENCE:
    * `term (p1/p2){n,m} term .` — the last nesting combination
    * ([[seqModPathTriple]] covers `+ * ?`).
    */
  private def seqRangePathTriple: Parser[GroupElem] =
    term ~ ("(" ~> rep1sep(pathStep, "/") <~ ")") ~ rangeSuffix ~ term <~
      opt(".") >> {
      case s ~ steps ~ ((mn, mx)) ~ o =>
        if (steps.size < 2) failure("single-step parens: use p{n,m}")
        else if (mx >= 0 && mn > mx) failure(s"path range {$mn,$mx}: min exceeds max")
        else success(GroupOrUnionElem(PathSeqRange(s, steps, mn, mx, o)))
    }

  /** `GRAPH (<g>|?g) { triples }` — named-graph scoping. A plain
    * BGP body keeps the [[Ast.GraphBgp]] form for either graph term
    * (its per-pattern graph column aligns a VARIABLE graph across the
    * joins); a general body (paths, OPTIONAL, FILTER, UNION, …)
    * parses to [[Ast.GraphGroup]], which the compiler supports for a
    * CONSTANT graph by slicing the quad relation.
    */
  private def graphElem: Parser[GroupElem] =
    "(?i)GRAPH".r ~> (varTerm | iriRef | pname) ~
      (bgpOnly ^^ (Left(_)) | groupGraphPattern ^^ (Right(_))) ^^ {
      case g ~ Left(ps) => GroupOrUnionElem(GraphBgp(g, ps))
      case g ~ Right(p) => GroupOrUnionElem(GraphGroup(g, p))
    }

  private def optionalElem: Parser[GroupElem] =
    "(?i)OPTIONAL".r ~> groupGraphPattern ^^ OptionalElem.apply
  private def minusElem: Parser[GroupElem] =
    "(?i)MINUS".r ~> groupGraphPattern ^^ MinusElem.apply

  // ---- BIND value expressions --------------------------------------
  // longer names before their prefixes: regex alternation is ordered
  // (STRBEFORE/STRAFTER/STRLEN before STR, SUBSTR before STR)
  private def fnName: Parser[String] =
    "(?i)(ENCODE_FOR_URI|CONCAT|UCASE|LCASE|STRLEN|STRBEFORE|STRAFTER|SUBSTR|REPLACE|COALESCE|STR|DATATYPE|LANG|BNODE|ABS|CEIL|FLOOR|ROUND|MD5|SHA1|SHA256|SHA384|SHA512|IRI|URI|YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|TIMEZONE|TZ)".r ^^
      (_.toUpperCase)
  private def ifExpr: Parser[VExpr] =
    "(?i)IF".r ~> "(" ~> orExpr ~ ("," ~> vAdditive) ~ ("," ~> vAdditive) <~ ")" ^^ {
      case c ~ t ~ f => VIf(c, t, f)
    }
  /** STRLANG / STRDT: the second argument is a constant tag / a
    * datatype IRI (angle-bracket or prefixed form both accepted),
    * normalized to a VStr so the compiler sees one shape.
    */
  private def strLangDt: Parser[VExpr] =
    ("(?i)(STRLANG|STRDT)".r ^^ (_.toUpperCase)) ~ ("(" ~> vAdditive) ~
      ("," ~> (iriRef ^^ (i => VStr(i.value)) |
               pname ^^ (i => VStr(i.value)) |
               strLit ^^ (l => VStr(l.lexical)))
        <~ ")") ^^ {
      case f ~ lex ~ arg => FnCall(f, Seq(lex, arg))
    }
  /** Zero-argument builtins: UUID() mints a fresh urn:uuid IRI,
    * STRUUID() the bare simple-literal form, NOW() the query-constant
    * xsd:dateTime (W3C §17.4.5.1 — "the same value for every call in
    * a single query execution").
    */
  private def zeroArgFn: Parser[VExpr] =
    "(?i)(STRUUID|UUID|NOW|BNODE)".r ~ "(" ~ ")" ^^ {
      case f ~ _ ~ _ => FnCall(f.toUpperCase, Nil)
    }
  /** Aggregate call in EXPRESSION position (§18.2.4.4 —
    * `SELECT (SUM(?a)/SUM(?b) AS ?r)`, `ORDER BY DESC(COUNT(?x))`):
    * parses to the parse-time-only [[Ast.VAgg]] node, which the
    * select builder lifts into a hidden aggregate of an inner
    * subquery. Argument rules mirror aggSel's.
    */
  private def aggCall: Parser[VExpr] =
    aggOp ~ ("(" ~> opt("(?i)DISTINCT".r) ~
      (vAdditive ^^ Some.apply | "*" ^^^ None) ~
      opt(";" ~> "(?i)SEPARATOR".r ~> "=" ~> strLit) <~ ")") >> {
      case op ~ (dist ~ arg ~ sep) =>
        val realOp = if (op == Count && dist.isDefined) CountDistinct else op
        val distFlag = dist.isDefined &&
          (realOp == Sum || realOp == GroupConcat || realOp == Avg)
        val sepStr = sep.map(_.lexical).getOrElse(" ")
        arg match {
          case None if realOp != Count && realOp != CountDistinct =>
            failure(s"$realOp(*) is not supported — name a variable")
          case None => success(VAgg(realOp, None, sep = sepStr))
          case Some(VVar(n)) =>
            if (sep.isDefined && realOp != GroupConcat)
              failure("SEPARATOR only applies to GROUP_CONCAT")
            else success(VAgg(realOp, Some(Var(n)), distFlag, sepStr))
          case Some(e) =>
            if (realOp == Sample)
              failure(s"$realOp over an expression is not supported")
            else success(VAgg(realOp, None, distFlag, sepStr,
              expr = Some(e)))
        }
    }
  private def vPrimary: Parser[VExpr] =
    ("(" ~> vAdditive <~ ")") |
    ifExpr |
    strLangDt |
    zeroArgFn |
    aggCall |
    fnName ~ ("(" ~> rep1sep(vAdditive, ",") <~ ")") ^^ {
      case f ~ args => FnCall(f, args)
    } |
    varTerm ^^ (v => VVar(v.name)) |
    numLit ^^ (l => VNum(l.num.get)) |
    strLit ^^ (l => VStr(l.lexical))
  private def vMultiplicative: Parser[VExpr] =
    vPrimary ~ rep(("*" | "/") ~ vPrimary) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (acc, "*" ~ r) => Arith(MulOp, acc, r)
        case (acc, _ ~ r) => Arith(DivOp, acc, r)
      }
    }
  private def vAdditive: Parser[VExpr] =
    vMultiplicative ~ rep(("+" | "-") ~ vMultiplicative) ^^ { case h ~ t =>
      t.foldLeft(h) {
        case (acc, "+" ~ r) => Arith(AddOp, acc, r)
        case (acc, _ ~ r) => Arith(SubOp, acc, r)
      }
    }
  private def bindElem: Parser[GroupElem] =
    "(?i)BIND".r ~> "(" ~> vAdditive ~ ("(?i)AS".r ~> varTerm) <~ ")" ^^ {
      case e ~ v => BindElem(e, v.name)
    }
  private def valuesConst: Parser[Term] =
    "(?i)UNDEF".r ^^^ (Undef: Term) | iriRef | pname | numLit | strLit
  /** The DataBlock shared by in-group `VALUES` and the query-final
    * ValuesClause (W3C §18.2.4.2).
    */
  private def valuesPattern: Parser[ValuesPattern] =
    "(?i)VALUES".r ~> (
      // multi-var form: VALUES (?a ?b) { (c1 c2) … } — zero rows is
      // legal (§18.2.4.2 an empty DataBlock joins as the empty table)
      ("(" ~> rep1(varTerm) <~ ")") ~
        ("{" ~> rep("(" ~> rep1(valuesConst) <~ ")") <~ "}") >> {
        case vs ~ rows =>
          if (rows.exists(_.size != vs.size))
            failure(s"VALUES row arity must be ${vs.size}")
          else success(ValuesPattern(vs, rows))
      } |
      // single-var form: VALUES ?v { c… } (possibly empty)
      varTerm ~ ("{" ~> rep(valuesConst) <~ "}") ^^ {
        case v ~ vals => ValuesPattern(Seq(v), vals.map(Seq(_)))
      })
  private def valuesElem: Parser[GroupElem] =
    valuesPattern ^^ GroupOrUnionElem.apply
  private def groupOrUnion: Parser[GroupElem] =
    rep1sep(groupGraphPattern, "(?i)UNION".r) ^^ (gs =>
      GroupOrUnionElem(gs.reduceLeft(Union.apply)))

  /** Nested `{ SELECT … }` subquery inside a group pattern. */
  private def subSelectElem: Parser[GroupElem] =
    "{" ~> selectQuery <~ "}" ^^ (q => GroupOrUnionElem(SubSelect(q)))

  private def groupElem: Parser[GroupElem] =
    filterElem | optionalElem | minusElem | bindElem | valuesElem |
      graphElem | negPathTriple | pathTriple | seqModPathTriple |
      rangePathTriple | seqRangePathTriple |
      altPathTriple | invSeqPathTriple | seqPathTriple |
      subSelectElem | groupOrUnion | (triplesSameSubject ^^ TriplesElem.apply)

  private def groupGraphPattern: Parser[Pattern] =
    // grammar rule [54] GroupGraphPatternSub: an optional '.' may
    // follow any GraphPatternNotTriples (`BIND(…) . BIND(…)`,
    // `{…} . ?s :p ?o`) — triple blocks consume their own terminator
    "{" ~> rep(groupElem <~ opt(".")) <~ "}" ^^ assemble

  /** SPARQL group semantics: triples merge into one BGP, OPTIONAL
    * left-joins everything seen so far, sub-groups/UNIONs join in,
    * FILTERs scope over the whole group (applied last).
    */
  private def assemble(elems: Seq[GroupElem]): Pattern = {
    var current: Option[Pattern] = None
    var bgp = Vector.empty[TriplePattern]
    val filters = Seq.newBuilder[Expr]
    def flushBgp(): Unit = if (bgp.nonEmpty) {
      val b = Bgp(bgp); bgp = Vector.empty
      current = Some(current.fold[Pattern](b)(Join(_, b)))
    }
    elems.foreach {
      case TriplesElem(ps) => bgp ++= ps
      case FilterElem(e) => filters += e
      case OptionalElem(p) =>
        flushBgp()
        current = Some(LeftJoin(current.getOrElse(Bgp(Seq.empty)), p))
      case MinusElem(p) =>
        flushBgp()
        current = Some(Minus(current.getOrElse(Bgp(Seq.empty)), p))
      case BindElem(e, as) =>
        flushBgp()
        current = Some(Bind(current.getOrElse(Bgp(Seq.empty)), e, as))
      case GroupOrUnionElem(p) =>
        flushBgp()
        current = Some(current.fold(p)(Join(_, p)))
    }
    flushBgp()
    val base = current.getOrElse(Bgp(Seq.empty))
    val fs = filters.result()
    if (fs.isEmpty) base else Filter(fs, base)
  }

  // ---- select clause ----------------------------------------------
  private sealed trait Selector
  private case class VarSel(name: String) extends Selector
  private case class AggSel(agg: Agg) extends Selector
  /** SELECT expression `(expr AS ?alias)` — desugared into a BIND
    * wrapped around the group pattern (projection-phase extension;
    * not supported alongside aggregates).
    */
  private case class ExprSel(e: VExpr, alias: String) extends Selector

  private def aggOp: Parser[AggOp] =
    "(?i)GROUP_CONCAT".r ^^^ GroupConcat | "(?i)COUNT".r ^^^ Count |
    "(?i)SUM".r ^^^ Sum | "(?i)AVG".r ^^^ Avg |
    "(?i)MAX".r ^^^ Max | "(?i)MIN".r ^^^ Min |
    "(?i)SAMPLE".r ^^^ Sample

  private def aggSel: Parser[Selector] =
    "(" ~> aggOp ~ ("(" ~> opt("(?i)DISTINCT".r) ~
      (vAdditive ^^ Some.apply | "*" ^^^ None) ~
      opt(";" ~> "(?i)SEPARATOR".r ~> "=" ~> strLit) <~ ")") ~
      ("(?i)AS".r ~> varTerm) <~ ")" >> {
      case op ~ (dist ~ arg ~ sep) ~ alias =>
        val realOp = (op, dist.isDefined) match {
          case (Count, true) => CountDistinct
          case (o, _) => o
        }
        // DISTINCT set semantics for SUM / AVG / GROUP_CONCAT; a
        // no-op for MIN/MAX/SAMPLE (§18.5.1 — the distinct multiset
        // has the same extremes); COUNT has its own op
        val distFlag = dist.isDefined &&
          (realOp == Sum || realOp == GroupConcat || realOp == Avg)
        val sepStr = sep.map(_.lexical).getOrElse(" ")
        arg match {
          // '*' is COUNT-family only: COUNT(*) and COUNT(DISTINCT *)
          // (distinct full solutions, §18.5.1)
          case None if realOp != Count && realOp != CountDistinct =>
            failure(s"$realOp(*) is not supported — name a variable")
          case None =>
            success(AggSel(Agg(realOp, None, alias.name, sepStr)))
          case Some(VVar(n)) =>
            if (sep.isDefined && realOp != GroupConcat)
              failure("SEPARATOR only applies to GROUP_CONCAT")
            else success(AggSel(Agg(realOp, Some(Var(n)), alias.name, sepStr,
              distinct = distFlag)))
          // expression argument: every aggregate but SAMPLE (whose
          // deterministic lexical-min pick needs a stored binding)
          case Some(e) =>
            if (realOp == Sample)
              failure(s"$realOp over an expression is not supported")
            else success(AggSel(
              Agg(realOp, None, alias.name, sepStr, expr = Some(e),
                distinct = distFlag)))
        }
    }

  private def exprSel: Parser[Selector] =
    "(" ~> vAdditive ~ ("(?i)AS".r ~> varTerm) <~ ")" ^^ {
      case e ~ v => ExprSel(e, v.name)
    }
  private def selector: Parser[Selector] =
    aggSel | exprSel | (varTerm ^^ (v => VarSel(v.name)))

  /** An ORDER BY condition is a variable or a computed expression;
    * expressions desugar into a hidden BIND (`__ord<i>`) wrapped
    * around the group pattern, and the hidden column is dropped after
    * the sort (Compiler.run never projects non-projection vars).
    */
  private sealed trait OrderKey
  private case class OrderVar(name: String) extends OrderKey
  private case class OrderExpr(e: VExpr) extends OrderKey
  // parse the full expression first, then classify: a committed `|`
  // would stop a bare-var parse from extending into `?x * 2`
  private def orderKey: Parser[OrderKey] =
    vAdditive ^^ {
      case VVar(n) => OrderVar(n)
      case e => OrderExpr(e)
    }
  private def orderCond: Parser[(OrderKey, Boolean)] =
    "(?i)DESC".r ~> "(" ~> orderKey <~ ")" ^^ ((_, false)) |
    "(?i)ASC".r ~> "(" ~> orderKey <~ ")" ^^ ((_, true)) |
    // W3C OrderCondition also admits a bare BrackettedExpression
    // (`ORDER BY (35 - ?a)`), ascending (r11, conformance suite)
    "(" ~> orderKey <~ ")" ^^ ((_, true)) |
    varTerm ^^ (v => (OrderVar(v.name): OrderKey, true))

  /** Dataset clause: `FROM <g>` / `FROM NAMED <g>` lines between the
    * projection and WHERE (SPARQL 1.1 §13.2).
    */
  private def datasetClause: Parser[(Boolean, String)] =
    "(?i)FROM".r ~> opt("(?i)NAMED".r) ~ (iriRef | pname) ^^ {
      case named ~ g => (named.isDefined, g.value)
    }

  /** HAVING constraint: the alias form rides the ordinary boolean
    * grammar; the direct-aggregate form (`HAVING (SUM(?s) > 250)` —
    * W3C agg08) parses here and resolves against the projection's
    * aggregates at compile time (r11, conformance suite).
    */
  private def havingAggCmp: Parser[Expr] =
    aggOp ~ ("(" ~> opt("(?i)DISTINCT".r) ~
      (varTerm ^^ Some.apply | "*" ^^^ None) <~ ")") ~ cmpOp ~
      (numLit | strLit) ^^ {
      case op ~ (dist ~ v) ~ c ~ l =>
        val realOp = if (op == Count && dist.isDefined) CountDistinct else op
        HavingAggCmp(realOp, v.map(t => Var(t.name)), c, l)
    }
  private def havingPrimary: Parser[Expr] = havingAggCmp | primaryExpr
  private def havingExpr: Parser[Expr] =
    rep1sep(rep1sep(havingPrimary, "&&") ^^ (_.reduceLeft(And.apply)),
      "||") ^^ (_.reduceLeft(Or.apply))

  /** GROUP BY condition: a variable, or the W3C `(expr AS ?v)` form
    * (SPARQL 1.1 §19.8 GroupCondition) — the expression desugars into
    * a hidden BIND around the WHERE pattern, so grouping always runs
    * over named columns (r11, conformance family).
    */
  private def groupCond: Parser[Either[String, (VExpr, String)]] =
    varTerm ^^ (v => Left(v.name)) |
    ("(" ~> vAdditive ~ ("(?i)AS".r ~> varTerm) <~ ")") ^^ {
      case e ~ v => Right((e, v.name))
    }

  /** §18.2.4.4 lift: replace every [[Ast.VAgg]] in `e` with a VVar
    * over a hidden aggregate alias, accumulating the hidden Agg
    * entries. An identical VISIBLE aggregate (same op/arg/flags)
    * reuses its alias, so `ORDER BY DESC(COUNT(?x))` next to
    * `(COUNT(?x) AS ?c)` rides the projected fold instead of
    * aggregating twice.
    */
  private def liftAggs(e: VExpr, visible: Seq[Agg],
      buf: scala.collection.mutable.ListBuffer[Agg]): VExpr = e match {
    case VAgg(op, v, dst, sep, ex) =>
      val all = visible ++ buf
      val alias = all.find(a => a.op == op && a.v == v &&
          a.distinct == dst && a.sep == sep && a.expr == ex)
        .map(_.alias).getOrElse {
          val nm = s"__sagg${buf.size}"
          buf += Agg(op, v, nm, sep, ex, dst)
          nm
        }
      VVar(alias)
    case Arith(op, l, r) =>
      Arith(op, liftAggs(l, visible, buf), liftAggs(r, visible, buf))
    case FnCall(f, as) => FnCall(f, as.map(liftAggs(_, visible, buf)))
    case VIf(c, t, f) => VIf(liftAggsExpr(c, visible, buf),
      liftAggs(t, visible, buf), liftAggs(f, visible, buf))
    case other => other
  }
  private def liftAggsExpr(e: Expr, visible: Seq[Agg],
      buf: scala.collection.mutable.ListBuffer[Agg]): Expr = e match {
    // a lift that leaves a BARE variable takes the companion-aware
    // Cmp path (ExprCmp dispatches statically on the expression
    // SHAPE, which would misread a lone alias var as non-numeric —
    // the same normalization the cmp parser applies)
    case ExprCmp(op, x, l) => liftAggs(x, visible, buf) match {
      case VVar(n) => Cmp(op, Var(n), l)
      case lifted => ExprCmp(op, lifted, l)
    }
    case CmpVV(op, l, r) =>
      CmpVV(op, liftAggs(l, visible, buf), liftAggs(r, visible, buf))
    case And(l, r) =>
      And(liftAggsExpr(l, visible, buf), liftAggsExpr(r, visible, buf))
    case Or(l, r) =>
      Or(liftAggsExpr(l, visible, buf), liftAggsExpr(r, visible, buf))
    case Not(x) => Not(liftAggsExpr(x, visible, buf))
    case other => other
  }

  /** Conservative variable footprint of a select/order expression
    * (post-lift: no VAgg remains) — used for the §18.2.5.3 DISTINCT
    * sort-key scope check.
    */
  private def vexprVarNames(e: VExpr): Set[String] = e match {
    case VVar(n) => Set(n)
    case Arith(_, l, r) => vexprVarNames(l) ++ vexprVarNames(r)
    case FnCall(_, as) => as.flatMap(vexprVarNames).toSet
    case VIf(c, t, f) =>
      exprVarNames(c) ++ vexprVarNames(t) ++ vexprVarNames(f)
    case _ => Set.empty
  }
  private def exprVarNames(e: Expr): Set[String] = e match {
    case Cmp(_, v, _) => Set(v.name)
    case ExprCmp(_, x, _) => vexprVarNames(x)
    case CmpVV(_, l, r) => vexprVarNames(l) ++ vexprVarNames(r)
    case And(l, r) => exprVarNames(l) ++ exprVarNames(r)
    case Or(l, r) => exprVarNames(l) ++ exprVarNames(r)
    case Not(x) => exprVarNames(x)
    case Bound(v) => Set(v.name)
    case _ => Set.empty
  }

  private def selectQuery: Parser[SelectQuery] =
    "(?i)SELECT".r ~> opt("(?i)DISTINCT".r) ~ (rep1(selector) ^^ Some.apply | "*" ^^^ None) ~
      rep(datasetClause) ~
      ("(?i)WHERE".r ~> groupGraphPattern) ~
      opt("(?i)GROUP\\s+BY".r ~> rep1(groupCond)) ~
      opt("(?i)HAVING".r ~> "(" ~> havingExpr <~ ")") ~
      opt("(?i)ORDER\\s+BY".r ~> rep1(orderCond)) ~
      // LIMIT/OFFSET in either order, per the SPARQL grammar
      rep(("(?i)LIMIT".r ~> """\d+""".r ^^ (n => ("limit", n.toLong))) |
          ("(?i)OFFSET".r ~> """\d+""".r ^^ (n => ("offset", n.toLong)))) ~
      // query-final ValuesClause (W3C §18.2.4.2): the data block joins
      // the WHERE pattern's solutions — exactly the in-group VALUES
      // algebra for pattern-level queries, so it desugars to
      // Join(where, data). With aggregates the spec joins AFTER
      // grouping, which this desugaring would misplace — rejected.
      opt(valuesPattern) ^^ {
      case dist ~ sels ~ dataset ~ where0 ~ group ~ hav ~ order ~ slices ~ tval =>
        val limit = slices.collectFirst { case ("limit", n) => n }
        val offset = slices.collectFirst { case ("offset", n) => n }
        val selectors = sels.getOrElse(Seq.empty)
        val aggSels = selectors.collect { case AggSel(a) => a }
        val groupConds = group.getOrElse(Seq.empty)
        val groupNames = groupConds.map {
          case Left(n) => n
          case Right((_, n)) => n
        }
        val groupExprBinds = groupConds.collect { case Right(en) => en }
        // §18.2.4.4: lift aggregate calls embedded in SELECT / ORDER
        // BY expressions into hidden aggregates (an embedded call
        // identical to a projected one reuses its alias)
        val hidden = scala.collection.mutable.ListBuffer.empty[Agg]
        val exprSels = selectors.collect { case ExprSel(e, alias) =>
          ExprSel(liftAggs(e, aggSels, hidden), alias)
        }
        val orderKeys = order.getOrElse(Seq.empty).map {
          // a pure aggregate-call key normalizes to its (possibly
          // hidden) alias and keeps the direct variable-sort path
          case (OrderExpr(e), asc) => liftAggs(e, aggSels, hidden) match {
            case VVar(n) => (OrderVar(n): OrderKey, asc)
            case lifted => (OrderExpr(lifted): OrderKey, asc)
          }
          case other => other
        }
        // general HAVING expressions (`HAVING (SUM(?s)/COUNT(?e) >
        // n)`) lift their aggregate calls the same way; the dedicated
        // HavingAggCmp form passes through untouched
        val havs = hav.toSeq.map(liftAggsExpr(_, aggSels, hidden))
        val orderExprs = orderKeys.zipWithIndex.collect {
          case ((OrderExpr(e), _), idx) => (s"__ord$idx", e)
        }
        val orderBy = orderKeys.zipWithIndex.map {
          case ((OrderVar(n), asc), _) => (n, asc)
          case ((OrderExpr(_), asc), idx) => (s"__ord$idx", asc)
        }
        val projection = selectors.map {
          case VarSel(n) => n
          case AggSel(a) => a.alias
          case ExprSel(_, alias) => alias
        }
        val fromG = dataset.collect { case (false, g) => g }
        val fromN = dataset.collect { case (true, g) => g }
        val hasAgg = aggSels.nonEmpty || hidden.nonEmpty
        // §18.2.4.1 validity: in an aggregate query (any aggregate
        // call, GROUP BY clause, OR bare HAVING — §18.2.4 groups the
        // whole solution sequence into one implicit group for it) the
        // projection may use only group keys and aggregate results —
        // an ungrouped variable has no single value per group, and
        // the spec makes referencing one a QUERY error, not a free
        // choice. Without this guard the post-aggregation projection
        // would silently materialize the variable as unbound (the
        // bound-nowhere sentinel path). SELECT * in an aggregate
        // query is the same error in star form (§18.2.4.1 defines
        // the projection by enumeration).
        if (hasAgg || groupNames.nonEmpty || hav.isDefined) {
          if (sels.isEmpty) throw new IllegalArgumentException(
            "SELECT * is not allowed in an aggregate query (§18.2.4.1)")
          val exprAliases = (aggSels.map(_.alias) ++ hidden.map(_.alias) ++
            selectors.collect { case ExprSel(_, a) => a }).toSet
          val badVars = selectors.collect { case VarSel(n) => n }
            .filterNot(groupNames.contains)
          if (badVars.nonEmpty) throw new IllegalArgumentException(
            badVars.map("?" + _).mkString(", ") +
              " projected but neither grouped nor aggregated (§18.2.4.1)")
          exprSels.foreach { case ExprSel(e, alias) =>
            val bad = vexprVarNames(e) -- groupNames.toSet -- exprAliases
            if (bad.nonEmpty) throw new IllegalArgumentException(
              s"SELECT expression ?$alias references ungrouped " +
                bad.map("?" + _).mkString(", ") + " (§18.2.4.1)")
          }
          // HAVING evaluates over GROUPS, so a plain variable there
          // must be a group key or an AGGREGATE alias (the
          // HavingAggCmp form and lifted aggregate calls arrive as
          // their aliases and pass). Non-aggregate SELECT-expression
          // aliases are NOT admissible: §18.2.4.4 evaluates SELECT
          // expressions after HAVING, so they are out of scope there.
          // Previously both classes surfaced as raw unresolved-column
          // crashes at compile.
          val aggAliases =
            (aggSels.map(_.alias) ++ hidden.map(_.alias)).toSet
          val badHav = havs.flatMap(exprVarNames)
            .filterNot(n => groupNames.contains(n) || aggAliases.contains(n))
          if (badHav.nonEmpty) throw new IllegalArgumentException(
            "HAVING references ungrouped " +
              badHav.distinct.map("?" + _).mkString(", ") + " (§18.2.4.1)")
        }
        // §18.2.5.3: under DISTINCT a sort key must be an expression
        // over PROJECTED variables (aggregate aliases count — hidden
        // lifted ones included, they are group-functional); anything
        // else is a loud error, matching the variable-key posture
        if (dist.isDefined && orderExprs.nonEmpty && projection.nonEmpty) {
          val allowed = (projection ++ aggSels.map(_.alias) ++
            hidden.map(_.alias)).toSet
          orderExprs.foreach { case (_, e) =>
            val bad = vexprVarNames(e) -- allowed
            if (bad.nonEmpty) throw new IllegalArgumentException(
              "ORDER BY expression under DISTINCT references unprojected " +
                bad.map("?" + _).mkString(", ") + " (§18.2.5.3)")
          }
        }
        if (hasAgg &&
            (exprSels.nonEmpty || orderExprs.nonEmpty || tval.isDefined)) {
          // §18.2.4 staging via a subquery: (1) group/aggregate +
          // HAVING in an inner SELECT, (2) the final VALUES block
          // joins the GROUPED solutions (not the pattern ones), (3)
          // SELECT expressions extend them left-to-right, (4) ORDER
          // BY expressions bind hidden sort keys, then DISTINCT and
          // the slice apply on top
          val varSelNames = selectors.collect { case VarSel(n) => n }
          val inner = SelectQuery(
            where = groupExprBinds.foldLeft(where0) {
              case (w, (e, nm)) => Bind(w, e, nm)
            },
            projection = (varSelNames ++ groupNames ++
              aggSels.map(_.alias) ++ hidden.map(_.alias)).distinct,
            aggregates = aggSels ++ hidden.toSeq,
            groupBy = groupNames,
            having = havs)
          val joined = tval.fold(SubSelect(inner): Pattern)(vp =>
            Join(SubSelect(inner), vp))
          val extended =
            exprSels.foldLeft(joined)((w, s) => Bind(w, s.e, s.alias))
          if (dist.isDefined && orderExprs.nonEmpty) {
            // DISTINCT evaluates before ORDER BY: distinct the
            // projection in a middle subquery, sort on hidden keys
            // bound OUTSIDE it (§18.2.5.3 — the keys are expressions
            // over projected variables)
            val mid = SelectQuery(where = extended,
              projection = projection, distinct = true)
            SelectQuery(
              where = orderExprs.foldLeft(SubSelect(mid): Pattern) {
                case (w, (nm, e)) => Bind(w, e, nm)
              },
              projection = projection, orderBy = orderBy,
              offset = offset.getOrElse(0L), limit = limit.getOrElse(-1L),
              fromGraphs = fromG, fromNamed = fromN)
          } else
            SelectQuery(
              where = orderExprs.foldLeft(extended) {
                case (w, (nm, e)) => Bind(w, e, nm)
              },
              projection = projection,
              distinct = dist.isDefined,
              orderBy = orderBy,
              offset = offset.getOrElse(0L), limit = limit.getOrElse(-1L),
              fromGraphs = fromG, fromNamed = fromN)
        } else if (!hasAgg && dist.isDefined && orderExprs.nonEmpty) {
          // SELECT DISTINCT … ORDER BY <expr>: distinct runs first
          // over the projection (SELECT expressions pre-bound as
          // usual), the hidden sort keys bind outside the subquery
          val whereJ = tval.fold(where0)(vp => Join(where0, vp))
          val whereWithSels =
            exprSels.foldLeft(whereJ)((w, s) => Bind(w, s.e, s.alias))
          val whereWithGroups = groupExprBinds.foldLeft(whereWithSels) {
            case (w, (e, nm)) => Bind(w, e, nm)
          }
          val mid = SelectQuery(where = whereWithGroups,
            projection = projection, distinct = true)
          SelectQuery(
            where = orderExprs.foldLeft(SubSelect(mid): Pattern) {
              case (w, (nm, e)) => Bind(w, e, nm)
            },
            projection = projection, orderBy = orderBy,
            offset = offset.getOrElse(0L), limit = limit.getOrElse(-1L),
            fromGraphs = fromG, fromNamed = fromN)
        } else {
          // pattern-level path: SELECT expressions and expression
          // order keys desugar to pre-projection BINDs
          val where = tval.fold(where0)(vp => Join(where0, vp))
          val whereWithSels =
            exprSels.foldLeft(where)((w, s) => Bind(w, s.e, s.alias))
          val whereWithGroups = groupExprBinds.foldLeft(whereWithSels) {
            case (w, (e, nm)) => Bind(w, e, nm)
          }
          SelectQuery(
            where = orderExprs.foldLeft(whereWithGroups) {
              case (w, (nm, e)) => Bind(w, e, nm)
            },
            projection = projection,
            aggregates = aggSels ++ hidden.toSeq,
            groupBy = groupNames,
            having = havs,
            distinct = dist.isDefined,
            orderBy = orderBy,
            offset = offset.getOrElse(0L),
            limit = limit.getOrElse(-1L),
            fromGraphs = fromG, fromNamed = fromN)
        }
    }

  // ---- PREFIX declarations -----------------------------------------
  /** `PREFIX ns: <iri>` header lines (reference prepends these and
    * lets Jena resolve them: pidb-rdf-engine/src/main/java/sparql/
    * Prefixes.java). Resolution is a post-parse rewrite: any prefixed
    * name whose prefix is declared expands to the declared namespace +
    * local part; undeclared prefixes pass through verbatim (the triple
    * store's own short-form vocabulary keeps working).
    */
  private def prefixDecl: Parser[(String, String)] =
    "(?i)PREFIX".r ~> ("""[A-Za-z][A-Za-z0-9_-]*:""".r | ":") ~ iriRef ^^ {
      case p ~ i => (p, i.value)
    }
  /** `BASE <iri>` — stored under a reserved key (no user prefix can
    * collide: prefixes end in ':'); a later BASE wins via toMap. A
    * relative IRI (`<alice>`, no scheme colon) resolves by
    * concatenation — the straight-prepend subset of RFC 3986 (no
    * dot-segment normalization), which covers the hash/slash
    * namespace layout every RDF vocabulary uses.
    */
  private def baseDecl: Parser[(String, String)] =
    "(?i)BASE".r ~> iriRef ^^ (i => ("\u0000base", i.value))
  private def prologue: Parser[Map[String, String]] =
    rep(prefixDecl | baseDecl) ^^ (_.toMap)

  private def expandIri(v: String, pfx: Map[String, String]): String = {
    val idx = v.indexOf(':')
    if (idx < 0)
      pfx.get("\u0000base").map(_ + v).getOrElse(v)
    else if (pfx.isEmpty) v
    else pfx.get(v.substring(0, idx + 1))
      .map(_ + v.substring(idx + 1)).getOrElse(v)
  }

  private def rewriteTerm(t: Term, f: String => String): Term = t match {
    case Iri(v) => Iri(f(v))
    case other => other
  }
  private def rewriteTp(tp: TriplePattern, f: String => String): TriplePattern =
    TriplePattern(rewriteTerm(tp.s, f), rewriteTerm(tp.p, f), rewriteTerm(tp.o, f))
  private def rewriteExpr(e: Expr, f: String => String): Expr = e match {
    case Exists(p) => Exists(rewritePattern(p, f))
    case NotExists(p) => NotExists(rewritePattern(p, f))
    case And(l, r) => And(rewriteExpr(l, f), rewriteExpr(r, f))
    case Or(l, r) => Or(rewriteExpr(l, f), rewriteExpr(r, f))
    case Not(x) => Not(rewriteExpr(x, f))
    case In(v, vals, neg) => In(v, vals.map(rewriteTerm(_, f)), neg)
    case other => other // Cmp / LangCmp / StrFilter / Bound carry no IRIs
  }
  private def rewritePattern(p: Pattern, f: String => String): Pattern = p match {
    case Bgp(ps) => Bgp(ps.map(rewriteTp(_, f)))
    case Filter(es, in) => Filter(es.map(rewriteExpr(_, f)), rewritePattern(in, f))
    case LeftJoin(l, r) => LeftJoin(rewritePattern(l, f), rewritePattern(r, f))
    case Union(l, r) => Union(rewritePattern(l, f), rewritePattern(r, f))
    case Join(l, r) => Join(rewritePattern(l, f), rewritePattern(r, f))
    case Minus(l, r) => Minus(rewritePattern(l, f), rewritePattern(r, f))
    case Bind(in, e, as) => Bind(rewritePattern(in, f), e, as) // VExpr: no IRIs
    case ValuesPattern(vs, rows) =>
      ValuesPattern(vs, rows.map(_.map(rewriteTerm(_, f))))
    case PathPlus(s, preds, o) =>
      PathPlus(rewriteTerm(s, f), preds.map(f), rewriteTerm(o, f))
    case PathStar(s, preds, o) =>
      PathStar(rewriteTerm(s, f), preds.map(f), rewriteTerm(o, f))
    case PathZeroOne(s, preds, o) =>
      PathZeroOne(rewriteTerm(s, f), preds.map(f), rewriteTerm(o, f))
    case PathRange(s, preds, mn, mx, o) =>
      PathRange(rewriteTerm(s, f), preds.map(f), mn, mx, rewriteTerm(o, f))
    case GraphBgp(g, ps) =>
      GraphBgp(rewriteTerm(g, f), ps.map(rewriteTp(_, f)))
    case GraphGroup(g, inner) =>
      GraphGroup(rewriteTerm(g, f), rewritePattern(inner, f))
    case PathSeq(s, steps, o) =>
      PathSeq(rewriteTerm(s, f),
        steps.map(_.rewrite(f)), rewriteTerm(o, f))
    case PathSeqMod(s, steps, mod, o) =>
      PathSeqMod(rewriteTerm(s, f),
        steps.map(_.rewrite(f)), mod,
        rewriteTerm(o, f))
    case PathSeqRange(s, steps, mn, mx, o) =>
      PathSeqRange(rewriteTerm(s, f),
        steps.map(_.rewrite(f)), mn, mx,
        rewriteTerm(o, f))
    case NegPath(s, preds, o) =>
      NegPath(rewriteTerm(s, f), preds.map(f), rewriteTerm(o, f))
    case PathAlt(s, preds, o) =>
      PathAlt(rewriteTerm(s, f), preds.map(f), rewriteTerm(o, f))
    case SubSelect(q) => SubSelect(q.copy(where = rewritePattern(q.where, f)))
    // compiler-internal nodes; never present in a parsed tree —
    // PreBound carries no IRIs, GraphPath recurses for completeness
    case pb: PreBound => pb
    case g: GraphNames => g
    case GraphPath(gn, path) => GraphPath(gn, rewritePattern(path, f))
    case PerGraphLimited(gn, q, dropAfter) =>
      PerGraphLimited(gn, q.copy(where = rewritePattern(q.where, f)), dropAfter)
    case PerGraphGlobalAgg(gn, q) =>
      PerGraphGlobalAgg(gn, q.copy(where = rewritePattern(q.where, f)))
  }

  private def finish[T](res: ParseResult[T]): T = res match {
    case Success(q, _) => q
    case NoSuccess(msg, rest) =>
      throw new IllegalArgumentException(
        s"SPARQL parse error at line ${rest.pos.line}:${rest.pos.column}: $msg")
    case other =>
      throw new IllegalArgumentException(s"SPARQL parse error: $other")
  }

  def parse(text: String): SelectQuery = {
    val (pfx, q) = finish(parseAll(prologue ~ selectQuery ^^ {
      case p ~ s => (p, s)
    }, text))
    if (pfx.isEmpty) q
    else q.copy(where = rewritePattern(q.where, expandIri(_, pfx)),
      fromGraphs = q.fromGraphs.map(expandIri(_, pfx)),
      fromNamed = q.fromNamed.map(expandIri(_, pfx)))
  }

  /** ASK query form: the group pattern whose non-emptiness is the
    * answer.
    */
  def parseAsk(text: String): Pattern = {
    val (pfx, w) = finish(parseAll(
      prologue ~ ("(?i)ASK".r ~> groupGraphPattern) ^^ { case p ~ s => (p, s) },
      text))
    rewritePattern(w, expandIri(_, pfx))
  }

  /** DESCRIBE query form: the resource IRI to look up, after prefix
    * expansion (reference serves this via its endpoint:
    * pidb-rdf-import/src/main/java/semantics/extension/RDFEndpoint.java).
    */
  def parseDescribe(text: String): String = {
    val (pfx, iri) = finish(parseAll(
      prologue ~ ("(?i)DESCRIBE".r ~> (iriRef | pname)) ^^ {
        case p ~ i => (p, i)
      }, text))
    expandIri(iri.value, pfx)
  }

  /** Full DESCRIBE grammar (SPARQL 1.1 §16.4):
    * `DESCRIBE VarOrIri+ WhereClause?` — any mix of constant IRIs and
    * variables, with an optional WHERE group pattern (the WHERE
    * keyword itself optional, per the spec grammar). The described
    * resource set is the constants plus every binding of each listed
    * variable in the pattern's solutions; a variable with no pattern
    * (or absent from it) describes nothing, a pattern with only
    * constant targets still CONSTRAINS nothing (constants are
    * unconditionally described — §16.4's union semantics). Returns
    * the target list (Left = expanded constant IRI, Right = variable
    * name) and the optional rewritten pattern.
    */
  def parseDescribeQuery(text: String)
      : (Seq[Either[String, String]], Option[Pattern]) = {
    val target: Parser[Either[Iri, String]] =
      varTerm ^^ (v => Right(v.name): Either[Iri, String]) |
        (iriRef | pname) ^^ (i => Left(i): Either[Iri, String])
    val q =
      prologue ~ ("(?i)DESCRIBE".r ~> rep1(target)) ~
        opt(opt("(?i)WHERE".r) ~> groupGraphPattern) ^^ {
          case p ~ ts ~ w => (p, ts, w)
        }
    val (pfx, ts, w) = finish(parseAll(q, text))
    (ts.map {
      case Left(i) => Left(expandIri(i.value, pfx)): Either[String, String]
      case Right(v) => Right(v): Either[String, String]
    }, w.map(rewritePattern(_, expandIri(_, pfx))))
  }

  /** SPARQL Update forms: INSERT DATA / DELETE DATA / DELETE WHERE /
    * the DELETE-INSERT-WHERE template modify / the §3.2
    * graph-management forms (CLEAR, DROP, CREATE, COPY, MOVE, ADD).
    *
    * Graph-management notes: the quad model has no empty graphs, so
    * DROP normalizes to CLEAR and CREATE parses to a checked no-op;
    * SILENT is accepted (every form is already total over a quad
    * relation); DEFAULT as a management target is rejected — the
    * default graph here is the read-time union of the triple store,
    * not a mutable graph slot.
    */
  def parseUpdate(text: String): Update.Op = {
    // [WITH <g>] (DELETE {t} [INSERT {t}] | INSERT {t})
    //   (USING [NAMED] <g>)* WHERE {p}   — grammar rule [41] Modify.
    // Bare modify (no WITH, no USING) keeps the triple-store Modify
    // form; any graph scoping parses to ModifyGraph (quads only).
    val templates: Parser[(Seq[TriplePattern], Seq[TriplePattern])] =
      ("(?i)DELETE".r ~> bgpOnly) ~ opt("(?i)INSERT".r ~> bgpOnly) ^^ {
        case del ~ ins => (del, ins.getOrElse(Nil))
      } |
      ("(?i)INSERT".r ~> bgpOnly) ^^ (ins => (Seq.empty[TriplePattern], ins))
    val usingClause: Parser[Either[String, String]] =
      ("(?i)USING".r ~> "(?i)NAMED".r ~> ((iriRef | pname) ^^ (_.value))) ^^
        (g => Right(g): Either[String, String]) |
      ("(?i)USING".r ~> ((iriRef | pname) ^^ (_.value))) ^^
        (g => Left(g): Either[String, String])
    val modify: Parser[Update.Op] =
      opt("(?i)WITH".r ~> ((iriRef | pname) ^^ (_.value))) ~ templates ~
        rep(usingClause) ~ ("(?i)WHERE".r ~> groupGraphPattern) ^^ {
        case w ~ ((del, ins)) ~ us ~ where =>
          if (w.isEmpty && us.isEmpty) Update.Modify(del, ins, where)
          else Update.ModifyGraph(w, del, ins,
            us.collect { case Left(g) => g },
            us.collect { case Right(g) => g }, where)
      }
    // `[GRAPH] <g>` — the GRAPH keyword is optional in COPY/MOVE/ADD
    // (GraphOrDefault) and required in CLEAR/DROP/CREATE (GraphRef);
    // DEFAULT fails with a pointed message instead of a generic one.
    val graphName: Parser[String] =
      (iriRef | pname) ^^ (_.value) |
      "(?i)DEFAULT".r >> (_ => failure(
        "DEFAULT is not a managed graph — the default graph is the union view"))
    val silent = opt("(?i)SILENT".r)
    val graphRef: Parser[String] = "(?i)GRAPH".r ~> graphName
    val graphOrDefault: Parser[String] = opt("(?i)GRAPH".r) ~> graphName
    val graphMgmt: Parser[Update.Op] =
      "(?i)CLEAR".r ~> silent ~> graphRef ^^ Update.ClearGraph.apply |
      // DROP ≡ CLEAR over quads: no graph outlives its last quad
      "(?i)DROP".r ~> silent ~> graphRef ^^ Update.ClearGraph.apply |
      "(?i)CREATE".r ~> silent ~> graphRef ^^ Update.CreateGraph.apply |
      ("(?i)COPY".r ~> silent ~> graphOrDefault) ~
        ("(?i)TO".r ~> graphOrDefault) ^^ {
        case f ~ t => Update.CopyGraph(f, t)
      } |
      ("(?i)MOVE".r ~> silent ~> graphOrDefault) ~
        ("(?i)TO".r ~> graphOrDefault) ^^ {
        case f ~ t => Update.MoveGraph(f, t)
      } |
      ("(?i)ADD".r ~> silent ~> graphOrDefault) ~
        ("(?i)TO".r ~> graphOrDefault) ^^ {
        case f ~ t => Update.AddToGraph(f, t)
      }
    // LOAD [SILENT] <source> [INTO GRAPH g] (§3.1.31) — the source
    // stays a verbatim IRI (file:///… or http(s)://…), never
    // prefix-expanded; the destination graph is a normal graph name
    val load: Parser[Update.Op] =
      ("(?i)LOAD".r ~> silent) ~ iriRef ~
        opt("(?i)INTO".r ~> "(?i)GRAPH".r ~> graphName) ^^ {
        case sil ~ src ~ g => Update.Load(src.value, g, sil.isDefined)
      }
    // QuadData (grammar [48]/[49]): `{ (GRAPH g { triples })+ }` —
    // GRAPH-scoped data blocks; bare triples keep the triple-store
    // data forms (the quad default graph is the read-time union)
    val quadBlock: Parser[(String, Seq[TriplePattern])] =
      ("(?i)GRAPH".r ~> ((iriRef | pname) ^^ (_.value))) ~ bgpOnly ^^ {
        case g ~ ts => (g, ts)
      }
    val quadData: Parser[Seq[(String, Seq[TriplePattern])]] =
      "{" ~> rep1(quadBlock <~ opt(".")) <~ "}"
    val (pfx, op) = finish(parseAll(prologue ~ (
      "(?i)INSERT\\s+DATA".r ~> (
        quadData ^^ Update.InsertQuadData.apply |
        bgpOnly ^^ Update.InsertData.apply) |
      "(?i)DELETE\\s+DATA".r ~> (
        quadData ^^ Update.DeleteQuadData.apply |
        bgpOnly ^^ Update.DeleteData.apply) |
      "(?i)DELETE\\s+WHERE".r ~> bgpOnly ^^ Update.DeleteWhere.apply |
      load |
      graphMgmt |
      modify) ^^ {
      case p ~ o => (p, o)
    }, text))
    def rw(ts: Seq[TriplePattern]) = ts.map(rewriteTp(_, expandIri(_, pfx)))
    def rg(g: String) = expandIri(g, pfx)
    op match {
      case Update.InsertData(ts) => Update.InsertData(rw(ts))
      case Update.DeleteData(ts) => Update.DeleteData(rw(ts))
      case Update.InsertQuadData(bs) =>
        Update.InsertQuadData(bs.map { case (g, ts) => (rg(g), rw(ts)) })
      case Update.DeleteQuadData(bs) =>
        Update.DeleteQuadData(bs.map { case (g, ts) => (rg(g), rw(ts)) })
      case Update.DeleteWhere(ts) => Update.DeleteWhere(rw(ts))
      case Update.Modify(d, i, w) =>
        Update.Modify(rw(d), rw(i), rewritePattern(w, expandIri(_, pfx)))
      case Update.ModifyGraph(g, d, i, us, un, w) =>
        Update.ModifyGraph(g.map(rg), rw(d), rw(i), us.map(rg), un.map(rg),
          rewritePattern(w, expandIri(_, pfx)))
      case Update.Load(s, g, sil) => Update.Load(s, g.map(rg), sil)
      case Update.ClearGraph(g) => Update.ClearGraph(rg(g))
      case Update.CreateGraph(g) => Update.CreateGraph(rg(g))
      case Update.CopyGraph(f, t) => Update.CopyGraph(rg(f), rg(t))
      case Update.MoveGraph(f, t) => Update.MoveGraph(rg(f), rg(t))
      case Update.AddToGraph(f, t) => Update.AddToGraph(rg(f), rg(t))
    }
  }

  /** CONSTRUCT query form: (template triples, where pattern). Also
    * accepts the SPARQL 1.1 §10.2.3 `CONSTRUCT WHERE { tp* }`
    * shorthand, where the pattern doubles as the template.
    */
  def parseConstruct(text: String): (Seq[TriplePattern], Pattern) = {
    val full =
      prologue ~ ("(?i)CONSTRUCT".r ~> bgpOnly) ~
        ("(?i)WHERE".r ~> groupGraphPattern) ^^ {
        case p ~ t ~ w => (p, t, w)
      }
    val shorthand =
      prologue ~ ("(?i)CONSTRUCT\\s+WHERE".r ~> bgpOnly) ^^ {
        case p ~ t => (p, t, Bgp(t))
      }
    val (pfx, tmpl, where) = finish(parseAll(shorthand | full, text))
    (tmpl.map(rewriteTp(_, expandIri(_, pfx))),
      rewritePattern(where, expandIri(_, pfx)))
  }
}
