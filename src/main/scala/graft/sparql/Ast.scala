package graft.sparql

/** SPARQL algebra subset matching the reference compiler's coverage
  * (reference: pidb-rdf-engine/src/main/java/sparql/SparqlToGremlinCompiler.java:235-317,
  * WhereTraversalBuilder.java:40-117): BGP, FILTER (6 comparators,
  * &&, ||, EXISTS, NOT EXISTS), OPTIONAL, UNION, projection, DISTINCT,
  * ORDER BY, LIMIT/OFFSET, GROUP BY with COUNT/COUNT DISTINCT/MAX.
  */
object Ast {

  sealed trait Term
  final case class Var(name: String) extends Term
  final case class Iri(value: String) extends Term
  /** The UNDEF placeholder in a VALUES row (SPARQL 1.1 §10.2.2): the
    * variable is left unbound for that row, and an unbound value is
    * join-COMPATIBLE with anything.
    */
  case object Undef extends Term
  /** Literal with lexical form; `num` set when it parses as a number;
    * `lang` set for language-tagged literals (`"chat"@fr` — W3C
    * grammar rule [129] RDFLiteral LANGTAG). A lang-tagged literal is
    * a DIFFERENT term from the plain literal with the same lexical
    * form, and pattern matching distinguishes them.
    */
  final case class Lit(lexical: String, num: Option[Double],
                       lang: Option[String] = None) extends Term

  final case class TriplePattern(s: Term, p: Term, o: Term)

  sealed trait Expr
  sealed trait CmpOp
  case object Eq extends CmpOp
  case object Ne extends CmpOp
  case object Lt extends CmpOp
  case object Le extends CmpOp
  case object Gt extends CmpOp
  case object Ge extends CmpOp
  final case class Cmp(op: CmpOp, v: Var, value: Lit) extends Expr
  sealed trait StrOp
  /** REGEX(?v, "pat") — unanchored match, like the SPARQL builtin. */
  case object RegexMatch extends StrOp
  case object StrStarts extends StrOp
  case object StrEnds extends StrOp
  case object StrContains extends StrOp
  /** String-builtin filters over a variable's lexical form. `flags`
    * is REGEX's optional third argument (XPath flags; "i" and "s"
    * supported — the two with direct Java-regex embeddings).
    */
  final case class StrFilter(op: StrOp, v: Var, arg: String,
                             flags: String = "") extends Expr
  /** Comparison whose left side is a computed expression (the BIND
    * expression language): `FILTER(STRLEN(?n) >= 10)`,
    * `FILTER(?price * 2 > 1500)`.
    */
  final case class ExprCmp(op: CmpOp, e: VExpr, value: Lit) extends Expr
  /** Comparison of two computed sides (`FILTER(?a < ?b)`,
    * `FILTER(?x * 2 >= STRLEN(?n))`): numeric when both sides have a
    * numeric interpretation, else lexical.
    */
  final case class CmpVV(op: CmpOp, l: VExpr, r: VExpr) extends Expr
  /** `LANG(?v) = "tag"` / `LANG(?v) != "tag"`; a plain literal's
    * language is the empty string per the SPARQL lang() builtin.
    */
  final case class LangCmp(eq: Boolean, v: Var, tag: String) extends Expr
  /** `LANGMATCHES(LANG(?v), "range")` — RFC 4647 basic filtering:
    * "*" matches any tagged literal; a plain range matches itself and
    * any subtag extension (case-insensitive).
    */
  final case class LangMatches(v: Var, range: String) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  /** `?v [NOT] IN (c1, c2, …)` — value-equality against a constant
    * list (numeric when the binding has a numeric companion).
    */
  final case class In(v: Var, values: Seq[Term], neg: Boolean) extends Expr
  /** BOUND(?v). Unmatched OPTIONAL vars carry the engine's "N/A"
    * sentinel (the reference compiler's unmatched constant), so BOUND
    * is "in scope, not null, and not the sentinel".
    */
  final case class Bound(v: Var) extends Expr
  final case class Not(e: Expr) extends Expr
  /** HAVING-only: a direct aggregate comparison (`HAVING (SUM(?s) >
    * 250)` — W3C agg08 shape). Resolves to the projection aggregate
    * with the same (op, argument); the alias form (`HAVING (?tot >
    * 250)`) remains the general path.
    */
  final case class HavingAggCmp(agg: AggOp, v: Option[Var], op: CmpOp,
                                value: Lit) extends Expr
  /** Term-type tests isIRI / isLiteral / isBlank over a binding. An
    * object-position binding reads its hidden is-IRI companion;
    * subject/predicate bindings are resource terms by construction
    * (IRI unless `_:`-prefixed).
    */
  final case class IsIri(v: Var) extends Expr
  final case class IsLiteral(v: Var) extends Expr
  final case class IsBlank(v: Var) extends Expr
  /** isNumeric(?v): the binding carries a numeric value. */
  final case class IsNumeric(v: Var) extends Expr
  /** sameTerm(?a, ?b): RDF-term identity — lexical form AND term kind
    * AND language tag all equal (unlike `=`, which value-compares).
    */
  final case class SameTerm(a: Var, b: Var) extends Expr
  /** EXISTS / NOT EXISTS over a FULL group graph pattern (r12 — was
    * BGP-only): top-level filters compile to semi/anti joins; inside
    * a compound expression (&&, ||, !) the compiler rewrites each to
    * an [[ExistsFlag]] marker bound by one flag left-join.
    */
  final case class Exists(pattern: Pattern) extends Expr
  final case class NotExists(pattern: Pattern) extends Expr
  /** Internal: a bound EXISTS marker column (never produced by the
    * parser) — `coalesce(col(name), false)`, negated for NOT EXISTS.
    */
  private[sparql] final case class ExistsFlag(name: String,
                                              neg: Boolean) extends Expr
  /** Internal (never parsed): a FILTER subexpression referencing a
    * variable that is not in the frame's scope — SPARQL evaluates it
    * as a TYPE ERROR; compiled as SQL null so three-valued logic
    * propagates exactly the SPARQL error algebra (err && false =
    * false, err || true = true, !err = err, FILTER drops err).
    */
  private[sparql] case object TypeErr extends Expr
  /** Internal: a constant boolean leaf (e.g. BOUND of a var that is
    * not in scope, which is plain false — never an error).
    */
  private[sparql] final case class ConstBool(b: Boolean) extends Expr

  sealed trait Pattern
  /** Compiler-internal, never parsed: a pre-compiled solution
    * relation spliced into a pattern tree. Carries the OUTER group's
    * bindings of the named variables into a correlated EXISTS body
    * (§8.1.1 substitution), so a FILTER inside the body evaluates
    * against each outer binding instead of degrading to a constant
    * type error under the §17.2 scope guard.
    */
  private[sparql] final case class PreBound(
      frame: org.apache.spark.sql.DataFrame,
      vars: Seq[String]) extends Pattern
  final case class Bgp(patterns: Seq[TriplePattern]) extends Pattern
  final case class Filter(exprs: Seq[Expr], input: Pattern) extends Pattern
  /** OPTIONAL: right side is a BGP (+ filters), reference fills
    * unmatched vars with the constant "N/A"
    * (SparqlToGremlinCompiler.java:122). */
  final case class LeftJoin(left: Pattern, right: Pattern) extends Pattern
  final case class Union(l: Pattern, r: Pattern) extends Pattern
  /** Natural join of two sub-patterns (a group joined with a UNION block). */
  final case class Join(l: Pattern, r: Pattern) extends Pattern
  /** SPARQL MINUS: drop left solutions compatible with a right
    * solution on at least one shared variable; sides with disjoint
    * variable domains remove nothing (per SPARQL 1.1 §8.3).
    */
  final case class Minus(left: Pattern, right: Pattern) extends Pattern
  /** BIND(expr AS ?v): extends each solution with a computed binding. */
  final case class Bind(input: Pattern, expr: VExpr, as: String) extends Pattern

  /** BIND value expressions: arithmetic over numeric bindings plus the
    * string builtins STR/STRLEN/UCASE/LCASE/CONCAT.
    */
  sealed trait VExpr
  final case class VVar(name: String) extends VExpr
  final case class VNum(value: Double) extends VExpr
  final case class VStr(value: String) extends VExpr
  sealed trait ArithOp
  case object AddOp extends ArithOp
  case object SubOp extends ArithOp
  case object MulOp extends ArithOp
  case object DivOp extends ArithOp
  final case class Arith(op: ArithOp, l: VExpr, r: VExpr) extends VExpr
  /** fn ∈ {STR, STRLEN, UCASE, LCASE, CONCAT, COALESCE, SUBSTR,
    * STRBEFORE, STRAFTER, REPLACE, ABS, CEIL, FLOOR, ROUND, MD5,
    * SHA256}.
    */
  final case class FnCall(fn: String, args: Seq[VExpr]) extends VExpr
  /** IF(cond, then, else) — conditional value expression. */
  final case class VIf(cond: Expr, t: VExpr, f: VExpr) extends VExpr
  /** Parse-time only: an aggregate call embedded in a SELECT or
    * ORDER BY expression (§18.2.4.4 — `SELECT (SUM(?a)/SUM(?b) AS
    * ?r)`, `ORDER BY DESC(COUNT(?x))`). The select builder lifts
    * every VAgg into a hidden aggregate (`__sagg<i>`) of an inner
    * subquery and rewrites the node to VVar(alias); the compiler
    * never evaluates one — an aggregate surviving to BIND/FILTER
    * position is rejected loudly.
    */
  final case class VAgg(op: AggOp, v: Option[Var],
                        distinct: Boolean = false, sep: String = " ",
                        expr: Option[VExpr] = None) extends VExpr
  /** Property path `(p1|p2|…)+`: s and o related by one or more hops
    * over any of the predicates (SPARQL alternation + OneOrMore).
    */
  final case class PathPlus(s: Term, preds: Seq[String], o: Term) extends Pattern
  /** Property path `(p1|p2|…)*`: zero or more hops. The zero-length
    * path relates every graph node (and any bound endpoint) to itself.
    */
  final case class PathStar(s: Term, preds: Seq[String], o: Term) extends Pattern
  /** Property path `(p1|p2|…)?`: zero or one hop. */
  final case class PathZeroOne(s: Term, preds: Seq[String], o: Term) extends Pattern
  /** Bare alternation path `(p1|p2|…)`: exactly one hop over ANY of
    * the predicates (SPARQL PathAlternative without a repetition
    * modifier) — the disjunctive-edge query the modifier forms build
    * on.
    */
  final case class PathAlt(s: Term, preds: Seq[String], o: Term) extends Pattern
  /** Fixed-range path `(p1|p2|…){n,m}`: between n and m hops (the
    * SPARQL 1.1 draft / Jena ARQ repetition form). Compiles to the
    * union of the k-hop chains for k ∈ [n, m]; k = 0 contributes the
    * zero-length identity pairs.
    */
  final case class PathRange(s: Term, preds: Seq[String], min: Int,
                             max: Int, o: Term) extends Pattern
  /** One step of a sequence path: a non-empty ALTERNATION of
    * (predicate, inverse?) atoms — `p` and `^p` are the single-atom
    * case, `(p1|^p2)` the general one (SPARQL 1.1 §9.1 lets an
    * alternation nest inside a sequence). Single-atom accessors keep
    * the common case readable.
    */
  final case class PathStep(alts: Seq[(String, Boolean)]) {
    require(alts.nonEmpty, "empty path-step alternation")
    /** Single-atom predicate (the pre-r14 shape; callers that accept
      * alternations read `alts` directly). */
    def pred: String = alts.head._1
    def inverse: Boolean = alts.head._2
    def rewrite(f: String => String): PathStep =
      PathStep(alts.map { case (p, i) => (f(p), i) })
  }
  object PathStep {
    def apply(pred: String, inverse: Boolean): PathStep =
      PathStep(Seq((pred, inverse)))
  }
  /** Sequence path `s p1/p2/… o` (SPARQL SequencePath, steps
    * optionally inverse); compiles by desugaring into a BGP chain
    * over fresh intermediate variables.
    */
  final case class PathSeq(s: Term, steps: Seq[PathStep], o: Term) extends Pattern
  /** Repetition over a parenthesized SEQUENCE — `(p1/p2)+`, `(^p/q)*`,
    * `(p/q)?` (SPARQL 1.1 §9.1 lets any path nest under a modifier;
    * the alternation-only forms above cover the other operand shape).
    * Compiles as closure/identity machinery over the COMPOSED two-hop
    * (or k-hop) edge relation instead of a predicate slice.
    */
  final case class PathSeqMod(s: Term, steps: Seq[PathStep], mod: Char,
                              o: Term) extends Pattern
  /** Fixed-range repetition over a parenthesized SEQUENCE —
    * `(p1/p2){n,m}` — completing the nesting algebra: every modifier
    * (`+ * ? {n,m}`) now accepts both operand shapes (alternation and
    * sequence).
    */
  final case class PathSeqRange(s: Term, steps: Seq[PathStep], min: Int,
                                max: Int, o: Term) extends Pattern
  /** Inline bindings `VALUES ?v { const… }` /
    * `VALUES (?a ?b) { (c1 c2) … }`: joins the group against the
    * constant table. Every row arity must match the variable list.
    */
  final case class ValuesPattern(vars: Seq[Var], rows: Seq[Seq[Term]]) extends Pattern
  /** Negated property set `s !(p1|p2|…) o`: one hop over any
    * predicate NOT in the list (SPARQL 1.1 §9.1 PathNegatedPropertySet,
    * forward form).
    */
  final case class NegPath(s: Term, preds: Seq[String], o: Term) extends Pattern
  /** `GRAPH g { bgp }` — the inner BGP matches entirely within one
    * named graph of the quad dataset: a constant g scopes to that
    * graph's slice, a variable g binds the graph name per solution
    * (every pattern of the BGP carries the same graph binding, so the
    * joins align it). Body restricted to a BGP — documented subset.
    * Compiles only through the quad entry point (Compiler.runQuads).
    */
  final case class GraphBgp(g: Term, patterns: Seq[TriplePattern]) extends Pattern
  /** `GRAPH <g> { group }` with a GENERAL body (r13): property paths,
    * OPTIONAL, FILTER, UNION … compose inside a CONSTANT named graph —
    * the graph's slice becomes the triple relation for the whole
    * sub-pattern. A variable graph name keeps the BGP-only
    * [[GraphBgp]] form (per-graph evaluation of arbitrary operators
    * would need a graph-partitioned replay — documented subset).
    */
  final case class GraphGroup(g: Term, pattern: Pattern) extends Pattern
  /** Compiler-internal: a property-path pattern evaluated under a
    * VARIABLE graph term (`GRAPH ?g { … path … }`), produced by the
    * graph-threading rewrite — never by the parser. Compiles as ONE
    * pass over the quad relation: the closure/k-hop machinery runs on
    * graph-encoded node ids (g⊕node), so reachability never crosses
    * graphs and the per-named-graph plan loop disappears.
    */
  private[sparql] final case class GraphPath(graphVar: String,
                                             path: Pattern) extends Pattern
  /** Compiler-internal: a graph-threaded sub-SELECT whose ORDER BY +
    * LIMIT/OFFSET must apply PER NAMED GRAPH — produced by the
    * graph-threading rewrite (never the parser) and compiled as one
    * pass: the limit-less inner query runs threaded, then a window
    * partitioned on the graph column applies the ordered cut.
    * `dropAfterCut` lists sort keys the rewrite LIFTED into the inner
    * projection because the user query orders by them without
    * projecting them (r18) — they exist only for the window's sort
    * and are dropped (with their companions) once the cut has run, so
    * the frame the enclosing group sees matches the user projection.
    */
  private[sparql] final case class PerGraphLimited(
      graphVar: String, q: SelectQuery,
      dropAfterCut: Seq[String] = Seq.empty) extends Pattern
  /** Compiler-internal: a graph-threaded GLOBAL aggregate — per §18.5
    * every named graph yields one row even when its slice matches
    * nothing, so the threaded groupBy-?g result right-joins the
    * distinct graph names and match-free graphs fill each aggregate's
    * empty-group value (COUNT/SUM/AVG → 0, GROUP_CONCAT → "",
    * MIN/MAX/SAMPLE → unbound). `q` is already rewritten with ?g in
    * its projection and grouping.
    */
  private[sparql] final case class PerGraphGlobalAgg(graphVar: String,
                                                     q: SelectQuery) extends Pattern
  /** Compiler-internal: the distinct named-graph-name frame bound to
    * the threaded graph column — produced by the graph-threading
    * rewrite (never the parser) to replicate a graph-INDEPENDENT
    * operand (inline VALUES, a var-free filter group) per named graph
    * when its composition needs `?g` bound on that side: a UNION
    * branch whose sibling binds `?g`, or the left operand of
    * MINUS/OPTIONAL whose right side does (§13.3: every branch still
    * solves per named graph). Graph names are metadata-scale, so the
    * frame broadcasts.
    */
  private[sparql] final case class GraphNames(graphVar: String) extends Pattern
  /** Nested `{ SELECT … }` subquery: evaluated bottom-up, its
    * projected variables join with the enclosing group (SPARQL 1.1
    * §12). Numeric outputs (aggregate aliases) re-derive their typed
    * companions on exit so outer FILTER/ORDER stay typed.
    */
  final case class SubSelect(q: SelectQuery) extends Pattern

  sealed trait AggOp
  case object Count extends AggOp
  case object CountDistinct extends AggOp
  case object Max extends AggOp
  case object Min extends AggOp
  case object Sum extends AggOp
  case object Avg extends AggOp
  /** GROUP_CONCAT — values sorted before joining, so the result is
    * deterministic under distributed, order-free aggregation.
    */
  case object GroupConcat extends AggOp
  /** SAMPLE — SPARQL allows any group member; this engine picks the
    * minimum lexical value so results are reproducible anywhere.
    */
  case object Sample extends AggOp
  /** Aggregate call. `v` is the plain-variable form; `expr` (SPARQL
    * allows any expression inside an aggregate) takes precedence when
    * set and evaluates through the numeric BIND machinery — e.g.
    * `SUM(?price * (1 - ?disc))`.
    */
  final case class Agg(op: AggOp, v: Option[Var], alias: String,
                       sep: String = " ", expr: Option[VExpr] = None,
                       distinct: Boolean = false)

  final case class SelectQuery(
      where: Pattern,
      projection: Seq[String] = Seq.empty,     // empty + no aggs = SELECT *
      aggregates: Seq[Agg] = Seq.empty,
      groupBy: Seq[String] = Seq.empty,
      /** HAVING constraints over aggregate aliases (typed columns). */
      having: Seq[Expr] = Seq.empty,
      distinct: Boolean = false,
      orderBy: Seq[(String, Boolean)] = Seq.empty, // (var, ascending)
      offset: Long = 0L,
      limit: Long = -1L,
      /** Dataset clause (SPARQL 1.1 §13.2), only meaningful through
        * the quad entry point: `FROM <g>` graphs compose the default
        * graph; `FROM NAMED <g>` graphs bound what GRAPH may match.
        * Empty = the whole dataset on both axes.
        */
      fromGraphs: Seq[String] = Seq.empty,
      fromNamed: Seq[String] = Seq.empty)
}
