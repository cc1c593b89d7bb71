package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Ast._

/** Compiles the SPARQL algebra subset (Ast) onto the triple relation.
  *
  * Spark-first counterpart of the reference's Gremlin emission
  * (reference: pidb-rdf-engine/src/main/java/sparql/SparqlToGremlinCompiler.java):
  * where the reference turns every triple pattern into a vertex-at-a-
  * time traversal step and `match()`es them, we turn each pattern into
  * a filtered projection of the triple table and equi-join on shared
  * variables — Catalyst then pushes the `p = const` filters into the
  * scan and AQE picks broadcast joins for small pattern sides at
  * runtime. Patterns are pre-ordered by a bound-term selectivity
  * heuristic so the join chain starts from the most selective scan and
  * never goes cartesian when a connected order exists.
  *
  * Variable ?x becomes column "x" (lexical form); a companion hidden
  * column "x__num" carries the numeric value when ?x binds to a
  * numeric literal, so FILTER / ORDER BY / MAX compare numerically
  * without casts in the hot path.
  */
object Compiler {

  private val NUM = "__num"

  def isNumCol(c: String): Boolean = c.endsWith(NUM)
  def numCol(v: String): String = v + NUM

  /** One triple pattern → filtered projection of the triple table. */
  private def patternDf(triples: DataFrame, tp: TriplePattern): DataFrame = {
    var df = triples
    tp.p match {
      case Iri(v) => df = df.filter(col("p") === v)
      case Var(_) => ()
      case Lit(_, _) =>
        throw new IllegalArgumentException("literal predicate")
    }
    tp.s match {
      case Iri(v) => df = df.filter(col("s") === v)
      case Var(_) => ()
      case Lit(_, _) =>
        throw new IllegalArgumentException("literal subject")
    }
    tp.o match {
      case Iri(v) => df = df.filter(col("o") === v && col("o_is_iri"))
      case Lit(_, Some(n)) => df = df.filter(col("o_num") === n)
      case Lit(lex, None) => df = df.filter(col("o") === lex && !col("o_is_iri"))
      case Var(_) => ()
    }
    // same-var-twice patterns (?x :p ?x) constrain within the row
    (tp.s, tp.o) match {
      case (Var(a), Var(b)) if a == b => df = df.filter(col("s") === col("o"))
      case _ => ()
    }
    val out = Seq.newBuilder[Column]
    tp.s match { case Var(n) => out += col("s").as(n); case _ => () }
    tp.p match { case Var(n) => out += col("p").as(n); case _ => () }
    tp.o match {
      case Var(n) if !tp.s.isInstanceOf[Var] || tp.s.asInstanceOf[Var].name != n =>
        out += col("o").as(n); out += col("o_num").as(numCol(n))
      case _ => ()
    }
    df.select(out.result(): _*)
  }

  /** More bound terms ⇒ more selective ⇒ earlier in the join chain. */
  private def selectivity(tp: TriplePattern): Int = {
    def bound(t: Term, w: Int) = t match {
      case Var(_) => 0
      case _ => w
    }
    bound(tp.s, 4) + bound(tp.o, 2) + bound(tp.p, 1)
  }

  private def vars(tp: TriplePattern): Set[String] =
    Seq(tp.s, tp.p, tp.o).collect { case Var(n) => n }.toSet

  /** Greedy connected ordering: start at the most selective pattern,
    * always extend with a pattern sharing a variable (avoids
    * accidental cartesian products when the BGP is connected).
    */
  private def orderPatterns(ps: Seq[TriplePattern]): Seq[TriplePattern] = {
    if (ps.size <= 1) return ps
    val remaining = scala.collection.mutable.ListBuffer(ps.sortBy(-selectivity(_)): _*)
    val out = Seq.newBuilder[TriplePattern]
    var boundVars = Set.empty[String]
    while (remaining.nonEmpty) {
      val next = remaining.find(p => boundVars.isEmpty || vars(p).intersect(boundVars).nonEmpty)
        .getOrElse(remaining.head) // disconnected BGP: cartesian is semantically required
      remaining -= next
      out += next
      boundVars ++= vars(next)
    }
    out.result()
  }

  /** Natural join on shared variable columns; right-side duplicate
    * numeric companions are dropped (equal by construction).
    */
  private def joinOnVars(acc: DataFrame, next: DataFrame, joinType: String = "inner"): DataFrame = {
    val shared = acc.columns.intersect(next.columns).filterNot(isNumCol)
    val dupNums = acc.columns.intersect(next.columns).filter(isNumCol)
    val r = next.drop(dupNums: _*)
    if (shared.isEmpty) acc.crossJoin(r)
    else acc.join(r, shared.toSeq, joinType)
  }

  private def compileBgp(triples: DataFrame, ps: Seq[TriplePattern]): DataFrame =
    orderPatterns(ps).map(patternDf(triples, _)).reduceLeft(joinOnVars(_, _))

  /** Scalar filter → Column predicate (numeric when the literal and
    * the binding are numeric, lexical otherwise).
    */
  private def exprColumn(df: DataFrame, e: Expr): Column = e match {
    case Cmp(op, v, value) =>
      val useNum = value.num.isDefined && df.columns.contains(numCol(v.name))
      val (c, l) =
        if (useNum) (col(numCol(v.name)), lit(value.num.get))
        else (col(v.name), lit(value.lexical))
      op match {
        case Eq => c === l
        case Ne => c =!= l
        case Lt => c < l
        case Le => c <= l
        case Gt => c > l
        case Ge => c >= l
      }
    case And(a, b) => exprColumn(df, a) && exprColumn(df, b)
    case Or(a, b) => exprColumn(df, a) || exprColumn(df, b)
    case _: Exists | _: NotExists =>
      throw new IllegalArgumentException("EXISTS must be a top-level filter")
  }

  def compilePattern(triples: DataFrame, p: Pattern): DataFrame = p match {
    case Bgp(ps) => compileBgp(triples, ps)
    case Filter(exprs, input) =>
      exprs.foldLeft(compilePattern(triples, input)) {
        case (df, Exists(ps)) => joinOnVars(df, compileBgp(triples, ps), "left_semi")
        case (df, NotExists(ps)) => joinOnVars(df, compileBgp(triples, ps), "left_anti")
        case (df, e) => df.filter(exprColumn(df, e))
      }
    case LeftJoin(l, r) =>
      val ldf = compilePattern(triples, l)
      val rdf = compilePattern(triples, r)
      val joined = joinOnVars(ldf, rdf, "left_outer")
      // reference fills unmatched OPTIONAL vars with constant "N/A"
      // (SparqlToGremlinCompiler.java:122)
      val optOnly = rdf.columns.filterNot(isNumCol).diff(ldf.columns)
      optOnly.foldLeft(joined)((df, c) => df.withColumn(c, coalesce(col(c), lit("N/A"))))
    case Union(l, r) =>
      val ldf = compilePattern(triples, l)
      val rdf = compilePattern(triples, r)
      val allCols = (ldf.columns ++ rdf.columns.diff(ldf.columns)).toSeq
      def pad(df: DataFrame): DataFrame =
        df.select(allCols.map(c =>
          if (df.columns.contains(c)) col(c)
          else lit(null).cast(if (isNumCol(c)) "double" else "string").as(c)): _*)
      pad(ldf).unionByName(pad(rdf))
    case Join(l, r) =>
      joinOnVars(compilePattern(triples, l), compilePattern(triples, r))
  }

  /** Full SELECT pipeline: where → group/aggregate → order → project →
    * distinct → slice. Output columns are the projected variable names
    * (lexical strings) and aggregate aliases (typed).
    */
  def run(triples: DataFrame, q: SelectQuery): DataFrame = {
    var df = compilePattern(triples, q.where)

    if (q.aggregates.nonEmpty) {
      val aggCols = q.aggregates.map { case Agg(op, v, alias) =>
        def numOrLex(name: String): Column =
          if (df.columns.contains(numCol(name))) col(numCol(name)) else col(name)
        val c = op match {
          case Count => v.map(vr => count(col(vr.name))).getOrElse(count(lit(1)))
          case CountDistinct => countDistinct(col(v.get.name))
          case Max => max(numOrLex(v.get.name))
          case Min => min(numOrLex(v.get.name))
          case Sum => sum(col(numCol(v.get.name)))
          case Avg => avg(col(numCol(v.get.name)))
        }
        c.as(alias)
      }
      df =
        if (q.groupBy.nonEmpty)
          df.groupBy(q.groupBy.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
        else df.agg(aggCols.head, aggCols.tail: _*)
    }

    if (q.orderBy.nonEmpty) {
      val sorts = q.orderBy.map { case (v, asc) =>
        val c = if (df.columns.contains(numCol(v))) col(numCol(v)) else col(v)
        if (asc) c.asc else c.desc
      }
      df = df.orderBy(sorts: _*)
    }

    val projected =
      if (q.projection.nonEmpty) df.select(q.projection.map(col): _*)
      else df.select(df.columns.filterNot(isNumCol).map(col).toSeq: _*)
    df = projected
    if (q.distinct) df = df.distinct()
    if (q.offset > 0) df = df.offset(q.offset.toInt)
    if (q.limit >= 0) df = df.limit(q.limit.toInt)
    df
  }
}
