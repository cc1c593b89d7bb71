package graft.sparql

import graft.rdf.TripleOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Ast._

/** SPARQL 1.1 Update subset: INSERT DATA / DELETE DATA (ground
  * triples) and DELETE WHERE (pattern-matched deletion). The
  * reference mutates its store through write procedures
  * (pidb-rdf-import/src/main/java/semantics/RDFImport.java:50); the
  * Spark re-expression derives a NEW store via [[TripleOps]] set
  * operations, so updates compose with the same merge-on-write
  * posture as bulk import.
  */
object Update {

  sealed trait Op
  final case class InsertData(triples: Seq[TriplePattern]) extends Op
  final case class DeleteData(triples: Seq[TriplePattern]) extends Op
  /** QuadData (grammar [48]/[49]): GRAPH-scoped blocks inside
    * INSERT DATA / DELETE DATA, applied to a quad relation — each
    * block is (destination graph IRI, ground triples). Bare
    * default-graph triples keep the triple-store forms above (the
    * quad model's default graph is the read-time union).
    */
  final case class InsertQuadData(
      blocks: Seq[(String, Seq[TriplePattern])]) extends Op
  final case class DeleteQuadData(
      blocks: Seq[(String, Seq[TriplePattern])]) extends Op
  final case class DeleteWhere(patterns: Seq[TriplePattern]) extends Op
  /** `DELETE { tmpl } INSERT { tmpl } WHERE { pattern }` — the
    * template modify form; either template may be empty.
    */
  final case class Modify(del: Seq[TriplePattern], ins: Seq[TriplePattern],
                          where: Pattern) extends Op

  /** Graph-scoped template modify (SPARQL Update §3.1.3):
    * `[WITH <g>] DELETE {t} INSERT {t} (USING [NAMED] <g>)* WHERE {p}`.
    * WITH names the graph the templates write (and, absent USING, the
    * WHERE's default graph); USING graphs compose the WHERE's default
    * graph exactly like FROM, USING NAMED bounds what GRAPH may match
    * inside the WHERE exactly like FROM NAMED. Quad relation only —
    * the triple store has no graphs to scope.
    */
  final case class ModifyGraph(withGraph: Option[String],
                               del: Seq[TriplePattern],
                               ins: Seq[TriplePattern],
                               using: Seq[String], usingNamed: Seq[String],
                               where: Pattern) extends Op

  /** SPARQL 1.1 Update §3.2 graph-management forms, applied to a quad
    * relation via [[applyQuads]]. In the quad model a graph exists iff
    * it has quads, so DROP normalizes to [[ClearGraph]] at parse and
    * CREATE is a no-op derivation.
    */
  /** `LOAD [SILENT] <source> [INTO GRAPH <g>]` (SPARQL Update
    * §3.1.31): parse the document behind `source` through the
    * format-dispatching import facade ([[graft.rdf.RdfImport]], the
    * reference's importRDF surface — RDFImport.java:50) and derive
    * store + document. The format comes from the source extension;
    * `file://` and plain paths read distributed, `http(s)://`
    * follows the facade's driver-fetch path. SILENT turns a fetch or
    * parse failure into the unchanged store.
    */
  final case class Load(source: String, intoGraph: Option[String] = None,
                        silent: Boolean = false) extends Op

  sealed trait GraphOp extends Op
  final case class ClearGraph(g: String) extends GraphOp
  final case class CreateGraph(g: String) extends GraphOp
  final case class CopyGraph(from: String, to: String) extends GraphOp
  final case class MoveGraph(from: String, to: String) extends GraphOp
  final case class AddToGraph(from: String, to: String) extends GraphOp

  /** Apply one update to the store, returning the derived store. */
  def apply(store: DataFrame, op: Op): DataFrame = op match {
    case InsertData(ts) => TripleOps.add(store, ground(store, ts))
    case DeleteData(ts) => TripleOps.subtract(store, ground(store, ts))
    case DeleteWhere(ps) =>
      // solutions of the pattern join, then each pattern instantiated
      // per solution — the SPARQL DELETE WHERE template semantics.
      // Object-position vars rebuild full term identity from their
      // hidden companions, so a deleted literal can't take an
      // identically-spelled IRI with it.
      val sol = Compiler.compilePattern(store, Bgp(ps))
      val doomed = ps.map(instantiate(sol, _)).reduce(_.unionByName(_))
      TripleOps.subtract(store, doomed)
    case Modify(del, ins, where) =>
      // bindings come from the ORIGINAL store (SPARQL Update §3.1.3:
      // WHERE evaluates against the pre-update state), then delete
      // applies before insert
      val sol = Compiler.compilePattern(store, where)
      rejectDeleteBnodes(sol, del)
      val afterDel =
        if (del.isEmpty) store
        else TripleOps.subtract(store,
          del.map(instantiate(sol, _)).reduce(_.unionByName(_)))
      if (ins.isEmpty) afterDel
      else {
        // §3.1.3: a blank node in the INSERT template mints fresh per
        // solution (the CONSTRUCT rule) — shared minting machinery
        val (solIns, _) = Compiler.mintTemplateBnodes(sol, ins)
        TripleOps.add(afterDel,
          ins.map(instantiate(solIns, _)).reduce(_.unionByName(_)))
      }
    case Load(src, None, silent) =>
      loaded(store.sparkSession, src, silent) match {
        case Some(doc) => TripleOps.add(store, doc.drop("g"))
        case None => store
      }
    case Load(_, Some(g), _) =>
      throw new IllegalArgumentException(
        s"LOAD INTO GRAPH <$g> needs a quad relation — use applyQuads")
    case _: InsertQuadData | _: DeleteQuadData =>
      throw new IllegalArgumentException(
        "GRAPH-scoped data blocks need a quad relation — use applyQuads")
    case m: ModifyGraph =>
      throw new IllegalArgumentException(
        s"WITH/USING modify ${m.withGraph.orElse(m.using.headOption).getOrElse("")} " +
          "needs a quad relation — use applyQuads")
    case g: GraphOp =>
      throw new IllegalArgumentException(
        s"graph-management update $g needs a quad relation — use applyQuads")
  }

  /** The parsed LOAD document, None when SILENT swallowed a failure.
    * TriG sources carry their own graph column; triple formats don't
    * (LOAD INTO GRAPH overrides either way, per §3.1.31).
    */
  private def loaded(spark: org.apache.spark.sql.SparkSession, src: String,
                     silent: Boolean): Option[DataFrame] =
    try {
      val path = if (src.startsWith("file://")) src.stripPrefix("file://") else src
      // eager + tracked: a missing file / parse failure must surface
      // (or be swallowed by SILENT) at update time, not on first
      // read; the checkpoint also keeps the derived store from
      // re-parsing the document per downstream action
      Some(graft.Checkpoints.tracked(
        graft.rdf.RdfImport.read(spark, path, formatOf(src))))
    } catch {
      case e: Exception if silent => None
    }

  /** Import format from the source extension — the natural mapping of
    * §3.1.31's content-type dispatch onto the facade's five parsers.
    */
  private def formatOf(source: String): String = {
    val p = source.replaceAll("[?#].*$", "").toLowerCase
    if (p.endsWith(".nt") || p.endsWith(".ntriples")) "ntriples"
    else if (p.endsWith(".ttl") || p.endsWith(".turtle")) "turtle"
    else if (p.endsWith(".trig")) "trig"
    else if (p.endsWith(".jsonld") || p.endsWith(".json")) "jsonld"
    else if (p.endsWith(".rdf") || p.endsWith(".xml") || p.endsWith(".owl")) "rdfxml"
    else throw new IllegalArgumentException(
      s"cannot infer RDF format from LOAD source <$source> " +
        "(known: .nt .ttl .trig .jsonld .rdf/.xml/.owl)")
  }

  /** Apply a graph-management update to a quad (g, s, p, o, …)
    * relation, returning the derived quad set. CLEAR/MOVE are narrow
    * filters and CREATE passes the relation through (graphs exist iff
    * non-empty); only COPY/ADD touch more than a per-graph slice.
    */
  def applyQuads(quads: DataFrame, op: Op): DataFrame = op match {
    case Load(src, Some(g), silent) =>
      loaded(quads.sparkSession, src, silent) match {
        case Some(doc) =>
          // §3.1.31: INTO GRAPH names the destination regardless of
          // any graph labels the document itself carries (TriG).
          // Merge with SET semantics like TripleOps.addGraph — the
          // store's invariant is no duplicate quads, so re-loading a
          // document (or loading triples already present) must be
          // idempotent; the dedup touches only the destination
          // graph's slice, the rest of the dataset passes through.
          val merged = quads.filter(col("g") === g)
            .unionByName(doc.drop("g").withColumn("g", lit(g)),
              allowMissingColumns = true)
            .distinct()
          quads.filter(col("g") =!= g)
            .unionByName(merged, allowMissingColumns = true)
        case None => quads
      }
    case Load(_, None, _) =>
      // valid SPARQL Update (targets the default graph), but this quad
      // model's default graph is the READ-TIME UNION of the named
      // graphs, not a mutable slot — same posture as graph management
      // rejecting DEFAULT; the triple-store form (apply) is the way to
      // grow the union itself
      throw new IllegalArgumentException(
        "LOAD without INTO GRAPH targets the default graph, which in " +
          "the quad model is the read-time union — name a destination " +
          "with INTO GRAPH <g>, or apply the LOAD to the triple store")
    case ModifyGraph(withG, del, ins, using, usingNamed, where) =>
      // §3.1.3: the WHERE evaluates against the PRE-update dataset.
      // USING/USING NAMED form it exactly like FROM/FROM NAMED (when
      // either is present, the dataset is exactly those graphs);
      // otherwise WITH scopes the default graph to its slice, and a
      // bare modify reads the read-time union. Templates write the
      // WITH graph — without WITH they would target the default
      // graph, which this quad model keeps as a read-time union, so
      // WITH is required (the pointed-posture LOAD shares).
      val target = withG.getOrElse(throw new IllegalArgumentException(
        "template modify on a quad relation needs WITH <g> — the " +
          "default graph is the read-time union; scope the write " +
          "with WITH, or apply the modify to the triple store"))
      val hasDataset = using.nonEmpty || usingNamed.nonEmpty
      val defaultTriples =
        if (hasDataset)
          quads.filter(col("g").isin(using: _*)).drop("g").distinct()
        else quads.filter(col("g") === target).drop("g")
      val named =
        if (hasDataset) quads.filter(col("g").isin(usingNamed: _*)) else quads
      val sol = Compiler.compilePattern(defaultTriples, Some(named), where)
      rejectDeleteBnodes(sol, del)
      val afterDel =
        if (del.isEmpty) quads
        else TripleOps.subtract(quads,
          del.map(instantiate(sol, _).withColumn("g", lit(target)))
            .reduce(_.unionByName(_)))
      if (ins.isEmpty) afterDel
      else {
        val (solIns, _) = Compiler.mintTemplateBnodes(sol, ins)
        TripleOps.add(afterDel,
          ins.map(instantiate(solIns, _).withColumn("g", lit(target)))
            .reduce(_.unionByName(_)))
      }
    case InsertQuadData(blocks) =>
      // per-destination set-semantics merge (the LOAD INTO idiom):
      // only the touched graph's slice pays a dedup, the rest of the
      // dataset passes through untouched
      blocks.foldLeft(quads) { case (q, (g, ts)) =>
        val merged = q.filter(col("g") === g)
          .unionByName(ground(q, ts).withColumn("g", lit(g)),
            allowMissingColumns = true)
          .distinct()
        q.filter(col("g") =!= g)
          .unionByName(merged, allowMissingColumns = true)
      }
    case DeleteQuadData(blocks) =>
      // term-identity set minus per block (the TripleOps.subtract
      // convention: all quad columns participate, so a lang-tagged
      // literal never deletes its plain twin)
      blocks.foldLeft(quads) { case (q, (g, ts)) =>
        q.except(ground(q, ts).withColumn("g", lit(g))
          .select(q.columns.map(col).toSeq: _*))
      }
    case ClearGraph(g) => TripleOps.clearGraph(quads, g)
    case CreateGraph(_) => quads
    case CopyGraph(from, to) => TripleOps.copyGraph(quads, from, to)
    case MoveGraph(from, to) => TripleOps.moveGraph(quads, from, to)
    case AddToGraph(from, to) => TripleOps.addGraph(quads, from, to)
    case other =>
      throw new IllegalArgumentException(
        s"triple-store update $other on a quad relation — use apply")
  }

  /** Ground triples (no variables) as a triple relation. */
  private def ground(store: DataFrame, ts: Seq[TriplePattern]): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._
    val rows = ts.map { tp =>
      val s = constResource(tp.s, "subject")
      val p = constResource(tp.p, "predicate")
      tp.o match {
        case Iri(v) => (s, p, v, Option.empty[Double], true, Option.empty[String])
        case Lit(lex, num, lang) => (s, p, lex, num, false, lang)
        case other =>
          throw new IllegalArgumentException(s"DATA block must be ground, got $other")
      }
    }
    rows.toDF("s", "p", "o", "o_num", "o_is_iri", "lang")
  }

  private def constResource(t: Term, pos: String): String = t match {
    case Iri(v) => v
    case other =>
      throw new IllegalArgumentException(s"$pos must be an IRI, got $other")
  }

  /** SPARQL Update §3.1.3: blank nodes are ILLEGAL in a DELETE
    * template (a fresh node can never match stored data). The parser
    * encodes them as __bn* vars; one the WHERE doesn't bind would
    * otherwise crash column resolution — reject it pointedly.
    */
  private def rejectDeleteBnodes(sol: DataFrame,
                                 del: Seq[TriplePattern]): Unit = {
    val bad = del.flatMap(tp => Seq(tp.s, tp.p, tp.o)).collect {
      case Var(n) if n.startsWith("__bn") && !sol.columns.contains(n) => n
    }
    if (bad.nonEmpty) throw new IllegalArgumentException(
      "blank nodes are not allowed in a DELETE template (Update §3.1.3)")
  }

  /** One pattern instantiated over the solution relation. */
  private def instantiate(sol: DataFrame, tp: TriplePattern): DataFrame = {
    def res(t: Term, pos: String): Column = t match {
      case Var(n) => col(n)
      case other => lit(constResource(other, pos))
    }
    val (o, oNum, oIri, lang) = tp.o match {
      case Var(n) => (
        col(n),
        if (sol.columns.contains(Compiler.numCol(n))) col(Compiler.numCol(n))
        else lit(null).cast("double"),
        if (sol.columns.contains(Compiler.iriCol(n)))
          coalesce(col(Compiler.iriCol(n)), lit(true))
        else lit(true),
        if (sol.columns.contains(Compiler.langCol(n))) col(Compiler.langCol(n))
        else lit(null).cast("string"))
      case Iri(v) => (lit(v): Column, lit(null).cast("double"),
        lit(true): Column, lit(null).cast("string"))
      case Lit(lex, num, lg) => (lit(lex): Column,
        num.map(d => lit(d): Column).getOrElse(lit(null).cast("double")),
        lit(false): Column,
        lg.map(t => lit(t): Column).getOrElse(lit(null).cast("string")))
      case Undef =>
        throw new IllegalArgumentException("UNDEF in an update template")
    }
    sol.select(res(tp.s, "subject").as("s"), res(tp.p, "predicate").as("p"),
      o.as("o"), oNum.as("o_num"), oIri.as("o_is_iri"), lang.as("lang"))
  }
}
