package graft.velesql

import Ast._

/** EXPLAIN surface (SURVEY.md §2.13 — reference velesql/explain.rs:24-120:
  * a plan-intent tree with VectorSearch / Filter / Limit / Offset /
  * TableScan / Sequence / MatchTraversal nodes). We emit the same
  * intent summary from the AST, and callers can pair it with Spark's
  * `df.explain("formatted")` for the physical truth.
  */
object Explain {

  def explain(sql: String): Either[String, String] =
    Parser.parse(sql).map(render)

  def render(q: Query): String = q match {
    case Query(Some(sel), compound, None) =>
      val base = renderSelect(sel)
      compound match {
        case Some(Compound(op, r)) =>
          s"Sequence(${op.toUpperCase})\n" + indent(base) + "\n" + indent(renderSelect(r))
        case None => base
      }
    case Query(_, _, Some(m)) =>
      val hops = m.pattern.rels.map(r =>
        s"${r.direction}:${if (r.types.isEmpty) "*" else r.types.mkString("|")}" +
          (if (r.minHops == 1 && r.maxHops == 1) "" else s"*${r.minHops}..${r.maxHops}") +
          (if (r.properties.isEmpty) ""
           else r.properties.map { case (k, v) => s"$k=${valueStr(v)}" }
             .mkString(" {", ",", "}")))
      val named = m.pattern.name.map(n => s", path=$n").getOrElse("")
      s"MatchTraversal(nodes=${m.pattern.nodes.size}, hops=[${hops.mkString(", ")}]$named)" +
        m.where.map(w => "\n" + indent(s"Filter(${describe(w)})")).getOrElse("") +
        m.limit.map(l => "\n" + indent(s"Limit($l)")).getOrElse("")
    case _ => "Empty"
  }

  private def renderSelect(sel: Select): String = {
    val steps = Seq.newBuilder[String]
    sel.where.foreach { w =>
      if (hasNear(w)) steps += s"VectorSearch(k=${sel.limit.getOrElse(10)})"
      collectSim(w).foreach(s =>
        steps += s"SimilarityFilter(${s.field} ${s.op} ${s.threshold})")
      collectText(w).foreach(t => steps += s"TextMatch(${t.column}, '${t.query}')")
      steps += s"Filter(${describe(w)})"
    }
    if (sel.groupBy.nonEmpty) steps += s"Aggregate(by=${sel.groupBy.mkString(",")})"
    if (sel.orderBy.nonEmpty) steps += s"Sort(${sel.orderBy.size} keys)"
    sel.offset.foreach(o => steps += s"Offset($o)")
    sel.limit.foreach(l => steps += s"Limit($l)")
    if (sel.withOptions.nonEmpty)
      steps += sel.withOptions.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("With(", ", ", ")")
    val chain = steps.result()
    (s"TableScan(${sel.from})" +: chain).zipWithIndex
      .map { case (s, i) => "  " * i + s }.mkString("\n")
  }

  private def hasNear(c: Condition): Boolean = c match {
    case _: VectorNear | _: VectorNearFused => true
    case And(l, r) => hasNear(l) || hasNear(r)
    case Or(l, r) => hasNear(l) || hasNear(r)
    case Not(i) => hasNear(i)
    case _ => false
  }
  private def collectSim(c: Condition): Seq[SimilarityCond] = c match {
    case s: SimilarityCond => Seq(s)
    case And(l, r) => collectSim(l) ++ collectSim(r)
    case Or(l, r) => collectSim(l) ++ collectSim(r)
    case Not(i) => collectSim(i)
    case _ => Nil
  }
  private def collectText(c: Condition): Seq[TextMatch] = c match {
    case t: TextMatch => Seq(t)
    case And(l, r) => collectText(l) ++ collectText(r)
    case Or(l, r) => collectText(l) ++ collectText(r)
    case Not(i) => collectText(i)
    case _ => Nil
  }

  private def describe(c: Condition): String = c match {
    case Compare(col, op, v) => s"$col $op ${valueStr(v)}"
    case In(col, vs) => s"$col IN (${vs.map(valueStr).mkString(",")})"
    case Between(col, lo, hi) => s"$col BETWEEN ${valueStr(lo)} AND ${valueStr(hi)}"
    case Like(col, p, ci) => s"$col ${if (ci) "ILIKE" else "LIKE"} '$p'"
    case IsNull(col, n) => s"$col IS ${if (n) "NOT " else ""}NULL"
    case And(l, r) => s"(${describe(l)} AND ${describe(r)})"
    case Or(l, r) => s"(${describe(l)} OR ${describe(r)})"
    case Not(i) => s"NOT ${describe(i)}"
    case SimilarityCond(f, _, op, t) => s"similarity($f) $op $t"
    case TextMatch(col, q) => s"$col MATCH '$q'"
    case _: VectorNear => "vector NEAR …"
    case _: VectorNearFused => "vector NEAR_FUSED …"
  }

  private def valueStr(v: Value): String = v match {
    case IntValue(x) => x.toString
    case FloatValue(x) => x.toString
    case StringValue(x) => s"'$x'"
    case BoolValue(x) => x.toString
    case NullValue => "NULL"
    case Parameter(n) => s"$$$n"
    case ColumnRef(n) => n
    case TemporalValue(_) => "<temporal>"
    case SubqueryValue(_) => "<subquery>"
  }

  private def indent(s: String): String =
    s.linesIterator.map("  " + _).mkString("\n")
}
