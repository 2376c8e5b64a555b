package graft.velesql

/** VelesQL typed AST — structurally equivalent to the reference's
  * velesql ast module (crates/velesdb-core/src/velesql/ast/mod.rs,
  * select.rs, condition.rs, values.rs, aggregation.rs, join.rs,
  * fusion.rs, graph_pattern.rs), re-expressed as Scala case classes.
  */
object Ast {

  // ---- values (ast/values.rs:19-36)
  sealed trait Value
  case class IntValue(v: Long) extends Value
  case class FloatValue(v: Double) extends Value
  case class StringValue(v: String) extends Value
  case class BoolValue(v: Boolean) extends Value
  case object NullValue extends Value
  case class Parameter(name: String) extends Value
  /** Column reference on the value side (`a.x = b.y`, correlated
    * subquery predicates — ast/values.rs CorrelatedColumn). */
  case class ColumnRef(name: String) extends Value
  /** NOW()/INTERVAL arithmetic evaluated to epoch seconds
    * (ast/values.rs:91-122; units at 136-163, month = 30 days). */
  case class TemporalValue(expr: Temporal) extends Value
  case class SubqueryValue(q: Select) extends Value

  sealed trait Temporal
  case object Now extends Temporal
  case class Interval(raw: String) extends Temporal // e.g. "7 days"
  case class TemporalArith(l: Temporal, op: Char, r: Temporal) extends Temporal

  case class VectorValue(lit: Option[Seq[Float]], param: Option[String])

  // ---- conditions (ast/condition.rs)
  sealed trait Condition
  case class Compare(column: String, op: String, value: Value) extends Condition
  case class In(column: String, values: Seq[Value]) extends Condition
  case class Between(column: String, lo: Value, hi: Value) extends Condition
  case class Like(column: String, pattern: String, caseInsensitive: Boolean) extends Condition
  case class IsNull(column: String, negated: Boolean) extends Condition
  case class And(l: Condition, r: Condition) extends Condition
  case class Or(l: Condition, r: Condition) extends Condition
  case class Not(c: Condition) extends Condition
  /** vector NEAR $v (ast/condition.rs:43-47) */
  case class VectorNear(vector: VectorValue) extends Condition
  /** vector NEAR_FUSED [v…] USING FUSION 's' (params) (ast/condition.rs:50-56) */
  case class VectorNearFused(vectors: Seq[VectorValue], fusion: Option[FusionClause]) extends Condition
  /** similarity(field, $v) OP t (ast/condition.rs:59-69) */
  case class SimilarityCond(field: String, vector: VectorValue, op: String, threshold: Double) extends Condition
  /** column MATCH 'text query' → BM25 (grammar.pest:189) */
  case class TextMatch(column: String, query: String) extends Condition

  // ---- select (ast/select.rs)
  case class ColumnItem(name: String, alias: Option[String])
  case class AggregateItem(fn: String, arg: String, alias: Option[String]) {
    /** Result naming parity: `count` for COUNT(*), else `{fn}_{col}`,
      * alias wins (query/aggregation.rs:273-289). */
    def resultName: String = alias.getOrElse {
      if (fn == "count" && arg == "*") "count" else s"${fn}_${arg.replace('.', '_')}"
    }
  }
  sealed trait SelectList
  case object SelectAll extends SelectList
  case class SelectItems(items: Seq[Either[ColumnItem, AggregateItem]]) extends SelectList

  case class OrderByItem(expr: OrderExpr, ascending: Option[Boolean])
  sealed trait OrderExpr
  case class OrderByColumn(name: String) extends OrderExpr
  case class OrderByAggregate(agg: AggregateItem) extends OrderExpr
  case class OrderBySimilarity(field: String, vector: VectorValue) extends OrderExpr

  case class HavingTerm(agg: AggregateItem, op: String, value: Value)
  /** ops are applied strictly left-to-right, no precedence
    * (query/aggregation.rs:611-644). */
  case class Having(first: HavingTerm, rest: Seq[(String, HavingTerm)])

  case class JoinClause(joinType: String, table: String, alias: Option[String],
      on: Option[(String, String)], using: Seq[String])

  case class FusionClause(strategy: String, params: Map[String, Double])

  case class Select(
      distinct: Boolean,
      selectList: SelectList,
      from: String,
      fromAlias: Option[String],
      joins: Seq[JoinClause],
      where: Option[Condition],
      groupBy: Seq[String],
      having: Option[Having],
      orderBy: Seq[OrderByItem],
      limit: Option[Int],
      offset: Option[Int],
      withOptions: Map[String, String],
      fusion: Option[FusionClause])

  // ---- compound (ast/mod.rs:98-117)
  case class Compound(op: String, right: Select)

  // ---- MATCH graph queries (velesql/graph_pattern.rs:12-142)
  case class NodePattern(alias: Option[String], labels: Seq[String],
      properties: Map[String, Value])
  case class RelPattern(alias: Option[String], types: Seq[String],
      direction: String, // "out" | "in" | "undirected"
      minHops: Int, maxHops: Int,
      /** `[r:TYPE {prop: v}]` equality filters on the edge
        * (graph_pattern.rs:86-87, grammar.pest:34-45). */
      properties: Map[String, Value] = Map.empty)
  case class GraphPattern(nodes: Seq[NodePattern], rels: Seq[RelPattern],
      /** `p = (a)-[…]->(b)` named path (graph_pattern.rs:24-25). */
      name: Option[String] = None)
  sealed trait ReturnExpr
  case class ReturnProperty(alias: String, property: String) extends ReturnExpr
  case class ReturnAlias(alias: String) extends ReturnExpr
  case object ReturnSimilarity extends ReturnExpr
  /** `RETURN similarity(alias.field, $v)` (match_exec.rs:61-81). */
  case class ReturnSimilarityOf(field: String, vector: VectorValue) extends ReturnExpr
  case object ReturnAll extends ReturnExpr
  case class ReturnItem(expr: ReturnExpr, as: Option[String])
  case class MatchQuery(pattern: GraphPattern, where: Option[Condition],
      returns: Seq[ReturnItem], orderBy: Seq[OrderByItem], limit: Option[Int])

  // ---- top-level query (ast/mod.rs)
  case class Query(select: Option[Select], compound: Option[Compound],
      matchQuery: Option[MatchQuery])
}
