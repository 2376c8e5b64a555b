package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Graph schema for heterogeneous knowledge-graph collections
  * (reference `collection/graph/schema.rs:1-300`): strict mode admits
  * only the declared node/edge types (with typed properties), while
  * schemaless mode accepts anything. The schema is fixed at collection
  * create time (`CollectionType::Graph { schema }`, types.rs:53-61) and
  * persisted in a `graph_schema.json` sidecar; [[Collections]] enforces
  * it on every point/edge upsert.
  *
  * Property value types mirror the reference's `ValueType` enum
  * (schema.rs:14-27): string / integer / float / boolean / vector.
  */
final case class GraphNodeType(name: String, properties: Map[String, String])

final case class GraphEdgeType(name: String, fromType: String,
    toType: String, properties: Map[String, String])

final case class GraphSchema(
    schemaless: Boolean,
    nodeTypes: Seq[GraphNodeType],
    edgeTypes: Seq[GraphEdgeType]) {
  def nodeType(n: String): Option[GraphNodeType] = nodeTypes.find(_.name == n)
  def edgeType(n: String): Option[GraphEdgeType] = edgeTypes.find(_.name == n)
}

object GraphSchema {

  val ValueTypes: Set[String] =
    Set("string", "integer", "float", "boolean", "vector")

  private val mapper = new ObjectMapper()

  /** Parse + validate a schema JSON document:
    * {{{
    * {"schemaless": false,
    *  "node_types": [{"name": "Person", "properties": {"age": "integer"}}],
    *  "edge_types": [{"name": "knows", "from_type": "Person",
    *                  "to_type": "Person", "properties": {"weight": "float"}}]}
    * }}}
    * Unknown value types and edge endpoint types that aren't declared
    * node types reject eagerly (the reference rejects at use —
    * validate_edge_type, schema.rs:230-283 — but a schema that can never
    * validate is better refused at write time). */
  def parse(json: String): GraphSchema = {
    val root =
      try mapper.readTree(json)
      catch { case e: Exception =>
        throw new graft.velesql.SemanticError(s"graph schema is not valid JSON: ${e.getMessage}")
      }
    def fail(msg: String): Nothing = throw new graft.velesql.SemanticError(msg)
    def props(n: JsonNode): Map[String, String] =
      Option(n.get("properties")).filter(_.isObject).map { p =>
        p.properties().asScala.map { e =>
          val vt = e.getValue.asText
          if (!ValueTypes.contains(vt))
            fail(s"unknown property value type '$vt' (expected ${ValueTypes.toSeq.sorted.mkString("/")})")
          e.getKey -> vt
        }.toMap
      }.getOrElse(Map.empty)
    def name(n: JsonNode, what: String): String =
      Option(n.get("name")).map(_.asText).filter(_.nonEmpty)
        .getOrElse(fail(s"$what needs a 'name'"))
    val schemaless = Option(root.get("schemaless")).exists(_.asBoolean)
    val nodes = Option(root.get("node_types")).filter(_.isArray).toSeq
      .flatMap(_.elements().asScala)
      .map(n => GraphNodeType(name(n, "node type"), props(n)))
    val edges = Option(root.get("edge_types")).filter(_.isArray).toSeq
      .flatMap(_.elements().asScala)
      .map { n =>
        def ep(k: String): String = Option(n.get(k)).map(_.asText).filter(_.nonEmpty)
          .getOrElse(fail(s"edge type needs '$k'"))
        GraphEdgeType(name(n, "edge type"), ep("from_type"), ep("to_type"), props(n))
      }
    if (!schemaless) {
      val nodeNames = nodes.map(_.name).toSet
      edges.foreach { e =>
        Seq(e.fromType, e.toType).filterNot(nodeNames).foreach(t =>
          fail(s"edge '${e.name}' references undeclared node type '$t'"))
      }
    }
    GraphSchema(schemaless, nodes, edges)
  }

  /** Canonical JSON for the sidecar (round-trips through [[parse]]).
    * Names are JSON-escaped: parse accepts any string Jackson can
    * decode (quotes, backslashes, control chars), and writing one
    * unescaped would corrupt the sidecar — every later upsert/read of
    * the collection's schema then fails, with no API-level repair. */
  def render(s: GraphSchema): String = {
    def q(v: String): String = "\"" + v.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def propsJson(p: Map[String, String]): String =
      p.toSeq.sorted.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ", ", "}")
    val nodes = s.nodeTypes.map(n =>
      s"""{"name": ${q(n.name)}, "properties": ${propsJson(n.properties)}}""")
      .mkString("[", ", ", "]")
    val edges = s.edgeTypes.map(e =>
      s"""{"name": ${q(e.name)}, "from_type": ${q(e.fromType)}, "to_type": ${q(e.toType)}, "properties": ${propsJson(e.properties)}}""")
      .mkString("[", ", ", "]")
    s"""{"schemaless": ${s.schemaless}, "node_types": $nodes, "edge_types": $edges}"""
  }

  /** Does a Spark column type satisfy a declared ValueType? Integral
    * widths collapse to 'integer' and both float widths to 'float',
    * matching the reference's i64/f64 model. */
  def sparkTypeOk(declared: String, dt: DataType): Boolean = (declared, dt) match {
    case ("string", StringType)                                        => true
    case ("integer", ByteType | ShortType | IntegerType | LongType)    => true
    case ("float", FloatType | DoubleType)                             => true
    // integer columns are acceptable where float is declared (a JSON
    // batch with whole numbers infers integral — the value still is one)
    case ("float", ByteType | ShortType | IntegerType | LongType)      => true
    case ("boolean", BooleanType)                                      => true
    case ("vector", ArrayType(FloatType | DoubleType, _))              => true
    case _                                                             => false
  }
}
