package graft

import org.apache.spark.sql.types._

/** Structural guard for the oracle-compare type contract (3rd-time
  * failure class: r3 q69/q114, r8 q128/q135).
  *
  * The correctness driver hashes values after its own type
  * normalization, which renders Spark `DecimalType` and DuckDB
  * `DECIMAL(38,s)`/`HUGEINT` differently even when the values are
  * bit-identical. The repo convention (q01 `dsum`) is: exact decimal
  * arithmetic INSIDE the query is fine, but every FINAL output column
  * must be a driver-safe type — string/bool/integral/floating/
  * timestamp/date/binary, or arrays/maps/structs thereof. Never
  * DecimalType.
  *
  * Two checks:
  *  1. Spark side — materialize every `SparkEntry.queries` schema on
  *     sf0.001 and reject any schema containing a DecimalType.
  *  2. Oracle side — scan every `SparkEntry.oracleSql` string for
  *     DuckDB expressions whose result type the driver can't normalize:
  *     `sum(<non-double>)` (HUGEINT for integers, DECIMAL(38,s) for
  *     decimals) and a `CAST(... AS DECIMAL)` that escapes to the
  *     output, unless wrapped in an enclosing CAST AS BIGINT/DOUBLE.
  */
class TypeParitySpec extends SparkSpecBase {

  private def decimalIn(dt: DataType): Boolean = dt match {
    case _: DecimalType    => true
    case a: ArrayType      => decimalIn(a.elementType)
    case m: MapType        => decimalIn(m.keyType) || decimalIn(m.valueType)
    case s: StructType     => s.fields.exists(f => decimalIn(f.dataType))
    case _                 => false
  }

  test("no query output schema contains DecimalType") {
    val offenders = SparkEntry.allDefs.flatMap { q =>
      val schema = q.fn(spark, sfDir).schema
      if (decimalIn(schema)) Some(s"${q.name}: ${schema.simpleString}")
      else None
    }
    assert(offenders.isEmpty,
      s"final outputs must avoid DecimalType (driver normalization):\n" +
        offenders.mkString("\n"))
  }

  // ---- oracle-SQL audit --------------------------------------------

  /** Index of the ')' matching the '(' at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _   =>
      }
      i += 1
    }
    s.length - 1
  }

  /** The type word of the innermost `cast( ... as <type>)` enclosing
    * [from, to], if any. */
  private def enclosingCastType(s: String, from: Int, to: Int): Option[String] = {
    val casts = "(?<![a-z_])cast\\s*\\(".r.findAllMatchIn(s).toList
    val enclosing = casts
      .map(m => (m.start, matchParen(s, s.indexOf('(', m.start))))
      .filter { case (st, en) => st < from && en > to }
    enclosing.sortBy { case (st, en) => en - st }.headOption.map {
      case (_, en) =>
        // type word is the token right before the close paren
        val inner = s.substring(0, en)
        val asIdx = inner.lastIndexOf(" as ")
        if (asIdx < 0) "" else inner.substring(asIdx + 4).trim.takeWhile(c => c.isLetter)
    }
  }

  private def safeWrapped(s: String, from: Int, to: Int): Boolean =
    enclosingCastType(s, from, to).exists(t => t == "bigint" || t == "double")

  /** Names of double/float-typed columns across the test tables —
    * DuckDB's sum() over these is DOUBLE, which the driver normalizes
    * fine. */
  private lazy val doubleCols: Set[String] = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.flatMap { t =>
      Tables.table(spark, sfDir, t).schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType =>
          f.name.toLowerCase
      }
    }.toSet
  }

  /** Span [start, end) of the final top-level SELECT list (the only
    * place whose expression types escape to the driver-visible output).
    * Sums inside CTEs/HAVING are excluded by construction; a CTE column
    * that passes a HUGEINT through is caught by the Spark-side schema
    * mismatch the driver reports (schema_match), so this audit focuses
    * on the hash-red class: aggregates computed in the final list. */
  private def finalSelectSpan(s: String): (Int, Int) = {
    var depth = 0
    var lastSelect = -1
    val sel = "(?<![a-z_])select(?![a-z_])".r
    val from = "(?<![a-z_])from(?![a-z_])".r
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && sel.pattern.matcher(s).region(i, s.length).lookingAt())
            lastSelect = i
      }
      i += 1
    }
    if (lastSelect < 0) (0, s.length)
    else {
      // matching depth-0 FROM after the final SELECT
      var j = lastSelect
      depth = 0
      var end = s.length
      var done = false
      while (j < s.length && !done) {
        s.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
            if (depth == 0 && j > lastSelect &&
                from.pattern.matcher(s).region(j, s.length).lookingAt()) {
              end = j; done = true
            }
        }
        j += 1
      }
      (lastSelect, end)
    }
  }

  /** Driver-unsafe output expressions in one oracle SQL (empty = ok). */
  private def auditOracle(name: String, sqlRaw: String): Seq[String] = {
    val s = sqlRaw.toLowerCase.replace('\n', ' ')
    val (selStart, selEnd) = finalSelectSpan(s)
    val sumIssues = "(?<![a-z_])sum\\s*\\(".r.findAllMatchIn(s).toList
      .filter(m => m.start >= selStart && m.start < selEnd)
      .flatMap { m =>
        val open  = s.indexOf('(', m.start)
        val close = matchParen(s, open)
        val arg   = s.substring(open + 1, close)
        // DuckDB: sum(DOUBLE) -> DOUBLE (safe); sum(int) -> HUGEINT,
        // sum(decimal) -> DECIMAL(38,s) (both driver-unsafe) unless
        // the whole expression is cast back to BIGINT/DOUBLE.
        // A decimal cast inside the sum dominates: sum(DECIMAL) is
        // DECIMAL(38,s) no matter what fed the cast (old q135 shape).
        val argForcesDecimal =
          arg.contains("as decimal") || arg.contains("::decimal")
        val argIsDouble = !argForcesDecimal && (arg.contains("as double") ||
          arg.contains("::double") || arg.contains("avg(") ||
          // a float literal or DuckDB's float division '/' makes the
          // whole arithmetic expression DOUBLE
          "\\d\\.\\d".r.findFirstIn(arg).isDefined || arg.contains("/") ||
          doubleCols.exists(c => s"(?<![a-z_])$c(?![a-z_])".r.findFirstIn(arg).isDefined))
        if (argIsDouble || safeWrapped(s, m.start, close)) None
        else Some(s"$name: raw sum(...) in final SELECT at ${m.start} -> HUGEINT/DECIMAL")
      }
    val decIssues = "(?<![a-z_])as\\s+decimal".r.findAllMatchIn(s).toList
      .filter(m => m.start >= selStart && m.start < selEnd)
      .flatMap { m =>
        // a decimal cast is fine while an enclosing sum()/cast()
        // re-types it before output
        val insideSum = "(?<![a-z_])sum\\s*\\(".r.findAllMatchIn(s).exists { sm =>
          val open = s.indexOf('(', sm.start)
          open < m.start && matchParen(s, open) > m.start
        }
        if (insideSum || safeWrapped(s, m.start, m.end)) None
        else Some(s"$name: CAST AS DECIMAL escapes to output at ${m.start}")
      }
    sumIssues ++ decIssues
  }

  test("no oracle SQL produces HUGEINT/DECIMAL output columns") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (name, sql) => auditOracle(name, sql) }
    assert(offenders.isEmpty,
      "oracle SQL must CAST aggregate outputs to BIGINT/DOUBLE " +
        "(driver normalization):\n" + offenders.mkString("\n"))
  }

  test("audit catches the historical r8 red shapes (regression pin)") {
    // old q135: round(sum(decimal), 4) with no outer cast -> DECIMAL(38,4)
    val oldQ135 =
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin
    assert(auditOracle("oldQ135", oldQ135).nonEmpty)
    // old q128: raw integer sum -> HUGEINT
    val oldQ128 =
      """SELECT kind, count(*) AS n,
        |  sum(CASE WHEN kind = 'video' THEN declared_frames ELSE 0 END) AS n_frames
        |FROM m GROUP BY kind""".stripMargin
    assert(auditOracle("oldQ128", oldQ128).nonEmpty)
    // and the fixed shapes pass
    val fixed =
      """SELECT kind,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS qty,
        |  CAST(sum(CASE WHEN kind = 'video' THEN declared_frames ELSE 0 END) AS BIGINT) AS n
        |FROM m GROUP BY kind""".stripMargin
    assert(auditOracle("fixed", fixed).isEmpty)
  }
}
