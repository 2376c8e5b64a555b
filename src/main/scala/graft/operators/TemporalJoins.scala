package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward AS-OF
  * join and a bucketized time-RANGE join (beyond-reference: the
  * reference's temporal surface is NOW/INTERVAL filters only,
  * velesql/ast.rs — nothing joins two event streams by time; these are
  * the batch complements of the streaming interval join,
  * [[graft.streaming.StreamingOps.intervalJoin]]).
  *
  * Both avoid the plan Spark would otherwise pick for a pure
  * inequality join — BroadcastNestedLoopJoin, O(|L|·|R|) and
  * cluster-fatal at 100 TB — by reformulating as EQUI-joins:
  *
  *  - as-of: the classic union-tag trick (pandas merge_asof / KDB aj /
  *    Flink temporal join shape): union both sides, ONE shuffle on the
  *    match key, one in-partition ordered window pass carries the
  *    latest right payload forward into each left row. No range
  *    predicate ever reaches a join.
  *  - range: bucket timestamps by the window width Δ; a right row in
  *    (l.ts, l.ts+Δ] can only sit in the left row's bucket or the next
  *    one, so probing buckets {b, b+1} (2× duplication of the LEFT
  *    side only) turns the range predicate into an equi-join key +
  *    residual filter — the Databricks/Photon range-join-hint shape.
  *    Shuffle key = bucket: at scale the per-bucket row count is the
  *    event rate × Δ, independent of total history length; AQE splits
  *    a hot bucket (burst traffic) like any other skewed key.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, the single most recent
    * right row with `right.tsCol <= left.tsCol`, matched per `keyCols`.
    * Right payload columns arrive null when no prior right row exists
    * (left-outer semantics) or when it is older than `toleranceUs`.
    *
    * Ties: a right row AT the left row's timestamp matches (<=, the
    * DuckDB/pandas ASOF convention). Right rows must be unique per
    * (key, ts) — pre-aggregate duplicates or the carried payload is
    * nondeterministic (documented, not checked: the check would cost a
    * full groupBy).
    *
    * The matched right row is carried as ONE struct (never per-column),
    * so a right row whose payload VALUE is null still matches as a row
    * — its null payload arrives as null instead of an older row's value
    * leaking through — and multi-payload results can never mix columns
    * from different right rows. `tsCol` must not be listed in
    * `payloadCols`; the matched timestamp is always returned as
    * `asof_ts`.
    *
    * One shuffle (key), one window sort — no join node at all. */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      toleranceUs: Long = Long.MaxValue): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    require(keyCols.nonEmpty, "as-of needs at least one match key")
    require(toleranceUs > 0, "tolerance must be positive")
    require(!payloadCols.contains(tsCol),
      s"payloadCols must not contain tsCol '$tsCol' — the matched timestamp is returned as asof_ts")
    val leftCols = left.columns.toSeq
    val rStructType = StructType(
      StructField("__ts", right.schema(tsCol).dataType) +:
        payloadCols.map(c => StructField(c, right.schema(c).dataType)))
    // tag = 0 sorts BEFORE tag = 1 at an equal timestamp, so the window
    // running-last sees the right row first and the left row at the same
    // ts picks it up (the <= tie rule falls out of the sort order)
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(0).as("__tag"),
        struct(col(tsCol).as("__ts") +: payloadCols.map(c => col(c).as(c)): _*)
          .as("__r")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(col(tsCol), lit(1).as("__tag"),
        lit(null).cast(rStructType).as("__r")) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
          .map(c => col(c).as(s"__l_$c")): _*)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.select(
      (keyCols.map(col) :+ col(tsCol) :+ col("__tag")) ++
        lTagged.columns.filter(_.startsWith("__l_")).map(col) :+
        last(col("__r"), ignoreNulls = true).over(w).as("__m"): _*)
    val inTol = col("__m").isNotNull &&
      (unix_micros(col(tsCol)) - unix_micros(col("__m.__ts")) <= toleranceUs)
    carried.where(col("__tag") === 1).select(
      keyCols.map(col) ++ Seq(col(tsCol)) ++
        leftCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
          .map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c =>
          when(inTol, col(s"__m.$c")).as(s"asof_$c")) ++
        Seq(when(inTol, col("__m.__ts")).as("asof_ts")): _*)
  }

  /** Range join: all (left, right) pairs with
    * `0 < right.tsCol − left.tsCol <= deltaUs` and equal `keyCols`
    * (keyCols may be empty — the pure time-range case). Returns the
    * pair frame: every left column plus each `rightCols` renamed
    * `r_<name>`.
    *
    * The left side probes buckets {b, b+1} (2× row duplication); the
    * bucket becomes part of the equi-join key, the exact range
    * predicate stays as a cheap residual filter. */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, deltaUs: Long, rightCols: Seq[String]): DataFrame = {
    require(deltaUs > 0, "delta must be positive")
    // EXACT long floor-div, never `/`: Divide promotes long/long to
    // double, whose 53-bit mantissa misassigns buckets for timestamps
    // past 2^53 µs and silently drops matching pairs (r15 review
    // finding). Align to the floor multiple with floorMod (all long
    // ops), then DIV — truncation equals floor on an exact multiple,
    // sign included.
    // floorMod-align (pmod is the non-negative remainder), then DIV —
    // every op stays in LONG and truncation equals floor on the exact
    // multiple, sign included
    def bucketOf(ts: Column): Column =
      org.apache.spark.sql.functions.expr(
        s"(unix_micros(`$tsCol`) - pmod(unix_micros(`$tsCol`), ${deltaUs}L))" +
          s" DIV ${deltaUs}L")
    val bL = bucketOf(col(tsCol))
    val probe = left.withColumn("__b", explode(array(bL, bL + 1)))
    val build = right.select(
      keyCols.map(col) ++ Seq(col(tsCol).as("__r_ts"),
        bucketOf(col(tsCol)).as("__b")) ++
        rightCols.filterNot(keyCols.contains).filterNot(_ == tsCol)
          .map(c => col(c).as(s"r_$c")): _*)
    val gap = unix_micros(col("__r_ts")) - unix_micros(col(tsCol))
    probe.join(build, keyCols :+ "__b")
      .where(gap > 0 && gap <= deltaUs)
      .drop("__b")
      .withColumnRenamed("__r_ts", s"r_$tsCol")
  }

  /** Batch sessionization — the batch complement of
    * [[graft.streaming.StreamingOps.sessionAgg]]'s live session
    * windows (same semantics, replayable over history): per key,
    * events closer than `gapUs` chain into one session; a gap larger
    * than `gapUs` starts the next. One per-session summary row:
    * `(keyCol, session_idx, n_events, start_us, end_us, duration_us)`
    * with `session_idx` numbering a key's sessions 1..n in time order.
    *
    * The classic gaps-and-islands pass: lag + running sum + one agg,
    * all inside a single window partitioned BY THE KEY — one shuffle,
    * per-partition work bounded by a key's own event count, nothing
    * global. Timestamps reduce to `unix_micros` BIGINTs up front
    * (≡ DuckDB `epoch_us` — the repo's cross-engine timestamp idiom),
    * so everything downstream is exact integer arithmetic. Ties on
    * `tsCol` order by `idCol` — deterministic on both engines. */
  def sessionize(events: DataFrame, gapUs: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(gapUs > 0, "gapUs must be positive")
    val e = events.select(col(keyCol), col(idCol).as("__id"),
      unix_micros(col(tsCol)).as("__us"))
    val order = Window.partitionBy(keyCol).orderBy("__us", "__id")
    val marked = e
      .withColumn("__pus", lag(col("__us"), 1).over(order))
      .withColumn("__brk",
        when(col("__pus").isNull || col("__us") - col("__pus") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("__brk")).over(order))
    marked.groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("__us")).as("start_us"),
        max(col("__us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}
