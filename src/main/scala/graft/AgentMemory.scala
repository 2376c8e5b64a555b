package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Agent-memory convenience SDK (SURVEY.md §1.1 — reference
  * crates/velesdb-core/src/agent/mod.rs:1-14: semantic / episodic /
  * procedural memories with TTL and snapshots, as a thin layer over
  * collections).
  *
  * Spark shape: one memory collection `(id, kind, content, embedding,
  * ts, ttl_seconds)`; each memory type is a filtered view, recall is
  * exact knn over the live view, expiry is a predicate (storage-level
  * deletion is [[Collections.delete]] + [[Collections.compact]]).
  */
class AgentMemory(spark: SparkSession, collections: Collections,
    name: String = "agent_memory") {

  def create(): Unit =
    if (!collections.exists(name))
      collections.create(name, idCol = "id", vectorCol = Some("embedding"))

  /** Store a batch of memories (upsert by id). A TTL'd memory needs a
    * timestamp to expire FROM — a (ttl, null ts) row was a zombie:
    * invisible to live() (NULL predicate) yet never matched by
    * expire()'s delete either (r15 review finding). */
  def remember(batch: DataFrame): Unit = {
    if (batch.columns.contains("ttl_seconds") && batch.columns.contains("ts")) {
      val zombies = batch
        .where(col("ttl_seconds").isNotNull && col("ts").isNull).limit(1)
      require(zombies.isEmpty,
        "a memory with ttl_seconds needs a non-null ts to expire from")
    }
    collections.upsert(name, batch)
  }

  /** Live (non-expired) memories at `nowEpoch`; NULL TTL = keep forever. */
  def live(nowEpoch: Long): DataFrame = {
    val df = collections.table(name)
      .getOrElse(throw new IllegalStateException(s"$name not created"))
    df.where(col("ttl_seconds").isNull ||
      unix_timestamp(col("ts")) + col("ttl_seconds") > nowEpoch)
  }

  def semantic(nowEpoch: Long): DataFrame = live(nowEpoch).where(col("kind") === "semantic")
  def episodic(nowEpoch: Long): DataFrame = live(nowEpoch).where(col("kind") === "episodic")
  def procedural(nowEpoch: Long): DataFrame = live(nowEpoch).where(col("kind") === "procedural")

  /** Recall: exact top-k over live memories of a kind, ranked under the
    * collection's OWN declared metric (a hardcoded cosine silently
    * re-ranked collections created with another metric; r15 review). */
  def recall(kind: String, query: Seq[Float], k: Int, nowEpoch: Long): DataFrame =
    operators.Knn.topK(live(nowEpoch).where(col("kind") === kind),
      "embedding", query, k, collections.metaOf(name)._3, idCol = "id")

  /** Expire: physically delete dead rows (agent snapshot hygiene).
    * A predicate delete — the dead set is filtered out executor-side
    * (the r1 shape collected every dead id to the driver: unbounded). */
  def expire(nowEpoch: Long): Unit =
    collections.deleteWhere(name, col("ttl_seconds").isNotNull &&
      unix_timestamp(col("ts")) + col("ttl_seconds") <= nowEpoch)

  // ---- snapshots (agent/snapshot.rs SnapshotManager): persist the
  // memory state under a tag; restore makes that state current again.
  // Thin delegation to [[Collections.snapshot]]/[[Collections
  // .restoreSnapshot]] — the memory store IS a collection, so snapshot
  // durability and atomic-restore semantics come from the generation
  // machinery for free.

  def snapshot(tag: String): Unit = collections.snapshot(name, tag)
  def restore(tag: String): Unit = collections.restoreSnapshot(name, tag)
  def listSnapshots(): Seq[String] = collections.listSnapshots(name)
}
