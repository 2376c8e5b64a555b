package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the RAG / embedding-pipeline
  * front step (LangChain's RecursiveCharacterTextSplitter shape, token
  * flavor): fixed windows of `windowTokens` whitespace tokens advancing
  * by `strideTokens`, so consecutive chunks overlap by
  * `windowTokens - strideTokens` tokens and no token is lost.
  *
  * Beyond-reference pipeline tier (velesdb stores and searches vectors;
  * producing the chunk rows that get embedded is the step before it).
  *
  * Scale shape: map-only — tokenize, per-row chunk-count arithmetic,
  * one `explode` per chunk; no shuffle, no state, fuses into a single
  * whole-stage-codegen projection over the scan. Output size is
  * ~n_tokens/stride rows per doc regardless of corpus size. */
object Chunking {

  /** Emit `(idCol, chunk_id, chunk, n_tokens)` — chunk i covers tokens
    * [i·stride + 1, i·stride + window] (1-based, clamped at the doc
    * end), chunk_id is 0-based. Docs with zero tokens emit nothing.
    * Chunk count = 1 + max(0, ceil((n − window)/stride)) — the standard
    * last-window-may-be-short convention. */
  def slidingWindow(docs: DataFrame, textCol: String, idCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens >= 1, "windowTokens must be >= 1")
    require(strideTokens >= 1 && strideTokens <= windowTokens,
      "strideTokens must be in [1, windowTokens]")
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    val lastChunk = greatest(lit(0L),
      ceil((col("__n") - lit(windowTokens)).cast("double") / lit(strideTokens)))
    docs.select(col(idCol), toks.as("__w"))
      .withColumn("__n", size(col("__w")))
      .where(col("__n") > 0)
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0L), lastChunk)).as("chunk_id"))
      .withColumn("__s",
        slice(col("__w"), (col("chunk_id") * strideTokens + 1).cast("int"),
          lit(windowTokens)))
      .select(col(idCol), col("chunk_id"),
        array_join(col("__s"), " ").as("chunk"),
        size(col("__s")).cast("long").as("n_tokens"))
  }
}
