package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay documents end-to-end in a
  * deterministic order and cut the stream into fixed token-budget chunks
  * ("concat-and-chunk" — what GPT-style pre-training does to fill context
  * windows without padding).
  *
  * The reference has no such operator; north-star scope. Scale shape: the
  * running token total is a per-SHARD window scan, so parallelism = number
  * of shards and no global single-partition sort ever happens. Shards are
  * the natural training-data unit (source, dump, path prefix); skew is
  * bounded by the largest shard. All math is integer (cumsum, integer
  * division, modulo) — exact on every engine.
  */
object PackOps {

  /** Assign each row its chunk under concat-and-chunk packing.
    *
    * Within each `shardCol` partition, rows are laid out in `orderCol`
    * order; the token stream is cut every `budget` tokens. Appends:
    *  - `chunk_id`: chunk (within the shard) containing the row's FIRST token
    *  - `chunk_off`: that token's offset inside the chunk
    *  - `n_chunks`: how many chunks the row spans (a row longer than the
    *    remaining space straddles a boundary; trainers mask or split there)
    */
  def packByTokenBudget(df: DataFrame, shardCol: String, orderCol: String,
                        tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__tok", tokens.cast("long"))
      .withColumn("__before", sum(col("__tok")).over(w) - col("__tok"))
      .withColumn("chunk_id", expr(s"__before div ${budget}L"))
      .withColumn("chunk_off", col("__before") % budget)
      .withColumn("n_chunks",
        when(col("__tok") === 0, lit(1L))
          .otherwise(expr(s"(chunk_off + __tok + ${budget - 1}L) div ${budget}L")))
      .drop("__tok", "__before")
  }
}
