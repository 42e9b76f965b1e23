package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: filter a huge fact table down to rows
  * that MIGHT match a selective dimension BEFORE the join shuffle.
  *
  * At 100 TB this is the difference between shuffling the whole fact table
  * and shuffling ~|matching| rows: the bloom filter is built with one pass
  * over the (small) key side, shipped to every fact task as a broadcast
  * closure, and applied as a scan-adjacent filter — false positives are
  * removed by the exact join that follows, so results are identical to the
  * plain join. (Spark can inject this itself via
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` for shuffle joins;
  * this operator is the explicit, composable form — e.g. to pre-filter
  * before an expensive UDF or a non-join consumer.)
  */
object BloomOps {

  /** `fact` reduced to rows whose `factKey` might appear in `dim.dimKey`.
    * Exactly the semi-join rows plus ≤ fpp false positives; null keys drop
    * (a null never equi-joins). One action on `dim` to build the sketch.
    * The probe is a codegen'd native expression
    * ([[graft.functions.SketchExpressions.BloomMightContain]]) carrying the
    * sketch as a plan reference object — the fact-side scan stays inside
    * whole-stage codegen with no per-row boxing (plan-pinned: no ScalaUDF).
    * Probe type follows the fact column's type — integral keys probe as
    * long, strings as UTF-8 bytes (matching how `stat.bloomFilter` inserted
    * the dim side); anything else is rejected loudly rather than silently
    * filtering everything out with a mistyped probe.
    */
  def bloomReduce(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.functions.SketchExpressions
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val might = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        SketchExpressions.bloomMightContain(col(factKey).cast("long"), bf)
      case StringType =>
        SketchExpressions.bloomMightContain(col(factKey), bf)
      case other =>
        throw new IllegalArgumentException(
          s"bloomReduce: unsupported key type $other for '$factKey' " +
            "(integral and string keys only — matching BloomFilter.put semantics)")
    }
    fact.filter(might)
  }

  /** Bloom-reduced equi-join: plain inner join result, but the fact side
    * is pre-filtered by the dimension-key bloom filter so the join shuffle
    * moves only probable matches.
    */
  def bloomJoin(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long, fpp: Double = 0.01): DataFrame =
    bloomReduce(fact, dim, factKey, dimKey, expectedItems, fpp)
      .join(dim, col(factKey) === col(dimKey))
}
