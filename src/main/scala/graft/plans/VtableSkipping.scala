package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.ops.VersionedTable

/** Optimizer-integrated data skipping for versioned tables: the rule that
  * makes `SELECT … FROM graft_vtable('/wh/t') WHERE k BETWEEN 5 AND 9` —
  * or any `VersionedTable.read(...).filter(...)` DataFrame — skip
  * manifest-pruned files WITHOUT the caller going through
  * [[graft.ops.VersionedTable.readWhere]].
  *
  * [[graft.ops.VersionedTable]] tags every base parquet relation it hands
  * out with its (dir, pinned version). This rule fires on
  * `Filter(cond, taggedRelation)` — the shape the main optimizer batches
  * normalize to (predicates pushed through projects, adjacent filters
  * combined) — mines the condition's top-level AND conjuncts for
  * `attr <op> literal` ranges and `attr IN (literals)` sets (the same
  * conservative contract as [[graft.ops.VersionedTable.readWhere]]: ORs
  * never split, casts/UDFs mine nothing, strict bounds widen to closed),
  * asks the manifest which files could hold a qualifying row (zone-map
  * intervals + bloom sidecar refinement), and swaps the relation's
  * [[InMemoryFileIndex]] for one listing only the survivors.
  *
  * Correctness is independent of extraction, twice over: every mined
  * predicate is implied by the conjunct it came from, and the Filter
  * node itself is LEFT IN PLACE — pruning only decides which files are
  * worth opening, exactly parquet row-group pruning one level up. The
  * relation's output attributes are reused verbatim, so no expression id
  * in the surrounding plan changes. Pruning a tagged base under a patch
  * fold is sound because Catalyst only places a Filter directly on the
  * base where filtering is sound, and skipping a file none of whose rows
  * survive that filter is the same algebra at file granularity.
  *
  * Runs in the user-provided / injected-rule batch AFTER the main
  * optimizer (so literal folding and predicate pushdown are done).
  * Terminates under fixed-point: a pruned relation is re-tagged with
  * [[prunedTag]] and never matched again; a no-op prune returns the
  * original node instance.
  *
  * Reference note: the reference engine re-reads its whole SQLite table
  * per run (reference/scripts/load.py:107-159) — file skipping is the
  * capability gap this closes at warehouse scale.
  */
object VtableSkipping extends Rule[LogicalPlan] {

  /** Marks a relation this rule already rewrote (or decided not to). */
  private[graft] val prunedTag =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.vtable.pruned")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.getTagValue(VersionedTable.pruneTag).isDefined &&
          lr.getTagValue(prunedTag).isEmpty &&
          lr.relation.isInstanceOf[HadoopFsRelation] =>
      val (dir, version) = lr.getTagValue(VersionedTable.pruneTag).get
      val (ranges, inSets) = mine(cond)
      if (ranges.isEmpty && inSets.isEmpty) f
      else {
        val fsRel = lr.relation.asInstanceOf[HadoopFsRelation]
        val spark = fsRel.sparkSession
        val survivors =
          VersionedTable.pruneForSpec(spark, dir, ranges, inSets, Some(version))
        val total = fsRel.location.inputFiles.length
        if (survivors.size >= total) f
        else if (survivors.isEmpty)
          // no file can hold a qualifying row — the relation collapses to
          // an empty local relation with the SAME output attributes
          Filter(cond, LocalRelation(lr.output, Seq.empty, isStreaming = false))
        else {
          val paths = survivors.map(p => new Path(s"$dir/$p"))
          val index = new InMemoryFileIndex(spark, paths, fsRel.options,
            Some(fsRel.dataSchema), FileStatusCache.getOrCreate(spark),
            None, None)
          val pruned = lr.copy(relation = fsRel.copy(location = index)(spark))
          pruned.setTagValue(prunedTag, true)
          Filter(cond, pruned)
        }
      }
  }

  /** Conjunct miner over RESOLVED Catalyst predicates — the optimizer-side
    * sibling of [[org.apache.spark.sql.GraftShim.mineRanges]] (which walks
    * unresolved ColumnNode trees). By this point constant folding has run,
    * so literal sides are [[Literal]]s; `In` may have become [[InSet]]
    * (whose values are internal, hence `Literal(v, dt)` not
    * `Literal.apply`). Only bare `AttributeReference <op> Literal` shapes
    * mine — a Cast on the attribute side mines nothing (conservative), and
    * `EqualNullSafe` is deliberately excluded: `a <=> NULL` SELECTS null
    * rows, which interval pruning would wrongly drop.
    */
  private[graft] def mine(cond: Expression)
      : (Seq[(String, Option[Column], Option[Column])], Seq[(String, Seq[Column])]) = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def c(l: Literal): Column = GraftShim.column(l)
    val ranges = conjuncts(cond).flatMap {
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => Some((a.name, Some(c(l)), None))
      case GreaterThan(a: AttributeReference, l: Literal)        => Some((a.name, Some(c(l)), None))
      case LessThanOrEqual(a: AttributeReference, l: Literal)    => Some((a.name, None, Some(c(l))))
      case LessThan(a: AttributeReference, l: Literal)           => Some((a.name, None, Some(c(l))))
      case EqualTo(a: AttributeReference, l: Literal)            => Some((a.name, Some(c(l)), Some(c(l))))
      // literal on the LEFT flips the direction
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => Some((a.name, None, Some(c(l))))
      case GreaterThan(l: Literal, a: AttributeReference)        => Some((a.name, None, Some(c(l))))
      case LessThanOrEqual(l: Literal, a: AttributeReference)    => Some((a.name, Some(c(l)), None))
      case LessThan(l: Literal, a: AttributeReference)           => Some((a.name, Some(c(l)), None))
      case EqualTo(l: Literal, a: AttributeReference)            => Some((a.name, Some(c(l)), Some(c(l))))
      case _ => None
    }
    val ins = conjuncts(cond).flatMap {
      case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        Some((a.name, vs.map(v => c(v.asInstanceOf[Literal]))))
      case InSet(a: AttributeReference, hset) if hset.nonEmpty =>
        Some((a.name, hset.toSeq.map(v => GraftShim.column(Literal(v, a.dataType)))))
      case _ => None
    }
    (ranges, ins)
  }
}
