package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

import graft.catalog.GraftTable
import graft.ops.VersionedTable

/** Analyzer (post-hoc resolution) rule: every READ of a
  * [[graft.catalog.GraftTable]] resolved through the V2 catalog is
  * swapped for the native [[VersionedTable.read]] plan — the SAME tagged
  * parquet `LogicalRelation` the `graft_vtable` TVF produces. One read
  * implementation, two spellings: manifest data skipping
  * ([[VtableSkipping]]), metadata-only aggregates ([[VtableMetadataAgg]])
  * and MV rewrite ([[VtableViewRewrite]]) all keep working because they
  * key off [[VersionedTable.pruneTag]], which the swapped-in relation
  * carries. Without this rule (extensions not installed) the table still
  * reads through its `V1Scan` fallback — correct, row-based, slower.
  *
  * WRITE-SIDE targets must stay V2 relations (that is how Spark finds
  * the `SupportsWrite`/`SupportsDelete` implementation), so the
  * recursion rewrites only [[V2WriteCommand]]'s QUERY side and leaves
  * [[DeleteFromTable]]'s target alone.
  *
  * The output attributes of the swap reuse the V2 relation's expression
  * ids (per-column `Alias` with pinned `exprId`), so the surrounding
  * plan — and anything already resolved against the relation — is
  * untouched.
  *
  * The rule runs at TWO hook points, because sessions reach the catalog
  * two ways:
  *  - `spark.sql.extensions` sessions: post-hoc RESOLUTION rule — the
  *    swap happens before optimization, matching the raw
  *    [[DataSourceV2Relation]].
  *  - plain sessions upgraded by [[graft.functions.GraftFunctions
  *    .register]]: `experimental.extraOptimizations` — by then V2
  *    pushdown has already turned the relation into a
  *    [[DataSourceV2ScanRelation]] (with pruned output), which swaps the
  *    same way; the fixed-point "User Provided Optimizers" batch then
  *    lets [[VtableSkipping]] prune the swapped relation on a later
  *    iteration of the same batch.
  */
object VtableCatalogReads extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = rewrite(plan)

  private def rewrite(p: LogicalPlan): LogicalPlan = p match {
    case w: V2WriteCommand => w.withNewQuery(rewrite(w.query))
    case d: DeleteFromTable => d // target relation + pushed condition only
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      swap(r.table.asInstanceOf[GraftTable], r.output)
    case s: DataSourceV2ScanRelation
        if s.relation.table.isInstanceOf[GraftTable] =>
      swap(s.relation.table.asInstanceOf[GraftTable], s.output)
    case other =>
      other.mapChildren(rewrite).transformExpressionsUp {
        case se: SubqueryExpression => se.withNewPlan(rewrite(se.plan))
      }
  }

  private def missing(t: GraftTable, name: String,
                      inner: LogicalPlan): Nothing =
    throw new IllegalStateException(
      s"VtableCatalogReads: column $name of ${t.name()} is missing " +
        s"from the table read (has ${inner.output.map(_.name).mkString(", ")}) " +
        "— the table changed schema between resolution and planning; re-run")

  /** The native read with its output rebound to the V2 relation's
    * expression ids. The read's plan is freshly built (nothing else
    * references its attributes), so when it is a bare `LogicalRelation`
    * the rebinding is a `copy(output = …)` — NO wrapper node, which
    * matters: [[VtableSkipping]]'s `Filter`-over-relation match (and the
    * planner's scan-schema pruning) see exactly the shape the TVF
    * produces. Narrower/reordered outputs add one attribute-only
    * `Project`; reads with their own plan structure (column-mapped
    * tables) fall back to an aliasing `Project`.
    */
  private def swap(t: GraftTable,
                   out: Seq[AttributeReference]): LogicalPlan = {
    val spark = SparkSession.active
    val inner = VersionedTable.read(spark, t.dir, t.asOf)
      .queryExecution.analyzed
    inner match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        val v2ByName = out.map(a => a.name.toLowerCase -> a).toMap
        val rebound = lr.output.map(ia =>
          v2ByName.get(ia.name.toLowerCase).map(va =>
            ia.withExprId(va.exprId)).getOrElse(ia))
        val relr = lr.copy(output = rebound)
        relr.copyTagsFrom(lr) // pruneTag/tableIdTag live on the node
        if (rebound.map(_.exprId) == out.map(_.exprId)) relr
        else Project(out.map(a =>
          rebound.find(_.exprId == a.exprId)
            .getOrElse(missing(t, a.name, inner)): NamedExpression), relr)
      case _ =>
        val byName = inner.output.map(a => a.name.toLowerCase -> a).toMap
        Project(out.map { a =>
          val src = byName.getOrElse(a.name.toLowerCase,
            missing(t, a.name, inner))
          Alias(src, a.name)(exprId = a.exprId,
            qualifier = a.qualifier): NamedExpression
        }, inner)
    }
  }
}
