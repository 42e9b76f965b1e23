package graft.sql

import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session parser wrapper: graft DML statements (see [[GraftDml]]) parse
  * here; every other statement — and every non-plan parse request —
  * delegates to Spark's parser verbatim. Injected by
  * [[graft.functions.GraftSqlExtensions]], so a session built with
  * `spark.sql.extensions=graft.functions.GraftSqlExtensions` runs
  * `spark.sql("MERGE INTO graft_vtable(...) ...")` natively.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftDml.parse(sqlText).getOrElse(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String) =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String) =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String) =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String) =
    delegate.parseRoutineParam(sqlText)
}

/** SQL entry point for sessions that did not inject the parser (plain
  * `getOrCreate` + [[graft.functions.GraftFunctions.register]]): graft
  * DML executes through the same command plans; everything else is
  * `spark.sql`. Command plans execute EAGERLY, like every Spark DML.
  */
object GraftSql {
  def sql(spark: SparkSession, sqlText: String): DataFrame =
    GraftDml.parse(sqlText)
      .map(plan => org.apache.spark.sql.GraftShim.dataFrame(spark, plan))
      .getOrElse(spark.sql(sqlText))
}
