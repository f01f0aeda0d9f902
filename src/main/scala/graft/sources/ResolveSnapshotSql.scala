package graft.sources

import org.apache.spark.sql.{GraftSqlBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.IntegerType

/** Lowers SQL over [[SnapshotCatalog]] tables onto the programmatic
  * snapshot engine — the rule that makes the catalog's identity
  * handles EXECUTABLE:
  *
  *  - a relation over a [[SnapshotSqlTable]] (any `SELECT`, incl.
  *    `VERSION AS OF` / `TIMESTAMP AS OF`, whose version the catalog
  *    already pinned into the handle) becomes the version's read
  *    plan: the stats-pruned manifest [[SnapshotFileIndex]] scan when
  *    the version carries no MOR delete vectors, else the
  *    delete-applying union [[SnapshotTable.read]] builds — EXACTLY
  *    the programmatic semantics, never a parallel SQL
  *    re-implementation;
  *  - `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE
  *    SET * WHEN NOT MATCHED THEN INSERT *` becomes
  *    [[SnapshotTable.merge]] (the stats-scoped copy-on-write upsert
  *    — cost of the TOUCHED sets, never the table), and
  *    `… WHEN MATCHED THEN DELETE` (alone) becomes
  *    [[SnapshotTable.deleteRows]] (a MOR delete-vector commit).
  *    Other action shapes raise a clear AnalysisException naming the
  *    supported forms — a wrong answer would be worse than no answer.
  *
  * Runs as an injected RESOLUTION rule, replacing the plan nodes
  * before Spark's own row-level-operation machinery (which requires
  * `SupportsRowLevelOperations`) or the V2 capability checks would
  * reject them. Attribute identity is preserved by aliasing the read
  * plan's columns back onto the relation's original ExprIds, so
  * parent operators resolve unchanged.
  */
class ResolveSnapshotSql(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Fast bail-out for the 99% case: this rule sits in EVERY session's
    // resolution batch and is re-invoked on every analyzer fixed-point
    // iteration of every query — and analysis runs once per DataFrame
    // transformation, not once per action, so a 30-step query pays it
    // ~30×N times. A plan that contains no snapshot relation anywhere
    // (every MERGE over a snapshot table necessarily contains one as
    // its target) must cost ONE short-circuiting walk with no
    // allocation — not the collect-into-Set + transformUp double walk
    // below, whose per-node closure dispatch showed up as board-wide
    // fixed cost on the 245-query bench.
    val touchesSnapshot = plan.exists {
      case r: DataSourceV2Relation => r.table.isInstanceOf[SnapshotSqlTable]
      case _ => false
    }
    if (!touchesSnapshot) return plan
    // a MERGE or INSERT target must stay a RELATION until its consumer
    // takes it: transformUp visits the relation before its parent, and
    // rewriting it to a read Project there would leave the merge
    // unmatched forever (no SupportsRowLevelOperations) or break the
    // V1-write bridge (AppendData/Overwrite need the DSv2 relation's
    // SupportsWrite table). Collected fresh each pass; once the merge
    // lowers / the write plans, the set is empty and reads proceed.
    val mergeTargets: Set[LogicalPlan] = plan.collect {
      case m: MergeIntoTable => EliminateSubqueryAliases(m.targetTable)
      case a: AppendData => EliminateSubqueryAliases(a.table)
      case o: OverwriteByExpression => EliminateSubqueryAliases(o.table)
    }.toSet
    plan.transformUp {
      case m: MergeIntoTable if isSnapshotTarget(m.targetTable) &&
          m.sourceTable.resolved && m.mergeCondition.resolved =>
        lowerMerge(m)
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotSqlTable] &&
            !mergeTargets.contains(r) =>
        readPlanFor(r)
    }
  }

  private def isSnapshotTarget(target: LogicalPlan): Boolean =
    EliminateSubqueryAliases(target) match {
      case r: DataSourceV2Relation => r.table.isInstanceOf[SnapshotSqlTable]
      case _ => false
    }

  /** The pinned version's read plan, output re-aliased onto the
    * relation's ExprIds. Delete-vector-free versions read through the
    * manifest file index (file-set skipping + parquet pushdown);
    * versions with MOR deletes read through the anti-join union. */
  private def readPlanFor(r: DataSourceV2Relation): LogicalPlan = {
    val t = r.table.asInstanceOf[SnapshotSqlTable]
    val df = SnapshotTable.sqlRead(spark, t.root, t.snapshotVersion)
    val read = GraftSqlBridge.logicalPlan(df)
    val byName = read.output.map(a => a.name.toLowerCase -> a).toMap
    val cols: Seq[NamedExpression] = r.output.map { a =>
      val src = byName.getOrElse(a.name.toLowerCase,
        throw new IllegalStateException(
          s"snapshot read of ${t.tableName} lost column ${a.name}"))
      Alias(src, a.name)(exprId = a.exprId)
    }
    Project(cols, read)
  }

  private def lowerMerge(m: MergeIntoTable): LogicalPlan = {
    val target = EliminateSubqueryAliases(m.targetTable)
      .asInstanceOf[DataSourceV2Relation]
    val table = target.table.asInstanceOf[SnapshotSqlTable]
    def unsupported(what: String): Nothing =
      throw new UnsupportedOperationException(
        s"MERGE INTO ${table.tableName}: $what")
    // key: a single target-column = source-column equality on the
    // same column name — the upsert key shape merge()/deleteRows()
    // implement. (General conditions need Spark's row-level-operation
    // rewrite, which this store trades away for stats-scoped commits.)
    val key = m.mergeCondition match {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if l.name.equalsIgnoreCase(r.name) &&
            (target.outputSet.contains(l) ^ target.outputSet.contains(r)) =>
        l.name
      case other => unsupported(
        s"ON must be t.<key> = s.<key> on one shared column; got ${other.sql}")
    }
    // source plan with any snapshot relations lowered too (the command
    // is a leaf — the fixed point will not descend into it)
    val source = m.sourceTable.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[SnapshotSqlTable] => readPlanFor(r)
    }
    // SET * / INSERT * arrive either raw (star actions) or already
    // expanded by the analyzer into per-column name-matched
    // assignments — accept both spellings of the same upsert shape
    def isStarAssignments(assigns: Seq[Assignment]): Boolean =
      assigns.nonEmpty && assigns.forall {
        case Assignment(k: AttributeReference, v: AttributeReference) =>
          k.name.equalsIgnoreCase(v.name)
        case _ => false
      }
    def isSetStar(a: MergeAction): Boolean = a match {
      case UpdateStarAction(None) => true
      case u: UpdateAction =>
        u.condition.isEmpty && isStarAssignments(u.assignments)
      case _ => false
    }
    def isInsertStar(a: MergeAction): Boolean = a match {
      case InsertStarAction(None) => true
      case i: InsertAction =>
        i.condition.isEmpty && isStarAssignments(i.assignments)
      case _ => false
    }
    (m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions) match {
      case (Seq(up), Seq(ins), Seq()) if isSetStar(up) && isInsertStar(ins) =>
        SnapshotMergeCommand(table.root, key, source, delete = false)
      case (Seq(DeleteAction(None)), Seq(), Seq()) =>
        SnapshotMergeCommand(table.root, key, source, delete = true)
      case _ => unsupported(
        "actions must be exactly [WHEN MATCHED THEN UPDATE SET * WHEN " +
          "NOT MATCHED THEN INSERT *] (upsert) or [WHEN MATCHED THEN " +
          "DELETE] (MOR delete)")
    }
  }
}

/** `MERGE INTO` lowered onto the snapshot store's own write paths:
  * upsert = [[SnapshotTable.merge]] (stats-scoped COW — rewrites only
  * file sets the update keys can touch), delete =
  * [[SnapshotTable.deleteRows]] (one MOR delete-vector commit).
  * Returns the published version as the command's single row. The
  * source plan is a constructor argument, not a child: it is already
  * analyzed when the rule builds the command, and re-enters a full
  * QueryExecution (optimizer included) through the DataFrame handle
  * at run time. */
final case class SnapshotMergeCommand(root: String, key: String,
                                      source: LogicalPlan,
                                      delete: Boolean)
  extends LeafRunnableCommand {

  override def output: Seq[AttributeReference] =
    Seq(AttributeReference("version", IntegerType, nullable = false)())

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = GraftSqlBridge.dataset(spark, source)
    val v =
      if (delete) SnapshotTable.deleteRows(spark, root, src.select(key), key)
      else SnapshotTable.merge(spark, root, src, key)
    Seq(Row(v))
  }
}
