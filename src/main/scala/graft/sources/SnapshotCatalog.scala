package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The SQL front door of the snapshot store: a DSv2 [[TableCatalog]]
  * mapping `catalog.ns….table` identifiers onto snapshot roots under a
  * configured warehouse directory, so the lakehouse runs from
  * `spark.sql` TEXT — the first surface a real user touches:
  *
  * {{{
  * spark.sql.catalog.lake           = graft.sources.SnapshotCatalog
  * spark.sql.catalog.lake.warehouse = hdfs://…/lakehouse
  *
  * SELECT * FROM lake.raw.docs                        -- latest version
  * SELECT * FROM lake.raw.docs VERSION AS OF 3        -- time travel
  * SELECT * FROM lake.raw.docs TIMESTAMP AS OF '…'    -- by commit time
  * MERGE INTO lake.raw.docs t USING batch s
  *   ON t.doc_id = s.doc_id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *                   -- COW upsert
  * CALL lake.system.expire_snapshots('raw.docs', 3)   -- retention
  * CALL lake.system.vacuum('raw.docs')                -- debris GC
  * CALL lake.system.rollback('raw.docs', 2)           -- undo commit
  * }}}
  *
  * Identity-only by design: the catalog resolves names/versions to
  * [[SnapshotSqlTable]] handles; the actual scan/merge semantics are
  * lowered by [[ResolveSnapshotSql]] onto the SAME
  * [[SnapshotTable]] code paths the programmatic API runs (manifest
  * union, MOR delete vectors, stats-pruned file index, optimistic
  * commit) — the SQL surface can never drift from the engine.
  *
  * Also a [[ProcedureCatalog]]: maintenance runs as `CALL` statements
  * (`expire_snapshots`, `vacuum`, `rollback`, `compact_small` — the
  * Iceberg procedure convention), each returning its report as rows.
  *
  * Time travel resolves through the two `loadTable` overloads Spark's
  * analyzer calls for `VERSION AS OF` (exact published version id) and
  * `TIMESTAMP AS OF` (latest version committed at-or-before the
  * instant, [[SnapshotTable.versionAsOf]]).
  */
class SnapshotCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at the " +
          "directory holding the snapshot roots"))
  }

  override def name(): String = catalogName

  private def spark = SparkSession.active

  private[sources] def rootOf(ident: Identifier): String =
    ((warehouse +: ident.namespace.toIndexedSeq) :+ ident.name)
      .mkString("/")

  private def rootOf(dotted: String): String =
    (warehouse +: dotted.split('.').toIndexedSeq).mkString("/")

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.latestVersion(spark, rootOf(ident)).isDefined

  override def loadTable(ident: Identifier): Table = {
    val root = rootOf(ident)
    val v = SnapshotTable.latestVersion(spark, root)
      .getOrElse(throw new NoSuchTableException(ident))
    SnapshotSqlTable(fullName(ident), root, v)
  }

  /** `VERSION AS OF <v>` — an exact published version id. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val v = try version.trim.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"snapshot versions are integers; got VERSION AS OF '$version'")
    }
    if (!SnapshotTable.versions(spark, root).contains(v))
      throw new NoSuchTableException(ident)
    SnapshotSqlTable(fullName(ident), root, v)
  }

  /** `TIMESTAMP AS OF <t>` — latest version committed at or before
    * the instant (micros from Spark's timestamp resolution). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val root = rootOf(ident)
    val v =
      try SnapshotTable.versionAsOf(spark, root, timestampMicros / 1000L)
      catch {
        case _: IllegalStateException => throw new NoSuchTableException(ident)
      }
    SnapshotSqlTable(fullName(ident), root, v)
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace.toIndexedSeq :+ ident.name)
      .mkString(".")

  /** CREATE TABLE — publishes version 1 as an empty file set with the
    * declared schema, so the first `MERGE INTO` / append has a base
    * to land on. Partition transforms are rejected: physical layout
    * in this store is a property of each commit
    * (statsColumn/z-order/buckets), not of the table DDL. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "snapshot tables do not take DDL partition transforms; layout " +
          "is per-commit (statsColumn / rewriteZorder / compactSmall)")
    val root = rootOf(ident)
    if (tableExists(ident))
      throw new IllegalStateException(s"table $ident already exists at $root")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    SnapshotTable.commit(spark, root, empty, append = false)
    loadTable(ident)
  }

  /** ALTER TABLE … ADD / DROP / RENAME COLUMN — the SQL spelling of
    * the store's schema evolution, all three metadata-only:
    *  - ADD publishes one empty file set carrying the widened schema
    *    (append commit); pre-existing rows null-fill through the
    *    parquet missing-column path. Only nullable, top-level,
    *    position-free adds are legal.
    *  - DROP / RENAME publish a manifest schema action
    *    ([[SnapshotTable.alterSchema]]); readers normalize each file
    *    set through pending actions, no data is rewritten, and
    *    `compact` clears the actions by rewriting under the resolved
    *    schema.
    * All other change kinds are rejected loudly — anything else would
    * need a rewrite this store trades away. */
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val root = rootOf(ident)
    // DROP / RENAME COLUMN lower onto the store's metadata-only
    // schema actions ([[SnapshotTable.alterSchema]] — one manifest
    // commit per action, no data rewritten, existence/collision
    // checks and the no-live-MOR-vectors fence enforced there); ADD
    // COLUMN keeps its additive empty-set commit below. Mixed
    // statements apply in order, one version each — Spark sends one
    // change kind per ALTER statement anyway.
    val (schemaChanges, addChanges) = changes.partition {
      case _: TableChange.DeleteColumn | _: TableChange.RenameColumn => true
      case _ => false
    }
    schemaChanges.foreach {
      case d: TableChange.DeleteColumn =>
        if (d.fieldNames.length != 1)
          throw new UnsupportedOperationException(
            s"nested DROP COLUMN ${d.fieldNames.mkString(".")} not supported")
        SnapshotTable.alterSchema(spark, root,
          SnapshotTable.DropColumn(d.fieldNames.head))
      case r: TableChange.RenameColumn =>
        if (r.fieldNames.length != 1)
          throw new UnsupportedOperationException(
            s"nested RENAME COLUMN ${r.fieldNames.mkString(".")} not supported")
        SnapshotTable.alterSchema(spark, root,
          SnapshotTable.RenameColumn(r.fieldNames.head, r.newName))
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    if (addChanges.isEmpty) return loadTable(ident)
    val adds = addChanges.map {
      case a: TableChange.AddColumn => a
      case other => throw new UnsupportedOperationException(
        s"ALTER TABLE on snapshot tables supports ADD/DROP/RENAME " +
          s"COLUMN(S) only; got ${other.getClass.getSimpleName}")
    }
    val v = SnapshotTable.latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"table $ident does not exist"))
    val cur = SnapshotTable.read(spark, root, v).schema
    val newFields = adds.map { a =>
      if (a.fieldNames.length != 1)
        throw new UnsupportedOperationException(
          s"nested ADD COLUMN ${a.fieldNames.mkString(".")} not supported")
      if (a.position != null)
        throw new UnsupportedOperationException(
          "FIRST/AFTER positions not supported: additive evolution " +
            "appends columns in commit order")
      if (!a.isNullable)
        throw new UnsupportedOperationException(
          s"ADD COLUMN ${a.fieldNames.head} must be nullable: existing " +
            "rows null-fill")
      if (cur.fieldNames.exists(_.equalsIgnoreCase(a.fieldNames.head)))
        throw new IllegalArgumentException(
          s"column ${a.fieldNames.head} already exists")
      org.apache.spark.sql.types.StructField(
        a.fieldNames.head, a.dataType, nullable = true)
    }
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(cur.fields ++ newFields))
    SnapshotTable.commit(spark, root, empty, append = true)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = new org.apache.hadoop.fs.Path(rootOf(ident))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(root) && fs.delete(root, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME TABLE is not supported")

  /** Tables under one namespace = snapshot roots (dirs with a
    * `_snapshots` manifest dir) under the namespace directory. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val nsPath = new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toIndexedSeq).mkString("/"))
    val fs = nsPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(nsPath)) Array.empty
    else fs.listStatus(nsPath).filter(_.isDirectory).map(_.getPath.getName)
      .filter(t => SnapshotTable.latestVersion(spark,
        (warehouse +: namespace.toIndexedSeq :+ t).mkString("/")).isDefined)
      .map(Identifier.of(namespace, _))
  }

  // ---- procedures (CALL cat.system.<proc>(…)) ----

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    SnapshotCatalog.ProcedureNames
      .map(Identifier.of(Array("system"), _)).toArray

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val nm = ident.name.toLowerCase(java.util.Locale.ROOT)
    if (!SnapshotCatalog.ProcedureNames.contains(nm))
      throw new IllegalArgumentException(
        s"unknown procedure $ident; have ${SnapshotCatalog.ProcedureNames}")
    new SnapshotProcedure(nm, rootOf _)
  }
}

object SnapshotCatalog {
  val ProcedureNames: Seq[String] =
    Seq("expire_snapshots", "vacuum", "rollback", "compact_small")
}

/** Identity handle for one (root, version) of a snapshot table — the
  * catalog's resolution product. Carries name/schema only;
  * [[ResolveSnapshotSql]] lowers any relation over it onto the
  * programmatic read paths before physical planning, so the handle
  * needs no DSv2 scan machinery of its own. WRITES (`INSERT INTO` /
  * `INSERT OVERWRITE`) go through the V1-fallback write bridge: the
  * builder hands Spark an [[org.apache.spark.sql.sources.InsertableRelation]]
  * that calls [[SnapshotTable.commit]] — an insert is EXACTLY an
  * append commit (overwrite = a replace commit; history stays
  * readable), never a second write path. */
final case class SnapshotSqlTable(tableName: String, root: String,
                                  snapshotVersion: Int)
  extends Table
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = tableName
  override lazy val schema: StructType =
    SnapshotTable.read(SparkSession.active, root, snapshotVersion).schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def properties(): util.Map[String, String] =
    Map("root" -> root, "version" -> snapshotVersion.toString).asJava

  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var replace = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        replace = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              SnapshotTable.commit(data.sparkSession, root, data,
                append = !(replace || overwrite))
              ()
            }
        }
    }
}

/** One maintenance procedure over a snapshot table, Iceberg-style:
  * first argument is the table's dotted name RELATIVE TO THE CATALOG
  * (`'ns.table'`), and the report comes back as the CALL's result
  * rows. */
final class SnapshotProcedure(procName: String, rootOf: String => String)
  extends UnboundProcedure {

  override def name(): String = procName
  override def description(): String = procName match {
    case "expire_snapshots" =>
      "drop versions below keep_from, GC unreferenced file sets"
    case "vacuum" => "GC file sets no published manifest references"
    case "rollback" => "publish a new version with an old version's sets"
    case "compact_small" => "fold file sets smaller than small_rows"
  }

  override def bind(inputType: StructType): BoundProcedure =
    new BoundProcedure {
      override def name(): String = procName
      override def description(): String = SnapshotProcedure.this.description()
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = procName match {
        case "expire_snapshots" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_from", IntegerType).build())
        case "vacuum" => Array(
          ProcedureParameter.in("table", StringType).build())
        case "rollback" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("to_version", IntegerType).build())
        case "compact_small" => Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("small_rows", LongType).build())
      }

      override def call(input: InternalRow): util.Iterator[Scan] = {
        val spark = SparkSession.active
        val root = rootOf(input.getUTF8String(0).toString)
        val (schema, row) = procName match {
          case "expire_snapshots" =>
            val r = SnapshotTable.expire(spark, root, input.getInt(1))
            (StructType(Seq(
              StructField("versions_expired", IntegerType, nullable = false),
              StructField("versions_kept", IntegerType, nullable = false),
              StructField("dirs_removed", IntegerType, nullable = false),
              StructField("dirs_kept", IntegerType, nullable = false))),
              InternalRow(r.versionsExpired, r.versionsKept,
                r.dirsRemoved, r.dirsKept))
          case "vacuum" =>
            val r = SnapshotTable.vacuum(spark, root)
            (StructType(Seq(
              StructField("dirs_removed", IntegerType, nullable = false),
              StructField("dirs_kept", IntegerType, nullable = false))),
              InternalRow(r.dirsRemoved, r.dirsKept))
          case "rollback" =>
            val v = SnapshotTable.rollback(spark, root, input.getInt(1))
            (StructType(Seq(
              StructField("version", IntegerType, nullable = false))),
              InternalRow(v))
          case "compact_small" =>
            val v = SnapshotTable.compactSmall(spark, root, input.getLong(1))
            (StructType(Seq(
              StructField("version", IntegerType, nullable = false))),
              InternalRow(v))
        }
        util.Collections.singletonList[Scan](new LocalScan {
          override def rows(): Array[InternalRow] = Array(row)
          override def readSchema(): StructType = schema
        }).iterator()
      }
    }
}
