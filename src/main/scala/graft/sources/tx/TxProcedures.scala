package graft.sources.tx

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MAINTENANCE PROCEDURES — the format's two table-level maintenance
  * operations as SQL `CALL` statements (Spark 4's DSv2 stored-procedure
  * contract, the same surface Iceberg ships `system.rewrite_data_files`
  * on):
  *
  * {{{
  *   CALL tx.system.vacuum(tbl => 'events', keep => 8)
  *   CALL tx.system.rebucket(tbl => 'events', nbuckets => 64)
  *   CALL tx.system.restore(tbl => 'events', version => 7)
  * }}}
  *
  * Both return a one-row summary as a [[LocalScan]]. They are
  * maintenance verbs, not queries — vacuum's retention contract and
  * rebucket's O(table) cost are documented on [[graft.sources.Tx]];
  * the procedure surface only removes the last reason to reach for the
  * side API from a SQL-first deployment.
  */
object TxProcedures {

  val Namespace: Array[String] = Array("system")
  val Names: Seq[String] = Seq("vacuum", "rebucket", "restore")

  def forName(name: String, root: String): UnboundProcedure =
    name.toLowerCase match {
      case "vacuum" => new VacuumProcedure(root)
      case "rebucket" => new RebucketProcedure(root)
      case "restore" => new RestoreProcedure(root)
      case other => throw new IllegalArgumentException(
        s"TxCatalog: unknown procedure 'system.$other' " +
          s"(supported: ${Names.mkString(", ")})")
    }

  private[tx] def oneRowScan(
      schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new Scan with LocalScan {
      override val rows: Array[InternalRow] = Array(row)
      override def readSchema(): StructType = schema
    }).iterator()

  /** Identifier hygiene: a procedure's table argument resolves under
    * the catalog root exactly like an identifier — dot-qualified for a
    * namespaced table (`'raw.ev'` → `<root>/raw/ev`; namespaces nest
    * to any depth, like the catalog's), each part checked so it can
    * never escape the root. The table must EXIST (some committed
    * version) — maintaining a typo must be a named error, not a silent
    * no-op success row.
    */
  private[tx] def tablePath(root: String, tbl: String): String = {
    val parts = tbl.split("\\.", -1).toSeq
    require(parts.nonEmpty && parts.forall(p =>
      p.nonEmpty && !p.contains("/") && !p.contains("\\") &&
        !p.startsWith(".")),
      s"TxCatalog: illegal table argument '$tbl' — a table name or " +
        "'namespace.table' (namespaces may nest: 'a.b.table')")
    val path = (root +: parts).mkString("/")
    require(graft.sources.Tx.versions(path).nonEmpty,
      s"TxCatalog: no such table '$tbl' under the catalog root — " +
        "nothing to maintain")
    path
  }
}

class VacuumProcedure(root: String) extends UnboundProcedure {
  override def name(): String = "vacuum"
  override def description(): String =
    "Retention: keep the newest <keep> versions of <tbl>, delete older " +
      "manifests and every data directory only they referenced " +
      "(age-gated orphan sweep included). Readers pinned to dropped " +
      "versions break — the standard retention contract."

  override def bind(inputType: StructType): BoundProcedure =
    new BoundProcedure {
      override def name(): String = "vacuum"
      override def description(): String = VacuumProcedure.this.description()
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tbl", StringType)
          .comment("table name under the catalog root").build(),
        ProcedureParameter.in("keep", IntegerType)
          .comment("how many newest versions survive").build())
      override def isDeterministic: Boolean = false // deletes state

      private val schema = StructType(Seq(
        StructField("tbl", StringType, nullable = false),
        StructField("kept_versions", IntegerType, nullable = false),
        StructField("dropped_versions", IntegerType, nullable = false)))

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        val keep = input.getInt(1)
        val path = TxProcedures.tablePath(root, tbl)
        val before = graft.sources.Tx.versions(path).size
        graft.sources.Tx.vacuum(path, keep)
        val after = graft.sources.Tx.versions(path).size
        TxProcedures.oneRowScan(schema, new GenericInternalRow(Array[Any](
          UTF8String.fromString(tbl), after, before - after)))
      }
    }
}

class RestoreProcedure(root: String) extends UnboundProcedure {
  override def name(): String = "restore"
  override def description(): String =
    "Recovery: re-publish version <version>'s table state as a NEW " +
      "commit by reference — one manifest CAS, O(manifest), zero data " +
      "motion. The bad commit stays live for audit (time travel still " +
      "reads it); monotone guard meta (sink epochs, MV cursors) is " +
      "never rewound. A vacuumed version is a named error."

  override def bind(inputType: StructType): BoundProcedure =
    new BoundProcedure {
      override def name(): String = "restore"
      override def description(): String = RestoreProcedure.this.description()
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tbl", StringType)
          .comment("table name under the catalog root").build(),
        ProcedureParameter.in("version", LongType)
          .comment("the live version to restore the table to").build())
      override def isDeterministic: Boolean = false // commits a version

      private val schema = StructType(Seq(
        StructField("tbl", StringType, nullable = false),
        StructField("version", LongType, nullable = false),
        StructField("restored_from", LongType, nullable = false)))

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        val from = input.getLong(1)
        val path = TxProcedures.tablePath(root, tbl)
        val v = graft.sources.Tx.restore(path, from)
        TxProcedures.oneRowScan(schema, new GenericInternalRow(Array[Any](
          UTF8String.fromString(tbl), v, from)))
      }
    }
}

class RebucketProcedure(root: String) extends UnboundProcedure {
  override def name(): String = "rebucket"
  override def description(): String =
    "Re-layout: rehash every row of <tbl> into <nbuckets> buckets in " +
      "one manifest CAS (O(table) — every row migrates). Earlier " +
      "versions keep their old layout until vacuum."

  override def bind(inputType: StructType): BoundProcedure =
    new BoundProcedure {
      override def name(): String = "rebucket"
      override def description(): String =
        RebucketProcedure.this.description()
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("tbl", StringType)
          .comment("table name under the catalog root").build(),
        ProcedureParameter.in("nbuckets", IntegerType)
          .comment("the new bucket count").build())
      override def isDeterministic: Boolean = false // commits a version

      private val schema = StructType(Seq(
        StructField("tbl", StringType, nullable = false),
        StructField("version", LongType, nullable = false),
        StructField("nbuckets", IntegerType, nullable = false)))

      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val tbl = input.getUTF8String(0).toString
        val nb = input.getInt(1)
        val path = TxProcedures.tablePath(root, tbl)
        val v = graft.sources.Tx.rebucket(
          org.apache.spark.sql.SparkSession.active, path, nb)
        TxProcedures.oneRowScan(schema, new GenericInternalRow(Array[Any](
          UTF8String.fromString(tbl), v, nb)))
      }
    }
}
