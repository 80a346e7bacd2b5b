package graft.sources.tx

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sources.Tx

/** SQL catalog over a directory of [[graft.sources.Tx]] tables — the
  * piece that removes the last `load(path)` boilerplate:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.tx", classOf[TxCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.tx.root", "/data/tx")
  *
  *   spark.sql("SELECT * FROM tx.events WHERE day BETWEEN 10 AND 14")
  *   spark.sql("SELECT * FROM tx.events VERSION AS OF 3")   // time travel
  *   spark.sql("INSERT INTO tx.events SELECT ...")          // MERGE commit
  *   spark.sql("""CREATE TABLE tx.mv (day BIGINT, n BIGINT)
  *                TBLPROPERTIES ('keys'='day', 'nbuckets'='32')""")
  *   df.writeTo("tx.events").append()
  * }}}
  *
  * Identifiers map to subdirectories of `root` (namespaces nest to any
  * depth since r13 — each level a subdirectory; a directory holding a
  * `_v` manifest dir is a table); every read plans the SAME pruned DSv2
  * scan as `spark.read.format("graft-tx")` — zone-map pushdown, DPP,
  * statistics, vectorized decode — because `loadTable` returns the same
  * [[TxTableV2]]. CREATE TABLE maps to [[Tx.createTable]] (schema +
  * properties pinned in an empty v1 manifest: `keys` required,
  * `nbuckets` / `bucketkeys` / `statscols` optional); ALTER TABLE ADD
  * COLUMN maps to the format's additive [[Tx.addColumn]] evolution;
  * DROP/RENAME are directory operations (a rename is NOT atomic against
  * concurrent writers — maintenance-window semantics, like vacuum).
  */
class TxCatalog extends TableCatalog with ProcedureCatalog
    with SupportsNamespaces with FunctionCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = options.get("root")
    require(root != null && root.nonEmpty,
      s"TxCatalog: spark.sql.catalog.$name.root = <directory> is required")
  }

  override def name(): String = catalogName

  // lets `ALTER TABLE ... ADD COLUMN x T DEFAULT <lit>` route through
  // (the analyzer refuses DEFAULT clauses for catalogs without it); the
  // literal lands as the column's INITIAL default (Tx.DefaultMetaKey)
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  override def defaultNamespace(): Array[String] = Array.empty

  private def checkPart(p: String): String = {
    require(p.nonEmpty && !p.contains("/") && !p.contains("\\") &&
      p != "." && p != ".." && !p.startsWith("."),
      s"TxCatalog: illegal identifier part '$p'")
    p
  }

  private def pathOf(ident: Identifier): String =
    ((root +: ident.namespace().toSeq) :+ ident.name())
      .map {
        case p if p == root => p
        case p => checkPart(p)
      }.mkString("/")

  private def nsDir(namespace: Array[String]): java.io.File =
    new java.io.File((root +: namespace.toSeq.map(checkPart)).mkString("/"))

  private def isTableDir(f: java.io.File): Boolean =
    new java.io.File(f, "_v").isDirectory

  /** FunctionCatalog: the one function the format defines is its bucket
    * transform ([[TxBucketFunction]]) in the TOP-LEVEL namespace — where
    * Spark's `V2ExpressionUtils` looks when it resolves the
    * `bucket(n, keys...)` transform a [[TxScan]] reports as its
    * KeyGroupedPartitioning. That resolution is what lets two same-layout
    * Tx tables join storage-partitioned (zero Exchange); without this
    * surface the report is silently ignored and the join plans shuffles.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else if (namespaceExists(namespace)) Array.empty
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket")
      TxBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  /** `tx.<table>.history` / `tx.<table>.files` — when the identifier's
    * LAST namespace part resolves to a Tx table and the name is a
    * metadata suffix, serve that table's metadata relation (Iceberg's
    * `db.table.history` convention). Metadata names take precedence
    * over a REAL table of the same name nested under a namespace
    * directory that is also a table — an intentionally pathological
    * layout; documented, not supported.
    */
  private def metaTableOf(ident: Identifier): Option[Table] =
    if (ident.namespace().nonEmpty &&
        TxMetaTables.Names.contains(ident.name().toLowerCase)) {
      val base = Identifier.of(
        ident.namespace().dropRight(1), ident.namespace().last)
      if (Tx.versions(pathOf(base)).nonEmpty)
        Some(TxMetaTables.forName(ident.name().toLowerCase, pathOf(base)))
      else None
    } else None

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    namespace.foreach(checkPart) // '..' must not escape the root
    val dir = new java.io.File((root +: namespace.toSeq).mkString("/"))
    val fs = dir.listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isDirectory &&
        new java.io.File(f, "_v").isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    Tx.versions(pathOf(ident)).nonEmpty

  override def loadTable(ident: Identifier): Table =
    metaTableOf(ident).getOrElse {
      val p = pathOf(ident)
      if (Tx.versions(p).isEmpty)
        throw new NoSuchTableException(
          (catalogName +: ident.namespace().toSeq :+ ident.name()))
      new TxTableV2(p, -1L, TxSource.schemaAt(p, -1L))
    }

  /** `SELECT ... FROM tx.t VERSION AS OF v` — the option("version")
    * time travel, reachable from pure SQL.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    val v = version.toLongOption.getOrElse(throw new IllegalArgumentException(
      s"TxCatalog: VERSION AS OF takes a numeric Tx version, got '$version'"))
    new TxTableV2(p, v, TxSource.schemaAt(p, v))
  }

  /** `SELECT ... FROM tx.t TIMESTAMP AS OF '...'` — Spark hands the
    * parsed literal as epoch MICROS; [[Tx.versionAt]] resolves the
    * newest version committed at or before it (commit stamps are
    * strictly monotonic, so the answer is well-defined), with named
    * errors for probes before the first commit and for pre-stamping
    * legacy tables.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val p = pathOf(ident)
    if (Tx.versions(p).isEmpty)
      throw new NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    val v = Tx.versionAt(p, Math.floorDiv(timestampMicros, 1000L))
    new TxTableV2(p, v, TxSource.schemaAt(p, v))
  }

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "TxCatalog: Tx tables bucket on their merge keys — declare them " +
        "via TBLPROPERTIES ('keys'='a,b'[, 'bucketkeys'='a']...), not " +
        "PARTITIONED BY")
    val p = pathOf(ident)
    if (Tx.versions(p).nonEmpty)
      throw new TableAlreadyExistsException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()))
    val props = properties.asScala
    val keys = props.get("keys").map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        "TxCatalog: CREATE TABLE needs TBLPROPERTIES ('keys'='a[,b]') — " +
          "the merge keys define what a matched row means"))
    Tx.createTable(p, schema, keys,
      nBuckets = props.get("nbuckets").map(_.toInt).getOrElse(16),
      bucketKeys = props.get("bucketkeys")
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      statsCols = props.get("statscols")
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      fileSortCols = props.get("filesortcols")
        .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      maxRowsPerFile = props.get("maxrowsperfile").map(_.toLong)
        .getOrElse(0L))
    loadTable(ident)
  }

  /** Only the format's own evolution is expressible: ADD COLUMN (at the
    * end, nullable) and `SET TBLPROPERTIES` enabling layout properties
    * LATE on a table that lacks them (statscols / filesortcols /
    * maxrowsperfile → [[Tx.setLayoutProperties]], a metadata-only
    * commit; recorded values never change — a re-layout is the
    * rebucket procedure's job). Everything else needs column ids the
    * files don't carry — same honest scope as [[Tx.addColumn]].
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames().length == 1,
          "TxCatalog: ADD COLUMN supports top-level columns only")
        // DEFAULT <literal> becomes the INITIAL default: pre-evolution
        // rows read back as it (Tx.addColumn validates the type); an
        // expression default has no literal and is refused
        val dv = Option(add.defaultValue()).map { d =>
          val l = d.getValue
          if (l == null) throw new UnsupportedOperationException(
            "TxCatalog: ADD COLUMN DEFAULT supports literal defaults " +
              "only (expression defaults have no storable value)")
          if (l.dataType() == add.dataType()) l.value()
          else org.apache.spark.sql.catalyst.expressions.Cast(
            org.apache.spark.sql.catalyst.expressions.Literal(
              l.value(), l.dataType()),
            add.dataType(), Some("UTC")).eval(null)
        }
        Tx.addColumn(p, add.fieldNames()(0), add.dataType(), dv)
      case rn: TableChange.RenameColumn =>
        require(rn.fieldNames().length == 1,
          "TxCatalog: RENAME COLUMN supports top-level columns only")
        Tx.renameColumn(p, rn.fieldNames()(0), rn.newName())
      case del: TableChange.DeleteColumn =>
        require(del.fieldNames().length == 1,
          "TxCatalog: DROP COLUMN supports top-level columns only")
        Tx.dropColumn(p, del.fieldNames()(0))
      case ut: TableChange.UpdateColumnType =>
        require(ut.fieldNames().length == 1,
          "TxCatalog: ALTER COLUMN TYPE supports top-level columns only")
        // in-place for the lossless widenings; everything else gets
        // widenColumn's named drop+re-add guidance
        Tx.widenColumn(p, ut.fieldNames()(0), ut.newDataType())
      case set: TableChange.SetProperty =>
        def cols(v: String) = v.split(",").toSeq.filter(_.nonEmpty)
        set.property().toLowerCase match {
          case "statscols" =>
            Tx.setLayoutProperties(p, statsCols = cols(set.value()))
          case "filesortcols" =>
            Tx.setLayoutProperties(p, fileSortCols = cols(set.value()))
          case "maxrowsperfile" =>
            val n = set.value().toLongOption.getOrElse(
              throw new IllegalArgumentException(
                s"TxCatalog: maxrowsperfile takes a positive row count, " +
                  s"got '${set.value()}'"))
            Tx.setLayoutProperties(p, maxRowsPerFile = n)
          case c if c.startsWith("constraint.") =>
            // match the prefix case-insensitively but take the NAME from
            // the original property string: constraint names are
            // case-preserving in the direct API, so lowercasing here
            // would record a name UNSET TBLPROPERTIES / dropConstraint
            // could never address by its given spelling
            Tx.addConstraint(org.apache.spark.sql.SparkSession.active, p,
              set.property().substring("constraint.".length), set.value())
          case c if c.startsWith("nonnull.") =>
            // only 'true' is a meaningful value: silently treating
            // 'false' as "add the gate" would invert the user's intent
            require(set.value() == "true",
              s"TxCatalog: 'nonnull.<col>' takes 'true' (UNSET the " +
                s"property to drop the gate), got '${set.value()}'")
            Tx.addNotNull(org.apache.spark.sql.SparkSession.active, p,
              set.property().substring("nonnull.".length))
          case "nbuckets" => throw new UnsupportedOperationException(
            "TxCatalog: nbuckets is changed by re-layout, not ALTER — " +
              "CALL <catalog>.system.rebucket(tbl => ..., nbuckets => ...)")
          case other => throw new UnsupportedOperationException(
            s"TxCatalog: unsupported table property '$other' — only the " +
              "late-enableable layout properties (statscols, " +
              "filesortcols, maxrowsperfile) and write-time gates " +
              "('constraint.<name>', 'nonnull.<col>') can be set after " +
              "creation")
        }
      case unset: TableChange.RemoveProperty
          if unset.property().toLowerCase.startsWith("constraint.") =>
        // case-insensitive prefix match, case-preserving name (above)
        Tx.dropConstraint(p,
          unset.property().substring("constraint.".length))
      case unset: TableChange.RemoveProperty
          if unset.property().toLowerCase.startsWith("nonnull.") =>
        Tx.dropNotNull(p, unset.property().substring("nonnull.".length))
      case other => throw new UnsupportedOperationException(
        s"TxCatalog: unsupported ALTER ($other) — the format's " +
          "evolution is ADD (with DEFAULT) / RENAME / DROP COLUMN, " +
          "ALTER COLUMN TYPE for the lossless widenings, " +
          "layout-property enablement, and the write-time gates " +
          "('constraint.<name>', 'nonnull.<col>')")
    }
    loadTable(ident)
  }

  /** NAMESPACES = directory chains under the root (any depth since
    * r13 — `<cat>.<org>.<area>.<table>` maps to nested subdirectories;
    * a directory with a `_v` manifest dir is a TABLE, everything else
    * is a namespace). Namespaces carry no metadata of their own.
    */
  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val fs = nsDir(namespace).listFiles()
    if (fs == null) Array.empty
    else fs.filter(f => f.isDirectory && !isTableDir(f))
      .map(f => namespace :+ f.getName).sortBy(_.mkString("."))
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val d = nsDir(namespace)
      d.isDirectory && !isTableDir(d)
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchNamespaceException(catalogName +: namespace.toSeq)
    new util.HashMap[String, String]()
  }

  override def createNamespace(
      namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.nonEmpty, "TxCatalog: empty namespace")
    // Spark stamps defaults (owner, ...) on every CREATE NAMESPACE —
    // accepted and discarded: a namespace is a directory, nothing more.
    // Parent levels are created along the way (directory semantics);
    // no prefix may resolve to a TABLE (a table is not a namespace).
    namespace.toSeq.inits.toSeq.reverse.drop(1).foreach { prefix =>
      val d = nsDir(prefix.toArray)
      require(!isTableDir(d),
        s"TxCatalog: '${prefix.mkString(".")}' is a TABLE — a table " +
          "cannot contain namespaces")
    }
    val d = nsDir(namespace).toPath
    if (java.nio.file.Files.exists(d))
      throw new org.apache.spark.sql.catalyst.analysis
        .NamespaceAlreadyExistsException(
          (catalogName +: namespace.toSeq).toArray)
    java.nio.file.Files.createDirectories(d)
    ()
  }

  override def alterNamespace(
      namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*)
      : Unit = throw new UnsupportedOperationException(
    "TxCatalog: namespaces carry no metadata to alter")

  /** Non-cascade refuses a namespace with tables or child namespaces
    * in it; cascade drops them recursively (each table a real Tx-table
    * delete — the [[dropTable]] care). Non-catalog debris ANYWHERE in
    * the subtree refuses BEFORE anything is deleted: discovering it
    * mid-cascade would leave a half-destroyed namespace behind a
    * failed statement.
    */
  override def dropNamespace(
      namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    val d = nsDir(namespace)
    def debrisIn(dir: java.io.File): Seq[java.io.File] = {
      val cs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      cs.flatMap { f =>
        if (f.isDirectory && isTableDir(f)) Nil // a table: droppable
        else if (f.isDirectory) debrisIn(f) // a child namespace: recurse
        else Seq(f) // a loose file: not ours
      }
    }
    val debris = debrisIn(d)
    require(debris.isEmpty,
      s"TxCatalog: namespace ${namespace.mkString(".")} holds non-table " +
        s"content (${debris.take(3).map(_.getName).mkString(", ")}) — " +
        "refusing to delete what the catalog didn't create")
    val children = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
    val tables = children.filter(f => f.isDirectory && isTableDir(f))
    val childNs = children.filter(f => f.isDirectory && !isTableDir(f))
    if (tables.nonEmpty || childNs.nonEmpty) {
      require(cascade,
        s"TxCatalog: namespace ${namespace.mkString(".")} holds " +
          s"${tables.length} table(s) and ${childNs.length} child " +
          "namespace(s) — DROP ... CASCADE to delete them")
      tables.foreach(t => dropTable(Identifier.of(namespace, t.getName)))
      childNs.foreach(n => dropNamespace(namespace :+ n.getName, cascade))
    }
    d.delete()
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    // only ever delete an actual Tx TABLE: a namespace directory (or
    // any non-table path) must not be recursively wiped just because
    // its name resolved — dropping 'ns' with tables inside would
    // otherwise destroy them all and report success
    if (Tx.versions(path).isEmpty) false
    else { Tx.deleteRecursive(java.nio.file.Paths.get(path)); true }
  }

  /** `CALL tx.system.vacuum(...)` / `CALL tx.system.rebucket(...)` — the
    * format's maintenance verbs as SQL statements ([[TxProcedures]]).
    */
  override def loadProcedure(
      ident: Identifier): org.apache.spark.sql.connector.catalog
      .procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(TxProcedures.Namespace),
      s"TxCatalog: procedures live under the 'system' namespace, got " +
        (ident.namespace() :+ ident.name()).mkString("."))
    TxProcedures.forName(ident.name(), root)
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(TxProcedures.Namespace))
      TxProcedures.Names
        .map(n => Identifier.of(TxProcedures.Namespace, n)).toArray
    else Array.empty

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = java.nio.file.Paths.get(pathOf(oldIdent))
    val to = java.nio.file.Paths.get(pathOf(newIdent))
    if (!java.nio.file.Files.exists(from))
      throw new NoSuchTableException(
        (catalogName +: oldIdent.namespace().toSeq :+ oldIdent.name()))
    if (java.nio.file.Files.exists(to))
      throw new TableAlreadyExistsException(
        (catalogName +: newIdent.namespace().toSeq :+ newIdent.name()))
    java.nio.file.Files.createDirectories(to.getParent)
    java.nio.file.Files.move(from, to)
    ()
  }
}
