package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** A Spark `TableCatalog` over graftsink tables — the pure-SQL surface
  * of the sink: register once
  * (`spark.sql.catalog.graft = graft.sources.GraftCatalog`,
  * `spark.sql.catalog.graft.root = <dir>`) and the whole DDL/DML
  * lifecycle runs through Spark SQL against manifest-committed tables:
  *
  *  - `CREATE TABLE graft.ns.t (…)` publishes an empty manifest v0
  *    (the table exists transactionally from version zero);
  *  - `INSERT INTO` / `INSERT OVERWRITE` ride the batch write protocol
  *    (append / truncate manifests);
  *  - `SELECT … VERSION AS OF k` resolves time travel through the
  *    catalog's versioned `loadTable`;
  *  - `DELETE FROM … WHERE` is the table's copy-on-write delete (a
  *    fresh overwrite version — atomic, time-travelable);
  *  - `ALTER TABLE … ADD COLUMN` publishes a schema-evolution version
  *    (same files, evolved DDL — the reader's by-name reconciliation
  *    makes old files surface null);
  *  - namespaces are directories; tables are directories holding
  *    manifests.
  *
  * Layout: `<root>/<ns…>/<table>/manifest-v*` — exactly the layout
  * `format("graftsink")` path reads use, so the catalog and the
  * path-based API interoperate on the same tables.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(sys.error(
      s"GraftCatalog '$name' needs spark.sql.catalog.$name.root = <dir>"))
  }
  override def name(): String = catalogName

  private def spark = SparkSession.active
  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def dirFor(ident: Identifier): String =
    (root +: (ident.namespace() :+ ident.name())).mkString("/")
  private def isTableDir(p: Path): Boolean =
    fs.exists(p) && fs.listStatus(p).exists(
      _.getPath.getName.startsWith("manifest-v"))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val ns = new Path((root +: namespace).mkString("/"))
    if (!fs.exists(ns)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(ns).filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    GraftSink.latestManifest(spark, dir) match {
      case Some(m) =>
        new GraftSinkTable(StructType.fromDDL(m.schemaDdl), dir)
      case None => throw new NoSuchTableException(ident)
    }
  }

  /** `VERSION AS OF v` — the pinned manifest supplies both schema and
    * file set, so time travel across schema changes reads old data
    * under its own shape.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = dirFor(ident)
    val v = version.toInt
    val m = try GraftSink.manifestAt(spark, dir, Some(v))
    catch { case _: Throwable => None }
    m match {
      case Some(mf) => new GraftSinkTable(
        StructType.fromDDL(mf.schemaDdl), dir, pinnedVersion = Some(v))
      case None => throw new NoSuchTableException(ident)
    }
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = {
    require(partitions.isEmpty,
      "graftsink tables do not take PARTITIONED BY (file skipping " +
        "rides per-file column bounds instead)")
    val dir = dirFor(ident)
    if (isTableDir(new Path(dir)))
      throw new TableAlreadyExistsException(ident)
    GraftSink.checkSupported(schema)
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // the empty v0 manifest IS table existence — transactional from birth
    GraftSink.publish(spark, conf, dir, schema.toDDL, Seq.empty,
      truncate = true)
    new GraftSinkTable(schema, dir)
  }

  /** `ALTER TABLE … ADD COLUMN`: a schema-evolution publish — the new
    * version carries the SAME files under the evolved DDL; the
    * by-name reader surfaces null for the added column in every
    * pre-evolution file. Only top-level ADD COLUMN is supported;
    * renames/drops/retypes would silently corrupt the positional line
    * format and are refused.
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = dirFor(ident)
    val m = GraftSink.latestManifest(spark, dir)
      .getOrElse(throw new NoSuchTableException(ident))
    val prev = StructType.fromDDL(m.schemaDdl)
    val added = changes.map {
      case a: TableChange.AddColumn if a.fieldNames().length == 1 =>
        org.apache.spark.sql.types.StructField(a.fieldNames().head,
          a.dataType(), nullable = true)
      case other => sys.error(
        s"graftsink: unsupported ALTER TABLE change $other " +
          "(only top-level ADD COLUMN)")
    }
    added.foreach(f => require(!prev.fieldNames.contains(f.name),
      s"column ${f.name} already exists"))
    val evolved = StructType(prev.fields ++ added)
    GraftSink.checkSupported(evolved)
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    GraftSink.publishSchemaChange(spark, conf, dir, evolved.toDDL)
    new GraftSinkTable(evolved, dir)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(dirFor(ident))
    isTableDir(p) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val src = new Path(dirFor(oldIdent))
    if (!isTableDir(src)) throw new NoSuchTableException(oldIdent)
    val dst = new Path(dirFor(newIdent))
    if (fs.exists(dst)) throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(dst.getParent)
    if (!fs.rename(src, dst))
      sys.error(s"graftsink: rename $src -> $dst failed")
  }

  // ---- namespaces (directories) ----

  override def listNamespaces(): Array[Array[String]] = {
    val r = new Path(root)
    if (!fs.exists(r)) Array.empty
    else fs.listStatus(r)
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      val ns = new Path((root +: namespace).mkString("/"))
      if (!fs.exists(ns)) throw new NoSuchNamespaceException(namespace)
      fs.listStatus(ns)
        .filter(s => s.isDirectory && !isTableDir(s.getPath))
        .map(s => namespace :+ s.getPath.getName)
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    fs.exists(new Path((root +: namespace).mkString("/")))

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(new Path((root +: namespace).mkString("/")))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    sys.error("graftsink namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = new Path((root +: namespace).mkString("/"))
    if (!fs.exists(p)) false
    else {
      if (!cascade && fs.listStatus(p).nonEmpty)
        sys.error(s"namespace ${namespace.mkString(".")} is not empty")
      fs.delete(p, true)
    }
  }
}
