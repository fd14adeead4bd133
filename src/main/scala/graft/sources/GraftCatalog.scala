package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The catalog rung of the connector ladder ([[EventsDataSource]] is
  * the TableProvider rung): a read-only DataSourceV2 `TableCatalog`
  * that exposes the synthetic event stream as a catalog-qualified
  * table — `spark.sql("SELECT ... FROM graft.events")` — with zero
  * `format()`/`option()` plumbing on the query side. Register with
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.n", "100000")   // + seed/days/...
  * }}}
  *
  * Table parameters come from the catalog's own conf namespace
  * (`spark.sql.catalog.<name>.*`, handed to `initialize`), the way
  * production catalogs carry warehouse/credentials. Every pushdown
  * the TableProvider path has (day-partition pruning, column pruning,
  * COUNT/MIN/MAX closed forms, limit/top-N, runtime filtering,
  * statistics, metadata columns, columnar read) arrives here for free
  * because `loadTable` returns the same [[EventsTable]].
  *
  * Mutations are rejected loudly: the synthetic stream is immutable
  * by construction, so CREATE/ALTER/DROP/RENAME throw
  * UnsupportedOperationException rather than pretending.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var options: CaseInsensitiveStringMap = _

  override def initialize(name: String, opts: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    options = opts
  }
  override def name(): String = catalogName

  // the single flat namespace: tables live at the catalog root, so
  // `graft.events` resolves with namespace = [] (Spark's default for
  // 2-part identifiers against a custom catalog)
  private def rootNs(ns: Array[String]): Boolean = ns.isEmpty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!rootNs(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    Array(Identifier.of(namespace, "events"))
  }

  override def tableExists(ident: Identifier): Boolean =
    rootNs(ident.namespace()) && ident.name().equalsIgnoreCase("events")

  override def loadTable(ident: Identifier): Table =
    if (tableExists(ident)) new EventsTable(EventsConf(options))
    else throw new NoSuchTableException(ident)

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: CREATE TABLE is not supported")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: ALTER TABLE is not supported")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: DROP TABLE is not supported")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: RENAME TABLE is not supported")

  override def listNamespaces(): Array[Array[String]] = Array.empty
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (rootNs(namespace)) Array.empty
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
  override def namespaceExists(namespace: Array[String]): Boolean =
    rootNs(namespace)
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (rootNs(namespace)) java.util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: CREATE NAMESPACE is not supported")
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: ALTER NAMESPACE is not supported")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"$catalogName is a read-only synthetic catalog: DROP NAMESPACE is not supported")
}
