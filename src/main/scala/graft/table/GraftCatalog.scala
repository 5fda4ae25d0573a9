package graft.table

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Filesystem-backed catalog: the reference's REST-catalog surface
  * (lib.rs:21-41 `RestCatalogConfig` + namespace/table wiring at
  * lib.rs:34-35) re-expressed over a warehouse directory tree, the same
  * role the REST service plays for MinIO-backed tables — resolve names
  * to table roots and answer existence/listing questions. Layout:
  * `warehouse/<namespace>/<table>/` where each table directory is a
  * [[GraftTable]] root (recognized by its `_log` directory, so a
  * half-created directory never lists as a table).
  *
  * Semantics ported:
  *  - idempotent init (lib.rs:44-78: exists → drop → create) =
  *    [[createTable]], which replaces any existing table of that name
  *  - namespace creation is idempotent mkdir (REST's create-namespace
  *    409-tolerant call)
  *  - drop is best-effort recursive delete, false when absent (REST's
  *    404-tolerant drop, lib.rs:52-57)
  *
  * At scale nothing here touches data files: every operation is
  * metadata-sized (directory listings bounded by table count), matching
  * Iceberg's catalog/commit split — the catalog knows WHERE tables are,
  * the per-table commit log knows WHAT they contain.
  */
final class GraftCatalog(spark: SparkSession, warehouse: Path) {

  private def nsDir(ns: String): Path = {
    require(ns.nonEmpty && !ns.contains('/'), s"bad namespace: $ns")
    warehouse.resolve(ns)
  }

  private def tableDir(ns: String, name: String): Path = {
    require(name.nonEmpty && !name.contains('/'), s"bad table name: $name")
    nsDir(ns).resolve(name)
  }

  /** idempotent: an existing namespace is fine (REST 409-tolerance). */
  def createNamespace(ns: String): Unit =
    Files.createDirectories(nsDir(ns))

  def namespaceExists(ns: String): Boolean = Files.isDirectory(nsDir(ns))

  def namespaces: Seq[String] =
    if (!Files.isDirectory(warehouse)) Nil
    else Files.list(warehouse).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted

  /** a directory is a TABLE only once its commit log exists — listings
    * never surface debris or half-created roots.
    */
  def tableExists(ns: String, name: String): Boolean =
    Files.isDirectory(tableDir(ns, name).resolve("_log"))

  def listTables(ns: String): Seq[String] =
    if (!namespaceExists(ns)) Nil
    else Files.list(nsDir(ns)).iterator().asScala
      .filter(d => Files.isDirectory(d.resolve("_log")))
      .map(_.getFileName.toString).toSeq.sorted

  /** the reference's init() shape: exists → drop → create (idempotent
    * whether or not the table is already there).
    */
  def createTable(ns: String, name: String): GraftTable = {
    createNamespace(ns)
    GraftTable.createOrReplace(spark, tableDir(ns, name).toString)
  }

  def openTable(ns: String, name: String): GraftTable = {
    require(tableExists(ns, name), s"no such table: $ns.$name")
    GraftTable.open(spark, tableDir(ns, name).toString)
  }

  /** 404-tolerant drop: false when the table was not there. */
  def dropTable(ns: String, name: String): Boolean = {
    val dir = tableDir(ns, name)
    if (!Files.exists(dir)) false
    else {
      val s = Files.walk(dir)
      try s.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally s.close()
      true
    }
  }
}

object GraftCatalog {
  def apply(spark: SparkSession, warehouse: String): GraftCatalog = {
    val p = Paths.get(warehouse)
    Files.createDirectories(p)
    new GraftCatalog(spark, p)
  }
}
