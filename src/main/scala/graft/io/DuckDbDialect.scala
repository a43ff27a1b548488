package graft.io

import java.sql.SQLException

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects}
import org.apache.spark.sql.types.{DataType, LongType, MetadataBuilder}

/** Minimal JDBC dialect for DuckDB — what makes `df.write.jdbc` /
  * `spark.read.jdbc` work against `jdbc:duckdb:` URLs.
  *
  * Why it must exist: Spark 4's `JdbcUtils.tableExists` probes with
  * `SELECT 1 FROM t WHERE 1=0` and RETHROWS the resulting SQLException
  * unless `dialect.isObjectNotFoundException` classifies it as
  * table-not-found. DuckDB's JDBC driver raises a plain SQLException with
  * no SQLState/vendor code ("Catalog Error: Table with name t does not
  * exist!"), which the default dialect does not recognize — so an append
  * into a fresh database dies in the existence probe instead of creating
  * the table. Classifying by the catalog-error message fixes create-on-
  * first-append; everything else (quoting, type mapping) works through the
  * defaults: Spark emits TEXT/BIGINT/DOUBLE/TIMESTAMP, all native DuckDB.
  *
  * This is the same `JdbcDialects.registerDialect` extension point the
  * built-in MySQL/Postgres dialects use — registration is per-JVM and
  * idempotent (re-registering replaces this instance). */
object DuckDbDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  override def isObjectNotFoundException(e: SQLException): Boolean =
    Option(e.getMessage).exists(m =>
      m.contains("Catalog Error") && m.contains("does not exist"))

  /** duckdb-jdbc's ResultSetMetaData reports BIGINT columns as unsigned,
    * which Spark's default mapping widens to DECIMAL(20,0) on read — a
    * written LongType would round-trip as decimal. Pin signed 64-bit back
    * to LongType; every other type goes through the defaults. */
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                               md: MetadataBuilder): Option[DataType] =
    if (sqlType == java.sql.Types.BIGINT && typeName == "BIGINT") Some(LongType)
    else None

  /** Register (idempotently) with Spark's dialect registry. */
  def register(): Unit = {
    JdbcDialects.unregisterDialect(this)
    JdbcDialects.registerDialect(this)
  }
}
