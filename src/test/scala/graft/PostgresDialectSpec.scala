package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Config, IniConfig}

/** Postgres DIALECT coverage for the JDBC seam — the sandbox has no
  * live Postgres, so this pins the half of the contract that never
  * needs one: which dialect a reference-shaped connection resolves to
  * and how that dialect renders identifiers and maps types in both
  * directions. The live-cursor mechanics (row identity, pushdown,
  * striping) are pinned against embedded Derby in [[JdbcIngressSpec]];
  * dialect resolution is URL-driven in Spark, so these two halves
  * compose into the real-Postgres behavior (reference ct_data.py:69-70
  * + aact.properties).
  */
class PostgresDialectSpec extends AnyFunSuite {

  /** The reference's psycopg2 parts (host/port/dbname) as
    * [[IniConfig.jdbcUrl]] assembles them. */
  private val url = IniConfig(Map("aact.database" -> Map(
    "host" -> "warehouse.example.org", "port" -> "5433",
    "dbname" -> "aact"))).jdbcUrl

  private val dialect = JdbcDialects.get(url)

  test("a psycopg2-parts config resolves Spark's Postgres dialect") {
    assert(url == "jdbc:postgresql://warehouse.example.org:5433/aact")
    assert(dialect.getClass.getName.contains("Postgres"),
      s"expected the Postgres dialect for $url, got ${dialect.getClass}")
    assert(dialect.canHandle(url))
  }

  test("identifiers render double-quoted (mixed-case/keyword safe DDL)") {
    // WarehouseWriter DDL through this dialect must survive columns
    // named like keywords (the reference schema has `references`-
    // adjacent names); Postgres folds unquoted identifiers to lower
    assert(dialect.quoteIdentifier("nct_id") == "\"nct_id\"")
    assert(dialect.quoteIdentifier("Order") == "\"Order\"")
  }

  test("write-side type mapping: FloatType lands as FLOAT4 (the §7.4.5 real contract)") {
    // init-user-db.sh:45,87 declares completion ratios as Postgres
    // `real`; a saveJdbc through this dialect must keep them float4,
    // not widen to float8 — the rounding behavior the oracle checks
    // depends on it
    def ddl(t: DataType): String =
      dialect.getJDBCType(t).map(_.databaseTypeDefinition.toUpperCase)
        .getOrElse(fail(s"no Postgres JDBC type for $t"))
    assert(ddl(FloatType) == "FLOAT4")
    assert(ddl(DoubleType) == "FLOAT8")
    assert(ddl(StringType) == "TEXT")
    assert(ddl(BooleanType) == "BOOLEAN")
  }

  test("read-side type mapping: Postgres real comes back as FloatType") {
    // the inverse leg: an ingress of the reference's `real` columns
    // must type as FloatType so a snapshot→warehouse→snapshot round
    // trip is width-stable
    val got = dialect.getCatalystType(java.sql.Types.REAL, "float4", 0,
      new MetadataBuilder())
    // None means "use Spark's default JDBC mapping", which for
    // Types.REAL is FloatType — either way the resolved type is float4
    assert(got.forall(_ == FloatType))
    // Postgres reports bool as Types.BIT size 1; the dialect may defer
    // to Spark's default mapping (None), which resolves it to
    // BooleanType — assert it never overrides to something else
    val bool = dialect.getCatalystType(java.sql.Types.BIT, "bool", 1,
      new MetadataBuilder())
    assert(bool.forall(_ == BooleanType),
      s"Postgres bool must surface as BooleanType, got $bool")
  }

  test("a literal url= key still routes by its own scheme") {
    val derby = IniConfig(Map("aact.database" -> Map(
      "url" -> "jdbc:derby:memory:x;create=true"))).jdbcUrl
    assert(!JdbcDialects.get(derby).getClass.getName.contains("Postgres"))
  }
}
