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

  test("stripe predicates render as Postgres-executable WHERE clauses") {
    // the S1 composition argument's last seam: JdbcIngressSpec pins the
    // striped-cursor MECHANICS against Derby; this pins the per-stripe
    // predicate SQL the SAME readTablePartitioned options render under
    // the Postgres url — Spark's own columnPartition, no live server
    val schema = StructType(Seq(StructField("id", LongType)))
    def stripes(lower: Long, upper: Long, n: Int): Seq[String] =
      org.apache.spark.sql.GraftColumnBridge.jdbcStripePredicates(
        schema, "UTC", Map(
          "url" -> url, "dbtable" -> "studies",
          // JDBCOptions eagerly resolves SOME driver class for the url
          // and the sandbox has no Postgres jar; the driver never
          // connects here (clause RENDERING is driver-free) and the
          // dialect is resolved from the URL, so any present driver
          // class satisfies the constructor without touching the result
          "driver" -> "org.apache.derby.jdbc.EmbeddedDriver",
          "partitionColumn" -> "id",
          "lowerBound" -> lower.toString,
          "upperBound" -> upper.toString,
          "numPartitions" -> n.toString))
    val s4 = stripes(0L, 100L, 4)
    assert(s4.size == 4, s"expected 4 stripes, got $s4")
    // the boundary contract that makes stripes a PARTITION of the
    // table: first takes everything below its bound PLUS NULLs (no row
    // silently dropped), interior stripes are half-open, last is
    // unbounded above (rows past upperBound still land somewhere)
    assert(s4.head.contains("< 25") && s4.head.contains("is null"),
      s"first stripe must absorb NULLs and the low tail: ${s4.head}")
    assert(s4(1).contains(">= 25") && s4(1).contains("< 50"), s4(1))
    assert(s4(2).contains(">= 50") && s4(2).contains("< 75"), s4(2))
    assert(s4.last.trim.endsWith(">= 75"),
      s"last stripe must be unbounded above: ${s4.last}")
    // rendered column references must be the dialect's quoted form —
    // Postgres folds unquoted identifiers to lowercase, so a mixed-case
    // key column only works because of this
    s4.foreach(w => assert(w.contains("\"id\""),
      s"stripe predicate must quote the column Postgres-style: $w"))
    // every clause is plain ANSI comparison SQL — executable by the
    // warehouse verbatim (the reference's WHERE-in-Postgres contract)
    s4.foreach(w => assert(!w.contains("`"),
      s"backtick quoting would break Postgres: $w"))
  }

  test("a literal url= key still routes by its own scheme") {
    val derby = IniConfig(Map("aact.database" -> Map(
      "url" -> "jdbc:derby:memory:x;create=true"))).jdbcUrl
    assert(!JdbcDialects.get(derby).getClass.getName.contains("Postgres"))
  }
}
