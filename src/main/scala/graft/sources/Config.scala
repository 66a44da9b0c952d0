package graft.sources

import java.io.{FileInputStream, InputStream}
import java.util.Properties

import scala.jdk.CollectionConverters._

/** S2: the config-file-driven connection seam (reference
  * ct_data.py:32-40 reads `aact.properties` and turns `k=v` pairs into
  * a connection string). The engine's equivalent hands the same pairs
  * to `spark.read.options(...)` / writer options. JDK Properties only —
  * no extra dependency.
  */
object Config {

  def fromProperties(in: InputStream): Map[String, String] = {
    val p = new Properties()
    try p.load(in) finally in.close()
    p.asScala.toMap
  }

  def fromFile(path: String): Map[String, String] =
    fromProperties(new FileInputStream(path))

  /** The reference's conn-string render (`' '.join(k=v)`) — kept for
    * parity with ct_data.py:37-40; Spark paths use the Map directly. */
  def render(conf: Map[String, String]): String =
    conf.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(" ")

  /** Parse the reference's ACTUAL file format: `aact.properties` is an
    * INI file read with ConfigParser (ct_data.py:32-36 — section
    * `[aact.database]`, `key=value` or `key: value` entries), which
    * plain JDK Properties cannot see sections of. `#`/`;` comment
    * lines are skipped; keys case-normalize to lower (ConfigParser
    * semantics); entries before any header land in section "" so a
    * flat properties file still parses. */
  def loadIni(path: String): IniConfig =
    parseIni(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala.toSeq)

  def parseIni(lines: Seq[String]): IniConfig = {
    var current = ""
    val out = scala.collection.mutable.Map.empty[String,
      scala.collection.mutable.Map[String, String]]
    lines.map(_.trim).foreach {
      case l if l.isEmpty || l.startsWith("#") || l.startsWith(";") => ()
      case l if l.startsWith("[") && l.endsWith("]") =>
        current = l.substring(1, l.length - 1).trim
      case l =>
        val i = {
          val eq = l.indexOf('='); val co = l.indexOf(':')
          if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
        }
        require(i > 0, s"config: unparseable line '$l'")
        out.getOrElseUpdate(current,
            scala.collection.mutable.Map.empty[String, String])
          .update(l.take(i).trim.toLowerCase, l.drop(i + 1).trim)
    }
    IniConfig(out.view.mapValues(_.toMap).toMap)
  }

  /** Mains' dir-argument seam: `@/path/to/file.properties` resolves to
    * the config's `[graft] data.dir`; anything else is the snapshot
    * dir itself. Lets every harness run config-file-driven (S2 parity)
    * without changing its argument shape. */
  def resolveDir(arg: String): String =
    if (arg.startsWith("@")) {
      val cfg = loadIni(arg.drop(1))
      cfg.dataDir.getOrElse(sys.error(
        s"config ${arg.drop(1)}: no data.dir under [graft]"))
    } else arg
}

/** A parsed INI config — the sectioned twin of the flat [[Config]]
  * map. `[aact.database]` supplies either a literal `url` (any JDBC
  * target — the embedded-Derby specs use this) or psycopg2-style parts
  * (`host`/`port`/`dbname`) from which the Postgres JDBC URL is built;
  * `user`/`password` (and any other key) pass through as connection
  * properties, mirroring the reference's forward-every-section-key
  * behavior. A `[graft]` section may carry `data.dir` for the harness
  * mains ([[Config.resolveDir]]). */
final case class IniConfig(sections: Map[String, Map[String, String]]) {

  def section(name: String): Map[String, String] =
    sections.getOrElse(name, Map.empty)

  private def db: Map[String, String] = section("aact.database")

  /** The connection URL: a literal `url` key wins; otherwise the
    * reference's psycopg2 parts build the Postgres form. */
  def jdbcUrl: String = db.getOrElse("url", {
    val host = db.getOrElse("host",
      sys.error("config: [aact.database] needs url= or host="))
    val port = db.getOrElse("port", "5432")
    val name = db.getOrElse("dbname",
      sys.error("config: [aact.database] needs dbname= with host="))
    s"jdbc:postgresql://$host:$port/$name"
  })

  /** Every remaining `[aact.database]` key as a JDBC connection
    * property — unknown keys flow through rather than being dropped. */
  def connectionProperties: Properties = {
    val p = new Properties()
    (db - "url" - "host" - "port" - "dbname").foreach {
      case (k, v) => p.setProperty(k, v)
    }
    p
  }

  def dataDir: Option[String] = section("graft").get("data.dir")
}
