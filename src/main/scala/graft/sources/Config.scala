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
}
