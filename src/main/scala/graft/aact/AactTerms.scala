package graft.aact

import org.apache.spark.sql.Column

import graft.functions.ColumnOps.anyTerm

/** The reference's literal oncology term lists — three call sites, three
  * lists, preserved exactly (SURVEY §7.4.2: do NOT unify).
  *
  *  - [[dashboard8]]: the 8-term dashboard-extract variant with 'anoma'
  *    (reference docker/db2wh/scripts/db2wh-etl.sh:90-97)
  *  - [[condition15]]: the 15-term per-condition variant with 'lanoma'
  *    (reference docker/aact/docker-entrypoint-initdb.d/init-user-db.sh:63-77)
  *  - [[title15]]: the same 15 terms in the brief_title rollup's own
  *    order (init-user-db.sh:144-158) — identical set, distinct site
  *
  * The drift matters: 'anomaly' matches the dashboard list ('anoma') but
  * not the condition list; 'hematoma' matches the condition list ('toma')
  * but not the dashboard list. AactSemanticsSpec pins both directions.
  */
object AactTerms {

  val dashboard8: Seq[String] = Seq(
    "ancer", "cinoma", "eukem", "phoma", "umor", "umour", "eoplasm",
    "anoma")

  val condition15: Seq[String] = Seq(
    "ancer", "cinoma", "eukem", "phoma", "umor", "umour", "eoplasm",
    "lanoma", "yeloma", "lioma", "toma", "myelodysplas",
    "estrogen receptor", "sterone receptor", "neu negative")

  val title15: Seq[String] = Seq(
    "ancer", "cinoma", "eukem", "phoma", "umor", "umour", "eoplasm",
    "lanoma", "toma", "lioma", "yeloma", "myelodysplas",
    "estrogen receptor", "sterone receptor", "neu negative")

  /** 8-term dashboard oncology flag (expects an already-lowercased
    * column, as the reference applies it to `downcase_name`). */
  def oncoDashboard(c: Column): Column = anyTerm(c, dashboard8)

  /** 15-term per-condition oncology flag over `downcase_name`. */
  def oncoCondition(c: Column): Column = anyTerm(c, condition15)

  /** 15-term oncology flag over `brief_title` (reference applies it to
    * the raw title — case-sensitive there; callers pass the column as
    * the reference site does). */
  def oncoTitle(c: Column): Column = anyTerm(c, title15)
}
