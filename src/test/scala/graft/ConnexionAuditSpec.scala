package graft

import org.apache.spark.sql.functions._
import graft.security.ConnexionAudit
import graft.sources.Sources

/** Connection-history audit ingest + active-sessions view (reference
  * track_connexions.py + v_connexions_actives, 011:346-391). */
class ConnexionAuditSpec extends SparkSpec {
  import spark.implicits._

  private def feedJson(login: String, ts: String, result: String) =
    s"""{"heure_connexion":"$ts","login_sql":"$login",
       |"ip_client":"10.1.2.3","resultat":"DATABASE AUTHENTICATION $result",
       |"application":"sqlcmd","base_de_donnees":"dwh"}""".stripMargin
      .replace("\n", "")

  test("pluggable fetch (Sources.fetched JSON) → normalize: SUCCEEDED → " +
      "SUCCES, anything else → ECHEC, snapshot stamp applied") {
    val raw = Sources.fetched(spark, Seq(
      feedJson("alice", "2024-06-01 08:00:00", "SUCCEEDED"),
      feedJson("bob", "2024-06-01 08:05:00", "FAILED")))
    val hist = ConnexionAudit.normalize(raw, lit("2024-06-02 00:00:00"))
    val rows = hist.orderBy("login_sql")
      .select("login_sql", "statut_session", "poste_client", "application")
      .as[(String, String, String, String)].collect()
    assert(rows.toSeq == Seq(
      ("alice", "SUCCES", "10.1.2.3", "sqlcmd"),
      ("bob", "ECHEC", "10.1.2.3", "sqlcmd")))
    assert(hist.schema("heure_connexion").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(hist.select(countDistinct("snapshot_dt")).head().getLong(0) == 1)
  }

  test("appendHistory is idempotent: overlapping refetch inserts only new " +
      "keys, exact re-run inserts nothing, originals keep their stamp") {
    val raw = Sources.fetched(spark, Seq(
      feedJson("alice", "2024-06-01 08:00:00", "SUCCEEDED"),
      feedJson("bob", "2024-06-01 08:05:00", "FAILED")))
    val day1 = ConnexionAudit.normalize(raw, lit("2024-06-01 12:00:00"))
    val refetch = Sources.fetched(spark, Seq(
      feedJson("alice", "2024-06-01 08:00:00", "SUCCEEDED"), // already loaded
      feedJson("carol", "2024-06-01 09:00:00", "SUCCEEDED"))) // new
    val day2 = ConnexionAudit.normalize(refetch, lit("2024-06-02 12:00:00"))
    val hist = ConnexionAudit.appendHistory(day1, day2)
    assert(hist.count() == 3)
    // alice's original row survived with the day-1 stamp
    assert(hist.filter(col("login_sql") === "alice")
      .select(col("snapshot_dt").cast("string")).head().getString(0)
      == "2024-06-01 12:00:00")
    // exact re-run: no growth
    assert(ConnexionAudit.appendHistory(hist, day2).count() == 3)
  }

  test("within-batch duplicate keys resolve to ONE deterministic row " +
      "(first in column order — the reference's in-order cursor)") {
    val dup = Seq(
      ("alice", "2024-06-01 08:00:00", "ECHEC", "z-host", "app", "dwh",
        "2024-06-02 00:00:00"),
      ("alice", "2024-06-01 08:00:00", "SUCCES", "a-host", "app", "dwh",
        "2024-06-02 00:00:00"))
      .toDF("login_sql", "heure_connexion", "statut_session", "poste_client",
        "application", "base_de_donnees", "snapshot_dt")
      .withColumn("heure_connexion", col("heure_connexion").cast("timestamp"))
      .withColumn("snapshot_dt", col("snapshot_dt").cast("timestamp"))
    val hist = ConnexionAudit.appendHistory(dup.limit(0), dup)
    assert(hist.count() == 1)
    assert(hist.select("statut_session").head().getString(0) == "ECHEC")
  }

  test("appendHistory on a key-only frame: duplicates are identical whole " +
      "rows, deduped via dropDuplicates instead of an empty window order") {
    val keyOnly = Seq(
      ("alice", "2024-06-01 08:00:00"),
      ("alice", "2024-06-01 08:00:00"),
      ("bob", "2024-06-01 09:00:00"))
      .toDF("login_sql", "heure_connexion")
      .withColumn("heure_connexion", col("heure_connexion").cast("timestamp"))
    val hist = ConnexionAudit.appendHistory(keyOnly.limit(0), keyOnly)
    assert(hist.count() == 2)
    assert(ConnexionAudit.appendHistory(hist, keyOnly).count() == 2)
  }

  test("activeSessions: identity/zones fallbacks, system-session filter, " +
      "sorted zone list, minute age") {
    val sessions = Seq(
      ("alice", "2024-07-01 08:00:00", "running", "h1", "cli", true),
      ("ghost", "2024-07-01 09:30:30", "sleeping", "h2", "cli", true),
      ("etl_sys", "2024-07-01 00:00:00", "running", "h3", "cli", false))
      .toDF("login_sql", "heure_connexion", "statut_session", "poste_client",
        "application", "is_user_process")
      .withColumn("heure_connexion", col("heure_connexion").cast("timestamp"))
    val employes = Seq(("alice", "Alice Martin", "DIRECTEUR_AGENCE", 1))
      .toDF("login_sql", "nom_complet", "niveau_hierarchique", "agence_id")
    val agences = Seq((1, "Lille", "59"))
      .toDF("agence_id", "agence_ville", "agence_departement")
    val zones = Seq(("alice", Some("62")), ("alice", Some("59")),
      ("alice", None))
      .toDF("login_sql", "departement_code")
    val out = ConnexionAudit.activeSessions(sessions, employes, agences,
      zones, lit("2024-07-01 10:00:00")).orderBy("login_sql")
    val rows = out.select("login_sql", "nom_complet", "agence_ville",
      "zones_rls", "duree_connexion_min")
      .as[(String, Option[String], Option[String], String, Long)].collect()
    assert(rows.length == 2, "system session must be excluded")
    assert(rows(0) == (("alice", Some("Alice Martin"), Some("Lille"),
      "59, 62, REGION_ENTIERE", 120L)))
    assert(rows(1) == (("ghost", None, None,
      "Acces total (non filtre)", 29L))) // floor(29.5 min)
    // dimension joins broadcast; the session side never shuffles
    val plan = finalPlanOf(out)
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
  }
}
