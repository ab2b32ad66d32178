package graft.security

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Connection-history audit ingest + active-session monitoring — the
  * reference's last standalone behavior (reference
  * `analytics/etl/track_connexions.py:1-255` and the
  * `v_connexions_actives` view, `Terraform/sql/011_security_rls.sql:
  * 346-391`), re-expressed engine-side:
  *
  *  - the reference fetches SQL-audit login events from a log service
  *    (KQL over `AzureDiagnostics`, `track_connexions.py:79-143`); here
  *    the fetch is PLUGGABLE exactly like the REST/scrape sources — the
  *    caller's client returns raw JSON strings and
  *    [[graft.sources.Sources.fetched]] parallelizes/parses them, so the
  *    feed enters as a normal DataFrame with no HTTP client baked in;
  *  - [[normalize]] maps the audit projection to the
  *    `historique_connexions` shape ('SUCCEEDED' → SUCCES else ECHEC,
  *    `track_connexions.py:171`), with the load timestamp an explicit
  *    parameter (the reference's `GETDATE()`) so loads are reproducible;
  *  - [[appendHistory]] is the idempotent dedup-append (the reference's
  *    per-row `IF NOT EXISTS … INSERT` keyed on (login_sql,
  *    heure_connexion), `track_connexions.py:157-176`) as ONE set
  *    operation: an anti-join drops already-loaded keys, so re-running
  *    yesterday's fetch window inserts nothing — same guarantee, no
  *    row-at-a-time driver loop;
  *  - [[activeSessions]] is the monitoring view: live sessions LEFT JOIN
  *    employee identity LEFT JOIN agency LEFT JOIN the STRING_AGG'd RLS
  *    zone list, system sessions excluded, connection age in minutes
  *    from an explicit `now`.
  *
  * Scale shape: the audit feed is bounded (days × logins — operational,
  * not corpus, data), but [[appendHistory]] is written for an
  * arbitrarily large HISTORY side: the anti-join shuffles on the 2-col
  * key only (the probe projects just the key, so a wide history table
  * never moves), and at 100 TB history the table would be date-
  * partitioned so the fetch window prunes to a few partitions before
  * the join. Nothing collects to the driver.
  */
object ConnexionAudit {

  /** The fetched audit feed (KQL projection shape — `heure_connexion`,
    * `login_sql`, `ip_client`, `resultat`, `application`,
    * `base_de_donnees`) normalized to `historique_connexions` rows.
    * `snapshotDt` stamps the load batch (reference `snapshot_dt =
    * GETDATE()`). */
  def normalize(raw: DataFrame, snapshotDt: Column): DataFrame =
    raw.select(
      col("login_sql"),
      col("heure_connexion").cast("timestamp"),
      when(col("resultat").contains("SUCCEEDED"), lit("SUCCES"))
        .otherwise(lit("ECHEC")).as("statut_session"),
      col("ip_client").as("poste_client"),
      col("application"),
      col("base_de_donnees"),
      snapshotDt.cast("timestamp").as("snapshot_dt"))

  /** History ∪ genuinely-new rows: incoming rows whose (login_sql,
    * heure_connexion) key already exists in `existing` are dropped —
    * the reference's NOT EXISTS guard, so the load is idempotent and a
    * re-fetched overlapping window is a no-op. Within-batch duplicate
    * keys (the log service can emit one login twice) resolve
    * deterministically to the row with the SMALLEST non-key column
    * values (column order). The reference's in-order cursor loop keeps
    * the first ARRIVAL instead; the two coincide when duplicates are
    * byte-identical — the common log-replay case — and a Dataset has no
    * arrival order to preserve, so smallest-by-value is the
    * deterministic refinement. A key-only frame (no non-key columns to
    * order by) falls back to dropDuplicates: its duplicates are
    * identical whole rows, so any survivor is the same row. */
  def appendHistory(existing: DataFrame, incoming: DataFrame): DataFrame = {
    val key = Seq("login_sql", "heure_connexion")
    val rest = incoming.columns.filterNot(key.contains)
    val deduped =
      if (rest.isEmpty) incoming.dropDuplicates(key)
      else {
        val w = Window.partitionBy(key.map(col): _*)
          .orderBy(rest.map(col): _*)
        incoming.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    val newRows =
      deduped.join(existing.select(key.map(col): _*), key, "left_anti")
    existing.unionByName(newRows)
  }

  /** The active-sessions monitoring view (reference `011:350-391`):
    * one row per live user session with employee identity (null when
    * the login is not in `employes` — the reference shows 'Inconnu' at
    * DISPLAY time only), agency location, session age in minutes, and
    * the RLS zone list ('REGION_ENTIERE' for a NULL-department zone
    * row, 'Acces total (non filtre)' when the login has no zone rows —
    * same fallbacks as the reference ISNULLs). System sessions
    * (`is_user_process = false`) are excluded. Zone lists are sorted
    * before joining (the reference STRING_AGG has no ORDER BY, i.e.
    * nondeterministic — sorting is the deterministic refinement).
    *
    * Expected columns: sessions(login_sql, heure_connexion,
    * statut_session, poste_client, application, is_user_process),
    * employes(login_sql, nom_complet, niveau_hierarchique, agence_id),
    * agences(agence_id, agence_ville, agence_departement),
    * zones(login_sql, departement_code). All dimension sides are
    * catalog-sized → broadcast under the session autoBroadcast
    * threshold; sessions never shuffle. */
  def activeSessions(sessions: DataFrame, employes: DataFrame,
      agences: DataFrame, zones: DataFrame, now: Column): DataFrame = {
    val zonesAgg = zones.groupBy("login_sql")
      .agg(array_join(sort_array(collect_list(
        coalesce(col("departement_code").cast("string"),
          lit("REGION_ENTIERE")))), ", ").as("zones_rls"))
    sessions
      .filter(col("is_user_process"))
      .drop("is_user_process")
      .join(broadcast(employes), Seq("login_sql"), "left")
      .join(broadcast(agences), Seq("agence_id"), "left")
      .join(broadcast(zonesAgg), Seq("login_sql"), "left")
      .withColumn("zones_rls",
        coalesce(col("zones_rls"), lit("Acces total (non filtre)")))
      .withColumn("duree_connexion_min",
        floor((now.cast("timestamp").cast("double") -
          col("heure_connexion").cast("double")) / 60d))
      .drop("agence_id")
  }
}
