package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's fact-table reshapes (`analytics/etl/load_facts.py`),
  * each a single groupBy pass over staging instead of per-group slicing
  * loops. Column names follow the staging vocabulary of FIXTURES.md §1.
  */
object FactBuilders {

  private def yearDept: Seq[Column] = Seq(col("annee"), col("departement"))

  /** fait_emploi from stg_emploi_chomage (`load_facts.py:484-508`):
    * EMPSTA_ENQ codes '1' employed / '2' unemployed / '1T2' active →
    * one row per (annee, departement) with taux_chomage. */
  def emploi(stg: DataFrame): DataFrame =
    stg.groupBy(yearDept: _*)
      .agg(
        sum(when(col("employment_status") === "1", col("obs_value"))
          .otherwise(0.0)).as("emplois"),
        sum(when(col("employment_status") === "2", col("obs_value"))
          .otherwise(0.0)).as("chomeurs"),
        sum(when(col("employment_status") === "1T2", col("obs_value"))
          .otherwise(0.0)).as("actifs"))
      .withColumn("taux_chomage",
        when(col("actifs") > 0, col("chomeurs") * 100.0 / col("actifs")))

  /** fait_menages from stg_menage (`load_facts.py:605-626`): DWELLINGS =
    * household count, DWELLINGS_POPSIZE = household population; derived
    * mean household size. The reference's `or None` quirk (0.0 → null) is
    * deliberately NOT reproduced — zero counts stay 0.0 and the ratio
    * guard handles them. */
  def menages(stg: DataFrame): DataFrame =
    stg.filter(col("household_type") === "_T")
      .groupBy(yearDept: _*)
      .agg(
        sum(when(col("rp_measure") === "DWELLINGS", col("obs_value"))
          .otherwise(0.0)).as("menages"),
        sum(when(col("rp_measure") === "DWELLINGS_POPSIZE", col("obs_value"))
          .otherwise(0.0)).as("personnes"))
      .withColumn("taille_moyenne",
        when(col("menages") > 0, col("personnes") / col("menages")))

  /** fait_logement from stg_logement (`load_facts.py:612-613` family):
    * OVEROCC '1' overcrowded / '0' normal / '_T' total → surpeuplement
    * rate per (annee, departement). */
  def logement(stg: DataFrame): DataFrame =
    stg.filter(col("rp_measure") === "DWELLINGS")
      .groupBy(yearDept: _*)
      .agg(
        sum(when(col("overocc_code") === "_T", col("obs_value"))
          .otherwise(0.0)).as("logements"),
        sum(when(col("overocc_code") === "1", col("obs_value"))
          .otherwise(0.0)).as("surpeuples"))
      .withColumn("taux_surpeuplement",
        when(col("logements") > 0, col("surpeuples") * 100.0 / col("logements")))

  /** fait_revenus from stg_ds_filosofi (`load_facts.py:361-384`): the
    * indicator pivot with the reference's renames. */
  def revenus(stg: DataFrame): DataFrame =
    Etl.pivotIndicators(stg.filter(col("annee").isNotNull),
      Seq("annee", "departement"), "indicator_code", "indicator_value",
      values = Seq("MED_SL", "D1_SL", "D9_SL", "IR_D9_D1_SL", "PR_MD60",
        "NUM_HH", "NUM_PER"),
      rename = Map("MED_SL" -> "revenu_median", "D1_SL" -> "revenu_d1",
        "D9_SL" -> "revenu_d9", "IR_D9_D1_SL" -> "rapport_interdecile",
        "PR_MD60" -> "taux_pauvrete", "NUM_HH" -> "nb_menages_fiscaux",
        "NUM_PER" -> "nb_personnes"))

  /** fait_entreprises from stg_creation_entreprises (`load_facts.py:
    * 305-308`): totals only (_T activity and legal form), summed. */
  def entreprises(stg: DataFrame): DataFrame =
    stg.filter(col("activity") === "_T" && col("legal_form") === "_T")
      .groupBy(yearDept: _*)
      .agg(sum(col("obs_value")).as("creations"))
}
