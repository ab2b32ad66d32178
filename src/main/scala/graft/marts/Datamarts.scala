package graft.marts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Datamart view definitions — the Spark re-expression of the reference's
  * five `dm.vm_*` views + the dashboard scaffold (reference
  * `Terraform/sql/005_create_datamarts.sql:14-254`): star joins on small
  * dimensions (broadcast), department-level filter, grouped sums, and
  * guarded ratio expressions (`CASE WHEN SUM>0` / `NULLIF`).
  */
object Datamarts {

  /** Guarded per-mille rate: NULL when the denominator sum is 0
    * (reference `005:29-34`). */
  def per1000(num: Column, den: Column): Column =
    when(den > 0, num * 1000.0 / den).otherwise(lit(null))

  def pct(num: Column, den: Column): Column =
    when(den > 0, num * 100.0 / den).otherwise(lit(null))

  /** vm_demographie_departement: population ⋈ temps ⋈ geo ⟕ événements,
    * grouped by (annee, departement), with natalité/mortalité rates. */
  def demographieDepartement(faitPopulation: DataFrame, faitEvenements: DataFrame,
      dimTemps: DataFrame, dimGeo: DataFrame): DataFrame = {
    val base = faitPopulation
      .join(broadcast(dimTemps), "temps_id")
      .join(broadcast(dimGeo.filter(col("niveau_geo") === "DEPARTEMENT")), "geo_id")
      .join(faitEvenements.select("temps_id", "geo_id", "naissances", "deces"),
        Seq("temps_id", "geo_id"), "left")
    base.groupBy(col("annee"), col("departement_code"), col("departement_nom"))
      .agg(
        sum("population").as("population_totale"),
        sum("naissances").as("naissances"),
        sum("deces").as("deces"),
        sum(coalesce(col("naissances"), lit(0)) - coalesce(col("deces"), lit(0)))
          .as("solde_naturel"))
      .withColumn("taux_natalite",
        per1000(col("naissances"), col("population_totale")))
      .withColumn("taux_mortalite",
        per1000(col("deces"), col("population_totale")))
  }

  /** vm_revenus_departement: AVG/MIN/MAX income indicators. */
  def revenusDepartement(faitRevenus: DataFrame, dimTemps: DataFrame,
      dimGeo: DataFrame): DataFrame =
    faitRevenus
      .join(broadcast(dimTemps), "temps_id")
      .join(broadcast(dimGeo.filter(col("niveau_geo") === "DEPARTEMENT")), "geo_id")
      .groupBy(col("annee"), col("departement_code"), col("departement_nom"))
      .agg(
        avg("revenu_median").as("revenu_median"),
        min("revenu_d1").as("revenu_d1"),
        max("revenu_d9").as("revenu_d9"),
        avg("taux_pauvrete").as("taux_pauvrete"))

  /** vm_emploi_departement with taux_chomage = chomeurs/actifs*100. */
  def emploiDepartement(faitEmploi: DataFrame, dimTemps: DataFrame,
      dimGeo: DataFrame): DataFrame =
    faitEmploi
      .join(broadcast(dimTemps), "temps_id")
      .join(broadcast(dimGeo.filter(col("niveau_geo") === "DEPARTEMENT")), "geo_id")
      .groupBy(col("annee"), col("departement_code"), col("departement_nom"))
      .agg(sum("emplois").as("emplois"), sum("chomeurs").as("chomeurs"),
        sum("actifs").as("actifs"))
      .withColumn("taux_chomage", pct(col("chomeurs"), col("actifs")))

  /** vm_entreprises_departement (reference `005:56-84`): the one 4-way
    * star in the reference — fact ⋈ temps ⋈ geo ⋈ **activite**, grouped by
    * the third dimension's attributes (secteur / NAF section) on top of
    * the usual (annee, departement) keys, with conditional-split creation
    * counters summed per cell.
    *
    * All three dims carry a broadcast hint: datamart dimensions are
    * bounded-cardinality by construction (dates, communes, NAF sections —
    * none grows with fact volume), so the hint stays safe at 100 TB while
    * sparing three shuffles of the fact table.
    */
  def entreprisesDepartement(faitEntreprises: DataFrame, dimTemps: DataFrame,
      dimGeo: DataFrame, dimActivite: DataFrame): DataFrame =
    faitEntreprises
      .join(broadcast(dimTemps), "temps_id")
      .join(broadcast(dimGeo.filter(col("niveau_geo") === "DEPARTEMENT")), "geo_id")
      .join(broadcast(dimActivite), "activite_id")
      .groupBy(col("annee"), col("departement_code"), col("departement_nom"),
        col("secteur_activite"), col("naf_section_code"),
        col("naf_section_libelle"))
      .agg(
        sum("nb_creations_entreprises").as("nb_creations"),
        sum("nb_creations_micro").as("nb_creations_micro"),
        sum("nb_creations_ei").as("nb_creations_ei"),
        sum("nb_creations_hommes").as("creations_hommes"),
        sum("nb_creations_femmes").as("creations_femmes"),
        sum("nb_creations_moins_30ans").as("creations_jeunes"))

  /** vm_logement_departement (reference `005:174-199`): housing-stock SUMs
    * with the guarded overcrowding percentage (NULL when no stock). */
  def logementDepartement(faitLogement: DataFrame, dimTemps: DataFrame,
      dimGeo: DataFrame): DataFrame =
    faitLogement
      .join(broadcast(dimTemps), "temps_id")
      .join(broadcast(dimGeo.filter(col("niveau_geo") === "DEPARTEMENT")), "geo_id")
      .groupBy(col("annee"), col("departement_code"), col("departement_nom"))
      .agg(
        sum("nb_residences_principales").as("nb_residences_principales"),
        sum("nb_logements_surpeuples").as("nb_logements_surpeuples"))
      .withColumn("taux_surpeuplement",
        pct(col("nb_logements_surpeuples"), col("nb_residences_principales")))

  /** Dashboard scaffold: geo × temps CROSS JOIN, left-joined to each
    * datamart so every (department, year) cell exists even with no facts
    * (reference `005:235-254`; the entreprises mart enters re-aggregated
    * to (annee, departement) as in `005:239-243`). */
  def tableauBord(dimGeo: DataFrame, dimTemps: DataFrame,
      datamarts: Seq[(String, DataFrame)]): DataFrame = {
    val scaffold = dimGeo.filter(col("niveau_geo") === "DEPARTEMENT")
      .select("departement_code", "departement_nom")
      .crossJoin(dimTemps.select("annee").distinct())
    datamarts.foldLeft(scaffold) { case (acc, (_, dm)) =>
      acc.join(dm.drop("departement_nom"),
        Seq("annee", "departement_code"), "left")
    }
  }
}
