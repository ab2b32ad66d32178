package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension seed data — the reference's fixed warehouse vocabulary
  * (reference `Terraform/sql/004_populate_dimensions.sql`,
  * `analytics/etl/load_dimensions.py:273-597`). Seeds are plain public
  * statistics vocabulary (INSEE codes, NAF sections, the five
  * Hauts-de-France departments).
  */
object Seeds {

  /** dim_temps: years 2010-2024, census flag on 2010/2015/2021
    * (reference `004:13-31`). */
  def dimTemps(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val census = Set(2010, 2015, 2021)
    (2010 to 2024).map(y => (y, census.contains(y)))
      .toDF("annee", "est_recensement")
  }

  /** dim_geographie: the 5 departments of region 32 Hauts-de-France
    * (reference `004:41-49`). */
  def dimGeographie(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("02", "Aisne"), ("59", "Nord"), ("60", "Oise"),
      ("62", "Pas-de-Calais"), ("80", "Somme"))
      .toDF("departement_code", "departement_nom")
      .withColumn("region_code", lit("32"))
      .withColumn("region_nom", lit("Hauts-de-France"))
      .withColumn("niveau_geo", lit("DEPARTEMENT"))
  }

  /** dim_demographie: sexe ∪ PCS ∪ age-band member rows (reference
    * `004:58-94`; union-of-seed-rows shape per SURVEY U3). */
  def dimDemographie(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sexe = Seq(("SEXE", "M", "Hommes"), ("SEXE", "F", "Femmes"),
      ("SEXE", "_T", "Ensemble"))
    val pcs = Seq("1" -> "Agriculteurs exploitants",
      "2" -> "Artisans, commercants, chefs d'entreprise",
      "3" -> "Cadres et professions intellectuelles superieures",
      "4" -> "Professions intermediaires", "5" -> "Employes",
      "6" -> "Ouvriers", "7" -> "Retraites", "8" -> "Autres sans activite",
      "_T" -> "Ensemble").map { case (c, l) => ("PCS", c, l) }
    val age = Seq("Y15T24" -> "15-24 ans", "Y25T54" -> "25-54 ans",
      "Y_GE55" -> "55 ans et plus", "Y_GE15" -> "15 ans et plus",
      "Y15T64" -> "15-64 ans", "Y_LT30" -> "Moins de 30 ans",
      "Y30T39" -> "30-39 ans", "Y40T49" -> "40-49 ans",
      "Y50T59" -> "50-59 ans", "Y_GE60" -> "60 ans et plus",
      "_T" -> "Tous ages").map { case (c, l) => ("AGE", c, l) }
    (sexe ++ pcs ++ age).toDF("dimension_type", "code", "libelle")
      .dropDuplicates("dimension_type", "code")
  }

  /** dim_activite: NAF section letters + legal forms (reference
    * `004:104-137`, SCD1-managed). */
  def dimActivite(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val naf = ('A' to 'S').map(c => ("NAF", c.toString, s"Section $c")) :+
      (("NAF", "_T", "Ensemble"))
    val formes = Seq("10" -> "Entrepreneur individuel",
      "54" -> "SARL", "57" -> "SAS", "MICRO" -> "Micro-entrepreneur",
      "ENTIND_X_MICRO" -> "Entrepreneur individuel hors micro",
      "OTH_SIDE" -> "Autres formes", "_T" -> "Ensemble")
      .map { case (c, l) => ("FORME_JURIDIQUE", c, l) }
    (naf ++ formes).toDF("dimension_type", "code", "libelle")
  }

  /** dim_indicateur: FILOSOFI / INSEE indicator codes (reference
    * `004:146-181`) — the pivot vocabulary for fait_revenus. */
  def dimIndicateur(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("MED_SL", "Niveau de vie median", "EUR"),
      ("D1_SL", "1er decile de niveau de vie", "EUR"),
      ("D9_SL", "9e decile de niveau de vie", "EUR"),
      ("IR_D9_D1_SL", "Rapport interdecile D9/D1", "RATIO"),
      ("PR_MD60", "Taux de pauvrete (60% mediane)", "PCT"),
      ("S_EI_DI", "Part des revenus d'activite", "PCT"),
      ("S_RET_PEN_DI", "Part des pensions et retraites", "PCT"),
      ("S_SOC_BEN_DI", "Part des prestations sociales", "PCT"),
      ("NUM_HH", "Nombre de menages fiscaux", "COUNT"),
      ("NUM_PER", "Nombre de personnes", "COUNT"))
      .toDF("indicateur_code", "libelle", "unite")
  }

  /** dim_logement: occupancy × overcrowding + household types
    * (reference `004:190-210`). */
  def dimLogement(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val occ = Seq(("OCCUPATION", "0", "Peuplement normal"),
      ("OCCUPATION", "1", "Surpeuplement"), ("OCCUPATION", "_T", "Ensemble"))
    val types = Seq("110" -> "Homme seul", "111" -> "Femme seule",
      "11" -> "Personne seule", "12" -> "Autres menages sans famille",
      "MF21" -> "Couple sans enfant", "MF221" -> "Couple avec enfant(s)",
      "MF222" -> "Famille monoparentale", "220" -> "Couples",
      "223" -> "Autres familles", "_T" -> "Ensemble")
      .map { case (c, l) => ("TYPE_MENAGE", c, l) }
    (occ ++ types).toDF("dimension_type", "code", "libelle")
  }

  /** All dims, surrogate-keyed deterministically. */
  def all(spark: SparkSession): Map[String, DataFrame] = Map(
    "dim_temps" -> Etl.withSurrogateKey(dimTemps(spark), "temps_id",
      Seq(col("annee"))),
    "dim_geographie" -> Etl.withSurrogateKey(dimGeographie(spark), "geo_id",
      Seq(col("departement_code"))),
    "dim_demographie" -> Etl.withSurrogateKey(dimDemographie(spark), "demo_id",
      Seq(col("dimension_type"), col("code"))),
    "dim_activite" -> Etl.withSurrogateKey(dimActivite(spark), "activite_id",
      Seq(col("dimension_type"), col("code"))),
    "dim_indicateur" -> Etl.withSurrogateKey(dimIndicateur(spark), "indicateur_id",
      Seq(col("indicateur_code"))),
    "dim_logement" -> Etl.withSurrogateKey(dimLogement(spark), "logement_id",
      Seq(col("dimension_type"), col("code"))))
}
