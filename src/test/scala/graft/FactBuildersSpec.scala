package graft

import org.apache.spark.sql.functions._
import graft.etl.FactBuilders

/** Reference fact reshapes on FIXTURES-shaped staging rows. */
class FactBuildersSpec extends SparkSpec {
  import spark.implicits._

  test("fait_emploi: conditional agg over EMPSTA codes + taux_chomage") {
    val stg = Seq(
      (2021, "59", "1", 900.0), (2021, "59", "2", 100.0), (2021, "59", "1T2", 1000.0),
      (2021, "02", "1", 50.0), (2021, "02", "1T2", 50.0))
      .toDF("annee", "departement", "employment_status", "obs_value")
    val f = FactBuilders.emploi(stg).cache()
    val nord = f.filter($"departement" === "59").first()
    assert(nord.getAs[Double]("chomeurs") == 100.0)
    assert(math.abs(nord.getAs[Double]("taux_chomage") - 10.0) < 1e-9)
    // no unemployment rows → 0 chomeurs, rate 0 (not null: actifs > 0)
    assert(f.filter($"departement" === "02").first().getAs[Double]("taux_chomage") == 0.0)
  }

  test("fait_menages: household size from DWELLINGS measures") {
    val stg = Seq(
      (2021, "59", "_T", "DWELLINGS", 400.0),
      (2021, "59", "_T", "DWELLINGS_POPSIZE", 1000.0),
      (2021, "59", "110", "DWELLINGS", 120.0)) // non-total rows excluded
      .toDF("annee", "departement", "household_type", "rp_measure", "obs_value")
    val f = FactBuilders.menages(stg).first()
    assert(f.getAs[Double]("menages") == 400.0)
    assert(math.abs(f.getAs[Double]("taille_moyenne") - 2.5) < 1e-9)
  }

  test("fait_logement: overcrowding rate with zero-denominator guard") {
    val stg = Seq(
      (2021, "59", "DWELLINGS", "_T", 200.0),
      (2021, "59", "DWELLINGS", "1", 30.0),
      (2021, "02", "DWELLINGS", "1", 5.0)) // no _T rows → logements 0
      .toDF("annee", "departement", "rp_measure", "overocc_code", "obs_value")
    val f = FactBuilders.logement(stg).cache()
    assert(math.abs(f.filter($"departement" === "59").first()
      .getAs[Double]("taux_surpeuplement") - 15.0) < 1e-9)
    assert(f.filter($"departement" === "02").first()
      .getAs[Any]("taux_surpeuplement") == null)
  }

  test("fait_revenus: FILOSOFI pivot with renames") {
    val stg = Seq(
      (2021, "59", "MED_SL", 22000.0), (2021, "59", "PR_MD60", 18.5),
      (2021, "02", "MED_SL", 20500.0))
      .toDF("annee", "departement", "indicator_code", "indicator_value")
    val f = FactBuilders.revenus(stg).cache()
    assert(f.columns.contains("revenu_median") && f.columns.contains("taux_pauvrete"))
    assert(f.filter($"departement" === "59").first()
      .getAs[Double]("revenu_median") == 22000.0)
    assert(f.filter($"departement" === "02").first()
      .getAs[Any]("taux_pauvrete") == null)
  }

  test("fait_entreprises: totals-only aggregation") {
    val stg = Seq(
      (2021, "59", "_T", "_T", 5000.0), (2021, "59", "A", "_T", 300.0),
      (2022, "59", "_T", "_T", 5200.0))
      .toDF("annee", "departement", "activity", "legal_form", "obs_value")
    val f = FactBuilders.entreprises(stg)
    assert(f.count() == 2)
    assert(f.filter($"annee" === 2021).first().getAs[Double]("creations") == 5000.0)
  }
}
