package graft

import org.apache.spark.sql.functions._
import graft.security.{Rls, SecurityGenerators}

/** RLS behavioral scenarios — the port of the reference's test_rls.py:
  * dept-scoped user sees exactly their department, NULL zone = whole
  * region, unregistered login = full access, cross-isolation. */
class RlsSpec extends SparkSpec {
  import spark.implicits._

  private def geo = Seq(
    ("02", "Aisne"), ("59", "Nord"), ("60", "Oise"),
    ("62", "Pas-de-Calais"), ("80", "Somme"))
    .toDF("departement_code", "departement_nom")

  private def zones = Seq(
    ("jean.dupont", Some("59")),
    ("sophie.martin", None: Option[String]))
    .toDF("login", "departement_code")

  test("dept-scoped user sees exactly their department") {
    val visible = Rls.filterForUser(geo, zones, "jean.dupont")
      .select("departement_code").as[String].collect().toSet
    assert(visible == Set("59"))
  }

  test("NULL zone grants the whole region") {
    assert(Rls.filterForUser(geo, zones, "sophie.martin").count() == 5)
  }

  test("unregistered login gets full access (reference NOT EXISTS branch)") {
    assert(Rls.filterForUser(geo, zones, "ghost").count() == 5)
  }

  test("cross-isolation: 59-scoped user sees zero rows of dept 62") {
    val leaked = Rls.filterForUser(geo, zones, "jean.dupont")
      .filter($"departement_code" === "62").count()
    assert(leaked == 0)
  }

  test("user view factory registers a filtered catalog view") {
    val name = Rls.createUserView(spark, "dim_geographie", geo, zones, "jean.dupont")
    assert(spark.table(name).count() == 1)
  }

  test("agency generator applies population thresholds and classes") {
    val communes = Seq(
      ("Lille", "59", 236234), ("Roubaix", "59", 98000),
      ("Petite", "59", 12000), ("Trop-petite", "59", 9000))
      .toDF("nom", "departement_code", "population")
    val ag = SecurityGenerators.agencies(communes).cache()
    assert(ag.count() == 3) // ≥ 10k only
    val classes = ag.select("nom", "classe").as[(String, String)].collect().toMap
    assert(classes("Lille") == "GRANDE" && classes("Roubaix") == "GRANDE")
    assert(classes("Petite") == "PETITE")
  }

  test("login folding strips accents (reference NFKD normalize)") {
    assert(SecurityGenerators.foldLogin("Jérôme", "Lefèvre") == "jerome.lefevre")
    assert(SecurityGenerators.foldLogin("Édith", "D'Amboise") == "edith.damboise")
  }
}
