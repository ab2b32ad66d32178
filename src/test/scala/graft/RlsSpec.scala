package graft

import org.apache.spark.sql.functions._
import graft.security.{Rbac, Rls, SecureTableApi, SecurityGenerators}

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
    // when()-chain columns must match the scalar thresholds exactly and
    // keep the generator UDF-free (codegen-pure main)
    ag.select("population", "classe", "nb_collaborateurs")
      .as[(Int, String, Int)].collect().foreach { case (p, c, n) =>
        assert((c, n) == SecurityGenerators.agencyClass(p))
      }
    assert(!ag.queryExecution.executedPlan.toString
      .toLowerCase.contains("scalaudf"))
  }

  test("login folding strips accents (reference NFKD normalize)") {
    assert(SecurityGenerators.foldLogin("Jérôme", "Lefèvre") == "jerome.lefevre")
    assert(SecurityGenerators.foldLogin("Édith", "D'Amboise") == "edith.damboise")
  }

  test("foldLoginCol (codegen AccentFold composition) ≡ foldLogin") {
    val names = Seq(("Jérôme", "Lefèvre"), ("Édith", "D'Amboise"),
      ("Anne-Sophie", "van Höuten"), ("ALAIN", "N°7"))
    val got = names.toDF("prenom", "nom")
      .select(SecurityGenerators.foldLoginCol($"prenom", $"nom").as("login"))
      .as[String].collect().toSeq
    assert(got == names.map { case (p, n) => SecurityGenerators.foldLogin(p, n) })
  }

  // ---- RBAC: the reference's 4-role grant matrix (006:16-120) ----

  test("RBAC matrix: the four reference roles and their schema grants") {
    assert(Rbac.roles.toSet == Set("role_admin", "role_etl_process",
      "role_analyst", "role_consultant"))
    // admin: everything read/write, incl. security metadata
    for (sc <- Seq("stg", "dwh", "dm", "analytics", "security"))
      assert(Rbac.canRead("role_admin", sc) && Rbac.canWrite("role_admin", sc))
    // etl: rw stg+dwh, read-only marts, no security
    assert(Rbac.canWrite("role_etl_process", "stg") &&
      Rbac.canWrite("role_etl_process", "dwh"))
    assert(Rbac.canRead("role_etl_process", "dm") &&
      !Rbac.canWrite("role_etl_process", "dm"))
    assert(!Rbac.canRead("role_etl_process", "security"))
    // analyst: read dwh/dm/analytics, NO staging access (006:85)
    assert(Rbac.canRead("role_analyst", "dwh") &&
      !Rbac.canRead("role_analyst", "stg") &&
      !Rbac.canWrite("role_analyst", "dwh"))
    // consultant: dm/analytics only
    assert(Rbac.canRead("role_consultant", "dm") &&
      !Rbac.canRead("role_consultant", "dwh") &&
      !Rbac.canRead("role_consultant", "stg"))
    // unknown roles hold nothing
    assert(!Rbac.canRead("role_ghost", "dm"))
  }

  test("consultant reads dm through the RLS filter, is denied dwh") {
    val user = Rbac.User("jean.dupont", "role_consultant")
    val dm = Rbac.scopedView(geo, user, "dm", zones)
    assert(dm.isDefined)
    assert(dm.get.select("departement_code").as[String].collect().toSet
      == Set("59"), "consultant must see only their RLS departments")
    assert(Rbac.scopedView(geo, user, "dwh", zones).isEmpty)
    // analyst on the same table: full read, no RLS
    val analyst = Rbac.scopedView(geo,
      Rbac.User("jean.dupont", "role_analyst"), "dm", zones)
    assert(analyst.get.count() == 5)
  }

  test("write gate: etl writes dwh, analyst/consultant cannot") {
    Rbac.requireWrite(Rbac.User("etl", "role_etl_process"), "dwh")
    intercept[SecurityException] {
      Rbac.requireWrite(Rbac.User("ana", "role_analyst"), "dwh")
    }
    intercept[SecurityException] {
      Rbac.requireWrite(Rbac.User("c", "role_consultant"), "dm")
    }
  }

  test("secure table API serves schema.table under role + RLS") {
    // schema.table addressing needs a real catalog database
    spark.sql("CREATE DATABASE IF NOT EXISTS dm")
    try {
      geo.write.mode("overwrite").saveAsTable("dm.rbac_geo")
      val cfg = SecureTableApi.Config(maxLimit = 100)
      val consultant = Rbac.User("jean.dupont", "role_consultant")
      val rows = SecureTableApi.read(spark, cfg, consultant, zones,
        "dm.rbac_geo", 100)
      assert(rows.select("departement_code").as[String].collect().toSet
        == Set("59"))
      intercept[SecurityException] {
        SecureTableApi.read(spark, cfg,
          Rbac.User("x", "role_consultant"), zones, "dwh.rbac_geo", 10)
      }
      intercept[IllegalArgumentException] {
        SecureTableApi.read(spark, cfg, consultant, zones, "dm.rbac_geo", 1000)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS dm.rbac_geo")
      spark.sql("DROP DATABASE IF EXISTS dm")
    }
  }
}
