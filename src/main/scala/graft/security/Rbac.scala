package graft.security

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Role-based access control — the reference's role→schema grant matrix
  * (`Terraform/sql/006_configure_security.sql:16-120`; tested at
  * `analytics/tests/test_dwh.py:640-687`) re-expressed as an explicit
  * permission table composed with the RLS view factory:
  *
  *  - `role_admin`        — full control of every schema
  *  - `role_etl_process`  — read/write `stg` + `dwh`, read `dm`/`analytics`
  *  - `role_analyst`      — read `dwh` + `dm` + `analytics` (no staging)
  *  - `role_consultant`   — read `dm`/`analytics` ONLY, with the RLS
  *                          department filter applied on top (the
  *                          reference's "RLS actif sur dm et analytics")
  *
  * Spark has no database principals, so the matrix is engine config and
  * the gate is applied where views are built/served (the same place the
  * RLS filter is injected) — `SecureTableApi` is the serving-layer
  * entrypoint. Scale posture: the gate is a driver-side map lookup plus,
  * for consultants, the literal IN filter from `Rls.filterForUser` that
  * pushes into the scan — authorization adds zero distributed work.
  */
object Rbac {

  final case class User(login: String, role: String)

  val Admin = "role_admin"
  val Etl = "role_etl_process"
  val Analyst = "role_analyst"
  val Consultant = "role_consultant"

  /** role → schema → "rw" | "r" (absent = no access), mirroring the
    * reference grants. `security` metadata is admin-only (006:99). */
  val grants: Map[String, Map[String, String]] = Map(
    Admin -> Map("stg" -> "rw", "dwh" -> "rw", "dm" -> "rw",
      "analytics" -> "rw", "security" -> "rw"),
    Etl -> Map("stg" -> "rw", "dwh" -> "rw", "dm" -> "r", "analytics" -> "r"),
    Analyst -> Map("dwh" -> "r", "dm" -> "r", "analytics" -> "r"),
    Consultant -> Map("dm" -> "r", "analytics" -> "r"))

  def roles: Seq[String] = Seq(Admin, Etl, Analyst, Consultant)

  def canRead(role: String, schema: String): Boolean =
    grants.get(role).exists(_.contains(schema))

  def canWrite(role: String, schema: String): Boolean =
    grants.get(role).exists(_.get(schema).contains("rw"))

  /** RLS applies to consultants only — other roles read their allowed
    * schemas unfiltered (the reference binds its security policy to the
    * consultant access path; admin/etl/analyst are exempt). */
  def rlsApplies(role: String): Boolean = role == Consultant

  /** The role-scoped view of a table: None when the role has no grant on
    * the schema; for consultants the RLS department filter is composed in
    * (when the table carries the department column — conformed dm tables
    * always do in the reference model). */
  def scopedView(df: DataFrame, user: User, schema: String, zones: DataFrame,
      deptCol: String = "departement_code"): Option[DataFrame] =
    if (!canRead(user.role, schema)) None
    else if (rlsApplies(user.role) && df.columns.contains(deptCol))
      Some(Rls.filterForUser(df, zones, user.login, deptCol))
    else Some(df)

  /** Write gate for pipeline stages: throws unless the role holds a
    * read/write grant on the target schema. */
  def requireWrite(user: User, schema: String): Unit =
    if (!canWrite(user.role, schema))
      throw new SecurityException(
        s"role ${user.role} cannot write schema $schema")
}

/** Role-aware serving layer: the flat allow-list `TableApi` composed with
  * the RBAC matrix and RLS — the engine-side `GET /tables/{name}` with a
  * caller identity (reference FastAPI + SQL Server roles). Tables are
  * addressed as `schema.table` against the session catalog. */
object SecureTableApi {
  final case class Config(maxLimit: Int = 1000)

  def read(spark: SparkSession, cfg: Config, user: Rbac.User, zones: DataFrame,
      qualified: String, limit: Int,
      deptCol: String = "departement_code"): DataFrame = {
    require(limit >= 1 && limit <= cfg.maxLimit, s"limit out of range: $limit")
    val parts = qualified.split('.')
    require(parts.length == 2, s"expected schema.table, got: $qualified")
    // authorize BEFORE touching the catalog: a denied role learns nothing
    // about what exists in the schema
    if (!Rbac.canRead(user.role, parts(0)))
      throw new SecurityException(
        s"role ${user.role} cannot read schema ${parts(0)}")
    Rbac.scopedView(spark.table(qualified), user, parts(0), zones, deptCol)
      .get.limit(limit)
  }
}
