package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.scd.Scd

/** SCD merge operators (SURVEY §2.9 M1-M4) demonstrated on testdata:
  * `customer` plays the dimension; the update set is derived
  * deterministically from the data itself (high-balance customers get
  * segment 'PREMIUM'; nation-0 customers play brand-new keys), so the
  * DuckDB oracle can rebuild the exact same merge.
  */
object ScdQueries {

  private def customer(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.load(s, d, "customer")

  /** dim snapshot: every customer except nation 0, seeded v1 active. */
  private val DIM_SQL =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_nationkey <> 0"""
  /** update set: all customers; balance > 5000 proposes segment PREMIUM. */
  private val UPD_SQL =
    """SELECT c_custkey, c_name,
      |       CASE WHEN c_acctbal > 5000 THEN 'PREMIUM' ELSE c_mktsegment END AS c_mktsegment
      |FROM customer""".stripMargin

  private def dimDf(s: org.apache.spark.sql.SparkSession, d: String) =
    customer(s, d).filter(col("c_nationkey") =!= 0)
      .select("c_custkey", "c_name", "c_mktsegment")

  private def updDf(s: org.apache.spark.sql.SparkSession, d: String) =
    customer(s, d).select(col("c_custkey"), col("c_name"),
      when(col("c_acctbal") > 5000, "PREMIUM").otherwise(col("c_mktsegment"))
        .as("c_mktsegment"))

  /** One `Scd.scd2Cdc` MERGE round as oracle CTE fragments: `$out` ends
    * as the merged dimension with columns (c_custkey, c_name,
    * c_mktsegment, version, est_actif, date_debut_validite,
    * date_fin_validite); tracked attribute = c_mktsegment. Mirrors the
    * engine branch-for-branch: in-batch latest-wins window, scd2's
    * full-outer classification (unchanged ∪ dim-only / closed / new
    * version / brand-new), then the delete-close pass. */
  private def cdcRoundSql(dim: String, ch: String, out: String,
      eff: String): String =
    s"""${out}_latest AS (SELECT * FROM (SELECT *, row_number() OVER
       |    (PARTITION BY c_custkey ORDER BY seq DESC) AS rn FROM $ch)
       |  WHERE rn = 1),
       |${out}_up AS (SELECT c_custkey, c_name, c_mktsegment
       |  FROM ${out}_latest WHERE op <> 'D'),
       |${out}_del AS (SELECT c_custkey FROM ${out}_latest WHERE op = 'D'),
       |${out}_j AS (
       |  SELECT d.c_custkey AS d_key, u.c_custkey AS u_key,
       |         d.c_name AS d_name, u.c_name AS u_name,
       |         d.c_mktsegment AS d_seg, u.c_mktsegment AS u_seg,
       |         d.version AS v, d.date_debut_validite AS deb
       |  FROM (SELECT * FROM $dim WHERE est_actif = 1) d
       |  FULL OUTER JOIN ${out}_up u ON d.c_custkey = u.c_custkey),
       |${out}_m AS (
       |  SELECT * FROM $dim WHERE est_actif = 0
       |  UNION ALL
       |  SELECT d_key, d_name, d_seg, v, 1, deb, CAST(NULL AS DATE)
       |  FROM ${out}_j WHERE d_key IS NOT NULL
       |    AND (u_key IS NULL OR d_seg IS NOT DISTINCT FROM u_seg)
       |  UNION ALL
       |  SELECT d_key, d_name, d_seg, v, 0, deb, DATE '$eff'
       |  FROM ${out}_j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
       |    AND d_seg IS DISTINCT FROM u_seg
       |  UNION ALL
       |  SELECT u_key, u_name, u_seg, v + 1, 1, DATE '$eff', CAST(NULL AS DATE)
       |  FROM ${out}_j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
       |    AND d_seg IS DISTINCT FROM u_seg
       |  UNION ALL
       |  SELECT u_key, u_name, u_seg, 1, 1, DATE '$eff', CAST(NULL AS DATE)
       |  FROM ${out}_j WHERE d_key IS NULL),
       |$out AS (
       |  SELECT m.c_custkey, m.c_name, m.c_mktsegment, m.version,
       |         CASE WHEN x.c_custkey IS NOT NULL THEN 0
       |              ELSE m.est_actif END AS est_actif,
       |         m.date_debut_validite,
       |         CASE WHEN x.c_custkey IS NOT NULL AND m.est_actif = 1
       |              THEN DATE '$eff'
       |              ELSE m.date_fin_validite END AS date_fin_validite
       |  FROM ${out}_m m
       |  LEFT JOIN ${out}_del x ON m.c_custkey = x.c_custkey)""".stripMargin

  val all: Seq[Q] = Seq(

    // M1: SCD1 overwrite with audit flag.
    Q("m_scd1_overwrite",
      s"""WITH dim AS ($DIM_SQL), upd AS ($UPD_SQL)
         |SELECT d.c_custkey, d.c_name,
         |       CASE WHEN u.c_mktsegment IS NOT NULL
         |                  AND d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         |            THEN u.c_mktsegment ELSE d.c_mktsegment END AS c_mktsegment,
         |       CAST(CASE WHEN u.c_mktsegment IS NOT NULL
         |                  AND d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         |            THEN 1 ELSE 0 END AS INT) AS changed
         |FROM dim d LEFT JOIN upd u ON d.c_custkey = u.c_custkey
         |ORDER BY d.c_custkey""".stripMargin) { (s, d) =>
      Scd.scd1(dimDf(s, d), updDf(s, d).drop("c_name"),
        Seq("c_custkey"), Seq("c_mktsegment"))
        .orderBy("c_custkey")
    },

    // M2+M4: batch SCD2 merge — one full-outer pass classifying rows into
    // {unchanged, closed, new-version, brand-new}.
    Q("m_scd2_merge",
      s"""WITH dim AS (
         |  SELECT c_custkey, c_name, c_mktsegment,
         |         1 AS version, 1 AS est_actif,
         |         DATE '2020-01-01' AS date_debut_validite,
         |         CAST(NULL AS DATE) AS date_fin_validite
         |  FROM customer WHERE c_nationkey <> 0),
         |upd AS ($UPD_SQL),
         |j AS (SELECT d.c_custkey AS d_key, u.c_custkey AS u_key,
         |             d.c_name AS d_name, u.c_name AS u_name,
         |             d.c_mktsegment AS d_seg, u.c_mktsegment AS u_seg,
         |             d.version AS v, d.date_debut_validite AS start0
         |      FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey)
         |SELECT c_custkey, c_name, c_mktsegment,
         |       CAST(version AS INT) AS version, CAST(est_actif AS INT) AS est_actif,
         |       date_debut_validite, date_fin_validite FROM (
         |  SELECT d_key AS c_custkey, d_name AS c_name, d_seg AS c_mktsegment,
         |         v AS version, 1 AS est_actif, start0 AS date_debut_validite,
         |         CAST(NULL AS DATE) AS date_fin_validite
         |  FROM j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
         |    AND d_seg IS NOT DISTINCT FROM u_seg AND d_name IS NOT DISTINCT FROM u_name
         |  UNION ALL
         |  SELECT d_key, d_name, d_seg, v, 0, start0, DATE '2024-06-01'
         |  FROM j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
         |    AND (d_seg IS DISTINCT FROM u_seg OR d_name IS DISTINCT FROM u_name)
         |  UNION ALL
         |  SELECT u_key, u_name, u_seg, v + 1, 1, DATE '2024-06-01', NULL
         |  FROM j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
         |    AND (d_seg IS DISTINCT FROM u_seg OR d_name IS DISTINCT FROM u_name)
         |  UNION ALL
         |  SELECT u_key, u_name, u_seg, 1, 1, DATE '2024-06-01', NULL
         |  FROM j WHERE d_key IS NULL
         |) x ORDER BY c_custkey, version, est_actif""".stripMargin) { (s, d) =>
      Scd.scd2(Scd.seed(dimDf(s, d), "2020-01-01"), updDf(s, d),
        Seq("c_custkey"), Seq("c_name", "c_mktsegment"), "2024-06-01")
        .orderBy("c_custkey", "version", "est_actif")
    },

    // M3: SCD3 previous-value column.
    Q("m_scd3_previous",
      s"""WITH dim AS ($DIM_SQL), upd AS ($UPD_SQL)
         |SELECT d.c_custkey, d.c_name,
         |       CASE WHEN u.c_mktsegment IS NOT NULL
         |                  AND d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         |            THEN u.c_mktsegment ELSE d.c_mktsegment END AS c_mktsegment,
         |       CASE WHEN u.c_mktsegment IS NOT NULL
         |                  AND d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         |            THEN d.c_mktsegment END AS ancien_c_mktsegment,
         |       CASE WHEN u.c_mktsegment IS NOT NULL
         |                  AND d.c_mktsegment IS DISTINCT FROM u.c_mktsegment
         |            THEN DATE '2024-06-01' END AS date_changement
         |FROM dim d LEFT JOIN upd u ON d.c_custkey = u.c_custkey
         |ORDER BY d.c_custkey""".stripMargin) { (s, d) =>
      Scd.scd3(dimDf(s, d), updDf(s, d).drop("c_name"),
        Seq("c_custkey"), "c_mktsegment", "2024-06-01")
        .orderBy("c_custkey")
    },

    // SCD2 point-in-time view over the merged dimension (W1-adjacent).
    Q("m_scd2_current_view",
      s"""WITH dim AS (
         |  SELECT c_custkey, c_name, c_mktsegment,
         |         1 AS version, 1 AS est_actif,
         |         DATE '2020-01-01' AS date_debut_validite,
         |         CAST(NULL AS DATE) AS date_fin_validite
         |  FROM customer WHERE c_nationkey <> 0),
         |upd AS ($UPD_SQL),
         |j AS (SELECT d.c_custkey AS d_key, u.c_custkey AS u_key,
         |             d.c_name AS d_name, u.c_name AS u_name,
         |             d.c_mktsegment AS d_seg, u.c_mktsegment AS u_seg,
         |             d.version AS v, d.date_debut_validite AS start0
         |      FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey),
         |merged AS (
         |  SELECT d_key AS c_custkey, d_seg AS c_mktsegment, v AS version, 1 AS est_actif
         |  FROM j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
         |    AND d_seg IS NOT DISTINCT FROM u_seg AND d_name IS NOT DISTINCT FROM u_name
         |  UNION ALL
         |  SELECT u_key, u_seg, v + 1, 1
         |  FROM j WHERE d_key IS NOT NULL AND u_key IS NOT NULL
         |    AND (d_seg IS DISTINCT FROM u_seg OR d_name IS DISTINCT FROM u_name)
         |  UNION ALL
         |  SELECT u_key, u_seg, 1, 1 FROM j WHERE d_key IS NULL)
         |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_active,
         |       CAST(max(version) AS INT) AS max_version
         |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) {
      (s, d) =>
        val merged = Scd.scd2(Scd.seed(dimDf(s, d), "2020-01-01"), updDf(s, d),
          Seq("c_custkey"), Seq("c_name", "c_mktsegment"), "2024-06-01")
        Scd.current(merged)
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_active"), max("version").as("max_version"))
          .orderBy("c_mktsegment")
    },

    // CDC apply with deterministic synthetic feed: custkey%10=0 gets two
    // updates (seq 2 wins → segment CDC_V2), %10=1 is hard-DELETED,
    // shifted keys are inserts. Latest-change-wins + anti-join + union —
    // the one merge shape with hard deletes.
    Q("m_cdc_apply",
      """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
        |changes AS (
        |  SELECT c_custkey, 'CDC_V1' AS c_mktsegment, 1 AS seq, 'U' AS op
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'CDC_V2', 2, 'U' FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, 1, 'D' FROM customer WHERE c_custkey % 10 = 1
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'CDC_NEW', 1, 'I' FROM customer
        |  WHERE c_custkey % 10 = 2),
        |latest AS (SELECT * FROM (SELECT *, row_number() OVER
        |             (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        |           FROM changes) WHERE rn = 1),
        |applied AS (
        |  SELECT b.c_custkey, b.c_mktsegment FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = b.c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment FROM latest WHERE op <> 'D')
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n
        |FROM applied GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = customer(s, d).select("c_custkey", "c_mktsegment")
      val cust = customer(s, d)
      def slice(m: Int) = cust.filter(col("c_custkey") % 10 === m)
      val changes =
        slice(0).select(col("c_custkey"), lit("CDC_V1").as("c_mktsegment"),
            lit(1).as("seq"), lit("U").as("op"))
          .unionByName(slice(0).select(col("c_custkey"),
            lit("CDC_V2").as("c_mktsegment"), lit(2).as("seq"), lit("U").as("op")))
          .unionByName(slice(1).select(col("c_custkey"),
            col("c_mktsegment"), lit(1).as("seq"), lit("D").as("op")))
          .unionByName(slice(2).select((col("c_custkey") + 1000000).as("c_custkey"),
            lit("CDC_NEW").as("c_mktsegment"), lit(1).as("seq"), lit("I").as("op")))
      Scd.applyCdc(base, changes, Seq("c_custkey"), "seq")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    },

    // PIT fact enrichment: orders join the customer-segment VERSION valid
    // at order date (v1 through 1995, v2 — PREMIUM promotion — from
    // CDC feed → SCD2 dimension (Scd.scd2Cdc — the merge each micro-batch
    // of Streams.scd2CdcSink applies): TWO sequential rounds so the
    // oracle covers every branch — in-batch latest-wins, update
    // close-and-append, value-identical update (no version bump), hard
    // delete (close only), insert, re-insert after delete (fresh version
    // chain), and a second round stacking versions to 3.
    Q("m_scd2_cdc",
      s"""WITH dim0 AS (
         |  SELECT c_custkey, c_name, c_mktsegment, 1 AS version,
         |         1 AS est_actif, DATE '2020-01-01' AS date_debut_validite,
         |         CAST(NULL AS DATE) AS date_fin_validite
         |  FROM customer WHERE c_custkey % 10 < 8),
         |ch1 AS (
         |  SELECT c_custkey, c_name, 'SEG_X' AS c_mktsegment, 1 AS seq, 'U' AS op
         |  FROM customer WHERE c_custkey % 10 = 0
         |  UNION ALL SELECT c_custkey, c_name, 'SEG_B1', 2, 'U'
         |  FROM customer WHERE c_custkey % 10 = 0
         |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 3, 'D'
         |  FROM customer WHERE c_custkey % 10 = 1
         |  UNION ALL SELECT c_custkey, c_name, 'SEG_NEW', 4, 'I'
         |  FROM customer WHERE c_custkey % 10 = 8
         |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 5, 'U'
         |  FROM customer WHERE c_custkey % 10 = 2),
         |${cdcRoundSql("dim0", "ch1", "dim1", "2024-01-01")},
         |ch2 AS (
         |  SELECT c_custkey, 'REINS' AS c_name, 'SEG_RE' AS c_mktsegment,
         |         10 AS seq, 'I' AS op
         |  FROM customer WHERE c_custkey % 10 = 1
         |  UNION ALL SELECT c_custkey, c_name, 'SEG_B2', 11, 'U'
         |  FROM customer WHERE c_custkey % 10 = 0
         |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 12, 'D'
         |  FROM customer WHERE c_custkey % 10 = 8),
         |${cdcRoundSql("dim1", "ch2", "dim2", "2024-02-01")}
         |SELECT c_mktsegment, CAST(est_actif AS INT) AS est_actif,
         |       CAST(version AS INT) AS version,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(min(date_debut_validite) AS VARCHAR) AS min_debut,
         |       coalesce(CAST(max(date_fin_validite) AS VARCHAR), 'open') AS max_fin
         |FROM dim2 GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val cust = customer(s, d)
      val k = col("c_custkey")
      def ch(m: Int, name: org.apache.spark.sql.Column,
          seg: org.apache.spark.sql.Column, seq: Int, op: String) =
        cust.filter(k % 10 === m).select(k.as("c_custkey"),
          name.as("c_name"), seg.as("c_mktsegment"),
          lit(seq).as("seq"), lit(op).as("op"))
      val dim0 = Scd.seed(cust.filter(k % 10 < 8)
        .select("c_custkey", "c_name", "c_mktsegment"), "2020-01-01")
      val b1 = ch(0, col("c_name"), lit("SEG_X"), 1, "U")
        .unionByName(ch(0, col("c_name"), lit("SEG_B1"), 2, "U"))
        .unionByName(ch(1, col("c_name"), col("c_mktsegment"), 3, "D"))
        .unionByName(ch(8, col("c_name"), lit("SEG_NEW"), 4, "I"))
        .unionByName(ch(2, col("c_name"), col("c_mktsegment"), 5, "U"))
      val dim1 = Scd.scd2Cdc(dim0, b1, Seq("c_custkey"),
        Seq("c_mktsegment"), "seq", "op", "2024-01-01")
      val b2 = ch(1, lit("REINS"), lit("SEG_RE"), 10, "I")
        .unionByName(ch(0, col("c_name"), lit("SEG_B2"), 11, "U"))
        .unionByName(ch(8, col("c_name"), col("c_mktsegment"), 12, "D"))
      val dim2 = Scd.scd2Cdc(dim1, b2, Seq("c_custkey"),
        Seq("c_mktsegment"), "seq", "op", "2024-02-01")
      dim2.groupBy(col("c_mktsegment"),
          col("est_actif").cast("int").as("est_actif"),
          col("version").cast("int").as("version"))
        .agg(count(lit(1)).as("n"),
          min(col("date_debut_validite").cast("string")).as("min_debut"),
          coalesce(max(col("date_fin_validite").cast("string")), lit("open"))
            .as("max_fin"))
        .orderBy("c_mktsegment", "est_actif", "version")
    },

    // EVENT-TIME SCD2 (Scd.scd2CdcEventTime): each change carries its own
    // effective date; out-of-order changes SPLICE the existing chain. The
    // oracle re-derives the whole rebuild in SQL — dim-version + derived-
    // delete + feed events, same-date collapse (feed > seq > delete),
    // no-op suppression, chain re-segmentation — over a dim where %10<7
    // keys hold a 2-version chain, %10=7 was closed by a historical
    // delete, and the feed exercises: mid-interval splice (0), no-op (1),
    // delete of the active version (2), re-insert after delete (7),
    // same-date override (3), same-key-same-date seq race (4),
    // mid-interval out-of-order DELETE splitting the chain (5), brand-new
    // key (8), delete of a never-seen key = dropped (9); %10=6 is
    // untouched passthrough.
    Q("m_scd2_eventtime",
      """WITH dim AS (
        |  SELECT c_custkey, c_name, c_mktsegment, 1 AS version,
        |         0 AS est_actif, DATE '2020-01-01' AS date_debut_validite,
        |         DATE '2022-01-01' AS date_fin_validite
        |  FROM customer WHERE c_custkey % 10 < 7
        |  UNION ALL
        |  SELECT c_custkey, c_name, 'SEG_V2', 2, 1, DATE '2022-01-01',
        |         CAST(NULL AS DATE)
        |  FROM customer WHERE c_custkey % 10 < 7
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment, 1, 0, DATE '2020-01-01',
        |         DATE '2021-06-01'
        |  FROM customer WHERE c_custkey % 10 = 7),
        |changes AS (
        |  SELECT c_custkey, c_name, 'SEG_MID' AS c_mktsegment, 1 AS seq,
        |         'U' AS op, DATE '2021-01-01' AS eff
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL SELECT c_custkey, c_name, 'SEG_V2', 2, 'U',
        |    DATE '2023-01-01' FROM customer WHERE c_custkey % 10 = 1
        |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 3, 'D',
        |    DATE '2023-06-01' FROM customer WHERE c_custkey % 10 = 2
        |  UNION ALL SELECT c_custkey, c_name, 'SEG_BACK', 4, 'I',
        |    DATE '2023-01-01' FROM customer WHERE c_custkey % 10 = 7
        |  UNION ALL SELECT c_custkey, c_name, 'SEG_SAME', 5, 'U',
        |    DATE '2022-01-01' FROM customer WHERE c_custkey % 10 = 3
        |  UNION ALL SELECT c_custkey, c_name, 'SEG_A', 6, 'U',
        |    DATE '2024-01-01' FROM customer WHERE c_custkey % 10 = 4
        |  UNION ALL SELECT c_custkey, c_name, 'SEG_B', 7, 'U',
        |    DATE '2024-01-01' FROM customer WHERE c_custkey % 10 = 4
        |  UNION ALL SELECT c_custkey, c_name, c_mktsegment, 8, 'D',
        |    DATE '2021-03-15' FROM customer WHERE c_custkey % 10 = 5
        |  UNION ALL SELECT c_custkey + 1000000, c_name, 'SEG_NEW', 9, 'I',
        |    DATE '2024-05-01' FROM customer WHERE c_custkey % 10 = 8
        |  UNION ALL SELECT c_custkey + 2000000, c_name, c_mktsegment, 10,
        |    'D', DATE '2024-01-01' FROM customer WHERE c_custkey % 10 = 9),
        |keys AS (SELECT DISTINCT c_custkey FROM changes),
        |touched AS (SELECT d.* FROM dim d
        |  WHERE EXISTS (SELECT 1 FROM keys k WHERE k.c_custkey = d.c_custkey)),
        |untouched AS (SELECT d.* FROM dim d
        |  WHERE NOT EXISTS (SELECT 1 FROM keys k WHERE k.c_custkey = d.c_custkey)),
        |ev AS (
        |  SELECT c_custkey, c_name, c_mktsegment, 'U' AS op,
        |         date_debut_validite AS eff, 0 AS arr,
        |         CAST(version AS BIGINT) AS seq, 0 AS dpri FROM touched
        |  UNION ALL
        |  SELECT t.c_custkey, t.c_name, t.c_mktsegment, 'D',
        |         t.date_fin_validite, 0, CAST(t.version AS BIGINT), 1
        |  FROM touched t
        |  WHERE t.est_actif = 0 AND t.date_fin_validite IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM touched s
        |      WHERE s.c_custkey = t.c_custkey
        |        AND s.date_debut_validite = t.date_fin_validite)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_mktsegment, op, eff, 1,
        |         CAST(seq AS BIGINT),
        |         CASE WHEN op = 'D' THEN 1 ELSE 0 END FROM changes),
        |one AS (SELECT * FROM (SELECT *, row_number() OVER
        |    (PARTITION BY c_custkey, eff
        |     ORDER BY arr DESC, seq DESC, dpri DESC) AS rn FROM ev)
        |  WHERE rn = 1),
        |kept AS (SELECT * FROM (
        |  SELECT *, lag(op) OVER w AS prev_op,
        |         (c_mktsegment IS DISTINCT FROM lag(c_mktsegment) OVER w)
        |           AS chg
        |  FROM one WINDOW w AS (PARTITION BY c_custkey ORDER BY eff))
        |  WHERE CASE WHEN op = 'D'
        |        THEN prev_op IS NOT NULL AND prev_op <> 'D'
        |        ELSE prev_op IS NULL OR prev_op = 'D' OR chg END),
        |built AS (SELECT * FROM (
        |  SELECT c_custkey, c_name, c_mktsegment, op, eff,
        |         lead(eff) OVER w2 AS next_eff,
        |         sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) OVER w2 AS chain
        |  FROM kept WINDOW w2 AS (PARTITION BY c_custkey ORDER BY eff))
        |  WHERE op <> 'D'),
        |reb AS (SELECT c_custkey, c_mktsegment,
        |        CAST(row_number() OVER
        |          (PARTITION BY c_custkey, chain ORDER BY eff) AS INT)
        |          AS version,
        |        CASE WHEN next_eff IS NULL THEN 1 ELSE 0 END AS est_actif,
        |        eff AS date_debut_validite, next_eff AS date_fin_validite
        |        FROM built),
        |fin AS (
        |  SELECT c_custkey, c_mktsegment, version, est_actif,
        |         date_debut_validite, date_fin_validite FROM untouched
        |  UNION ALL
        |  SELECT c_custkey, c_mktsegment, version, est_actif,
        |         date_debut_validite, date_fin_validite FROM reb)
        |SELECT c_mktsegment, CAST(est_actif AS INT) AS est_actif,
        |       CAST(version AS INT) AS version,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(date_debut_validite) AS VARCHAR) AS min_debut,
        |       coalesce(CAST(max(date_fin_validite) AS VARCHAR), 'open')
        |         AS max_fin
        |FROM fin GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val cust = customer(s, d)
      val k = col("c_custkey")
      def dimSlice(cond: org.apache.spark.sql.Column,
          seg: org.apache.spark.sql.Column, v: Int, actif: Int,
          deb: String, fin: Option[String]) =
        cust.filter(cond).select(k.as("c_custkey"), col("c_name"),
          seg.as("c_mktsegment"), lit(v).as("version"),
          lit(actif).as("est_actif"),
          lit(deb).cast("date").as("date_debut_validite"),
          fin.map(f => lit(f)).getOrElse(lit(null)).cast("date")
            .as("date_fin_validite"))
      val dim0 = dimSlice(k % 10 < 7, col("c_mktsegment"), 1, 0,
          "2020-01-01", Some("2022-01-01"))
        .unionByName(dimSlice(k % 10 < 7, lit("SEG_V2"), 2, 1,
          "2022-01-01", None))
        .unionByName(dimSlice(k % 10 === 7, col("c_mktsegment"), 1, 0,
          "2020-01-01", Some("2021-06-01")))
      def ch(m: Int, key: org.apache.spark.sql.Column,
          seg: org.apache.spark.sql.Column, seq: Int, op: String,
          eff: String) =
        cust.filter(k % 10 === m).select(key.as("c_custkey"),
          col("c_name"), seg.as("c_mktsegment"), lit(seq).as("seq"),
          lit(op).as("op"), lit(eff).as("eff"))
      val feed = ch(0, k, lit("SEG_MID"), 1, "U", "2021-01-01")
        .unionByName(ch(1, k, lit("SEG_V2"), 2, "U", "2023-01-01"))
        .unionByName(ch(2, k, col("c_mktsegment"), 3, "D", "2023-06-01"))
        .unionByName(ch(7, k, lit("SEG_BACK"), 4, "I", "2023-01-01"))
        .unionByName(ch(3, k, lit("SEG_SAME"), 5, "U", "2022-01-01"))
        .unionByName(ch(4, k, lit("SEG_A"), 6, "U", "2024-01-01"))
        .unionByName(ch(4, k, lit("SEG_B"), 7, "U", "2024-01-01"))
        .unionByName(ch(5, k, col("c_mktsegment"), 8, "D", "2021-03-15"))
        .unionByName(ch(8, k + 1000000, lit("SEG_NEW"), 9, "I", "2024-05-01"))
        .unionByName(ch(9, k + 2000000, col("c_mktsegment"), 10, "D",
          "2024-01-01"))
      Scd.scd2CdcEventTime(dim0, feed, Seq("c_custkey"),
          Seq("c_mktsegment"), "seq", "op", "eff")
        .groupBy(col("c_mktsegment"),
          col("est_actif").cast("int").as("est_actif"),
          col("version").cast("int").as("version"))
        .agg(count(lit(1)).as("n"),
          min(col("date_debut_validite").cast("string")).as("min_debut"),
          coalesce(max(col("date_fin_validite").cast("string")),
            lit("open")).as("max_fin"))
        .orderBy("c_mktsegment", "est_actif", "version")
    },

    // 1996), so the same customer contributes to different segments in
    // different years. Equi join on the key; the interval predicate is a
    // residual, never a range-join shuffle. Validity ends are EXCLUSIVE
    // (fin = successor's debut, exactly what Scd.scd2 writes) so a
    // boundary-dated fact matches exactly one version.
    Q("m_scd2_pit",
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment, 1 AS version,
        |         DATE '1990-01-01' AS date_debut_validite,
        |         DATE '1996-01-01' AS date_fin_validite
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |         CASE WHEN c_acctbal > 5000 THEN 'PREMIUM' ELSE c_mktsegment END,
        |         2, DATE '1996-01-01', CAST(NULL AS DATE)
        |  FROM customer)
        |SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |       d.c_mktsegment AS segment,
        |       CAST(max(d.version) AS INT) AS version,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o JOIN dim d ON o.o_custkey = d.c_custkey
        | AND CAST(o.o_orderdate AS DATE) >= d.date_debut_validite
        | AND (d.date_fin_validite IS NULL
        |      OR CAST(o.o_orderdate AS DATE) < d.date_fin_validite)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val cust = customer(s, d)
      val v1 = cust.select(col("c_custkey"), col("c_mktsegment"),
        lit(1).as("version"),
        lit("1990-01-01").cast("date").as("date_debut_validite"),
        lit("1996-01-01").cast("date").as("date_fin_validite"))
      val v2 = cust.select(col("c_custkey"),
        when(col("c_acctbal") > 5000, "PREMIUM").otherwise(col("c_mktsegment"))
          .as("c_mktsegment"),
        lit(2).as("version"),
        lit("1996-01-01").cast("date").as("date_debut_validite"),
        lit(null).cast("date").as("date_fin_validite"))
      val fact = Tables.load(s, d, "orders")
        .select(col("o_orderdate"), col("o_custkey").as("c_custkey"))
      Scd.pitJoin(fact, v1.unionByName(v2), Seq("c_custkey"), "o_orderdate")
        .groupBy(year(col("o_orderdate")).as("o_year"),
          col("c_mktsegment").as("segment"))
        .agg(max("version").cast("int").as("version"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_year", "segment")
    },

    // Temporal snapshot diff: the same SCD2 dimension read as-of TWO
    // dates, joined on the business key, keeping keys whose tracked
    // attribute changed — the "what moved between last quarter and now"
    // audit. Each snapshot is a pure validity-interval filter (partition-
    // prunable when the dim is written partitioned by est_actif/debut);
    // the join is key-to-key between two same-sized snapshots, and the
    // transition matrix groups it down to segments².
    Q("m_scd2_snapshot_diff",
      """WITH dim AS (
        |  SELECT c_custkey, c_mktsegment, 1 AS version,
        |         DATE '1990-01-01' AS date_debut_validite,
        |         DATE '1996-01-01' AS date_fin_validite
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey,
        |         CASE WHEN c_acctbal > 5000 THEN 'PREMIUM' ELSE c_mktsegment END,
        |         2, DATE '1996-01-01', CAST(NULL AS DATE)
        |  FROM customer),
        |s1 AS (SELECT c_custkey, c_mktsegment AS seg_before FROM dim
        |       WHERE date_debut_validite <= DATE '1995-06-01'
        |         AND (date_fin_validite IS NULL
        |              OR date_fin_validite > DATE '1995-06-01')),
        |s2 AS (SELECT c_custkey, c_mktsegment AS seg_after FROM dim
        |       WHERE date_debut_validite <= DATE '1997-06-01'
        |         AND (date_fin_validite IS NULL
        |              OR date_fin_validite > DATE '1997-06-01'))
        |SELECT seg_before, seg_after, CAST(count(*) AS BIGINT) AS n_customers
        |FROM s1 JOIN s2 USING (c_custkey)
        |WHERE seg_before <> seg_after
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val cust = customer(s, d)
      val v1 = cust.select(col("c_custkey"), col("c_mktsegment"),
        lit("1990-01-01").cast("date").as("date_debut_validite"),
        lit("1996-01-01").cast("date").as("date_fin_validite"))
      val v2 = cust.select(col("c_custkey"),
        when(col("c_acctbal") > 5000, "PREMIUM").otherwise(col("c_mktsegment"))
          .as("c_mktsegment"),
        lit("1996-01-01").cast("date").as("date_debut_validite"),
        lit(null).cast("date").as("date_fin_validite"))
      val dim = v1.unionByName(v2)
      val before = Scd.asOf(dim, "1995-06-01")
        .select(col("c_custkey"), col("c_mktsegment").as("seg_before"))
      val after = Scd.asOf(dim, "1997-06-01")
        .select(col("c_custkey"), col("c_mktsegment").as("seg_after"))
      before.join(after, "c_custkey")
        .filter(col("seg_before") =!= col("seg_after"))
        .groupBy("seg_before", "seg_after")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("seg_before", "seg_after")
    },
  )
}
