package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions.col

/** Round 7 shipped green dashboards over a broken gate because the
  * testdata's `events.ts` parquet annotation silently changed from
  * TIMESTAMP(NANOS, adjustedToUTC) to TIMESTAMP(MICROS, no UTC adjustment)
  * — which Spark reads as TIMESTAMP_NTZ, breaking numeric casts and
  * `withWatermark` across the query surface. This spec pins the whole
  * declared surface against BOTH annotations the generator has produced,
  * so the next annotation flip fails loudly in CI instead of silently
  * shrinking the correctness gate.
  *
  * Method: two copies of sf0.001 with `events` rewritten under each
  * annotation (Spark can write LTZ and NTZ; the retired NANOS shape is
  * covered by the LongType branch unit-tested below). Every query must
  * ANALYZE under both (DataFrame construction is eager analysis); the
  * timestamp-sensitive `st_*` family must fully EXECUTE under both with
  * identical results.
  */
class TimestampRobustnessSpec extends SparkSpec {

  private lazy val variantDirs: Map[String, String] = {
    val base = Files.createTempDirectory("ts-robust").toString
    val events = graft.core.Tables.load(spark, sf001, "events")
    assert(events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      "Tables.load must normalize events.ts to TimestampType")
    Map(
      "ltz" -> events,
      "ntz" -> events.withColumn("ts", col("ts").cast("timestamp_ntz"))
    ).map { case (tag, df) =>
      val dir = s"$base/$tag"
      Files.createDirectories(Paths.get(dir))
      graft.core.Tables.names.filterNot(_ == "events").foreach { n =>
        Files.copy(Paths.get(s"$sf001/$n.parquet"),
          Paths.get(s"$dir/$n.parquet"), StandardCopyOption.REPLACE_EXISTING)
      }
      df.coalesce(1).write.parquet(s"$dir/events.parquet")
      tag -> dir
    }
  }

  test("written variants actually carry the two distinct annotations") {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = variantDirs.map { case (tag, dir) =>
      tag -> spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    }
    assert(raw("ltz") == TimestampType, s"ltz variant read back as ${raw("ltz")}")
    assert(raw("ntz") == TimestampNTZType, s"ntz variant read back as ${raw("ntz")}")
  }

  test("Tables.load normalizes every annotation to TimestampType") {
    variantDirs.foreach { case (tag, dir) =>
      val dt = graft.core.Tables.load(spark, dir, "events").schema("ts").dataType
      assert(dt == org.apache.spark.sql.types.TimestampType,
        s"variant $tag loaded as $dt")
    }
  }

  test("normalizeEventTs converts legacy nanos-as-long to TimestampType") {
    import spark.implicits._
    // 2024-01-01T00:00:00.123456789Z in nanos — micros must truncate, not round
    val df = Seq(1704067200123456789L).toDF("ts")
    val out = graft.core.Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    val micros = out.select(org.apache.spark.sql.functions
      .unix_micros(col("ts"))).head.getLong(0)
    assert(micros == 1704067200123456L)
  }

  test("every declared query analyzes under both annotations") {
    variantDirs.foreach { case (tag, dir) =>
      val failures = SparkEntry.queries.flatMap { case (name, fn) =>
        // DataFrame construction runs the analyzer eagerly — an
        // unresolved cast or watermark on NTZ throws right here
        try { fn(spark, dir); None }
        catch { case e: Throwable => Some(s"[$tag] $name: ${e.getMessage}") }
      }
      assert(failures.isEmpty, failures.mkString("\n"))
    }
  }

  test("every events-touching query executes identically under both") {
    // detect events consumers from the analyzed plan (scan paths), so a
    // new query over events is covered automatically, not by a hand list
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val touching = SparkEntry.queries.filter { case (_, fn) =>
      fn(spark, variantDirs("ltz")).queryExecution.analyzed.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.mkString(",")
          case _ => ""
        }
      }.exists(_.contains("events.parquet"))
    }
    assert(touching.size >= 15, s"expected many events consumers, got ${touching.keys}")
    touching.foreach { case (name, fn) =>
      val results = variantDirs.map { case (tag, dir) =>
        tag -> fn(spark, dir).collect().map(_.toString).sorted.toSeq
      }
      assert(results("ltz").nonEmpty, s"$name returned no rows")
      assert(results("ltz") == results("ntz"),
        s"$name differs between LTZ and NTZ inputs")
    }
  }
}
