package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Schema-drift tripwire (the round-10 lesson): every registered query must
  * ANALYZE against the real driver-generated parquet schemas. Round 10
  * shipped a regression where the events `ts` column changed physical type
  * (INT64-nanos → TIMESTAMP(MICROS)/NTZ) and five queries failed at plan
  * time — nothing cheap exercised analysis against the on-disk schemas.
  *
  * This spec builds each query's DataFrame (plan construction forces
  * analysis — resolution, type-checking, implicit casts) WITHOUT executing
  * it, so the whole 90+-query sweep costs seconds. Any future reader-schema
  * drift (data regeneration, parquet-jar upgrade, reader-conf change) fails
  * here first, per-query, with the AnalysisException message.
  */
class SchemaDriftSpec extends SparkSpec {

  test("every registered query analyzes against the sf0.001 parquet schemas") {
    Tables.loadAll(spark, sfDir)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          // .schema forces analysis of the logical plan; no job runs.
          fn(spark, sfDir).schema
          None
        } catch {
          case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries fail analysis:\n${failures.mkString("\n")}")
  }

  test("normalizeTs disambiguates INT64 units by magnitude") {
    val s = spark
    import s.implicits._
    // the same instant (2023-11-14T22:13:20Z = epoch 1.7e9 s) written as
    // nanos / micros / millis / seconds — all four must normalize to the
    // identical TIMESTAMP (the round-10 failure mode was a loader
    // assuming units a writer had changed)
    val t = 1700000000L
    val units = Seq(t * 1000000000L, t * 1000000L, t * 1000L, t)
    val out = units.map { v =>
      Tables.normalizeTs(Seq((1L, v)).toDF("id", "ts"), "ts")
        .select(org.apache.spark.sql.functions.col("ts").cast("string"))
        .head().getString(0)
    }
    assert(out.distinct.size == 1, s"units normalized differently: $out")
    assert(out.head == "2023-11-14 22:13:20")
  }

  test("normalizeTs fails loudly outside the 1973-2096 validity window") {
    val s = spark
    import s.implicits._
    // values the magnitude heuristic CANNOT disambiguate: a 1970-01-02
    // epoch-millis (reads as seconds → 1972? no: 86400000 ms -> 'seconds'
    // branch is wrong either way) and a far-future seconds value — both
    // interpret outside 1973-2096 and must raise, not return 1000x-off
    // timestamps
    for (bad <- Seq(86400000L /* 1970-01-02 in millis */ ,
        5000000000L /* 2128 in seconds */ , 0L, -1L)) {
      val e = intercept[Exception] {
        Tables.normalizeTs(Seq((1L, bad)).toDF("id", "ts"), "ts")
          .select(org.apache.spark.sql.functions.col("ts").cast("string"))
          .head()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("normalizeTs")),
        s"value $bad should raise the normalizeTs guard, got: $e")
    }
    // values inside the window (and above each unit's classification
    // threshold) still pass; note 1973-01..03 micros/nanos sit BELOW
    // their thresholds — genuinely ambiguous, so they raise by design
    val ok = Seq(100000000000000000L /* 1e17 nanos = 1973-03-03 */ ,
      1700000000000000L /* 2023 micros */ ,
      3975868800L /* 2096-01-01 seconds */)
    ok.foreach { v =>
      Tables.normalizeTs(Seq((1L, v)).toDF("id", "ts"), "ts")
        .select(org.apache.spark.sql.functions.col("ts")).head()
    }
  }

  test("every loaded table has the column types the loaders promise") {
    val t = Tables.loadAll(spark, sfDir)
    import org.apache.spark.sql.types._
    // The one normalization contract: events.ts is session-tz TIMESTAMP
    // whatever the parquet writer produced (nanos-long, NTZ micros, ...).
    assert(t("events").schema("ts").dataType == TimestampType,
      s"events.ts normalized to ${t("events").schema("ts").dataType}, expected TIMESTAMP")
    // Embeddings vector column stays an array (ANN family depends on it).
    assert(t("embeddings").schema("embedding").dataType.isInstanceOf[ArrayType])
    // Documents text column is a string (whole text family depends on it).
    assert(t("documents").schema("text").dataType == StringType)
  }
}
