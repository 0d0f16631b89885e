package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EventStreamSpec extends SparkSpec {

  test("streaming hourly aggregate equals the batch aggregate (AvailableNow parity)") {
    val checkpoint = Files.createTempDirectory("ckpt").toString
    val stream = EventStream.readEvents(spark, sfDir)
    EventStream.runToMemory(EventStream.hourlyAgg(stream), "stream_hourly", checkpoint)

    val batch = EventStream.hourlyAggBatch(
      graft.queries.Tables.load(spark, sfDir, "events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = spark.table("stream_hourly")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    // Append-mode only emits windows the watermark has CLOSED; with
    // AvailableNow the final watermark still holds back the last 2h of
    // windows, so streamed ⊆ batch and covers everything older.
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed results not in batch: ${(streamed -- batch).take(3)}")
    val batchHours = batch.map(_._1.getTime)
    val streamedHours = streamed.map(_._1.getTime)
    // 2h watermark + 1h window + one-batch watermark propagation lag
    assert(batchHours.max - streamedHours.max <= 4 * 3600 * 1000L)
  }

  test("session windows merge gapped events and match the batch twin") {
    val checkpoint = Files.createTempDirectory("ckpt_sess").toString
    val stream = EventStream.readEvents(spark, sfDir)
    EventStream.runToMemory(EventStream.userSessions(stream), "stream_sessions", checkpoint)

    val batch = EventStream.userSessionsBatch(
      graft.queries.Tables.load(spark, sfDir, "events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    val streamed = spark.table("stream_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // append mode: only watermark-closed sessions emit; all of them must
    // agree with the batch sessionization exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed sessions not in batch: ${(streamed -- batch).take(3)}")
    // sessions are genuine merges: at least one session has >1 event and
    // every session spans end >= start
    assert(batch.exists(_._4 > 1))
    batch.foreach { case (_, s, e, _, _) => assert(!e.before(s)) }
  }

  test("stream-stream attribution join matches the batch twin") {
    val checkpoint = Files.createTempDirectory("ckpt_attr").toString
    val stream = EventStream.readEvents(spark, sfDir)
    EventStream.runToMemory(EventStream.attributionJoin(stream), "stream_attr", checkpoint)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))
    val batch = EventStream.attributionJoinBatch(
      graft.queries.Tables.load(spark, sfDir, "events")).collect().map(key).toSet
    val streamed = spark.table("stream_attr").collect().map(key).toSet
    // append mode: pairs emit once the watermark clears them; everything
    // emitted must agree with the batch join exactly
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed pairs not in batch: ${(streamed -- batch).take(3)}")
    // the interval bound is real: every pair's click precedes its purchase
    // by less than an hour
    batch.foreach { case (_, _, _, pTs, cTs) =>
      assert(cTs.before(pTs) && pTs.getTime - cTs.getTime <= 3600 * 1000L)
    }
  }

  test("mapGroupsWithState accumulates running per-type totals") {
    val spark0 = spark
    import spark0.implicits._
    val events = graft.queries.Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .as[EventStream.EventRow]
    val updates = EventStream.runningTotals(events).collect()
    val expected = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total"), max("value").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(updates.length == expected.size)
    updates.foreach { u =>
      val (n, total, mx) = expected(u.event_type)
      assert(u.n == n)
      assert(math.abs(u.total - total) < 1e-6)
      assert(u.max_value == mx)
    }
  }

  test("streaming exact-dedup drops duplicate content within the watermark") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    input.addData(
      (1L, "alpha text", ts(0)), (2L, "beta text", ts(1)),
      (3L, "alpha text", ts(2)), // dup of 1 within horizon
      (4L, "gamma text", ts(3)), (5L, "beta text", ts(4))) // dup of 2
    val deduped = EventStream.dedupStream(
      input.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts")
    val ckpt = Files.createTempDirectory("ckpt3").toString
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").collect()
    assert(out.length == 3) // alpha, beta, gamma — dups dropped
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L, 4L))
  }

  test("streaming incremental dedup emits exactly q48's verdicts on the same slices") {
    val docs = graft.queries.Tables.load(spark, sfDir, "documents")
    // q48's deterministic hash-mod split: <100 = incoming, >=100 = corpus
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 1000
    val corpus = docs.filter(bucket >= 100).select("doc_id", "text")
    // land the incoming slice as several files and stream them one per
    // trigger, so the parity below covers genuine multi-epoch increments
    val inDir = Files.createTempDirectory("ingest_docs").toString
    docs.filter(bucket < 100).select("doc_id", "text")
      .repartition(3).write.mode("overwrite").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3)))
    val got = collection.mutable.ArrayBuffer.empty[(Long, String, Option[Any], Option[Any])]
    val epochs = new java.util.concurrent.atomic.AtomicInteger(0)
    val ckpt = Files.createTempDirectory("ckpt_incr").toString
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    EventStream.runIncrementalDedup(stream, corpus, "doc_id", "text", ckpt) {
      (verdicts, _) =>
        got.synchronized { got ++= verdicts.collect().map(key) }
        epochs.incrementAndGet()
        ()
    }
    assert(epochs.get() >= 2, "expected multiple micro-batches")
    // per-epoch batch-side derivations are unpersisted at epoch end: only
    // the corpus-side index (<=4 cached nodes: shingle sets, raw minhash
    // signatures, band signatures, band rows) may remain after the run —
    // without the cleanup this grows by ~4 entries PER epoch, so with
    // epochs >= 2 a leak would push the delta past this bound
    val cachedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(cachedAfter - cachedBefore <= 4,
      s"batch-side cache entries leaked across epochs: $cachedBefore -> $cachedAfter")
    val want = graft.queries.TextDedup.q48IncrementalDedup(spark, sfDir)
      .collect().map(key).toSeq
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1))
  }

  test("foreachBatch parquet sink writes closed windows") {
    val checkpoint = Files.createTempDirectory("ckpt2").toString
    val out = Files.createTempDirectory("stream_out").toString + "/agg"
    val stream = EventStream.readEvents(spark, sfDir)
    EventStream.runToParquet(EventStream.hourlyAgg(stream), out, checkpoint)
    val rows = spark.read.parquet(out)
    assert(rows.count() > 0)
    assert(rows.columns.toSeq == Seq("hour", "event_type", "n", "total"))
  }
}
