package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming ingest prep: a micro-batch of raw documents is quality-
  * filtered, PII-scrubbed, and deduped against the corpus index; only
  * clean NOVEL documents reach the sink, already scrubbed. */
class IngestPrepSpec extends SparkSpec {

  private val corpusA = "the quick brown fox jumps over a lazy dog while " +
    "the calm river flows under an old stone bridge near town square today"
  private val corpusB = "a gentle breeze moves through the tall green " +
    "trees as birds sing soft songs above the quiet meadow during early " +
    "morning light"
  private val newGood = "every bright star in the night sky tells a long " +
    "story about distant worlds that spin slowly through dark space " +
    "beyond our reach"
  private val newPii = "many small boats drift down the wide blue river " +
    "while a few people watch from warm sand banks under bright summer " +
    "sun email bob.smith@mail.example.org"

  test("ingest admits only clean novel docs, scrubbed, rejecting dups and junk") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Seq((1L, corpusA), (2L, corpusB)).toDF("doc_id", "text")
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    input.addData(
      (9001L, corpusA),                                       // exact dup
      (9002L, corpusA + " contact jane@corp.example.com now"), // near dup once scrubbed
      (9003L, newGood),                                        // admit as-is
      (9004L, "zz zz"),                                        // quality reject
      (9005L, newPii),                                         // admit, scrubbed
      (9006L, newGood))                        // within-batch dup of 9003

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ckpt = Files.createTempDirectory("ckpt-ingest").toString
    EventStream.runIngestPrep(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text", ckpt) {
      (admitted, _) =>
        got ++= admitted.collect().map(r =>
          r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    }

    val byId = got.toMap
    // 9006 (identical to 9003, same batch) collapses to the min-id copy
    assert(byId.keySet == Set(9003L, 9005L),
      s"admitted ${byId.keySet}; expected only the clean novel docs")
    assert(byId(9003L) == newGood, "clean doc must pass through unmodified")
    assert(byId(9005L).contains("<EMAIL>") && !byId(9005L).contains("@"),
      s"PII survived ingest: ${byId(9005L)}")
  }

  test("ingest with a pre-fitted importance model admits only target-leaning docs") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Seq((1L, corpusA), (2L, corpusB)).toDF("doc_id", "text")
    // target register = the newGood vocabulary; raw pool = the corpus.
    // A doc written in corpus words scores raw-leaning; one in target
    // words scores target-leaning.
    val target = Seq((100L, newGood)).toDF("doc_id", "text")
    val model = graft.queries.Curation.fitImportanceModel(target, corpus, "text")
    // needs >= 2 distinct stopwords ("in", "the", "a") to clear the
    // quality rules — the gate under test here is the importance model
    val targetLike = "every distant star in the dark night sky tells a " +
      "long story about worlds that spin slowly beyond our reach"
    val rawLike = "the quick brown dog jumps over a lazy fox while the " +
      "calm river flows under an old stone bridge near the quiet meadow"

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    input.addData((9101L, targetLike), (9102L, rawLike))
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    EventStream.runIngestPrep(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      Files.createTempDirectory("ckpt-ingest-imp").toString,
      importanceModel = Some(model)) {
      (admitted, _) => got ++= admitted.collect().map(_.getAs[Long]("doc_id"))
    }
    assert(got.toSet == Set(9101L),
      s"admitted $got; expected only the target-leaning doc")
    // the same stream WITHOUT the model admits both (both are clean+novel)
    val input2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    input2.addData((9101L, targetLike), (9102L, rawLike))
    val got2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    EventStream.runIngestPrep(
      input2.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      Files.createTempDirectory("ckpt-ingest-imp2").toString) {
      (admitted, _) => got2 ++= admitted.collect().map(_.getAs[Long]("doc_id"))
    }
    assert(got2.toSet == Set(9101L, 9102L),
      s"control run admitted $got2; the gate must be the model, not dedup")
  }

  test("ingest with a pre-fitted vocab rewrites admitted docs over the keep-list") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Seq((1L, corpusA), (2L, corpusB)).toDF("doc_id", "text")
    // fit ONCE on the corpus — the serving contract
    val keep = graft.queries.TextOps.fitVocabulary(corpus, "doc_id", "text", 12)
    val keepSet = keep.collect().map(_.getString(0)).toSet
    assert(keepSet.size == 12)

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    input.addData((9003L, newGood), (9001L, corpusA))

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ckpt = Files.createTempDirectory("ckpt-ingest-vocab").toString
    EventStream.runIngestPrep(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text", ckpt,
      vocab = Some(keep)) { (admitted, _) =>
      got ++= admitted.collect().map(r =>
        r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    }

    val byId = got.toMap
    assert(byId.keySet == Set(9003L), s"admitted ${byId.keySet}")
    val toks = byId(9003L).split(" ")
    // position-exact: same token count, OOV replaced, in-vocab kept
    assert(toks.length == newGood.split(" ").length)
    assert(toks.forall(t => t == "<UNK>" || keepSet(t)),
      s"non-keep token survived: ${byId(9003L)}")
    assert(toks.zip(newGood.split(" ")).forall {
      case (out, orig) => out == orig || out == "<UNK>"
    }, "rewrite moved tokens out of position")
    assert(toks.contains("<UNK>"), "held-out doc should contain OOV tokens")
  }

  test("vector ingest admits exactly the batch-mode 'new' vectors") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 7 =!= 3)
      .select(col("vec_id"), col("embedding"))
    val batchDf = emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"))
    val batchRows = batchDf.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    input.addData(batchRows.toIndexedSeq: _*)

    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-vec").toString
    EventStream.runVectorIngest(
      input.toDF().toDF("vec_id", "embedding"), corpus,
      "vec_id", "embedding", ckpt, minCos = 0.35) { (admitted, _) =>
      got ++= admitted.collect().map(_.getAs[Long]("vec_id"))
    }

    val want = graft.queries.VectorOps.semanticIncremental(
      corpus, batchDf, "vec_id", "embedding", 0.35)
      .filter(col("verdict") === "new")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got.toSet == want, s"streaming admitted ${got.toSet}; batch says $want")
    // the τ is set so BOTH outcomes occur — the probe actually rejected dups
    assert(want.nonEmpty && want.size < batchRows.length,
      s"degenerate split: ${want.size} of ${batchRows.length} admitted")
  }

  test("auto-knob vector ingest routes to the cell-sharded probe past DeepenMinBits") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.queries.VectorOps

    // a corpus PAST the deepening boundary, so both the streaming ingest
    // and the batch comparator route to the cell-sharded probe
    val n = 140000L
    assert(VectorOps.autoBitsPer(n) >= VectorOps.DeepenMinBits)
    val corpus = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), " +
        "i -> CAST(pmod(hash(id * 67 + i), 13) - 6 AS FLOAT))")
        .as("embedding"))
    // batch: re-id'd EXACT twins of corpus vectors (must be rejected —
    // identical vectors co-assign under any centroid set) + novel vectors
    val twins = corpus.filter(col("vec_id") % 7000 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val novel = spark.range(20).select((col("id") + 2000000L).as("vec_id"),
      expr("transform(sequence(0, 63), " +
        "i -> CAST(pmod(hash((id + 999) * 101 + i * 31), 9) - 4 AS FLOAT))")
        .as("embedding"))
    val batchDf = twins.unionAll(novel)
    val batchRows = batchDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    input.addData(batchRows.toIndexedSeq: _*)

    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-vec-cells").toString
    EventStream.runVectorIngest(
      input.toDF().toDF("vec_id", "embedding"), corpus,
      "vec_id", "embedding", ckpt, minCos = 0.999) { (admitted, _) =>
      got ++= admitted.collect().map(_.getAs[Long]("vec_id"))
    }

    // every identical twin is rejected by the cell-sharded probe
    val twinIds = twins.collect().map(_.getLong(0)).toSet
    assert(got.toSet.intersect(twinIds).isEmpty,
      s"identical twins admitted: ${got.toSet.intersect(twinIds)}")
    assert(got.nonEmpty, "novel vectors should be admitted")
    // and the stream admits exactly what batch-mode (also routed) admits
    val want = VectorOps.semanticIncremental(
      corpus, batchDf, "vec_id", "embedding", 0.999)
      .filter(col("verdict") === "new")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got.toSet == want, s"streaming admitted ${got.toSet}; batch says $want")
  }

  test("vector ingest off a persisted index survives a session restart bit-identically") {
    import graft.queries.{Tables, VectorIndex, VectorOps}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") % 7 =!= 3)
      .select(col("vec_id"), col("embedding"))
    val batchDf = emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"))

    // BUILDING session: persist the index and compute the in-session
    // expected admissions (the cell-sharded probe the index serves)
    val dir = java.nio.file.Files.createTempDirectory("vec_idx_stream").toString
    VectorIndex.build(corpus, "vec_id", "embedding", dir, minCos = 0.35)
    val want = VectorOps.semanticIncrementalCellsIndexed(
      VectorOps.index(corpus, "vec_id", "embedding"),
      VectorOps.index(batchDf, "vec_id", "embedding"), 0.35)
      .filter(col("verdict") === "new")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val batchRows = batchDf.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))

    // "restart": catalog forgets the tables; a fresh session re-attaches
    Seq("vec_idx_meta", "vec_idx_cents", "vec_idx_pqbooks", "vec_idx_vecs",
      "vec_idx_cells", "vec_idx_bands", "vec_idx_pqcodes")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val fresh = spark.newSession()
    assert(!fresh.catalog.tableExists("vec_idx_bands"))
    VectorIndex.attach(fresh, dir)

    import fresh.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = fresh.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    input.addData(batchRows.toIndexedSeq: _*)

    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-vec-idx").toString
    EventStream.runVectorIngestIndexed(
      input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", ckpt) { (admitted, _) =>
      got ++= admitted.collect().map(_.getAs[Long]("vec_id"))
    }

    assert(got.toSet == want,
      s"restarted serving admitted ${got.toSet}; building session says $want")
    assert(want.nonEmpty && want.size < batchRows.length,
      s"degenerate split: ${want.size} of ${batchRows.length} admitted")
  }

  test("appendAdmitted dedups later epochs against earlier admissions") {
    import graft.queries.VectorIndex

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 100)
      .select(col("vec_id"), col("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("vec_idx_xepoch").toString
    val prefix = "vec_idx_xepoch"
    VectorIndex.build(corpus, "vec_id", "embedding", dir, minCos = 0.999,
      prefix = prefix)

    // epoch 1: X (re-idded corpus-excluded vector — novel at 0.999);
    // epoch 2: Y, an exact twin of X under a different id
    val x = emb.filter(col("vec_id") === 50)
      .select(lit(700001L).as("vec_id"), col("embedding"))
    val y = emb.filter(col("vec_id") === 50)
      .select(lit(700002L).as("vec_id"), col("embedding"))
    // two EPOCHS as two stream runs over ONE checkpoint (AvailableNow
    // snapshots everything already present into one batch, so in-run
    // multi-epoch ordering is not guaranteed; a stopped-and-resumed
    // stream is, and is also the realistic serving shape): run 1 sees X,
    // run 2 resumes the checkpoint and sees only the newly-landed Y
    val inDir = java.nio.file.Files.createTempDirectory("xepoch-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-xepoch").toString
    def stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
      .parquet(inDir)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    def runEpoch(n: Int): Unit =
      EventStream.runVectorIngestIndexed(stream, "vec_id", "embedding",
        ckpt, prefix, appendAdmitted = true) { (adm, _) =>
        admitted ++= adm.collect().map(r => n -> r.getAs[Long]("vec_id"))
      }

    x.coalesce(1).write.mode("append").parquet(inDir)
    runEpoch(1)
    y.coalesce(1).write.mode("append").parquet(inDir)
    runEpoch(2)
    assert(admitted.toSet == Set(1 -> 700001L),
      s"cross-epoch dedup failed: admitted ${admitted.toSeq} (Y is X's twin)")

    // and the epoch-1 admission is durably in the index: a later batch
    // session (no stream) still sees it
    val z = emb.filter(col("vec_id") === 50)
      .select(lit(700003L).as("vec_id"), col("embedding"))
    val v = VectorIndex.incrementalDedup(z, "vec_id", "embedding", prefix)
      .collect()
    assert(v.length == 1 && v(0).getAs[String]("verdict") == "near_dup" &&
      v(0).getAs[Long]("partner_id") == 700001L, s"got ${v.toSeq}")
  }

  test("text appendAdmitted dedups later epochs against earlier admissions") {
    import graft.queries.DedupIndex

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") >= 100)
    val dir = java.nio.file.Files.createTempDirectory("didx_xepoch").toString
    val prefix = "dedup_idx_xepoch"
    DedupIndex.build(corpus, "doc_id", "text", dir, prefix = prefix)

    // epoch 1: X (a corpus-excluded doc — novel); epoch 2: Y, an exact
    // twin of X under a different id — same two-run/one-checkpoint shape
    // as the vector twin above
    val x = docs.filter(col("doc_id") === 50)
      .select(lit(700001L).as("doc_id"), col("text"))
    val y = docs.filter(col("doc_id") === 50)
      .select(lit(700002L).as("doc_id"), col("text"))
    val inDir = java.nio.file.Files.createTempDirectory("txepoch-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-txepoch").toString
    def stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
      .parquet(inDir)
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
    def runEpoch(n: Int): Unit =
      EventStream.runIncrementalDedupIndexed(stream, prefix, "doc_id",
        "text", ckpt, appendAdmitted = true) { (vs, _) =>
        verdicts ++= vs.collect().map(r =>
          (n, r.getAs[Long]("doc_id"), r.getAs[String]("verdict")))
      }

    x.coalesce(1).write.mode("append").parquet(inDir)
    runEpoch(1)
    y.coalesce(1).write.mode("append").parquet(inDir)
    runEpoch(2)
    assert(verdicts.toSet == Set((1, 700001L, "new"),
      (2, 700002L, "exact_dup")),
      s"cross-epoch text dedup failed: ${verdicts.toSeq} (Y is X's twin)")

    // and the epoch-1 admission is durably in the index: a later batch
    // session (no stream) still sees it as the exact partner
    val z = docs.filter(col("doc_id") === 50)
      .select(lit(700003L).as("doc_id"), col("text"))
    val v = DedupIndex.incrementalDedup(z, "doc_id", "text", prefix)
      .collect()
    assert(v.length == 1 && v(0).getAs[String]("verdict") == "exact_dup" &&
      v(0).getAs[Long]("partner_id") == 700001L, s"got ${v.toSeq}")

    // the append must be COMPLETE: the bands/shingles rows of the
    // admitted doc exist, not just its hash row (regression pin for the
    // mid-append self-invalidation bug — the first table write's refresh
    // used to empty the later writes' recomputed source, silently losing
    // near-dup serving of appended content)
    assert(spark.table(s"${prefix}_bands")
      .filter(col("doc_id") === 700001L).count() > 0,
      "appended doc missing from the band index")
    assert(spark.table(s"${prefix}_shingles")
      .filter(col("doc_id") === 700001L).count() == 1,
      "appended doc missing from the shingle index")
  }

  test("joint text+vector ingest admits only rows new on BOTH indexes, cross-epoch") {
    import graft.queries.{DedupIndex, VectorIndex}

    val docsT = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val embsT = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val joined = docsT.join(embsT, docsT("doc_id") === embsT("vec_id"))
      .select(docsT("doc_id"), col("text"), col("embedding"))
    val corpus = joined.filter(col("doc_id") >= 100)
    val tdir = java.nio.file.Files.createTempDirectory("joint_txt").toString
    val vdir = java.nio.file.Files.createTempDirectory("joint_vec").toString
    DedupIndex.build(corpus, "doc_id", "text", tdir, prefix = "joint_txt")
    VectorIndex.build(corpus, "doc_id", "embedding", vdir, minCos = 0.999,
      prefix = "joint_vec")

    // fixture selection is DYNAMIC (documents/embeddings carry natural
    // near-dups): pick excluded ids that are new on both axes, and one
    // corpus row to copy for the dup cases
    val excluded = joined.filter(col("doc_id") < 100)
    val textNew = DedupIndex.incrementalDedup(excluded, "doc_id", "text",
      "joint_txt").filter(col("verdict") === "new")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val vecNew = VectorIndex.incrementalDedup(excluded, "doc_id",
      "embedding", "joint_vec").filter(col("verdict") === "new")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val bothNew = (textNew & vecNew).toSeq.sorted
    assert(bothNew.size >= 3, s"fixture degenerate: bothNew=$bothNew")
    val Seq(nb, nc, nd) = bothNew.take(3)
    val corpusPick = corpus.select(min("doc_id")).head().getLong(0)
    def rowOf(src: org.apache.spark.sql.DataFrame, srcId: Long) =
      src.filter(col("doc_id") === srcId)

    // four admission cases in one epoch:
    //   700001 both-new             -> admitted
    //   700002 both-dup (corpus copy) -> rejected by both
    //   700003 new text, dup embedding -> rejected by the vector side
    //   700004 dup text, new embedding -> rejected by the text side
    val b1 = rowOf(excluded, nb)
      .select(lit(700001L).as("doc_id"), col("text"), col("embedding"))
    val b2 = rowOf(corpus, corpusPick)
      .select(lit(700002L).as("doc_id"), col("text"), col("embedding"))
    val b3 = rowOf(excluded, nc).select(col("text"))
      .crossJoin(rowOf(corpus, corpusPick).select(col("embedding")))
      .select(lit(700003L).as("doc_id"), col("text"), col("embedding"))
    val b4 = rowOf(corpus, corpusPick).select(col("text"))
      .crossJoin(rowOf(excluded, nd).select(col("embedding")))
      .select(lit(700004L).as("doc_id"), col("text"), col("embedding"))
    val epoch1 = b1.unionAll(b2).unionAll(b3).unionAll(b4)

    val inDir = java.nio.file.Files.createTempDirectory("joint-in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-joint").toString
    def stream = spark.readStream.schema(epoch1.schema).parquet(inDir)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, String, String, Boolean)]
    def runEpoch(n: Int): Unit =
      EventStream.runJointIngestIndexed(stream, "doc_id", "text",
        "embedding", ckpt, "joint_txt", "joint_vec",
        appendAdmitted = true) { (joint, _) =>
        got ++= joint.collect().map(r => (n, r.getAs[Long]("doc_id"),
          r.getAs[String]("text_verdict"), r.getAs[String]("vec_verdict"),
          r.getAs[Boolean]("admitted")))
      }

    epoch1.coalesce(1).write.mode("append").parquet(inDir)
    runEpoch(1)
    val e1 = got.filter(_._1 == 1).map(t => t._2 -> (t._3, t._4, t._5)).toMap
    assert(e1(700001L) == (("new", "new", true)), s"both-new: ${e1(700001L)}")
    assert(e1(700002L) == (("exact_dup", "near_dup", false)),
      s"both-dup: ${e1(700002L)}")
    assert(e1(700003L)._1 == "new" && e1(700003L)._2 == "near_dup" &&
      !e1(700003L)._3, s"vec-dup: ${e1(700003L)}")
    assert(e1(700004L)._1 == "exact_dup" && e1(700004L)._2 == "new" &&
      !e1(700004L)._3, s"text-dup: ${e1(700004L)}")

    // epoch 2: a twin of the epoch-1 admission — rejected on BOTH axes
    // thanks to appendAdmitted (cross-epoch, both indexes)
    rowOf(excluded, nb)
      .select(lit(700005L).as("doc_id"), col("text"), col("embedding"))
      .coalesce(1).write.mode("append").parquet(inDir)
    runEpoch(2)
    val e2 = got.filter(_._1 == 2)
    assert(e2.map(_._2) == Seq(700005L) &&
      e2.head._3 == "exact_dup" && e2.head._4 == "near_dup" &&
      !e2.head._5,
      s"cross-epoch joint dedup failed: $e2")
  }

  test("streaming ANN serving matches the batch PQ probe across epochs") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id"), col("embedding"))
    val queriesDf = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
    // land the query batch as several files and stream one per trigger,
    // so the serving index is genuinely REUSED across micro-batches
    val inDir = java.nio.file.Files.createTempDirectory("ann-queries").toString
    queriesDf.repartition(3).write.mode("overwrite").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("embedding",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)

    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    var epochs = 0
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-ann").toString
    EventStream.runAnnServing(stream, corpus,
      "vec_id", "embedding", ckpt, k = 5) { (topk, _) =>
      epochs += 1
      got ++= topk.collect().map(_.toString)
    }
    assert(epochs >= 2, s"expected multi-epoch serving, saw $epochs")

    // queries are independent, so the union over epochs must equal one
    // batch probe over all of them (identical corpus-trained books)
    val want = graft.queries.VectorOps.knnPq(corpus, queriesDf,
      "vec_id", "embedding", k = 5).collect().map(_.toString)
    assert(got.sorted.sameElements(want.sorted.toIndexedSeq),
      s"streaming served ${got.size} rows, batch ${want.length}")
  }

  test("qualityGateStream applies a parquet-round-tripped gate with batch parity") {
    val spark0 = spark
    import spark0.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // fit ONCE on the corpus at rest (p90 of n_chars per lang), round-trip
    // through parquet — the serving contract a fresh cluster starts from
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val thDir = java.nio.file.Files.createTempDirectory("gate-th").toString
    graft.queries.Curation
      .fitPercentileThresholds(corpus, "lang", "n_chars", 9, 10)
      .write.mode("overwrite").parquet(s"$thDir/th.parquet")
    val th = spark.read.parquet(s"$thDir/th.parquet")

    val batchRows = corpus.select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    input.addData(batchRows.toIndexedSeq: _*)

    // the apply half is stateless, so the STREAMING frame goes straight
    // through the library form — no foreachBatch, no state store
    val gated = EventStream.qualityGateStream(
      input.toDF().toDF("doc_id", "lang", "n_chars"), th, "lang", "n_chars")
    assert(gated.isStreaming, "gate must stay a streaming transform")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt-gate").toString
    val q = gated.writeStream.format("memory").queryName("gate_out")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("gate_out")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val want = graft.queries.Curation
      .applyPercentileGate(corpus, th, "lang", "n_chars")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == want, s"stream kept ${got.size}, batch kept ${want.size}")
    assert(want.nonEmpty && want.size < batchRows.length,
      s"degenerate gate: ${want.size} of ${batchRows.length} kept")
  }

  test("streaming layout: epochs continue at the tail; single-epoch == q88 bit-exact") {
    val d = graft.queries.Tables.load(spark, sfDir, "documents")
    val inDir = Files.createTempDirectory("layout_docs").toString
    d.select("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val want = graft.queries.TextPipeline.q88StreamLayout(spark, sfDir)
      .collect().toSeq
    val totalLen = want.map(_.getAs[Long]("n_tokens") + 1L).sum

    // single epoch: arrival order is one id-ordered batch == q88
    val one = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val tail1 = EventStream.runStreamLayout(
      spark.readStream.schema(schema).parquet(inDir), "doc_id", "text",
      Files.createTempDirectory("ckpt-lay1").toString,
      bucketSpan = graft.queries.TextPipeline.StreamBucketSpan) {
      (layout, _) => one ++= layout.orderBy("doc_id").collect()
    }
    assert(one.map(_.toString).toSeq == want.map(_.toString),
      "single-epoch streaming layout diverged from q88")
    assert(tail1 == totalLen, s"returned tail $tail1 != stream length $totalLen")

    // multi-epoch: each epoch starts exactly at the previous tail, the
    // stream stays contiguous across epoch boundaries, every doc lands
    // exactly once, and the final tail is the full stream length
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Seq[org.apache.spark.sql.Row]]
    val tailN = EventStream.runStreamLayout(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir), "doc_id", "text",
      Files.createTempDirectory("ckpt-layN").toString,
      bucketSpan = graft.queries.TextPipeline.StreamBucketSpan) {
      (layout, _) => epochs += layout.orderBy("doc_id").collect().toSeq
    }
    assert(epochs.size >= 2, "expected multiple micro-batches")
    assert(tailN == totalLen, s"multi-epoch tail $tailN != $totalLen")
    var pos = 0L
    epochs.foreach { rows =>
      rows.foreach { r =>
        assert(r.getAs[Long]("start_off") == pos,
          s"stream gap at epoch boundary: doc ${r.getAs[Long]("doc_id")}")
        pos += r.getAs[Long]("n_tokens") + 1L
      }
    }
    assert(epochs.flatten.map(_.getAs[Long]("doc_id")).sorted ==
      want.map(_.getAs[Long]("doc_id")).sorted)
  }

  test("streaming drift monitor: single-epoch == q89 bit-exact; counts conserve across epochs") {
    val d = graft.queries.Tables.load(spark, sfDir, "documents")
    val fitted = graft.queries.Curation.capVocabulary(
      graft.queries.Curation.fitTokenDistribution(
        d.filter(col("doc_id") % 2 === 0), "text"),
      graft.queries.Curation.DriftVocabCap)
    val inDir = Files.createTempDirectory("drift_docs").toString
    d.filter(col("doc_id") % 2 === 1).select("doc_id", "text", "source")
      .repartition(3).write.mode("overwrite").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType)))
    val want = graft.queries.Curation.q89TokenDrift(spark, sfDir)
      .collect().toSeq

    // single epoch: the streaming report IS the oracle-checked q89
    val one = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    EventStream.runTokenDrift(
      spark.readStream.schema(schema).parquet(inDir), fitted,
      "source", "text", Files.createTempDirectory("ckpt-drift1").toString) {
      (report, _) => one ++= report.collect()
    }
    assert(one.map(_.toString).toSeq == want.map(_.toString),
      "single-epoch streaming drift diverged from q89")

    // multi-epoch: chi2 is per-batch by design, but the COUNT columns
    // are additive — per-source token and unseen mass must conserve
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Seq[org.apache.spark.sql.Row]]
    EventStream.runTokenDrift(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir), fitted,
      "source", "text", Files.createTempDirectory("ckpt-drift2").toString) {
      (report, _) => epochs += report.collect().toSeq
    }
    assert(epochs.size >= 2, "expected multiple micro-batches")
    val summed = epochs.flatten.groupBy(_.getString(0)).view.mapValues(rs =>
      (rs.map(_.getAs[Long]("n_tokens")).sum,
        rs.map(_.getAs[Long]("unseen_mass")).sum)).toMap
    want.foreach { r =>
      val (nt, um) = summed(r.getString(0))
      assert(nt == r.getAs[Long]("n_tokens"), s"token mass lost for ${r.getString(0)}")
      assert(um == r.getAs[Long]("unseen_mass"), s"unseen mass lost for ${r.getString(0)}")
    }
  }

  test("streaming DSIR scoring: single-epoch == q99 bit-exact; multi-epoch union == batch") {
    val d = graft.queries.Tables.load(spark, sfDir, "documents")
    val target = d.filter(col("doc_id") % graft.queries.Curation.DsirTargetMod === 0)
    val raw = d.filter(col("doc_id") % graft.queries.Curation.DsirTargetMod =!= 0)
    // fit ONCE on the at-rest corpus — the serving artifact
    val model = graft.queries.Curation.fitImportanceModel(target, raw, "text")
    val want = graft.queries.Curation.q99DsirSelect(spark, sfDir)
      .collect().toSeq
    val inDir = Files.createTempDirectory("dsir_docs").toString
    raw.select("doc_id", "text").repartition(3)
      .write.mode("overwrite").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    // single epoch: the streaming verdicts ARE the oracle-checked q99
    val one = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    EventStream.runImportanceScore(
      spark.readStream.schema(schema).parquet(inDir), model,
      "doc_id", "text", Files.createTempDirectory("ckpt-dsir1").toString) {
      (verdicts, _) => one ++= verdicts.collect()
    }
    assert(one.sortBy(_.getAs[Long]("doc_id")).map(_.toString).toSeq ==
      want.map(_.toString), "single-epoch streaming DSIR diverged from q99")

    // multi-epoch: scoring is stateless per document given the frozen
    // model, so the union over epochs must equal the batch verdicts
    val epochs = scala.collection.mutable.ArrayBuffer.empty[Seq[org.apache.spark.sql.Row]]
    EventStream.runImportanceScore(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir), model,
      "doc_id", "text", Files.createTempDirectory("ckpt-dsir2").toString) {
      (verdicts, _) => epochs += verdicts.collect().toSeq
    }
    assert(epochs.size >= 2, "expected multiple micro-batches")
    assert(epochs.flatten.sortBy(_.getAs[Long]("doc_id")).map(_.toString) ==
      want.map(_.toString), "multi-epoch union diverged from batch q99")
  }

  test("streaming BPE tokenization matches the batch encode across epochs") {
    import java.nio.file.Files
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // train ONCE on the at-rest corpus — the serving artifact
    val model = graft.queries.Bpe.train(corpus, numMerges = 10)

    // stream the same docs back one file per trigger: the vocab must be
    // REUSED across micro-batches, and the union over epochs must equal
    // the one-shot batch encode (tokenization is stateless per row)
    val inDir = Files.createTempDirectory("bpe-docs").toString
    corpus.repartition(3).write.mode("overwrite").parquet(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))

    var epochs = 0
    val got = scala.collection.mutable.Map.empty[Long, Seq[String]]
    EventStream.runBpeTokenize(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(inDir),
      model, Files.createTempDirectory("ckpt-bpe").toString) { (out, _) =>
      epochs += 1
      out.collect().foreach(r => got(r.getLong(0)) = r.getSeq[String](1))
    }
    assert(epochs >= 2, s"expected multi-epoch serving, saw $epochs")
    val want = graft.queries.Bpe.encode(corpus, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got.toMap == want,
      s"streamed ${got.size} docs, batch ${want.size}")
    model.vocab.unpersist()
  }
}
