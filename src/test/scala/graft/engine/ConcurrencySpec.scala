package graft.engine

import graft.SparkSpec
import graft.queries.{Relational, Tables}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent execution: one SparkSession serving parallel queries — the
  * serving shape of the reference's FastAPI workers (one engine,
  * concurrent requests) without its per-query connection rebuild. */
class ConcurrencySpec extends SparkSpec {

  test("eight concurrent queries on one session all return correct results") {
    Tables.loadAll(spark, sfDir)
    implicit val ec: ExecutionContext = ExecutionContext.global
    val expected = Relational.q01Agg(spark, sfDir).collect().length
    val futures = (1 to 8).map { i =>
      Future {
        i % 4 match {
          case 0 => Relational.q01Agg(spark, sfDir).collect().length == expected
          case 1 => Relational.q10Having(spark, sfDir).count() > 0
          case 2 => new GraftEngine(spark)
            .query("SELECT count(*) AS n FROM orders").collect()(0).getLong(0) > 0
          case 3 => Relational.q12Distinct(spark, sfDir).count() == 6
        }
      }
    }
    val results = Await.result(Future.sequence(futures), 5.minutes)
    assert(results.forall(identity))
  }

  test("concurrent dedup-family queries share cached bases and the label memo safely") {
    import graft.queries.TextDedup
    implicit val ec: ExecutionContext = ExecutionContext.global
    // serial ground truth first (also exercises memo-hit-after-compute)
    val serial28 = TextDedup.q28JaccardPairs(spark, sfDir).collect().map(_.toString).toSet
    val serial40 = TextDedup.q40DedupClusters(spark, sfDir).collect().map(_.toString).toSet
    val serial49 = TextDedup.q49Decontamination(spark, sfDir).count()
    // the racing path: cached shingle bases + the cluster-label TrieMap
    // all hit from parallel threads; results must equal the serial runs
    val futures = (1 to 6).map { i =>
      Future {
        i % 3 match {
          case 0 => TextDedup.q28JaccardPairs(spark, sfDir).collect()
            .map(_.toString).toSet == serial28
          case 1 => TextDedup.q40DedupClusters(spark, sfDir).collect()
            .map(_.toString).toSet == serial40
          case 2 => TextDedup.q49Decontamination(spark, sfDir).count() == serial49
        }
      }
    }
    val results = Await.result(Future.sequence(futures), 5.minutes)
    assert(results.forall(identity))
  }
}
