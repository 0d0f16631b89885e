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
}
