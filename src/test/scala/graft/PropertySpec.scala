package graft

import graft.engine.SqlTranslator
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based tests (SURVEY.md §5): the dialect translator's safety
  * properties and the fixed-point determinism contract. Raw ScalaCheck
  * (the scalatest bridge artifact is not in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, tests: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(6, Gen.alphaNumChar)
  } yield (h :: t).mkString

  test("translate is idempotent: translating translated SQL is a no-op") {
    val sqlGen = for {
      col <- ident
      tbl <- ident
      typ <- Gen.oneOf("DATE", "FLOAT", "BIGINT", "DECIMAL(10,2)")
      n <- Gen.choose(1, 99)
      unit <- Gen.oneOf("month", "day", "hour")
    } yield s"""SELECT "$col"::$typ, SUBSTRING($col FROM 'x(.)y') FROM $tbl """ +
      s"WHERE $col > CURRENT_DATE - INTERVAL '$n ${unit}s'"
    check(Prop.forAll(sqlGen) { sql =>
      val once = SqlTranslator.translate(sql)
      SqlTranslator.translate(once) == once
    })
  }

  test("translate never touches literal content for literal-free rules (casts, ROW, CURRENT_DATE)") {
    check(Prop.forAll(ident, ident) { (a, b) =>
      val lit = s"$a::$b ROW (x) CURRENT_DATE text"
      val sql = s"SELECT '$lit' AS s, c::DATE FROM t"
      val out = SqlTranslator.translate(sql,
        Some(java.time.LocalDate.of(2025, 1, 1)))
      out.contains(s"'$lit'") && out.contains("CAST(c AS DATE)")
    })
  }

  test("quoted identifiers become backtick identifiers, never literals or bare names") {
    check(Prop.forAll(ident) { id =>
      SqlTranslator.rewriteQuotedIdentifiers(s"""SELECT "$id" FROM t""") ==
        s"SELECT `$id` FROM t"
    })
    // non-identifier-shaped names stay identifiers (would silently become
    // string literals if passed through to Spark)
    assert(SqlTranslator.rewriteQuotedIdentifiers("""SELECT "a b" FROM t""") ==
      "SELECT `a b` FROM t")
    assert(SqlTranslator.rewriteQuotedIdentifiers("""SELECT "a.b" FROM t""") ==
      "SELECT `a.b` FROM t")
    // DuckDB's "" escape unwraps; quotes inside single-quoted literals survive
    assert(SqlTranslator.rewriteQuotedIdentifiers("""SELECT "we""ird" FROM t""") ==
      "SELECT `we\"ird` FROM t")
    assert(SqlTranslator.rewriteQuotedIdentifiers("""SELECT '"not an id"' FROM t""") ==
      """SELECT '"not an id"' FROM t""")
  }

  test("firewall never passes statements containing banned keywords") {
    val banned = Gen.oneOf("DROP", "DELETE", "INSERT", "UPDATE", "CREATE",
      "ALTER", "TRUNCATE", "GRANT", "REVOKE", "EXEC", "EXECUTE", "MERGE")
    check(Prop.forAll(banned, ident) { (kw, id) =>
      SqlTranslator.validateReadOnly(s"SELECT 1; $kw TABLE $id").isLeft &&
        SqlTranslator.validateReadOnly(s"$kw TABLE $id").isLeft &&
        // the keyword inside an identifier does not trip it
        SqlTranslator.validateReadOnly(s"SELECT ${kw}_count FROM $id").isRight
    })
  }

  test("fixed-point sum is invariant under permutation (the determinism contract)") {
    val doubles = Gen.listOfN(50, Gen.choose(-1e6, 1e6))
    check(Prop.forAll(doubles, Gen.choose(0L, Long.MaxValue)) { (xs, seed) =>
      def fp(vals: Seq[Double]): Long =
        vals.map(v => math.rint(v * 100).toLong).sum
      fp(xs) == fp(new scala.util.Random(seed).shuffle(xs))
    })
  }

  test("simhash chunk-pair keys are pigeonhole-complete for hamming <= 6") {
    // the mathematical core of q31's candidate generation: ANY two 64-bit
    // signatures within hamming distance 6 must share at least one of the
    // C(8,2)=28 (chunk-pair, byte, byte) keys — otherwise the equi-join
    // would silently lose near-dup pairs. Flipping <= 6 bits dirties at
    // most 6 of the 8 byte-chunks, so >= 2 chunks stay clean.
    def keys(sig: Long): Set[(Int, Int, Long, Long)] = {
      def byte(c: Int): Long = (sig >>> (8 * c)) & 0xffL
      (for (c1 <- 0 until 8; c2 <- c1 + 1 until 8)
        yield (c1, c2, byte(c1), byte(c2))).toSet
    }
    val gen = for {
      sig <- Gen.choose(Long.MinValue, Long.MaxValue)
      nFlips <- Gen.choose(0, 6)
      flips <- Gen.listOfN(nFlips, Gen.choose(0, 63))
    } yield (sig, flips)
    check(Prop.forAll(gen) { case (sig, flips) =>
      val other = flips.foldLeft(sig)((s, b) => s ^ (1L << b))
      (keys(sig) intersect keys(other)).nonEmpty
    }, tests = 500)
    // and the bound is tight: 7 flips across 7 DISTINCT chunks can leave
    // only one clean chunk — no clean pair — so d=7 would be incomplete
    val sig = 0L
    val sevenFlips = (0 until 7).foldLeft(sig)((s, c) => s ^ (1L << (8 * c)))
    assert((keys(sig) intersect keys(sevenFlips)).size == 0)
  }

  test("LIMIT injection: exactly one trailing LIMIT when absent") {
    check(Prop.forAll(ident, Gen.choose(1, 10000)) { (tbl, n) =>
      val out = SqlTranslator.injectLimit(s"SELECT * FROM $tbl", n)
      out.endsWith(s"LIMIT $n") &&
        "(?i)\\bLIMIT\\b".r.findAllIn(out).size == 1
    })
  }
}
