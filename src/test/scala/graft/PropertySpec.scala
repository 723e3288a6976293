package graft

import graft.sydraql.{Ast, Lexer, Parser}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests per the SURVEY §5 rebuild test plan: time_bucket edge
  * cases, lexer/parser round-trips, translator totality.
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def bucketRef(step: Long, ts: Long): Long =
    Math.floorDiv(ts, step) * step

  test("mutated queries always fail with QueryError, never an internal crash") {
    val base = "select time_bucket(3600, time) as b, avg(value) as a from click " +
      "where time >= 0 and time < 7200 group by time_bucket(3600, time) order by b limit 5"
    val mutation = for {
      kind <- Gen.choose(0, 3)
      at <- Gen.choose(0, base.length - 1)
      len <- Gen.choose(1, 12)
      junk <- Gen.listOfN(len, Gen.oneOf("()+*/,<>=~!.'\"%&|; abc123".toSeq)).map(_.mkString)
    } yield kind match {
      case 0 => base.substring(0, at) + base.substring(math.min(base.length, at + len)) // delete
      case 1 => base.substring(0, at) + junk + base.substring(at) // insert
      case 2 => base.substring(0, at) + junk // truncate + junk
      case _ => base.take(at) // truncate
    }
    check(Prop.forAll(mutation) { (q: String) =>
      try {
        graft.sydraql.Validator.validate(Parser.parse(q))
        true // mutants that stay grammatical are fine
      } catch {
        case _: graft.sydraql.QueryError => true // the contract
        case _: Throwable => false // anything else is an internal crash
      }
    })
  }

  test("time_bucket = floor division for any ts and positive step") {
    check(Prop.forAll(Gen.chooseNum(-4102444800L, 4102444800L), Gen.chooseNum(1L, 864000L)) {
      (ts: Long, step: Long) =>
        val b = bucketRef(step, ts)
        b <= ts && ts - b < step && b % step == 0
    })
  }

  test("lexer round-trips integer and float literals") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { (n: Long) =>
      Lexer.tokenize(n.toString).head == Lexer.TInt(n, 0)
    })
    check(Prop.forAll(Gen.chooseNum(0.0, 1e15)) { (d: Double) =>
      val s = java.math.BigDecimal.valueOf(d).toPlainString
      Lexer.tokenize(s).head match {
        case Lexer.TFloat(v, _) => math.abs(v - d) <= math.ulp(d) * 4
        case Lexer.TInt(v, _) => v.toDouble == d
        case _ => false
      }
    })
  }

  test("string literals with quotes round-trip through the lexer") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const('\''), Gen.const(' ')))
      .map(_.mkString)
    check(Prop.forAll(strGen) { (s: String) =>
      val quoted = "'" + s.replace("'", "''") + "'"
      Lexer.tokenize(quoted).head == Lexer.TString(s, 0)
    })
  }

  test("parser accepts any comparison of time against any integer") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2),
      Gen.oneOf(">", ">=", "<", "<=", "=")) { (n: Long, op: String) =>
      val q = s"select value from m where time $op ${if (n < 0) s"0 - ${-n}" else n}"
      Parser.parse(q).isInstanceOf[Ast.Select]
    })
  }

  test("translator never throws, always Success or 0A000 Failure") {
    val sqlGen = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"SELECT $s FROM t"),
      Gen.alphaNumStr.map(s => s"UPDATE $s SET x = 1"),
      Gen.alphaNumStr.map(s => s"DELETE FROM $s"),
      Gen.alphaNumStr,
      Gen.const("SELECT 1"))
    check(Prop.forAll(sqlGen) { (sql: String) =>
      graft.api.Translator.translate(sql) match {
        case graft.api.Translator.Success(s) => s.nonEmpty
        case graft.api.Translator.Failure(state, _) => state == "0A000"
      }
    })
  }

  test("shingle-hash arithmetic stays in [0, 2^31) for any word hashes") {
    val h = Gen.chooseNum(0L, 2147483646L)
    check(Prop.forAll(h, h, h) { (a: Long, b: Long, c: Long) =>
      import graft.pipeline.TextAnalysis.{ShingleA, ShingleB, ShingleP}
      val v = (a * ShingleA % ShingleP * ShingleA % ShingleP
        + b * ShingleB % ShingleP + c) % ShingleP
      v >= 0 && v < ShingleP
    })
  }
}
