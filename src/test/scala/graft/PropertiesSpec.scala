package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler
import graft.ops.Scoring

/** SURVEY.md §5.2-3: the Swoosh ICAR properties transplanted to our
  * representations, checked with raw ScalaCheck (no scalatestplus bridge
  * in the offline cache). Pure driver-side properties run generatively;
  * Spark-side properties use fixed seeded samples.
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val token = Gen.oneOf("alpha", "beta", "gamma", "delta", "tok1", "tok2", "x9")
  private val tokenSet = Gen.containerOf[Set, String](token)

  test("fusion (value-set union) is idempotent, commutative, associative") {
    check(Prop.forAll(tokenSet, tokenSet, tokenSet) { (a, b, c) =>
      (a ++ a) == a && (a ++ b) == (b ++ a) && ((a ++ b) ++ c) == (a ++ (b ++ c))
    })
  }

  test("jaccard bounds and identity") {
    check(Prop.forAll(tokenSet, tokenSet) { (a, b) =>
      val j =
        if ((a ++ b).isEmpty) 0.0
        else (a & b).size.toDouble / (a ++ b).size.toDouble
      val selfOk = a.isEmpty || (a & a).size.toDouble / (a ++ a).size.toDouble == 1.0
      j >= 0.0 && j <= 1.0 && selfOk
    })
  }

  test("jaro-winkler: symmetric, bounded, identity") {
    val str = Gen.alphaNumStr.map(_.take(20))
    check(Prop.forAll(str, str) { (a, b) =>
      val ab = JaroWinkler.similarity(a, b)
      val ba = JaroWinkler.similarity(b, a)
      math.abs(ab - ba) < 1e-12 && ab >= 0.0 && ab <= 1.0 &&
        (a.isEmpty || JaroWinkler.similarity(a, a) == 1.0)
    })
  }

  test("collapse ∘ explode = identity on generated corpora (BASELINE.json:15)") {
    import spark.implicits._
    val src = graft.gen.TranscriptGen.transcripts(spark, 30).toDF()
    val records = graft.ops.Collapse.collapse(src.repartition(5))
    assert(graft.ops.Collapse.invariantViolations(src, records).count() == 0)
  }

  test("strong-key encoding: round-trip injective + Spark parity on adversarial names") {
    // driver-side model of Features.strongKeys' length-prefixed encoding
    def enc(ts: List[String]): String =
      if (ts.isEmpty) "" else "T:" + ts.map(t => s"${t.length}:$t").mkString("|")
    // the unambiguous parse the Features scaladoc promises: read digits
    // to ':', take exactly len chars, expect '|' or end
    def dec(s: String): List[String] =
      if (s.isEmpty) Nil
      else {
        var rest = s.stripPrefix("T:")
        val out = scala.collection.mutable.ListBuffer.empty[String]
        while (rest.nonEmpty) {
          val colon = rest.indexOf(':')
          val len = rest.substring(0, colon).toInt
          out += rest.substring(colon + 1, colon + 1 + len)
          rest = rest.drop(colon + 1 + len)
          if (rest.startsWith("|")) rest = rest.drop(1)
        }
        out.toList
      }
    // dec ∘ enc = id over an alphabet that includes the delimiters
    // themselves ⇒ enc is injective: distinct tool sequences can never
    // share a strong key
    val toolGen = Gen.listOf(Gen.oneOf('a', 'b', '|', ':', '1'))
      .map(_.mkString.take(8))
    val seqGen = Gen.listOf(toolGen).map(_.take(6))
    check(Prop.forAll(seqGen) { ts => dec(enc(ts)) == ts })
    // parity: the Spark column computes the identical encoding on the
    // adversarial shapes (delimiter/digit/colon-bearing tool names)
    import spark.implicits._
    val adversarial = List(
      List("a|b"), List("a", "b"), List("1:a"), List(":", ":"),
      List("", "x"), List("|"), List("3:a|b"), List("a:b|c"))
    val rows = adversarial.zipWithIndex.flatMap { case (ts, ci) =>
      ts.zipWithIndex.map { case (t, i) =>
        graft.model.TranscriptRow(s"c$ci", i, "user", "t", Some(t),
          new java.sql.Timestamp(1700000000000L + i))
      }
    }
    val got = graft.ops.Features.enrich(
        graft.ops.Collapse.collapse(rows.toDS().toDF()))
      .select($"conv_id", $"strong_keys").as[(String, Seq[String])]
      .collect().toMap
    adversarial.zipWithIndex.foreach { case (ts, ci) =>
      assert(got(s"c$ci") == Seq(enc(ts)), s"c$ci: $ts")
    }
  }

  test("matchRule('weak_strong') = matchRule('strong') OR matchRule('weak')") {
    import spark.implicits._
    val f = Seq(
      (true, 0.9), (true, 0.1), (false, 0.9), (false, 0.1), (false, 0.45)
    ).toDF("strong_overlap", "jaccard_tokens")
    val lhs = f.filter(Scoring.matchRule("weak_strong")).count()
    val rhs = f.filter(Scoring.matchRule("strong") || Scoring.matchRule("weak")).count()
    assert(lhs == rhs)
  }
}
