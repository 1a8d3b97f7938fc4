package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("golden values (SURVEY.md §5.2)") {
    assert(approx(JaroWinkler.similarity("MARTHA", "MARHTA"), 0.9611111111111111))
    assert(approx(JaroWinkler.similarity("DWAYNE", "DUANE"), 0.84))
    assert(approx(JaroWinkler.similarity("DIXON", "DICKSONX"), 0.8133333333333332))
    assert(JaroWinkler.similarity("abc", "abc") == 1.0)
    assert(JaroWinkler.similarity("", "") == 0.0) // DuckDB parity
    assert(JaroWinkler.similarity("a", "") == 0.0)
    assert(JaroWinkler.similarity("abc", "xyz") == 0.0)
    // transpositions use integer division (DuckDB/rapidfuzz semantics);
    // expected value cross-computed with duckdb jaro_winkler_similarity
    assert(approx(JaroWinkler.similarity(
      "tok1653 tok0014 ox", "tok1072 they at irx"), 0.6208576998050682))
  }

  test("works as a codegen'd column expression") {
    val df = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"), ("same", "same"))
      .toDF("a", "b")
      .withColumn("jw", JaroWinkler.jaroWinkler(col("a"), col("b")))
    val got = df.select("jw").as[Double].collect().toSeq
    assert(approx(got(0), 0.9611111111111111))
    assert(approx(got(1), 0.84))
    assert(got(2) == 1.0)
  }

  test("null-safe") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .withColumn("jw", JaroWinkler.jaroWinkler(col("a"), col("b")))
    assert(df.select("jw").collect()(0).isNullAt(0))
  }

  test("cap inside the expression ≡ substring upstream (ASCII + multibyte)") {
    val rows = Seq(
      ("the quick brown fox jumps over it", "the quick brown dog jumps over it"),
      ("short", "also-short"),
      ("aéλ字 multibyte prefix shared", "aéλ字 multibyte prefix distinct"),
      ("", "nonempty"),
      ("exactly8ch", "exactly8ch plus tail"))
      .toDF("a", "b")
    val df = rows.select(
      JaroWinkler.jaroWinkler(col("a"), col("b"), 8).as("capped"),
      JaroWinkler.jaroWinkler(
        substring(col("a"), 1, 8), substring(col("b"), 1, 8)).as("substr"))
    df.as[(Double, Double)].collect().foreach { case (c, s) =>
      assert(approx(c, s), s"capped=$c substr=$s")
    }
  }
}
