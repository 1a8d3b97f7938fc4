package graft.gen

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{EntityLabel, TranscriptRow}
import graft.util.Hashing._

/** Deterministic synthetic transcript corpus with planted entity clusters.
  *
  * Spark-native analogue of the reference's SyntheticDatabase +
  * corrupt() (reference: python/database.py::SyntheticDatabase [PK-med,
  * SURVEY.md §0]): plant K entities, m ∈ [1..5] conversation duplicates
  * per entity, corrupt duplicate text at token level so weak features
  * disagree while strong features (tool-call signatures) mostly survive.
  *
  * Everything is a pure function of (seed, entity, dup, turn, token
  * position) via splitmix64 — no RNG state, so output is identical under
  * any partitioning, task retry, or parallelism level (FIXTURES.md §A).
  *
  * Planted truth: conv_id = "c%07d_%d".format(entity, dup); ground-truth
  * entity_id = the dup-0 conv_id, which is also the lexicographic min of
  * the cluster — matching the pipeline's canonical min-conv_id
  * representative, so golden comparison is exact.
  */
object TranscriptGen {

  val DefaultSeed = 42L

  /** ~2k-token vocabulary; low indices are hot (Zipf-ish draw below)
    * to create realistic hot blocking keys (FIXTURES.md §A1).
    */
  private val common: IndexedSeq[String] = IndexedSeq(
    "the", "a", "to", "of", "and", "in", "is", "it", "you", "that",
    "he", "was", "for", "on", "are", "with", "as", "his", "they", "be",
    "at", "one", "have", "this", "from", "or", "had", "by", "not", "word",
    "but", "what", "some", "we", "can", "out", "other", "were", "all",
    "there", "when", "up", "use", "your", "how", "said", "an", "each",
    "she", "which"
  )
  val vocab: IndexedSeq[String] =
    common ++ (0 until 1950).map(i => f"tok$i%04d")

  val toolNames: IndexedSeq[String] = IndexedSeq(
    "search", "browse", "calc", "code_run", "db_query", "file_read",
    "file_write", "http_get", "translate", "summarize", "plan", "sql",
    "regex", "embed", "rank", "parse", "extract", "classify", "cluster",
    "dedupe"
  )

  /** Zipf-ish vocab index: u^3 concentrates mass on low indices
    * (P[idx < 20] ≈ 0.21 with |V| = 2000).
    */
  private def zipfIdx(u: Double): Int = {
    val i = (math.pow(u, 3.0) * vocab.size).toInt
    math.min(i, vocab.size - 1)
  }

  /** Duplicate conversations planted for entity e: 1..5. */
  def dupCount(seed: Long, e: Long): Int = 1 + range(5, seed, e, 10L)

  def convId(e: Long, d: Int): String = f"c$e%07d_$d%d"

  def entityIdOf(e: Long): String = convId(e, 0)

  /** Turns per conversation (shared across an entity's duplicates): 2..15. */
  def turnCount(seed: Long, e: Long): Int = 2 + range(14, seed, e, 11L)

  /** user / assistant alternation with a tool turn every 4th position —
    * the transcripts-domain analogue of the reference's strong feature
    * (high-precision identifier; SURVEY.md §2.3 F5).
    */
  def roleOf(t: Int): String =
    if (t % 4 == 3) "tool" else if (t % 2 == 1) "assistant" else "user"

  /** Tool-call signature element: name(arg) with a ~2^30 arg space so
    * cross-entity strong-key collisions are negligible at bench scale.
    */
  private def toolCall(seed: Long, e: Long, t: Int): String = {
    val name = toolNames(range(toolNames.size, seed, e, t.toLong, 12L))
    val arg = (mix(seed, e, t.toLong, 13L) >>> 1) % 1000000000L
    f"$name%s(a$arg%09d)"
  }

  /** Base (uncorrupted) token sequence for (entity, turn). */
  def baseTokens(seed: Long, e: Long, t: Int): Seq[String] = {
    val n = 6 + range(10, seed, e, t.toLong, 14L)
    (0 until n).map(w => vocab(zipfIdx(unit(seed, e, t.toLong, w.toLong, 15L))))
  }

  /** Token-level corruption rates for duplicates (dup > 0): mirrors the
    * reference's SyntheticDatabase.corrupt noise model [PK-med]. Dropped /
    * mangled tokens leave token-set Jaccard vs the dup-0 hub at
    * ≈ (1-p)/(1+p) ≈ 0.80 — comfortably above the 0.45 match threshold.
    */
  val PDrop = 0.05
  val PMangle = 0.06
  /** Fraction of duplicates that lose their tool signature entirely
    * (forces the weak-feature path end-to-end).
    */
  val PToolDrop = 0.10

  private def mangle(tok: String, h: Long): String = {
    val pos = ((h >>> 8) % math.max(1, tok.length)).toInt
    val ch = ('a' + ((h >>> 16) % 26)).toChar
    tok.updated(pos, ch) + "x"
  }

  /** All turns of one conversation (entity e, duplicate d). Pure. */
  def turnsFor(seed: Long, e: Long, d: Int): Seq[TranscriptRow] = {
    val n = turnCount(seed, e)
    val toolsDropped = d > 0 && unit(seed, e, d.toLong, 16L) < PToolDrop
    val baseEpochSec = 1767225600L + e * 3600L + d * 600L
    (0 until n).map { t =>
      val role = roleOf(t)
      val base = baseTokens(seed, e, t)
      val toks =
        if (d == 0) base
        else base.zipWithIndex.flatMap { case (tok, w) =>
          val u = unit(seed, e, d.toLong, t.toLong, w.toLong, 17L)
          if (u < PDrop) None
          else if (u < PDrop + PMangle)
            Some(mangle(tok, mix(seed, e, d.toLong, t.toLong, w.toLong, 18L)))
          else Some(tok)
        }
      val text = if (toks.isEmpty) base.head else toks.mkString(" ")
      val tool =
        if (role == "tool" && !toolsDropped) Some(toolCall(seed, e, t))
        else None
      TranscriptRow(convId(e, d), t, role, text, tool,
        new Timestamp((baseEpochSec + t * 10L) * 1000L))
    }
  }

  /** The transcripts table: one row per turn (BASELINE.json:15 shape). */
  def transcripts(spark: SparkSession, nEntities: Long,
      seed: Long = DefaultSeed): Dataset[TranscriptRow] = {
    import spark.implicits._
    spark.range(nEntities).flatMap { e =>
      (0 until dupCount(seed, e)).flatMap(d => turnsFor(seed, e, d))
    }
  }

  /** Planted ground truth: conv_id → canonical entity_id. */
  def labels(spark: SparkSession, nEntities: Long,
      seed: Long = DefaultSeed): Dataset[EntityLabel] = {
    import spark.implicits._
    spark.range(nEntities).flatMap { e =>
      (0 until dupCount(seed, e)).map(d => EntityLabel(convId(e, d), entityIdOf(e)))
    }
  }
}
