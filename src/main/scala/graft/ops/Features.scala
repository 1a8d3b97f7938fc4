package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F3–F8 + B4 (SURVEY.md §2.3/§2.4): weak/strong feature extraction over
  * collapsed conversation records — the schema-as-code replacement for
  * the reference's annotated-CSV feature prelude (reference:
  * python/database.py::Database.__init__ [PK-high, SURVEY.md §0]).
  *
  * Everything here is a pure Catalyst column expression (higher-order
  * functions, no UDFs) so whole-stage codegen spans the feature stage.
  */
object Features {

  /** MinHash-LSH banding parameters (SURVEY.md §2.4 B4). Tuned for the
    * planted corruption model: token-set Jaccard between a corrupted
    * duplicate and its dup-0 hub is ≈0.80 ⇒ P(share ≥1 band) =
    * 1-(1-s^r)^b ≈ 1-(1-0.51)^13 ≈ 0.9999; a random pair at s≈0.15
    * collides with P ≈ 4%, which scoring then discards.
    */
  val NumBands = 13
  val RowsPerBand = 3
  val NumHashes: Int = NumBands * RowsPerBand

  /** F3: unicode-aware lowercase word tokenizer. */
  def tokenize(text: Column): Column =
    filter(
      split(lower(regexp_replace(text, "[^\\p{L}\\p{N}]+", " ")), " "),
      t => length(t) > 0)

  /** Canonical (sorted, deduped) value set — the reference keeps features
    * as value *sets* per record (SURVEY.md §1.1); sorted arrays make every
    * downstream result partition-order-independent.
    */
  def tokenSet(tokens: Column): Column = array_sort(array_distinct(tokens))

  /** F4: word k-shingles via pure HOFs (no UDF). */
  def shingles(tokens: Column, k: Int): Column =
    when(size(tokens) >= k,
      transform(sequence(lit(0), size(tokens) - k),
        i => concat_ws(" ", (0 until k).map(j => element_at(tokens, i + j + 1)): _*))
    ).otherwise(array().cast("array<string>"))

  /** F5: strong key = exact tool-call signature sequence (the
    * transcripts analogue of the reference's high-precision strong
    * features like phone/email [PK-high]).
    */
  def strongKeys(turns: Column): Column = {
    val sig = array_join(
      transform(
        filter(turns, t => t.getField("tool").isNotNull),
        t => t.getField("tool")),
      "|")
    when(length(sig) > 0, array(concat(lit("T:"), sig)))
      .otherwise(array().cast("array<string>"))
  }

  /** B4: MinHash signature over a value set. h_i(x) = xxhash64(x, i);
    * signature_i = min over set. One aggregate per hash, all inside
    * codegen; deterministic (vs Spark ML's MinHashLSH whose random
    * coefficients depend on a fitted model).
    */
  def minhashSignature(valueSet: Column, numHashes: Int = NumHashes): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => aggregate(valueSet, lit(Long.MaxValue),
        (acc, x) => least(acc, xxhash64(x, i))))

  /** B4: LSH band keys ("M|band|h1|h2|h3") from a MinHash signature.
    * Empty value sets get no bands (they'd otherwise all collide into one
    * monster block).
    */
  def minhashBands(sig: Column, valueSet: Column,
      bands: Int = NumBands, rowsPerBand: Int = RowsPerBand): Column =
    when(size(valueSet) > 0,
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws("|",
          (lit("M") +: (b.cast("string")) +:
            (0 until rowsPerBand).map(r =>
              element_at(sig, b * rowsPerBand + r + 1).cast("string"))): _*))
    ).otherwise(array().cast("array<string>"))

  /** SimHash-64 over a token multiset: per-bit vote of xxhash64(token),
    * pure HOFs. Used by near-dup detection (dedup module).
    */
  def simhash64(tokens: Column): Column = {
    val votes = aggregate(tokens,
      array_repeat(lit(0L), 64),
      (acc, x) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftrightunsigned", xxhash64(x), i)
              .bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))),
        (a, b) => a + b))
    aggregate(votes, lit(0L),
      (acc, v) => shiftleft(acc, 1) + when(v > 0, lit(1L)).otherwise(lit(0L)))
  }

  /** Enrich collapsed records with every feature the pipeline needs.
    * Input: collapse() output. Output adds:
    * text_all, first_text, n_turns, ts0, tokens, token_set, shingles,
    * strong_keys, minhash (signature), mh_bands.
    */
  def enrich(records: DataFrame, shingleK: Int = 3): DataFrame = {
    val withText = records
      .withColumn("text_all",
        array_join(transform(col("turns"), t => t.getField("text")), " "))
      .withColumn("first_text", element_at(col("turns"), 1).getField("text"))
      .withColumn("n_turns", size(col("turns")))
      .withColumn("ts0", element_at(col("turns"), 1).getField("ts"))
    withText
      .withColumn("tokens", tokenize(col("text_all")))
      .withColumn("token_set", tokenSet(col("tokens")))
      .withColumn("shingles", array_distinct(shingles(col("tokens"), shingleK)))
      .withColumn("strong_keys", strongKeys(col("turns")))
      .withColumn("minhash", minhashSignature(col("token_set")))
      .withColumn("mh_bands", minhashBands(col("minhash"), col("token_set")))
  }
}
