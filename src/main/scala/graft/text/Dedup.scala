package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rag.HashEmbedder

/** Deduplication operators for a training-data pipeline — exact,
  * MinHash+LSH (Broder 1997 resemblance sketch; banding per the
  * standard LSH construction), SimHash (Charikar 2002, as used in
  * Manku et al., WWW 2007 for web dedup), and exact n-gram Jaccard.
  *
  * Everything is Column-expression only (whole-stage codegen, no UDF),
  * with sha256-derived hashes so the DuckDB oracle can reproduce
  * results bit-for-bit.
  *
  * Scale notes (100 TB): exact dedup is one hash aggregate on the
  * digest (map-side combine, shuffle is digest+ids only, never text).
  * MinHash pairs shuffle only (band_key → doc_id) tuples — the classic
  * inverted-index join; candidate verification happens after the
  * band-bucket blocking, never all-pairs. SimHash pair join at full
  * scale keys on rotated hash prefixes (Manku); here the corpus is
  * small enough for the direct pair join, and the prefix-blocking path
  * is the same join with a coarser key.
  */
object Dedup {

  val WordRegex = "[A-Za-z0-9]+"

  def wordsCol(text: Column): Column =
    regexp_extract_all(text, lit(WordRegex), lit(0))

  /** rebalance to full parallelism before a compute-heavy projection —
    * a small corpus arriving as one file would otherwise pin the whole
    * sketch computation to its scan task
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** word 3-shingles, as strings (empty array below 3 words —
    * `sequence` would DESCEND on a negative span, so guard explicitly)
    */
  def shinglesCol(text: Column): Column = {
    val w = wordsCol(text)
    when(size(w) >= 3,
      transform(sequence(lit(0), size(w) - 3), i =>
        concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2),
          element_at(w, i + 3))))
      .otherwise(array().cast("array<string>"))
  }

  /** 60-bit seeded shingle hash (seed folded into the sha input). */
  def seededHash(seed: Column, s: Column): Column =
    conv(substring(sha2(concat_ws("|", seed, s), 256), 1, 15), 16, 10)
      .cast("long")

  // ---- exact ----

  /** groups by content digest; shuffle carries (digest, id) only. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(sha2(col(textCol), 256).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---- minhash + banded LSH ----

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4

  /** MinHash signature: sig[i] = min over shingles of hash_i.
    *
    * Shaped as a SINGLE fold over the shingle array — each shingle is
    * materialized and hashed exactly once per seed. (The naive
    * `transform(seeds, i -> array_min(transform(shingles, ...)))`
    * re-evaluates the whole shingle subtree per seed: Catalyst inlines
    * aliased subtrees into lambda bodies, so lambda-nested
    * array-building work multiplies by the outer arity.)
    */
  def signatureCol(text: Column): Column = {
    val maxSig = typedLit(Seq.fill(NumHashes)(Long.MaxValue))
    aggregate(shinglesCol(text), maxSig, (acc, s) =>
      zip_with(acc,
        transform(sequence(lit(0), lit(NumHashes - 1)), i => seededHash(i, s)),
        (a, h) => least(a, h)))
  }

  /** candidate pairs: same (band, band_key) bucket for any band.
    *
    * The band table is materialized (persist + eager count) before the
    * self-join — the production shape (signatures are a persisted
    * sketch table), and it stops Catalyst from inlining the full
    * sha256 signature pipeline into BOTH join legs.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // signatures via the relational path: explode shingles, hash each
    // seed as a codegen'd projected column, min-aggregate per doc.
    // Identical values to signatureCol, but the 16×|shingles| sha256
    // calls run in whole-stage codegen instead of interpreted HOF
    // lambdas (~10x), at the cost of one (id)-keyed shuffle of longs.
    // repartition first: the corpus may arrive as one file → one scan
    // task, and the 16×|shingles| sha256 projection must run at full
    // parallelism, not scan parallelism
    val sh = spread(docs)
      .filter(size(wordsCol(col(textCol))) >= 3)
      .select(col(idCol).as("id"), explode(shinglesCol(col(textCol))).as("sh"))
    val minCols = (0 until NumHashes).map(i =>
      min(seededHash(lit(i), col("sh"))).as(s"s_$i"))
    val sigs = sh.groupBy("id").agg(minCols.head, minCols.tail: _*)
      .select(col("id"),
        array((0 until NumHashes).map(i => col(s"s_$i")): _*).as("sig"))
    val bands = sigs.select(col("id"),
      explode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        struct(b.as("band"),
          concat_ws(",", slice(col("sig"), b * lit(RowsPerBand) + 1,
            lit(RowsPerBand))).as("key")))).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.key"))
      .persist()
    bands.count() // materialize once
    val a = bands.select(col("id").as("a_id"), col("band"), col("key"))
    val b = bands.select(col("id").as("b_id"), col("band"), col("key"))
    val pairs = a.join(b, Seq("band", "key")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .localCheckpoint() // materialize the (small) result …
    bands.unpersist() // … so the sketch cache can be released
    pairs
  }

  // ---- simhash ----

  val SimBits = 60

  /** 60-bit SimHash over word tokens: bit b set iff the ±1 vote sum of
    * that bit across token hashes is positive.
    *
    * Single pass over tokens (each token sha256'd once, emitting all
    * 60 bit votes), then one fold of the vote vector into the hash —
    * never re-evaluates the token array per bit.
    */
  def simhashCol(text: Column): Column = {
    val masks = typedLit((0 until SimBits).map(b => 1L << b))
    val zeros = typedLit(Seq.fill(SimBits)(0L))
    val hashed = transform(wordsCol(text), w => HashEmbedder.tokenHash(w))
    val votes = aggregate(hashed, zeros, (acc, h) =>
      zip_with(acc, masks, (a, m) =>
        a + when(h.bitwiseAND(m) =!= 0L, 1L).otherwise(-1L)))
    aggregate(zip_with(votes, masks, (v, m) => when(v > 0L, m).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** near-dup pairs by Hamming distance on SimHash. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val s = spread(docs)
      .select(col(idCol).as("id"), simhashCol(col(textCol)).as("sim"))
      .persist()
    s.count() // materialize the sketch once, not per join leg
    val a = s.select(col("id").as("a_id"), col("sim").as("sa"))
    val b = s.select(col("id").as("b_id"), col("sim").as("sb"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
      .localCheckpoint()
    s.unpersist()
    pairs
  }

  // ---- exact n-gram jaccard ----

  /** exact Jaccard over distinct 3-shingle sets, blocked by the
    * shared-shingle inverted index (never all-pairs).
    */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val sh = spread(docs)
      .select(col(idCol).as("id"),
        explode(array_distinct(shinglesCol(col(textCol)))).as("sh"))
      .persist()
    sh.count() // shared by sizes + both join legs
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val a = sh.select(col("id").as("a_id"), col("sh"))
    val b = sh.select(col("id").as("b_id"), col("sh"))
    val common = a.join(b, Seq("sh")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("common"))
    val pairs = common
      .join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .withColumn("jaccard",
        col("common") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
      .localCheckpoint()
    sh.unpersist()
    pairs
  }
}
