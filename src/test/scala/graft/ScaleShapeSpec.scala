package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.text.{Corpus, Dedup}

/** Scale-shape audits: the physical plans the 100 TB story depends on
  * (broadcast dims, sort-merge facts, pushdown, NO cartesians in the
  * pair-join dedup operators), plus the dedup building blocks that the
  * DuckDB oracle can't unit-test in isolation.
  */
class ScaleShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("tpch_region_stats: both dims join as BroadcastHashJoin") {
    val p = plan(SparkEntry.queries("tpch_region_stats")(spark, sf))
    // formatted explain lists each operator in the tree AND the detail
    // section, so the two dim joins appear 4 times
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("tpch_top_orders: hinted dim broadcasts; fact join sort-merges when too big to broadcast") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan(SparkEntry.queries("tpch_top_orders")(spark, sf))
      assert(p.contains("BroadcastHashJoin"), p) // broadcast(customer) hint
      assert(p.contains("SortMergeJoin"), p) // lineitem ⋈ orders
      // top-10 must be a heap merge, not a global sort
      assert(p.contains("TakeOrderedAndProject"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("search_topk_filtered: metadata filter reaches the parquet scan") {
    val p = plan(SparkEntry.queries("search_topk_filtered")(spark, sf))
    assert(p.contains("EqualTo(label,1)"), p) // PushedFilters
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("bm25_search: top-k is a heap merge and the term filter precedes the tf aggregate") {
    val p = plan(SparkEntry.queries("bm25_search")(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p) // no global sort
    // the term IN (...) filter must sit below the first exchange so
    // only matching-term rows shuffle
    // the formatted detail sections number operators leaf-to-root, so
    // the filter's detail preceding the exchange's proves it sits below
    val filterAt = p.indexOf("IN (hash,join,vector)")
    val exchangeAt = p.indexOf("hashpartitioning(doc_id")
    assert(filterAt >= 0 && exchangeAt >= 0 && filterAt < exchangeAt, p)
    // per-term contributions partial-aggregate map-side (hot docs combine)
    assert(p.contains("partial_sum(CASE WHEN"), p)
  }

  test("pair-join dedup operators plan equi-joins, never cartesians") {
    import spark.implicits._
    val docs = (0 until 20)
      .map(i => (i.toLong, s"alpha beta gamma delta epsilon doc$i tail"))
      .toDF("doc_id", "text")
    val plans = Seq(
      "minhash" -> plan(Dedup.minhashPairs(docs, "doc_id", "text", materialize = false)),
      "simhash" -> plan(Dedup.simhashPairs(docs, "doc_id", "text", 3, materialize = false)),
      "jaccard" -> plan(Dedup.ngramJaccard(docs, "doc_id", "text", 0.5, materialize = false)),
      "incremental" -> plan(Dedup.minhashPairsIncremental(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text")),
      // NOT dedup_keep_best here: connectedComponents executes eagerly
      // during construction, so its audited plan would only be the
      // comps⋈quality tail — a vacuous (and expensive) assertion; its
      // pair join is exactly simhashPairs, audited above
      "set_ops" -> plan(SparkEntry.queries("set_ops")(spark, sf)))
    plans.foreach { case (name, p) =>
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
    }
  }

  test("incremental dedup candidates = full-pair candidates restricted to the split") {
    import spark.implicits._
    // near-dup-rich corpus: shared body, per-doc tail
    val docs = (0L until 30L)
      .map(i => (i, s"alpha beta gamma delta epsilon shared body ${i % 5}"))
      .toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val inc = Dedup.minhashPairsIncremental(corpus, batch, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    val full = Dedup.minhashPairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // full pairs are (a<b); incremental is (batch, corpus) either order
    val fullCross = full.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (x, y) => x % 10 == 0 && y % 10 != 0 }
    assert(inc == fullCross && inc.nonEmpty)
  }

  test("embed_neardup plans an equi-join on the LSH bucket, no cartesian") {
    val p = plan(Queries.embedNearDup(spark, sf, 0.4, materialize = false))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("blocked near-dup is a subset of the exact pairs with measured recall") {
    import spark.implicits._
    val exact = Queries.embedNearDupExact(spark, sf, 0.4)
      .as[(Long, Long)].collect().toSet
    val blocked = Queries.embedNearDup(spark, sf, 0.4)
      .as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact), "blocking must never invent a pair")
    val recall = if (exact.isEmpty) 1.0 else blocked.size.toDouble / exact.size
    info(f"near-dup recall at threshold 0.4: $recall%.2f (${blocked.size}/${exact.size})")
    assert(recall >= 0.4, s"recall $recall collapsed — blocking misconfigured")
  }

  test("embed_neardup_exact refuses corpora above its row ceiling") {
    val e = intercept[IllegalArgumentException] {
      Queries.embedNearDupExact(spark, sf, 0.4, maxRows = 1L)
    }
    assert(e.getMessage.contains("recall baseline"))
  }

  test("bucketed tables co-locate the join: no Exchange in the plan") {
    import spark.implicits._
    val warehouse = java.nio.file.Files.createTempDirectory("bkt").toString
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val facts = (0L until 2000L).map(i => (i % 97, s"f$i")).toDF("k", "payload")
      val dims = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "attr")
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
      facts.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$warehouse/facts").saveAsTable("bkt_facts")
      dims.write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$warehouse/dims").saveAsTable("bkt_dims")
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      val p = plan(joined)
      // both sides pre-hashed into the same 8 buckets → the sort-merge
      // join needs NO shuffle: the write-time layout bought the join
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), p)
      assert(joined.count() == 2000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(warehouse))
    }
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      // 1 hot key carrying 50k wide rows vs 50 cold keys with 10 each
      val left = spark.range(0, 50000).select(lit(0L).as("k"),
          concat(lit("x"), col("id"), lit("y" * 64)).as("payload"))
        .union(spark.range(0, 500).select((col("id") % 50 + 1).as("k"),
          concat(lit("c"), col("id")).as("payload")))
      val right = spark.range(0, 51).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("v"))
      val joined = left.join(right, "k")
      // execute THIS frame (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 50500)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("mix60 column matches the JVM splitmix-mod-2^60 reference") {
    import spark.implicits._
    def mixJvm(h: Long, seed: Long): Long = {
      // wrapping multiply masked to 60 bits ≡ multiply mod 2^60
      var z = h ^ seed
      z = ((z ^ (z >>> 30)) * Dedup.MixC1) & Dedup.Mask60
      z = ((z ^ (z >>> 27)) * Dedup.MixC2) & Dedup.Mask60
      z ^ (z >>> 31)
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(50)(
      (rnd.nextLong() & Dedup.Mask60, Dedup.Seeds(rnd.nextInt(Dedup.NumHashes))))
    val got = cases.toDF("h", "seed")
      .select(Dedup.seededHash(col("seed"), col("h"))).as[Long].collect()
    cases.zip(got).foreach { case ((h, sd), g) =>
      assert(g == mixJvm(h, sd), s"h=$h seed=$sd")
    }
  }

  test("native shingle/simhash kernels equal the HOF Column forms") {
    import spark.implicits._
    val texts = Seq("", "one two", "alpha beta gamma delta", "x y z x y z x y z",
      "AT+CFUN=1, set; the quick brown fox. jumps over 42 lazy dogs",
      // multi-byte chars: byte-run words must split exactly where the
      // ASCII regex does (ï/é/CJK are run boundaries, not word chars)
      "naïve café touché 日本語42mix déjà-vu")
    val rows = texts.toDF("text").select(
      graft.text.TextExprs.shingleHashes(col("text"), distinct = false).as("n_all"),
      transform(Dedup.shinglesCol(col("text")), s => Dedup.shingleHash(s)).as("h_all"),
      graft.text.TextExprs.shingleHashes(col("text"), distinct = true).as("n_dst"),
      transform(array_distinct(Dedup.shinglesCol(col("text"))),
        s => Dedup.shingleHash(s)).as("h_dst"),
      graft.text.TextExprs.simhash(col("text")).as("n_sim"),
      Dedup.simhashColHof(col("text")).as("h_sim"),
      graft.text.TextExprs.minhashSig(col("text")).as("n_mh"),
      Dedup.signatureCol(col("text")).as("h_mh"),
      Dedup.wordsCol(col("text")).as("n_words"),
      Dedup.wordsColHof(col("text")).as("h_words")).collect()
    texts.zip(rows).foreach { case (t, r) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"all-shingles: '$t'")
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"distinct-shingles: '$t'")
      assert(r.getLong(4) == r.getLong(5), s"simhash: '$t'")
      if (r.isNullAt(7)) assert(r.getSeq[Long](6).isEmpty, s"minhash short: '$t'")
      else assert(r.getSeq[Long](6) == r.getSeq[Long](7), s"minhash: '$t'")
      assert(r.getSeq[String](8) == r.getSeq[String](9), s"words: '$t'")
    }
  }

  test("native wordStats kernel equals the HOF forms (count, lengths, per-list hits)") {
    import graft.text.{TextExprs, TextOps}
    // the tail cases pin the n_tokens/n_punct regex equivalences: a
    // Unicode NBSP is NOT Java-regex \s (counts as punct), tabs/VT/FF
    // are \s, a surrogate pair is ONE code point = one token
    val texts = Seq("", "The quick brown fox", "der und the la les y es",
      "ABC def GHI 42 the THE tHe", "punct, only; !!",
      "a\u00A0b", "x\t\fy!", "emoji 😀 mix, 7s")
    val lists = TextOps.Stopwords.map(_._2)
    val st = TextExprs.wordStats(col("text"), lists)
    import spark.implicits._
    val rows = texts.toDF("text").select(
      st.getField("n_words"),
      size(regexp_extract_all(col("text"), lit(Dedup.WordRegex), lit(0))),
      st.getField("sum_word_len"),
      aggregate(regexp_extract_all(col("text"), lit(Dedup.WordRegex), lit(0)),
        lit(0L), (acc, w) => acc + length(w)),
      st.getField("hits"),
      array(lists.map(l => TextOps.hits(col("text"), l)): _*),
      st.getField("n_tokens"),
      regexp_count(col("text"), lit(graft.chunk.Tokenizer.TokenRegex)),
      st.getField("n_punct"),
      regexp_count(col("text"), lit("[^A-Za-z0-9\\s]"))).collect()
    texts.zip(rows).foreach { case (t, r) =>
      assert(r.getInt(0) == r.getInt(1), s"n_words: '$t'")
      assert(r.getLong(2) == r.getLong(3), s"sum_word_len: '$t'")
      assert(r.getSeq[Int](4) == r.getSeq[Int](5), s"hits: '$t'")
      assert(r.getInt(6) == r.getInt(7), s"n_tokens: '$t'")
      assert(r.getInt(8) == r.getInt(9), s"n_punct: '$t'")
    }
  }

  test("minhash signature is null below 3 words, populated at 3+") {
    import spark.implicits._
    val rows = Seq("one two", "", "one two three four")
      .toDF("text")
      .select(Dedup.signatureCol(col("text")).as("sig"))
      .collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getSeq[Long](0).length == Dedup.NumHashes)
  }

  test("connected components: chain, triangle, isolated pair label correctly") {
    import spark.implicits._
    // chain 1-2-3-4 (one component), triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a_id", "b_id")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    // default path (small graph → driver union-find)
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // distributed pointer-jumping path, forced
    val gotDist = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(gotDist == expected)
  }

  test("connected components of an empty pair set is the empty frame") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(empty).count() == 0)
  }

  test("connected components equal union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = Seq.fill(25)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // min id per component
      val compMin = nodes.groupBy(id => find(id.toInt))
        .flatMap { case (_, ids) => ids.map(_ -> ids.min) }
      // force the DISTRIBUTED path — the default would take the driver
      // union-find short-circuit, making this test circular
      val got = Dedup.connectedComponents(edges.toDF("a_id", "b_id"),
        driverMaxEdges = 0L)
        .as[(Long, Long)].collect().toMap
      assert(got == compMin, s"edges: $edges")
    }
  }

  test("pigeonhole-blocked simhash pairs equal brute-force, incl. uneven block widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 40L).map { i =>
      (i, Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    // maxHamming = 6 → 7 blocks over 60 bits → widths 9/9/9/9/8/8/8 (uneven)
    val blocked = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
      .as[(Long, Long, Long)].collect().toSet
    val sketches = docs.select(col("doc_id"), Dedup.simhashCol(col("text")))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sketches; (b, sb) <- sketches if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 6
    } yield (a, b, h.toLong)).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty) // the corpus actually produces near-dups
  }

  test("ann_ivf_kmeans records trained centroids and oracleSql inlines them") {
    Queries.lastKmeans = None
    assert(!SparkEntry.oracleSql.contains("ann_ivf_kmeans")) // before training
    SparkEntry.queries("ann_ivf_kmeans")(spark, sf).collect()
    val Some((cents, probes)) = Queries.lastKmeans
    assert(cents.length == graft.rag.AnnIvf.NCells)
    assert(probes.length == graft.rag.AnnIvf.NProbe)
    val sql = SparkEntry.oracleSql("ann_ivf_kmeans")
    assert(sql.contains("VALUES") && sql.contains("cidx IN"))
    // every centroid component round-trips through its SQL literal
    assert(cents.flatten.forall(d => d.toString.toDouble == d))
  }

  test("contract: every registered query except golden_extract carries an oracle") {
    // the driver's correctness gate IS the oracle compare — a query
    // registered without its SQL twin silently downgrades to a
    // rows-only check. Training-derived oracles (kmeans, PQ) appear
    // after their queries run once.
    SparkEntry.queries("ann_ivf_kmeans")(spark, sf).collect()
    SparkEntry.queries("pq_encode")(spark, sf).collect()
    val missing = SparkEntry.queries.keySet - "golden_extract" --
      SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracleSql: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
  }

  test("Staged.explodeOnce == inner explode for empty/null arrays and keeps keep-cols") {
    import spark.implicits._
    import graft.util.Staged
    val df = Seq(
      (1L, Seq(10L, 20L)),
      (2L, Seq.empty[Long]), // inner explode drops — so must we
      (3L, null.asInstanceOf[Seq[Long]]), // ditto for null arrays
      (4L, Seq(30L))).toDF("id", "arr")
    val viaOnce = Staged.explodeOnce(df, Seq(col("id")), col("arr"), "v")
      .as[(Long, Long)].collect().toSet
    val viaInner = df.select(col("id"), explode(col("arr")).as("v"))
      .as[(Long, Long)].collect().toSet
    assert(viaOnce == viaInner && viaOnce == Set((1L, 10L), (1L, 20L), (4L, 30L)))
    val posDf = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String]))
      .toDF("pos", "arr") // keep col NAMED "pos" — must not be captured
    val viaPos = Staged.posexplodeOnce(posDf, Seq(col("pos").as("keep")),
      col("arr"), "p", "v")
    assert(viaPos.columns.toSeq == Seq("keep", "p", "v"))
    assert(viaPos.as[(Long, Int, String)].collect().toSet ==
      Set((1L, 0, "a"), (1L, 1, "b")))
  }

  test("no native kernel is re-evaluated inside a Filter (InferFiltersFromGenerate)") {
    // explode(kernel(text)) lets Catalyst infer `size(kernel)>0 AND
    // isnotnull(kernel)` below the Generate and push it through the
    // staging alias — the kernel then runs 3x per row (FilterExec has
    // no subexpression elimination). Staged.explodeOnce (explode_outer
    // + output-attribute filter) defeats the inference; this test pins
    // that no kernel name ever appears in a physical Filter condition.
    val kernels = Seq("shinglehashes", "minhashsig", "hashembed",
      "simhash", "wordstats")
    val plans = Map(
      "ngram_lazy" -> plan(Dedup.ngramJaccard(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
        0.8, materialize = false)),
      "minhash_lazy" -> plan(Dedup.minhashPairs(
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
        materialize = false)),
      "decontaminate" -> plan(SparkEntry.queries("decontaminate")(spark, sf)),
      // the registered query materializes (localCheckpoint) — audit the
      // LAZY shape, which is the plan that actually executes inside it
      "decontaminate_bloom" -> plan {
        val d = spark.read.parquet(s"$sf/documents.parquet")
        Corpus.decontaminateBloom(
          d.filter(col("doc_id") % 20 =!= 0), d.filter(col("doc_id") % 20 === 0),
          "doc_id", "text", n = 4, materialize = false)
      },
      "embed_docs" -> plan(SparkEntry.queries("embed_docs")(spark, sf)),
      "vocab_top" -> plan(SparkEntry.queries("vocab_top")(spark, sf)),
      "distinctive_terms" -> plan(SparkEntry.queries("distinctive_terms")(spark, sf)))
    for ((name, p) <- plans) {
      val badConds = p.linesIterator
        .filter(_.trim.startsWith("Condition"))
        .filter(l => kernels.exists(l.toLowerCase.contains))
        .toList
      assert(badConds.isEmpty,
        s"$name re-evaluates a kernel in a Filter:\n${badConds.mkString("\n")}")
    }
  }

  test("decontaminate_bloom prescreen is native and codegen (no UDF)") {
    // r4 verdict Missing #2: the prescreen probe was a Scala UDF —
    // it broke whole-stage codegen in the hottest filter of the scale
    // path. The rewrite probes via the native BloomFilterMightContain
    // over a binary literal; this pins (a) no UDF anywhere in the
    // plan, (b) the probe present as a Filter condition, (c) the
    // filter inside a WholeStageCodegen span (the formatted explain
    // marks codegen'd operators with a (codegen id)).
    // the registered query materializes (localCheckpoint), returning a
    // Scan ExistingRDD — audit the LAZY plan, which is what executes
    // inside the materialization
    val d0 = spark.read.parquet(s"$sf/documents.parquet")
    val df = Corpus.decontaminateBloom(
      d0.filter(col("doc_id") % 20 =!= 0), d0.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 4, materialize = false)
    val p = plan(df)
    assert(!p.toLowerCase.contains("batchevalpython") &&
      !p.contains("UDF") && !p.contains("ScalaUDF"), p)
    assert(p.contains("might_contain"), p)
    // codegen spans only appear on the FINAL (post-AQE) executed plan —
    // run the query, then require the probe's Filter line to carry the
    // *(n) whole-stage-codegen marker in the simple plan string
    df.collect()
    // the AdaptiveSparkPlan string repeats the tree as "== Initial
    // Plan ==" WITHOUT codegen stars — judge only the final section
    val executed = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val probeLines = executed.linesIterator
      .filter(l => l.contains("might_contain") && l.contains("Filter")).toList
    assert(probeLines.nonEmpty, s"no might_contain Filter in:\n$executed")
    assert(probeLines.forall(_.contains("*(")),
      s"prescreen Filter not codegen'd:\n${probeLines.mkString("\n")}")
  }

  test("suite sweep: EVERY registered query plans cartesian-free") {
    // the targeted plan tests above pin the interesting shapes; this
    // sweep is the structural floor for the whole contract surface — a
    // future query that quietly plans a CartesianProduct or
    // BroadcastNestedLoopJoin (the all-pairs scale-killers) fails here
    // even without a dedicated test. Sole exception: the O(n²) recall
    // BASELINE embed_neardup_exact, whose non-equi a_id < b_id join is
    // intentional and hard-ceilinged at 100k rows by its own guard.
    val allowedQuadratic = Set("embed_neardup_exact")
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(allowedQuadratic)
      .flatMap { name =>
        val p = plan(SparkEntry.queries(name)(spark, sf))
        if (p.contains("CartesianProduct") ||
            p.contains("BroadcastNestedLoopJoin")) Some(name) else None
      }
    assert(offenders.isEmpty, s"queries planning cartesians: $offenders")
  }

  test("IVF centroid training is cached per corpus snapshot") {
    graft.rag.AnnIvf.clearCentroidCache()
    val e = SparkEntry.embeddings(spark, sf)
    val c1 = graft.rag.AnnIvf.kmeansCentroids(e)
    val c2 = graft.rag.AnnIvf.kmeansCentroids(SparkEntry.embeddings(spark, sf))
    assert(c1 eq c2, "second call must hit the cache (same snapshot)")
    val f1 = graft.rag.AnnIvf.centroids(e)
    assert(f1 ne c1) // different trainer, different cache entry
    assert(graft.rag.AnnIvf.centroids(e) eq f1)
  }

  test("IVF probe prunes partitions when cell is the write-time partition column") {
    import graft.rag.AnnIvf
    val e = SparkEntry.embeddings(spark, sf)
    val cents = AnnIvf.centroids(e)
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout").toString + "/emb"
    e.withColumn("cell", AnnIvf.cellCol(col("embedding"), cents))
      .write.partitionBy("cell").parquet(dir)
    val probes = Seq(0, 1)
    val pruned = spark.read.parquet(dir)
      .filter(col("cell").isin(probes.map(Integer.valueOf): _*))
    val p = plan(pruned)
    // the probe predicate must land in PartitionFilters (directory
    // pruning at planning time), NOT as a post-scan data filter
    assert(p.contains("PartitionFilters"), p)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p)
    val full = spark.read.parquet(dir)
    val expected = full.filter(col("cell").isin(probes.map(Integer.valueOf): _*)).count()
    assert(pruned.count() == expected && expected > 0)
    assert(expected < full.count(), "probe must scan a strict subset")
  }

  test("sampleHash: deterministic, partition-independent, rate-bounded") {
    import graft.text.TextOps
    val d = SparkEntry.docs(spark, sf)
    val once = TextOps.sampleHash(d, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = TextOps.sampleHash(d.repartition(7), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again, "sampling must not depend on partitioning")
    assert(TextOps.sampleHash(d, "doc_id", 0.0).count() == 0)
    assert(TextOps.sampleHash(d, "doc_id", 1.0).count() == d.count())
    // nested sampling with distinct salts composes independently
    val nested = TextOps.sampleHash(
      TextOps.sampleHash(d, "doc_id", 0.5, "a"), "doc_id", 0.5, "b").count()
    assert(nested < once.size && nested > 0)
  }

  test("groupMedianExact picks the lower-median ELEMENT; filter keeps >= half per group") {
    import spark.implicits._
    import graft.text.TextOps
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 7.0), ("g", 3L, 3.0), ("g", 4L, 9.0),
      ("h", 5L, 5.0), ("h", 6L, 2.0), ("h", 7L, 8.0))
      .toDF("grp", "id", "v")
    val med = TextOps.groupMedianExact(df, "grp", "v", "id")
      .as[(String, Double)].collect().toMap
    // g sorted: 1,3,7,9 → lower median element 3.0; h sorted: 2,5,8 → 5.0
    assert(med == Map("g" -> 3.0, "h" -> 5.0))
    val kept = TextOps.aboveGroupMedian(df, "grp", "v", "id")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 5L, 7L))
  }

  test("groupPercentilesExact = brute-force rank pick; q=0.5 equals the median op") {
    import spark.implicits._
    import graft.text.TextOps
    val rows = (0L until 37L).map(i => (i, s"g${i % 3}", (i * 7 % 11).toDouble))
    val df = rows.toDF("id", "g", "v")
    val got = TextOps.groupPercentilesExact(df, "g", "v", "id")
      .as[(String, Double, Double)].collect().toSet
    val want = rows.groupBy(_._2).flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
      Seq(0.25, 0.5, 0.75).map { q =>
        val rank = math.max(1, math.floor(q * (sorted.size + 1)).toLong)
        (g, q, sorted((rank - 1).toInt))
      }
    }.toSet
    assert(got == want)
    val med = TextOps.groupMedianExact(df, "g", "v", "id")
      .as[(String, Double)].collect().toMap
    got.filter(_._2 == 0.5).foreach { case (g, _, v) => assert(v == med(g)) }
  }

  test("topPerGroup: k best per group, score desc, id tiebreak") {
    import spark.implicits._
    val df = Seq(("g1", 1L, 5.0), ("g1", 2L, 9.0), ("g1", 3L, 9.0),
      ("g1", 4L, 1.0), ("g2", 5L, 2.0))
      .toDF("g", "id", "score")
    val got = graft.text.TextOps.topPerGroup(df, "g", "score", "id", 2)
      .select("g", "rank", "id").as[(String, Int, Long)].collect().toSet
    assert(got == Set(("g1", 1, 2L), ("g1", 2, 3L), ("g2", 1, 5L)))
  }

  test("banded jaccard is a subset of the exhaustive uncapped path with measured recall") {
    import spark.implicits._
    val docs = SparkEntry.docs(spark, sf)
    // uncapped exhaustive = the recall reference (the df cap changes
    // scores, so compare against maxDf = ∞)
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", 0.5, maxDf = Int.MaxValue)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val banded = Dedup.ngramJaccardBanded(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(exact), "the prescreen must never invent a pair")
    val recall = if (exact.isEmpty) 1.0 else banded.size.toDouble / exact.size
    info(f"banded-jaccard recall at θ=0.5: $recall%.2f (${banded.size}/${exact.size})")
    assert(recall >= 0.4, s"recall $recall collapsed — banding misconfigured")
    // plan audit: no cartesian anywhere in the lazy plan
    val p = plan(Dedup.ngramJaccardBanded(docs, "doc_id", "text", 0.5,
      materialize = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ngram df cap drops stop-shingle-only candidate pairs") {
    import spark.implicits._
    // every doc shares exactly the boilerplate shingle "aa bb cc"
    val docs = (0 until 4)
      .map(i => (i.toLong, s"aa bb cc x$i y$i"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text",
      threshold = 0.1, maxDf = 1000)
    assert(uncapped.count() == 6) // all pairs share the stop shingle
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text",
      threshold = 0.1, maxDf = 3) // df("aa bb cc") = 4 > 3 → dropped
    assert(capped.count() == 0)
  }

  test("ngramJaccard keeps its output id type and accepts non-integral ids") {
    import spark.implicits._
    // int ids: the capped-ids aggregate collects BIGINT internally but
    // the output pair columns must keep the caller's id type (the
    // cast-back), and values must match the long-id run
    val intDocs = (0 until 4)
      .map(i => (i, s"aa bb cc x$i y$i shared tail words here"))
      .toDF("doc_id", "text")
    val intPairs = Dedup.ngramJaccard(intDocs, "doc_id", "text", 0.3)
    assert(intPairs.schema("a_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val longPairs = Dedup.ngramJaccard(
      intDocs.withColumn("doc_id", col("doc_id").cast("long")),
      "doc_id", "text", 0.3)
    assert(intPairs.collect().map(r => (r.getInt(0).toLong, r.getInt(1).toLong,
        r.getDouble(2))).toSet ==
      longPairs.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSet)
    // string ids take the generic df-count + anti-join path
    val strDocs = (0 until 4)
      .map(i => (s"d$i", s"aa bb cc x$i y$i shared tail words here"))
      .toDF("doc_id", "text")
    val strPairs = Dedup.ngramJaccard(strDocs, "doc_id", "text", 0.3)
    assert(strPairs.schema("a_id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(strPairs.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      intPairs.collect().map(r => (s"d${r.getInt(0)}", s"d${r.getInt(1)}")).toSet)
  }

  test("repetition_stats: line stats stay below the Generate (once per doc, not per gram)") {
    val p = plan(SparkEntry.queries("repetition_stats")(spark, sf))
    // the explode must consume the STAGED gram-array column, not
    // recompute the kernel — and the line expressions must not appear
    // in any projection above the Generate (the regression this test
    // pins: selected alongside explode, the analyzer rebuilds them
    // above, re-evaluating split/array_distinct per 2-gram row)
    assert(p.contains("explode(gs"), p)
    val aboveGenerate = p.split("Generate").head
    assert(!aboveGenerate.contains("array_distinct"), p)
  }

  test("distinctive_terms: rank pushes down as WindowGroupLimit; df side broadcasts") {
    val p = plan(SparkEntry.queries("distinctive_terms")(spark, sf))
    assert(p.contains("WindowGroupLimit"), p) // partial top-k before the exchange
    assert(p.contains("BroadcastHashJoin"), p) // vocabulary-sized df frame
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ann_ivfpq: compressed-domain shortlist then bounded exact refine, both TakeOrdered") {
    val p = plan(SparkEntry.queries("ann_ivfpq")(spark, sf))
    // two stacked TakeOrdered (tree + details sections → 4 mentions):
    // ADC shortlist (k·refine = 40) then refined top-k (10)
    assert("TakeOrderedAndProject".r.findAllIn(p).size == 4, p)
    assert(p.contains("Arguments: 40,"), p) // ADC shortlist (k·refine)
    assert(p.contains("Arguments: 10,"), p) // refined top-k
    assert(!p.contains("Exchange"), p) // single narrow pass, no shuffle
  }

  test("corpus_rollup plans one Expand + hash aggregate (no per-set scans)") {
    val p = plan(SparkEntry.queries("corpus_rollup")(spark, sf))
    assert("Expand".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("Union"), p) // grouping sets, not unioned scans
  }
}
