package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator for SCALING-CURVE runs past
  * the driver's largest fixture (sf0.1) — the round-10 verdict's "cash
  * the 100 TB claims" item: the plan-shape arguments want at least one
  * measured wall/CPU/shuffle curve across scales, and the driver's
  * testdata stops at sf0.1.
  *
  * Generates all ten harness tables (documents, embeddings, customer,
  * part, orders, lineitem, events, supplier, nation, region) with the
  * same statistical fingerprint as the driver fixtures (measured round
  * 11), so the ENTIRE registry can bench at generated scales:
  *  - documents: uniform-length 10..100 texts; lang 40/15×4; source =
  *    'src'||(doc_id%20); n_chars = len(text). DEFAULT mode "real"
  *    (round-12): Heaps-law vocabulary (V = ⌈10·√tokens⌉, so vocab
  *    grows with the corpus like real text) with Zipf(1) word draw —
  *    the 30 fixture words are the top ranks, rarer ranks render as
  *    "w<rank>"; near-dup truth is then ~only the PLANTED 5% of docs
  *    that copy a partner doc's text verbatim with ' dup' appended
  *    (fixed dup RATE — cluster-family answers scale Θ(n), the
  *    production shape). Mode "fixture30" (3rd CLI arg) reproduces the
  *    round-11 uniform-30-word corpus, where token-SET J ≥ 0.9 holds
  *    intrinsically for ~7% of ALL pairs (Θ(n²) true answers —
  *    measured as the round-11 curve's honest outlier), for replaying
  *    historical curves.
  *  - embeddings: unit-norm 64-dim gaussians (Box–Muller over hash
  *    uniforms), label 0..9 independent of the vector (fixture
  *    within-label mean cosine ≈ 0.0008 — no cluster structure).
  *  - customer/part: the 'Customer#%09d' and adj+noun (8×8 = 64 names)
  *    formats whose digit-edit / typo-chain pair structure drives the
  *    fuzzy-ER queries.
  *  - orders/lineitem: sequential orderkeys, uniform custkeys, lines
  *    per order ≈ 1+U(0,3)+U(0,3) (fixture is Poisson-4-ish, 1..17),
  *    uniform suppkeys — the pagerank bipartite graph's degree shape.
  *
  * All randomness is xxhash64(column-id, stream-tag) bit-mixing — no
  * RNG state, so any row regenerates identically at any parallelism and
  * the output is byte-stable across runs. Everything is spark.range +
  * column expressions: generation itself is shuffle-free and scales to
  * any sf.
  *
  * Usage: runMain graft.tools.GenData <outDir> <sf> — writes
  * <outDir>/{documents,embeddings,customer,part,orders,lineitem}.parquet
  * with row counts = sf × the per-sf1 cardinalities (50k docs, 20k
  * vectors, 150k customers, 200k parts, 1.5M orders, ~6M lineitem).
  */
object GenData {

  private val vocab: Seq[String] = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  /** Uniform double in [0, 1) from a hashed (id, tag) stream. */
  private def u(id: Column, tag: String): Column =
    (pmod(xxhash64(lit(tag), id), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))

  /** Uniform long in [0, n) from a hashed (id, tag) stream. */
  private def ui(id: Column, tag: String, n: Long): Column =
    pmod(xxhash64(lit(tag), id), lit(n))

  /** Uniform double in [0, 1) from a hashed (id, position, tag) stream. */
  private def u2(id: Column, pos: Column, tag: String): Column =
    (pmod(xxhash64(lit(tag), id, pos), lit(1L << 40)).cast("double")
      / lit((1L << 40).toDouble))

  def main(args: Array[String]): Unit = {
    val Array(outDir, sfStr) = args.take(2)
    val mode = args.lift(2).getOrElse("real")
    require(mode == "real" || mode == "fixture30" || mode == "clustered",
      s"mode must be 'real', 'fixture30' or 'clustered', got $mode")
    val sf = sfStr.toDouble
    require(sf > 0, s"sf must be positive, got $sf")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def n(base: Long): Long = math.max(1L, (base * sf).toLong)
    val vocabCol = array(vocab.map(lit): _*)

    // documents ------------------------------------------------------
    // 5% of docs are PLANTED near-duplicates — a partner doc's full
    // text with " dup" appended, exactly the fixture structure (250 of
    // 5000 sf0.1 docs carry a single trailing 'dup' token and share
    // their entire 8-gram prefix with one partner; all 250 'dup'
    // occurrences in the corpus are those markers). Because base text
    // is a PURE FUNCTION of doc_id, the dup doc regenerates its
    // partner's words without any join — generation stays shuffle-free.
    val nDocs = n(50000)
    // mode "real" (default): statistically realistic corpus — the
    // round-11 verdict's top item. The old 30-word uniform vocabulary
    // made token-SET Jaccard ≥ 0.9 an INTRINSIC property of ~7% of all
    // doc pairs, so the measured dedup-family scaling curve tracked
    // the generator's degeneracy (a Θ(n²) true answer) instead of
    // production behavior. Realistic shape: Heaps-law vocabulary
    // V = max(30, ceil(10·√T)) for T = expected corpus tokens (vocab
    // grows ~√corpus, the empirical law), Zipf(s=1) word draw via the
    // exact inverse CDF of the continuous Zipf approximation
    // (r = floor(exp(u · ln(V+1))) − 1 gives P(r) ∝ 1/(1+r)), and the
    // 30 fixture words serve as ranks 0-29 so the most frequent
    // tokens stay the fixture's real words (incl. the stopword 'the'
    // the quality queries look for); rarer ranks render as "w<rank>".
    // Non-planted near-dup pairs are then vanishingly rare, while the
    // planted 5% partner-copy RATE (below) is unchanged — cluster-
    // family truth becomes Θ(n), the production shape.
    // mode "fixture30" reproduces the old uniform-30-word corpus for
    // replaying historical curves.
    val avgLen = 55.0
    val vocabSize: Long =
      if (mode == "fixture30") 30L
      else math.max(30L, math.ceil(10.0 * math.sqrt(nDocs * avgLen)).toLong)
    println(s"[gendata] documents mode=$mode vocab=$vocabSize")
    def zipfWord(idCol: Column, j: Column): Column = {
      val r =
        if (mode == "fixture30") pmod(xxhash64(lit("w"), idCol, j), lit(30))
        else least(lit(vocabSize - 1),
          floor(exp(u2(idCol, j, "w") * math.log(vocabSize + 1.0)))
            .cast("long") - 1)
      when(r < 30, element_at(vocabCol, (r + 1).cast("int")))
        .otherwise(concat(lit("w"), r))
    }
    def baseText(idCol: Column): Column = {
      val len = (lit(10) + ui(idCol, "len", 91)).cast("int")
      concat_ws(" ", transform(sequence(lit(0), len - 1),
        j => zipfWord(idCol, j)))
    }
    // Partner must not itself be a dup doc (a dup partner's STORED
    // text is its own partner's text + " dup", so the plant would
    // duplicate no stored document). Pure-function fix: try three
    // independent candidate streams, take the first non-dup; the
    // all-three-dup fallback leaves ~0.05^3 of plants (≈6e-6 of the
    // corpus) short, noted here. Because the doc itself IS a dup,
    // any non-dup candidate is automatically ≠ doc_id.
    def isDupId(idCol: Column): Column = ui(idCol, "isdup", 20) === 0
    def cand(tag: String): Column = ui(col("doc_id"), tag, nDocs)
    spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("_isdup", isDupId(col("doc_id")))
      .withColumn("_partner",
        when(!isDupId(cand("partner")), cand("partner"))
          .when(!isDupId(cand("partnerB")), cand("partnerB"))
          .when(!isDupId(cand("partnerC")), cand("partnerC"))
          .otherwise(cand("partner")))
      .withColumn("text",
        when(col("_isdup") && col("_partner") =!= col("doc_id"),
          concat(baseText(col("_partner")), lit(" dup")))
          .otherwise(baseText(col("doc_id"))))
      .withColumn("lang",
        when(u(col("doc_id"), "lang") < 0.40, "en")
          .when(u(col("doc_id"), "lang") < 0.55, "zh")
          .when(u(col("doc_id"), "lang") < 0.70, "es")
          .when(u(col("doc_id"), "lang") < 0.85, "fr")
          .otherwise("de"))
      .withColumn("source", concat(lit("src"), pmod(col("doc_id"), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("_isdup", "_partner")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // embeddings -----------------------------------------------------
    // mode "clustered" (r18): a mixture of 100 hash-derived Gaussians
    // with Zipf-skewed sizes instead of one isotropic cloud. Isotropic
    // vectors CAP every IVF-family recall at the probed share
    // (ARCHITECTURE.md; measured in tools/probe_ceiling.py), which
    // makes the synthetic frontier look worse than production — real
    // document embeddings cluster heavily. Cluster of a vector is
    // floor(100·u²) (share of cluster c ≈ (√(c+1)−√c)/10: the hottest
    // cell holds ~10%, the tail ~0.5% — a 20× hot/empty-cell stress),
    // center coordinates are unit gaussians of the cluster id, members
    // are center + 0.25·noise (within-cluster cosine ≈ 0.9, cross ≈ 0).
    // Same hash-counter construction: shuffle-free, byte-stable.
    val nVecs = n(20000)
    def gauss(tag1: String, tag2: String, key: Column, j: Column): Column = {
      val u1 = (pmod(xxhash64(lit(tag1), key, j), lit(1L << 40))
        .cast("double") + lit(1.0)) / lit((1L << 40).toDouble)
      val u2 = pmod(xxhash64(lit(tag2), key, j), lit(1L << 40))
        .cast("double") / lit((1L << 40).toDouble)
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    }
    val rawCol =
      if (mode == "clustered") {
        val uc = u(col("vec_id"), "cluster")
        val cl = floor(uc * uc * lit(100.0)).cast("long")
        transform(sequence(lit(0), lit(63)), j =>
          gauss("c1", "c2", cl, j) / lit(8.0) +
            gauss("g1", "g2", col("vec_id"), j) * lit(0.25) / lit(8.0))
      } else
        transform(sequence(lit(0), lit(63)), j =>
          gauss("g1", "g2", col("vec_id"), j))
    spark.range(nVecs).select(col("id").as("vec_id"))
      .withColumn("_raw", rawCol)
      .withColumn("_norm", sqrt(aggregate(col("_raw"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("_raw"), x => (x / col("_norm")).cast("double")))
      .withColumn("label", ui(col("vec_id"), "label", 10).cast("int"))
      .select("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // customer -------------------------------------------------------
    val nCust = n(150000)
    spark.range(nCust).select(col("id").as("c_custkey"))
      .withColumn("c_name",
        concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
      .withColumn("c_nationkey", ui(col("c_custkey"), "nat", 25).cast("int"))
      .withColumn("c_acctbal",
        round(u(col("c_custkey"), "bal") * 10000.0, 2))
      .withColumn("c_mktsegment",
        element_at(array(lit("AUTOMOBILE"), lit("BUILDING"), lit("FURNITURE"),
          lit("HOUSEHOLD"), lit("MACHINERY")),
          (ui(col("c_custkey"), "seg", 5) + 1).cast("int")))
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")

    // part -----------------------------------------------------------
    val nPart = n(200000)
    val adjs = array(Seq("large", "hot", "blue", "old", "cold", "new",
      "red", "small").map(lit): _*)
    val nouns = array(Seq("ring", "bolt", "plate", "gear", "wheel", "pin",
      "rod", "cap").map(lit): _*)
    spark.range(nPart).select(col("id").as("p_partkey"))
      .withColumn("p_name", concat(
        element_at(adjs, (ui(col("p_partkey"), "adj", 8) + 1).cast("int")),
        lit(" "),
        element_at(nouns, (ui(col("p_partkey"), "noun", 8) + 1).cast("int"))))
      .withColumn("p_brand",
        concat(lit("Brand#"), ui(col("p_partkey"), "brand", 25)))
      .withColumn("p_type",
        concat(lit("TYPE "), ui(col("p_partkey"), "type", 30)))
      .withColumn("p_size", (ui(col("p_partkey"), "size", 50) + 1).cast("int"))
      .withColumn("p_retailprice",
        round(lit(900.0) + u(col("p_partkey"), "rp") * 1200.0, 2))
      .write.mode("overwrite").parquet(s"$outDir/part.parquet")

    // orders ---------------------------------------------------------
    val nOrders = n(1500000)
    val orders = spark.range(nOrders).select(col("id").as("o_orderkey"))
      .withColumn("o_custkey", ui(col("o_orderkey"), "cust", nCust))
      .withColumn("o_orderstatus",
        element_at(array(lit("F"), lit("O"), lit("P")),
          (ui(col("o_orderkey"), "stat", 3) + 1).cast("int")))
      .withColumn("o_totalprice",
        round(u(col("o_orderkey"), "tp") * 400000.0, 2))
      .withColumn("o_orderdate",
        date_add(lit(java.sql.Date.valueOf("1995-01-01")),
          ui(col("o_orderkey"), "od", 2400).cast("int")))
      .withColumn("o_orderpriority",
        element_at(array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
          lit("4-NOT SPECIFIED"), lit("5-LOW")),
          (ui(col("o_orderkey"), "pri", 5) + 1).cast("int")))
    orders.write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    // lineitem -------------------------------------------------------
    val nSupp = n(10000)
    spark.range(nOrders).select(col("id").as("l_orderkey"))
      // 1 + U(0,3) + U(0,3): triangular on 1..7, mean 4 (fixture shape)
      .withColumn("_k", (lit(1) + ui(col("l_orderkey"), "k1", 4)
        + ui(col("l_orderkey"), "k2", 4)).cast("int"))
      .select(col("l_orderkey"),
        explode(sequence(lit(1), col("_k"))).as("l_linenumber"))
      .withColumn("l_partkey",
        pmod(xxhash64(lit("pk"), col("l_orderkey"), col("l_linenumber")),
          lit(nPart)))
      .withColumn("l_suppkey",
        pmod(xxhash64(lit("sk"), col("l_orderkey"), col("l_linenumber")),
          lit(nSupp)))
      .withColumn("l_quantity",
        (pmod(xxhash64(lit("q"), col("l_orderkey"), col("l_linenumber")),
          lit(50)) + 1).cast("double"))
      .withColumn("l_extendedprice",
        round(col("l_quantity") * (lit(900.0) +
          pmod(xxhash64(lit("ep"), col("l_orderkey"), col("l_linenumber")),
            lit(1200)).cast("double")), 2))
      .withColumn("l_discount",
        (pmod(xxhash64(lit("d"), col("l_orderkey"), col("l_linenumber")),
          lit(11)).cast("double") / 100.0))
      .withColumn("l_tax",
        (pmod(xxhash64(lit("t"), col("l_orderkey"), col("l_linenumber")),
          lit(9)).cast("double") / 100.0))
      .withColumn("l_returnflag",
        element_at(array(lit("A"), lit("N"), lit("R")),
          (pmod(xxhash64(lit("rf"), col("l_orderkey"), col("l_linenumber")),
            lit(3)) + 1).cast("int")))
      .withColumn("l_linestatus",
        element_at(array(lit("F"), lit("O")),
          (pmod(xxhash64(lit("ls"), col("l_orderkey"), col("l_linenumber")),
            lit(2)) + 1).cast("int")))
      .withColumn("l_shipdate",
        date_add(lit(java.sql.Date.valueOf("1995-01-01")),
          pmod(xxhash64(lit("sd"), col("l_orderkey"), col("l_linenumber")),
            lit(2500)).cast("int")))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // events ---------------------------------------------------------
    // fixture fingerprint: value ~ Exponential(mean 50) (measured
    // stddev ≈ mean, median ≈ 50·ln2), ts uniform over 2024-01-01 ..
    // 2024-01-31, uniform event_type over 5, props = {"k": 0..99},
    // user_id uniform over 15000·sf users
    val nEvents = n(1000000)
    val nUsers = n(15000)
    spark.range(nEvents).select(col("id").as("event_id"))
      .withColumn("ts", timestamp_micros(
        lit(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .toEpochMilli * 1000L) +
          (u(col("event_id"), "ts") * lit(30.0 * 86400 * 1e6)).cast("long")))
      .withColumn("user_id", ui(col("event_id"), "uid", nUsers))
      .withColumn("event_type",
        element_at(array(lit("view"), lit("click"), lit("purchase"),
          lit("signup"), lit("error")),
          (ui(col("event_id"), "et", 5) + 1).cast("int")))
      .withColumn("value",
        -lit(50.0) * log(lit(1.0) - u(col("event_id"), "val")))
      .withColumn("props",
        concat(lit("{\"k\": "), ui(col("event_id"), "pk", 100), lit("}")))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    // supplier / nation / region ------------------------------------
    spark.range(n(10000)).select(col("id").as("s_suppkey"))
      .withColumn("s_name",
        concat(lit("Supplier#"), lpad(col("s_suppkey").cast("string"), 9, "0")))
      .withColumn("s_nationkey", ui(col("s_suppkey"), "snat", 25).cast("int"))
      .withColumn("s_acctbal", round(u(col("s_suppkey"), "sbal") * 10000.0, 2))
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    spark.range(25).select(col("id").cast("int").as("n_nationkey"))
      .withColumn("n_name", concat(lit("NATION_"), col("n_nationkey")))
      .withColumn("n_regionkey", pmod(col("n_nationkey"), lit(5)).cast("int"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/nation.parquet")
    spark.range(5).select(col("id").cast("int").as("r_regionkey"))
      .withColumn("r_name", element_at(
        array(lit("AFRICA"), lit("AMERICA"), lit("ASIA"), lit("EUROPE"),
          lit("MIDDLE EAST")), (col("r_regionkey") + 1).cast("int")))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/region.parquet")

    println(s"GENDATA_DONE: $outDir sf=$sf docs=$nDocs vecs=$nVecs " +
      s"cust=$nCust part=$nPart orders=$nOrders events=$nEvents")
    spark.stop()
  }
}
