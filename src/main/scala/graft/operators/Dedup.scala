package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication suite — harness north-star (BASELINE.json):
  * exact, bag-fingerprint, MinHash+LSH, SimHash, n-gram Jaccard with
  * prefix filtering. Every method is candidate-generation-by-equi-join:
  * no method ever materializes the full O(n²) pair space, which is what
  * makes them viable at 100 TB.
  */
object Dedup {

  /** Distinct word set of a document — the unit all set-based methods
    * work over. */
  def tokenSet(text: Column): Column = array_distinct(split(text, " "))

  /** Distinct token set hashed to longs: set identity and Jaccard are
    * preserved (collision odds ~n²·2⁻⁶⁴), and long-array intersections
    * are far cheaper than string-array ones on the verify path.
    * Imperative single-pass eval (plans.TextHashNative) — value-equal to
    * `array_sort(array_distinct(transform(split(text," "), xxhash64)))`,
    * asserted per-row in ExtensionsSpec; output is SORTED (the canonical
    * order the verify path needs anyway). */
  def tokenHashSet(text: Column): Column =
    graft.plans.TextHashNative.tokenHashSet(text)

  // ---- shared collapse → verify → expand core -------------------------

  /** The scale core all set-similarity dedup shares: (1) collapse docs
    * with IDENTICAL sets to one representative (clusters of hundreds of
    * true dups collapse to 1 — measured 5000→3935 sets on the harness
    * corpus); (2) run candidate generation + exact Jaccard verification
    * on representatives only; (3) expand back to member pairs with
    * joins — within-cluster pairs have Jaccard exactly 1, cross-cluster
    * pairs inherit their representatives' Jaccard. Output is identical
    * to verifying every pair directly, but verification work scales
    * with DISTINCT sets, not documents.
    *
    * @param docs (_id, _set: array<long>)
    * @param candidates reps(_fp, _set) → candidate pairs
    *                   (_fpa, _fpb), any orientation, dupes allowed
    *
    * Note: two small frames are persisted per invocation (via
    * [[graft.core.CacheGovernor.persistTracked]]) and stay cached for
    * the session (they back the lazily-returned result). Long-lived
    * sessions issuing many dedup calls should call
    * `CacheGovernor.isolate()` (or `reset`) after materializing
    * results — Bench and Verify do.
    */
  private def collapseVerifyExpand(
      docs: DataFrame,
      candidates: DataFrame => DataFrame,
      threshold: Double,
      candidatesDistinct: Boolean = false): DataFrame = {
    val (tagged, verified) =
      collapseVerify(docs, candidates, threshold, candidatesDistinct)
    expandPairs(tagged.select(col("_fp"), col("_id")), verified)
  }

  /** Member-pair expansion stage of [[collapseVerifyExpand]]:
    * within-fingerprint pairs are exact duplicates (J = 1); cross pairs
    * inherit their representatives' verified Jaccard. */
  private def expandPairs(members: DataFrame, verified: DataFrame): DataFrame = {
    val within = members.select(col("_fp"), col("_id").as("a_id"))
      .join(members.select(col("_fp"), col("_id").as("b_id")), "_fp")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jaccard"))
    val cross = verified
      .join(members.select(col("_fp").as("_fpa"), col("_id").as("_ida")), "_fpa")
      .join(members.select(col("_fp").as("_fpb"), col("_id").as("_idb")), "_fpb")
      .select(least(col("_ida"), col("_idb")).as("a_id"),
        greatest(col("_ida"), col("_idb")).as("b_id"), col("jaccard"))
    within.unionByName(cross)
  }

  /** Collapse + candidate + verify stages of [[collapseVerifyExpand]],
    * without the member-pair expansion: returns (tagged docs with their
    * set fingerprint, verified representative pairs). Cluster-level
    * consumers ([[minHashClusters]]) work on this graph directly — a
    * cluster of k true duplicates contributes ONE node, not k²/2 pairs. */
  private[graft] def collapseVerify(
      docs: DataFrame,
      candidates: DataFrame => DataFrame,
      threshold: Double,
      candidatesDistinct: Boolean = false): (DataFrame, DataFrame) = {
    // Both frames fan out to 3+ branches of the DAG (candidates, two
    // verify joins, member expansion); without persistence Spark
    // recomputes the tokenize→hash subtree per branch, which profiled
    // as ~70% of the whole operator. They are small — O(docs × set
    // size) — and evictable (MEMORY_AND_DISK).
    // PRECONDITION: _set must arrive SORTED (canonical order) — the
    // fingerprint below needs a canonical order and the verify stage's
    // two-pointer codegen intersect requires sorted inputs. Both
    // producers ([[tokenHashSet]], [[shingleHashSet]]) emit sorted sets
    // by construction (plans.TextHashNative sorts in its single pass);
    // a new caller with unsorted sets must array_sort first or the
    // verify silently undercounts.
    val tagged = graft.core.CacheGovernor.persistTracked(docs
      .withColumn("_fp", xxhash64(col("_set"))))
    val reps = graft.core.CacheGovernor.persistTracked(tagged.groupBy("_fp")
      .agg(first(col("_set")).as("_set")))
    // a generator declaring candidatesDistinct emits each pair exactly
    // once, already canonical — the dedup shuffle over collision rows
    // (the most expensive stage of the minhash build before the
    // skip-earlier-bands filter) disappears entirely
    val raw = candidates(reps)
      .select(least(col("_fpa"), col("_fpb")).as("_fpa"),
        greatest(col("_fpa"), col("_fpb")).as("_fpb"))
      .filter(col("_fpa") =!= col("_fpb"))
    val cand = if (candidatesDistinct) raw else raw.dropDuplicates("_fpa", "_fpb")
    // Union-free exact Jaccard with the two-pointer codegen intersect.
    // Sortedness comes from the entry PRECONDITION above (the native
    // tokenHashSet/shingleHashSet producers emit sorted sets).
    // |A∪B| = |A|+|B|−|A∩B| — same integers as
    // size(array_intersect)/size(array_union), same double, a fraction
    // of the per-pair work.
    val verified = cand
      .join(reps.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
      .join(reps.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
      .withColumn("_i",
        graft.plans.VectorNative.sortedIntersectSize(col("_seta"), col("_setb")))
      .withColumn("jaccard",
        col("_i").cast("double") / (size(col("_seta")) + size(col("_setb")) - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select("_fpa", "_fpb", "jaccard")
    (tagged, verified)
  }

  // ---- exact / fingerprint -------------------------------------------

  /** Exact dedup on chosen columns: plain hash-groupBy. */
  def exact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** Bag-of-words fingerprint: md5 of the sorted distinct token set.
    * Catches reorderings/repetitions that byte-exact dedup misses; one
    * shuffle on the 32-char fingerprint. */
  def withFingerprint(df: DataFrame, text: String): DataFrame =
    df.withColumn("fingerprint",
      md5(concat_ws(" ", array_sort(tokenSet(col(text)))).cast("binary")))

  /** Fingerprint duplicate groups: fingerprint → group size + id range. */
  def fingerprintGroups(df: DataFrame, id: String, text: String): DataFrame =
    withFingerprint(df, text)
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_docs"), min(col(id)).as("min_doc"), max(col(id)).as("max_doc"))
      .filter(col("n_docs") > 1)

  /** Canonical-document pick per duplicate group: among
    * fingerprint-identical docs keep the best-QUALITY member
    * ([[TextAnalysis.qualityScore]] desc, id asc tiebreak) — the pick a
    * shipped corpus wants, vs. an arbitrary or min-id survivor. One
    * hash aggregation (max_by on the (quality, -id) struct); duplicate
    * groups are tiny by construction so nothing skews. */
  def canonicalByQuality(df: DataFrame, id: String, text: String): DataFrame =
    withFingerprint(df, text)
      .withColumn("_q", TextAnalysis.qualityScore(col(text)))
      .groupBy("fingerprint")
      .agg(expr(s"max_by($id, struct(_q, -$id))").as("keep_id"),
        count(lit(1)).as("n_docs"), max(col("_q")).as("quality"))

  /** Incremental corpus ingest: dedup a NEW batch against an
    * already-indexed corpus WITHOUT reprocessing the corpus — the
    * nightly-shard shape of a production pipeline. `index` carries one
    * narrow `fingerprint` column (32-char md5, from [[withFingerprint]]
    * on previous batches), never the documents themselves. A new row
    * survives iff (a) its fingerprint misses the index (left-anti hash
    * join; Catalyst broadcasts when the index is small) and (b) it is
    * the minimum-`id` holder of its fingerprint within the batch — a
    * deterministic survivor, unlike dropDuplicates' partition-order
    * winner. Appending the survivors' fingerprints to the index keeps
    * the invariant for the next batch. Fingerprint groups are tiny by
    * construction, so the within-batch window cannot skew. */
  def dedupAgainstIndex(
      newDocs: DataFrame, id: String, text: String, index: DataFrame): DataFrame = {
    require(index.columns.contains("fingerprint"),
      "index must carry a 'fingerprint' column")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")
    withFingerprint(newDocs, text)
      .join(index.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .withColumn("_mid", min(col(id)).over(w))
      .filter(col(id) === col("_mid"))
      .drop("_mid")
  }

  // ---- MinHash + LSH --------------------------------------------------

  /** MinHash signature: one xxhash64 per token folded into the field
    * Z_p (p = 2³¹−1), then `numHashes` affine re-mixes (aᵢ·h + bᵢ) mod p
    * and a min per seed — the classic universal-hash permutation family.
    * Products stay ≤ 2³⁸, so no overflow under ANSI mode. Identical
    * token sets ⇒ identical signatures (recall 1.0 on true duplicates);
    * P(sigᵢ equal) ≈ Jaccard for distinct sets. Arithmetic-only per
    * (seed, token) — no per-element string allocation on the hot path. */
  def minHashSignature(tokens: Column, numHashes: Int): Column =
    minHashHashedSignature(transform(tokens, t => xxhash64(t)), numHashes)

  /** MinHash/LSH near-dup pairs with exact-Jaccard verification.
    *
    * Pipeline: signature → band hashes → explode(band) → self-equi-join
    * on (band index, band hash) → distinct candidate pairs → exact
    * Jaccard filter. The band join is the only shuffle that touches
    * pairs, and it only produces pairs that actually collide.
    *
    * For J ≥ 0.9 with 64 hashes / 16 bands (r=4), miss probability per
    * true pair is (1-J⁴)^16 < 4e-8 — and exactly 0 for identical sets.
    */
  def minHashPairs(
      df: DataFrame, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (members, verified) = minHashRelation(df, id, text, numHashes, bands, threshold)
    expandPairs(members, verified)
  }

  /** SHARED collapse→band→verify relation: the narrow (members
    * (_fp, _id), verified representative pairs) frames both
    * [[minHashPairs]] and [[minHashClusters]] consume, snapshotted once
    * per (session, input, parameters) — the in-process analogue of
    * [[writeMinHashRelation]]'s storage round-trip. A round-6
    * measurement found this net-negative, but that run predated the
    * CacheGovernor fix that actually frees checkpointed RDD blocks
    * (unpersist was a no-op on localCheckpoint-ed frames, so snapshot
    * blocks accumulated and the components loop degraded with session
    * age); re-measured after the fix it is a clean win — the cluster
    * query's candidate+verify re-derivation (~3 s at sf0.1) disappears. */
  private def minHashRelation(
      df: DataFrame, id: String, text: String,
      numHashes: Int, bands: Int, threshold: Double): (DataFrame, DataFrame) = {
    val key = Seq("minHashRelation", System.identityHashCode(df.sparkSession),
      df.queryExecution.analyzed.semanticHash(), id, text, numHashes, bands, threshold)
      .mkString(":")
    graft.core.CacheGovernor.sharedPair(key, df) {
      val (tagged, verified) = collapseVerify(prepTokenDocs(df, id, text),
        minHashCandidates(numHashes, bands, threshold), threshold,
        candidatesDistinct = true)
      (tagged.select(col("_fp"), col("_id")), verified)
    }
  }

  /** Spread a frame across the cluster ONLY when its scan is too narrow
    * to parallelize the projection that follows — a small corpus is one
    * parquet split, and without the spread an expensive per-row
    * projection runs as a single task (profiled at 8-9 s serial, and
    * hypersensitive to one slow core). A big corpus already scans as
    * thousands of splits, and an unconditional repartition would shuffle
    * the ENTIRE raw text — the one cost that must never scale with the
    * corpus.
    *
    * Partition-count inspection is plan-shape-aware: under AQE, `.rdd`
    * on a plan CONTAINING EXCHANGES materializes the upstream shuffle
    * stages eagerly, and that RDD is then discarded — the returned
    * frame would re-execute them. So a frame whose plan already
    * shuffles (or broadcasts) is passed through untouched — its output
    * width is governed by spark.sql.shuffle.partitions, not by scan
    * splits, and forcing it here would double-run the exchange. Only an
    * exchange-free (scan-shaped) plan is inspected via `.rdd`, where
    * building the RDD just plans file splits and executes nothing. */
  private[graft] def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    def hasExchange(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          hasExchange(a.inputPlan)
        case _: org.apache.spark.sql.execution.exchange.Exchange => true
        case other => other.children.exists(hasExchange)
      }
    if (hasExchange(df.queryExecution.executedPlan)) df
    else if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }

  /** Shared minhash entry prep: spread the RAW rows if the scan is
    * narrow, then project to the (_id, _set) shape the collapse core
    * consumes. */
  private def prepTokenDocs(df: DataFrame, id: String, text: String): DataFrame =
    spreadIfNarrow(df).select(col(id).as("_id"), tokenHashSet(col(text)).as("_set"))

  /** Banded minhash signatures for a rep frame (_fp, _set): one row per
    * (rep, band), keyed by the band's hash — the LSH bucket key the
    * self-join AND bipartite candidate generators equi-join on. Each row
    * also carries the rep's FULL band-hash array `_bhs` so the join can
    * apply the skip-earlier-bands filter ([[firstBandOnly]]).
    * Signature eval is the imperative loop (value-equal to
    * minHashHashedSignature — ExtensionsSpec), k×|set| arithmetic
    * without per-element lambdas. */
  private def bandedSigs(reps: DataFrame, numHashes: Int, bands: Int): DataFrame =
    reps.withColumn("_sig",
        graft.plans.TextHashNative.minHashSig(col("_set"), numHashes))
      .select(col("_fp"), size(col("_set")).as("_n"),
        bandHashesOfSig(col("_sig"), numHashes, bands).as("_bhs"))
      .select(col("_fp"), col("_n"), col("_bhs"), posexplode(col("_bhs")))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")

  /** Band-hash array of an ALREADY-MATERIALIZED minhash signature column
    * (callers must project the signature first — inlining it here would
    * re-evaluate the k×|set| signature once per band). Shared by the
    * batch generators and the streaming fuzzy-contamination gate. */
  private[graft] def bandHashesOfSig(sig: Column, numHashes: Int, bands: Int): Column = {
    val r = numHashes / bands
    transform(sequence(lit(0), lit(bands - 1)),
      g => xxhash64(concat_ws(",", slice(sig, g * r + 1, lit(r)))))
  }

  /** Skip-earlier-bands predicate: keep a band collision only if its
    * band index IS the pair's first matching band — each colliding
    * pair then survives on exactly ONE row, so candidates leave the
    * join ALREADY DISTINCT and the downstream dropDuplicates shuffle
    * disappears. On a corpus with high ambient similarity this is the
    * difference between shuffling every band-collision row and
    * shuffling none: profiled at sf0.1, the band join emits 19.3 M
    * collision rows for 1.93 M distinct pairs (pairs match in ~10 of
    * 16 bands), and the dropDuplicates pass over them was the single
    * most expensive stage of the whole minhash build (10.9 s of its
    * 54 s executor CPU). The comparison is the codegen'd
    * [[graft.plans.VectorNative.firstEqualIndex]] primitive — it runs
    * on every collision row, and an interpreted HOF chain here
    * profiled 3× WORSE than the dropDuplicates it replaces. */
  private def firstBandOnly: Column =
    col("_band") ===
      graft.plans.VectorNative.firstEqualIndex(col("_bhsa"), col("_bhsb"))

  /** MinHash/LSH candidate generation over collapsed representatives —
    * shared by [[minHashPairs]] and [[minHashClusters]]. Emits each
    * candidate pair exactly once, canonically ordered (_fpa < _fpb):
    * one orientation survives the fp filter, one band survives
    * [[firstBandOnly]] — so [[collapseVerify]] runs with
    * `candidatesDistinct = true` and never shuffles collision rows. */
  private[graft] def minHashCandidates(
      numHashes: Int, bands: Int, threshold: Double): DataFrame => DataFrame =
    reps => {
      // signatures + band hashes on REPRESENTATIVES only; band join
      // carries the cluster fingerprint, set size and band-hash array
      val banded = bandedSigs(reps, numHashes, bands)
      // length filter (exact, as in ngramJaccardPairs): J ≥ θ forces
      // min(|A|,|B|) ≥ θ·max(|A|,|B|) — ambient band collisions between
      // size-mismatched sets drop BEFORE anything shuffles; the 1e-9
      // slack protects boundary ratios from θ's binary rounding
      banded.select(col("_fp").as("_fpa"), col("_n").as("_na"),
          col("_bhs").as("_bhsa"), col("_band"), col("_bandhash"))
        .join(banded.select(col("_fp").as("_fpb"), col("_n").as("_nb"),
          col("_bhs").as("_bhsb"), col("_band"), col("_bandhash")),
          Seq("_band", "_bandhash"))
        .filter(col("_fpa") < col("_fpb"))
        .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
          col("_nb") >= col("_na") * threshold - 1e-9)
        .filter(firstBandOnly)
        .select("_fpa", "_fpb")
    }

  /** Near-duplicate CLUSTERS: the pair relation of [[minHashPairs]],
    * closed transitively, with one canonical document per cluster — the
    * form a corpus-cleaning pipeline actually consumes ("keep
    * `cluster_rep`, drop the rest").
    *
    * Scale shape: connected components (alternating star algorithm,
    * [[Components.connectedComponents]]) run on the COLLAPSED
    * fingerprint graph — one node per distinct token set, one edge per
    * verified representative pair — never on the expanded k²/2
    * member-pair space. Members then inherit their fingerprint's
    * component through one join, and labels finalize as the minimum
    * member doc id via a single window.
    *
    * @return (doc_id, cluster_rep, cluster_size) for every document in
    *         a cluster of ≥ 2; singletons are not duplicates and are
    *         omitted, mirroring the pair queries.
    */
  def minHashClusters(
      df: DataFrame, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val (members, verified) = minHashRelation(df, id, text, numHashes, bands, threshold)
    clustersFrom(members, verified)
  }

  /** Bipartite MinHash/LSH near-dup pairs BETWEEN two corpora — the
    * fuzzy train/test decontamination primitive: every (corpus doc,
    * benchmark doc) pair with exact Jaccard ≥ threshold, found without
    * ever scoring corpus×corpus or benchmark×benchmark pairs (which is
    * what running [[minHashPairs]] on the union would do — at 100 TB the
    * corpus side dwarfs the benchmark side and corpus self-pairs are
    * pure waste here).
    *
    * Scale shape: each side collapses identical token sets to one
    * representative, signatures and band hashes compute per side, and
    * the ONLY pair-producing shuffle is the (band, bandhash) equi-join
    * between the two banded rep frames; verification is the exact
    * two-pointer Jaccard on rep pairs, then members expand per side.
    * Identical cross-side documents share every band hash, so
    * `_fpa == _fpb` pairs arise naturally and are KEPT — orientation
    * here is A→B, not the self-join's canonical (least, greatest)
    * ordering, and a benchmark doc equal to a corpus doc is the
    * strongest contamination there is.
    *
    * Recall: identical sets are caught with probability 1; near dups
    * miss with the same (1−J^r)^b bound as [[minHashPairs]]
    * (< 4e-8 per true pair at θ=0.9 with 64/16).
    *
    * @return (a_id, b_id, jaccard) — a_id from dfA, b_id from dfB
    */
  def minHashPairsBetween(
      dfA: DataFrame, idA: String, textA: String,
      dfB: DataFrame, idB: String, textB: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def collapse(df: DataFrame, id: String, text: String): (DataFrame, DataFrame) = {
      val tagged = graft.core.CacheGovernor.persistTracked(
        prepTokenDocs(df, id, text).withColumn("_fp", xxhash64(col("_set"))))
      val reps = graft.core.CacheGovernor.persistTracked(
        tagged.groupBy("_fp").agg(first(col("_set")).as("_set")))
      (tagged.select(col("_fp"), col("_id")), reps)
    }
    val (membersA, repsA) = collapse(dfA, idA, textA)
    val (membersB, repsB) = collapse(dfB, idB, textB)
    val cand = bandedSigs(repsA, numHashes, bands)
      .select(col("_fp").as("_fpa"), col("_n").as("_na"),
        col("_bhs").as("_bhsa"), col("_band"), col("_bandhash"))
      .join(bandedSigs(repsB, numHashes, bands)
        .select(col("_fp").as("_fpb"), col("_n").as("_nb"),
          col("_bhs").as("_bhsb"), col("_band"), col("_bandhash")),
        Seq("_band", "_bandhash"))
      // same exact length prefilter as the self-join generator, then
      // one surviving row per pair (its first matching band) — no
      // dedup shuffle over collision rows
      .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
        col("_nb") >= col("_na") * threshold - 1e-9)
      .filter(firstBandOnly)
      .select("_fpa", "_fpb")
    val verified = cand
      .join(repsA.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
      .join(repsB.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
      .withColumn("_i",
        graft.plans.VectorNative.sortedIntersectSize(col("_seta"), col("_setb")))
      .withColumn("jaccard",
        col("_i").cast("double") / (size(col("_seta")) + size(col("_setb")) - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select("_fpa", "_fpb", "jaccard")
    verified
      .join(membersA.select(col("_fp").as("_fpa"), col("_id").as("a_id")), "_fpa")
      .join(membersB.select(col("_fp").as("_fpb"), col("_id").as("b_id")), "_fpb")
      .select("a_id", "b_id", "jaccard")
  }

  // stage accessors for graft.tools.ProfileShare (defaults of
  // q_dedup_minhash/q_dedup_clusters)
  private[graft] def collapseVerifyP(docs: DataFrame): (DataFrame, DataFrame) =
    collapseVerify(prepTokenDocs(docs, "doc_id", "text"),
      minHashCandidates(64, 16, 0.9), 0.9, candidatesDistinct = true)
  private[graft] def expandPairsP(m: DataFrame, v: DataFrame): DataFrame =
    expandPairs(m, v)
  private[graft] def clustersFromP(m: DataFrame, v: DataFrame): DataFrame =
    clustersFrom(m, v)

  /** Cluster-closure stage of [[minHashClusters]], over an already-
    * derived (members, verified) relation. */
  private def clustersFrom(members: DataFrame, verified: DataFrame): DataFrame = {
    val fpComp = Components.connectedComponents(
      verified.select("_fpa", "_fpb"), "_fpa", "_fpb")
      .withColumnRenamed("node", "_fp")
    // fingerprints with no cross-edge are their own component; their
    // members still cluster with each other (identical sets, J = 1)
    val labeled = members.select(col("_fp"), col("_id"))
      .join(fpComp, Seq("_fp"), "left_outer")
      .withColumn("_comp", coalesce(col("comp"), col("_fp")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("_comp")
    labeled
      .select(col("_id").as("doc_id"),
        min(col("_id")).over(w).as("cluster_rep"),
        count(lit(1)).over(w).as("cluster_size"))
      .filter(col("cluster_size") > 1)
  }

  // ---- materialized minhash relation ---------------------------------

  private val WhatMinHash = "minhash dedup relation"

  /** Manifest-gated recursive read of one of the relation's ledger
    * tables (members/reps/verified/meta) — every batch directory. */
  private def minhashSub(
      spark: org.apache.spark.sql.SparkSession, path: String,
      table: String): DataFrame = {
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    LedgerFiles.requireManifest(fs, root, path, WhatMinHash)
    spark.read.option("recursiveFileLookup", "true").parquet(s"$path/$table")
  }


  /** Materialize the minhash collapse→band→verify relation to storage —
    * the 100 TB pattern for a pipeline that wants BOTH the pair listing
    * and the cluster closure (and tomorrow's incremental batches): pay
    * the tokenize/signature/verify cost ONCE, write the two narrow
    * frames (member (_fp, _id) map and verified representative pairs —
    * both tiny next to the corpus), and derive every consumer from the
    * table. In-process snapshot sharing of this relation was measured
    * slower than rebuilding (round 6); a parquet round-trip is the
    * shape that actually scales. Layout: `<path>/members`,
    * `<path>/verified`. */
  def writeMinHashRelation(
      df: DataFrame, id: String, text: String, path: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val spark = df.sparkSession
    val (fs, root) = LedgerFiles.fsOf(spark, path)
    // LedgerFiles discipline (r18 WAL audit): invalidate readers for
    // the whole re-seed window, wipe any previous ledger trees, write
    // every table as its b0 batch, publish the manifest LAST
    fs.delete(new org.apache.hadoop.fs.Path(root, LedgerFiles.ManifestName), false)
    Seq("members", "verified", "reps", "meta").foreach(t =>
      fs.delete(new org.apache.hadoop.fs.Path(root, t), true))
    val (tagged, verified) = collapseVerify(prepTokenDocs(df, id, text),
      minHashCandidates(numHashes, bands, threshold), threshold,
      candidatesDistinct = true)
    tagged.select(col("_fp"), col("_id"))
      .write.mode("overwrite").parquet(s"$path/members/b0")
    verified.write.mode("overwrite").parquet(s"$path/verified/b0")
    // reps with PRECOMPUTED band hashes: incremental batches
    // ([[minHashPairsAgainst]]) band-join straight against these — the
    // corpus text is never re-tokenized, its signatures never recomputed
    tagged.groupBy("_fp").agg(first(col("_set")).as("_set"))
      .withColumn("_sig",
        graft.plans.TextHashNative.minHashSig(col("_set"), numHashes))
      .select(col("_fp"), col("_set"),
        bandHashesOfSig(col("_sig"), numHashes, bands).as("_bhs"))
      .write.mode("overwrite").parquet(s"$path/reps/b0")
    // persist the parameters WITH the relation: a reader supplying
    // mismatched numHashes/bands would band-join against misaligned
    // _bhs arrays and silently lose recall instead of erroring —
    // requireRelationMeta turns that into an immediate failure
    spark.range(1)
      .select(lit(numHashes).as("num_hashes"), lit(bands).as("bands"),
        lit(threshold).as("threshold"))
      .write.mode("overwrite").parquet(s"$path/meta/b0")
    LedgerFiles.publishManifest(fs, root, WhatMinHash)
  }

  /** Read back the (numHashes, bands, threshold) a relation was written
    * with; None for a pre-meta relation (documented-contract only). */
  def readMinHashRelationMeta(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(Int, Int, Double)] =
    try {
      val r = minhashSub(spark, path, "meta")
        .select("num_hashes", "bands", "threshold").head()
      Some((r.getInt(0), r.getInt(1), r.getDouble(2)))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
      case _: java.io.FileNotFoundException => None // same missing-path state
    }

  /** Fail fast when a reader's banding parameters disagree with the
    * values the stored relation was built with (silent recall loss
    * otherwise: batch band indices simply never align with stored
    * `_bhs` entries). The threshold may legitimately differ upward —
    * verification re-filters — but a LOWER threshold than the stored
    * one cannot recover candidates the writer's band layout already
    * dropped, so it is rejected too. */
  private def requireRelationMeta(
      spark: org.apache.spark.sql.SparkSession, path: String,
      numHashes: Int, bands: Int, threshold: Double): Unit =
    readMinHashRelationMeta(spark, path).foreach { case (nh, b, th) =>
      require(nh == numHashes && b == bands,
        s"stored minhash relation at $path was written with " +
          s"numHashes=$nh, bands=$b; caller passed $numHashes/$bands — " +
          "band hashes would not align and recall would silently degrade")
      require(threshold >= th - 1e-9,
        s"stored minhash relation at $path was verified at threshold=$th; " +
          s"querying at lower $threshold cannot recover pairs the stored " +
          "band layout already dropped")
    }

  /** Fold an accepted batch INTO a [[writeMinHashRelation]] index —
    * the missing half of the incremental-ingest story: without it a
    * long-lived pipeline re-tokenizes the whole corpus every night.
    * With it, each night costs O(batch) + one band join against the
    * stored (already banded) reps.
    *
    * Everything is DELTA-ONLY parquet appends — the stored members /
    * reps / verified files are never rewritten, so the write cost is
    * O(batch), not O(corpus): the 100 TB-safe shape.
    *
    * Equivalence to a full rebuild (asserted in DedupSpec): fingerprints
    * are content hashes of the token set, so the collapsed rep space is
    * independent of batch boundaries; the rebuild's candidate pairs
    * split exactly into stored×stored (already in `verified`),
    * new×stored (the bipartite band join here) and new×new (the self
    * generator over the truly-new reps) — and band collisions are
    * deterministic functions of the sets, so no pair is lost at the
    * seam. Cross pairs are canonicalized to the self-join's
    * (least, greatest) fingerprint orientation before appending.
    *
    * `assumeNewDocs` (default true) is the idempotence dial: the rep /
    * band-hash / verified deltas are inherently idempotent (the
    * anti-join against stored reps empties them on a re-apply), but the
    * MEMBER delta is append-blind — re-appending a (doc id, text)
    * already in the index duplicates its member row and with it every
    * expanded pair. The default trusts the caller to send each doc once
    * (the streaming ledger in
    * [[graft.streaming.StreamingOps.indexAppendBatch]] enforces exactly
    * that) and keeps the append strictly O(batch). Passing false makes
    * the whole append CRASH-idempotent: batch members anti-join against
    * the stored members OF THE BATCH'S FINGERPRINTS, and the verified
    * pair delta anti-joins against the stored pairs touching them — the
    * batch fp set broadcasts, so both stored reads are narrow scans
    * (no shuffle) and the write stays delta-only. This closes the
    * redelivery window a plain applied-batch marker leaves open: a
    * crash after the verified (or members) commit but before the reps
    * commit redelivers into empty deltas instead of duplicates (r19
    * advisor fix — the streaming fold passes false for exactly this). */
  def appendToMinHashRelation(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9,
      assumeNewDocs: Boolean = true): Unit = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireRelationMeta(spark, path, numHashes, bands, threshold)
    val storedReps = minhashSub(spark, path, "reps")
    val taggedNew = graft.core.CacheGovernor.persistTracked(
      prepTokenDocs(newDocs, id, text).withColumn("_fp", xxhash64(col("_set"))))
    // truly-new fingerprints only: a batch doc whose set is already
    // indexed extends the member map, but its rep row, band hashes and
    // stored×stored pairs are already present and MUST not duplicate
    val repsNew = graft.core.CacheGovernor.persistTracked(
      taggedNew.groupBy("_fp").agg(first(col("_set")).as("_set"))
        .join(storedReps.select("_fp"), Seq("_fp"), "left_anti"))
    val repsNewIndexed = graft.core.CacheGovernor.persistTracked(
      repsNew.withColumn("_sig",
          graft.plans.TextHashNative.minHashSig(col("_set"), numHashes))
        .select(col("_fp"), col("_set"),
          bandHashesOfSig(col("_sig"), numHashes, bands).as("_bhs")))
    // force the delta to materialize BEFORE any append below: its plan
    // reads <path>/reps (the anti-join), and appending files to a path
    // an unexecuted plan still has to scan is a lineage hazard
    repsNewIndexed.count()
    def banded(reps: DataFrame): DataFrame = reps
      .select(col("_fp"), size(col("_set")).as("_n"), col("_bhs"),
        posexplode(col("_bhs")))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")
    def verify(cand: DataFrame, setsA: DataFrame, setsB: DataFrame): DataFrame =
      cand
        .join(setsA.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
        .join(setsB.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
        .withColumn("_i", graft.plans.VectorNative.sortedIntersectSize(
          col("_seta"), col("_setb")))
        .withColumn("jaccard", col("_i").cast("double") /
          (size(col("_seta")) + size(col("_setb")) - col("_i")))
        .filter(col("jaccard") >= threshold)
        .select("_fpa", "_fpb", "jaccard")
    // new×stored: bipartite band equi-join (same shape as
    // minHashPairsBetween), then canonical (least, greatest) orientation
    val candCross = banded(repsNewIndexed)
      .select(col("_fp").as("_fpa"), col("_n").as("_na"),
        col("_bhs").as("_bhsa"), col("_band"), col("_bandhash"))
      .join(banded(storedReps)
        .select(col("_fp").as("_fpb"), col("_n").as("_nb"),
          col("_bhs").as("_bhsb"), col("_band"), col("_bandhash")),
        Seq("_band", "_bandhash"))
      .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
        col("_nb") >= col("_na") * threshold - 1e-9)
      .filter(firstBandOnly)
      .select("_fpa", "_fpb")
    val crossVerified = verify(candCross, repsNewIndexed, storedReps)
      .select(least(col("_fpa"), col("_fpb")).as("_fpa"),
        greatest(col("_fpa"), col("_fpb")).as("_fpb"), col("jaccard"))
    // new×new: the standard self generator over the truly-new reps
    val newNewVerified = verify(
      minHashCandidates(numHashes, bands, threshold)(repsNew),
      repsNewIndexed, repsNewIndexed)
    // staged atomic batch commits (r18 WAL audit): a crashed append
    // leaves nothing visible; ordering puts `reps` LAST because the
    // freshness anti-join gates on it — a crash mid-append redelivers
    // into the same delta
    val verifiedAll = crossVerified.unionByName(newNewVerified)
    val verifiedDelta =
      if (assumeNewDocs) verifiedAll
      else {
        // crash-idempotent path (r19 advisor fix): a batch that crashed
        // AFTER the verified commit but BEFORE the reps commit redelivers
        // with its fingerprints still absent from `reps`, recomputes the
        // identical pair delta, and a blind append would duplicate it.
        // Every delta pair carries at least one batch fingerprint on one
        // side, so two broadcast-semi-restricted reads of the stored
        // pairs (narrow scans — the stored relation never shuffles)
        // cover every possible duplicate; the anti-join empties the
        // re-append and redelivery converges.
        val batchFps = repsNew.select("_fp")
        val storedV = minhashSub(spark, path, "verified")
        val relevant = storedV
          .join(broadcast(batchFps.withColumnRenamed("_fp", "_fpa")),
            Seq("_fpa"), "left_semi")
          .unionByName(storedV
            .join(broadcast(batchFps.withColumnRenamed("_fp", "_fpb")),
              Seq("_fpb"), "left_semi"))
          .select("_fpa", "_fpb")
        val delta = graft.core.CacheGovernor.persistTracked(
          verifiedAll.join(relevant, Seq("_fpa", "_fpb"), "left_anti"))
        delta.count() // materialize before appending to the path it reads
        delta
      }
    LedgerFiles.atomicAppend(spark, path, "verified", verifiedDelta)
    val membersDelta =
      if (assumeNewDocs) taggedNew.select(col("_fp"), col("_id"))
      else {
        // idempotent path: only member rows not already stored under the
        // batch's fingerprints. The broadcast of the (small) batch fp
        // set keeps the stored-member read a streaming scan — no
        // shuffle of the member map, and the WRITE is still the delta.
        val batchFps = taggedNew.select("_fp").distinct()
        val storedRelevant = minhashSub(spark, path, "members")
          .join(broadcast(batchFps), Seq("_fp"), "left_semi")
        val delta = graft.core.CacheGovernor.persistTracked(
          taggedNew.select(col("_fp"), col("_id"))
            .join(storedRelevant, Seq("_fp", "_id"), "left_anti"))
        delta.count() // materialize before appending to the path it reads
        delta
      }
    LedgerFiles.atomicAppend(spark, path, "members", membersDelta)
    LedgerFiles.atomicAppend(spark, path, "reps", repsNewIndexed)
  }

  /** Compact an appended minhash relation into a fresh layout at
    * `dest` — the maintenance half of [[appendToMinHashRelation]]:
    * every append adds one batch's worth of small files per
    * sub-relation, and after enough nightly batches the file count
    * (not the data volume) starts taxing scan planning. Compaction
    * rewrites each sub-relation with `coalesce` (file merge, NO
    * shuffle — contents and row values are untouched) into a NEW
    * directory, following the versioned-directory convention: the live
    * index is never overwritten in place, so readers mid-query keep a
    * consistent snapshot and the swap is an atomic pointer/rename at
    * the orchestration layer. */
  def compactMinHashRelation(
      spark: org.apache.spark.sql.SparkSession, path: String, dest: String,
      targetRowsPerFile: Long = 4000000L): Unit = {
    val (fs, _) = LedgerFiles.fsOf(spark, path)
    require(LedgerFiles.canonical(fs, path) != LedgerFiles.canonical(fs, dest),
      "compaction writes a NEW versioned directory; compacting a live " +
        "index onto itself would corrupt readers mid-query")
    // wipe any previous dest state (manifest FIRST) so a reused dest
    // cannot serve stale b1+ batches beside the fresh b0
    val destRoot = new org.apache.hadoop.fs.Path(dest)
    fs.delete(new org.apache.hadoop.fs.Path(destRoot, LedgerFiles.ManifestName), false)
    def copy(sub: String): Unit = {
      fs.delete(new org.apache.hadoop.fs.Path(destRoot, sub), true)
      val df = minhashSub(spark, path, sub)
      val rows = df.count()
      val files = math.max(1L,
        (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
      df.coalesce(files).write.mode("overwrite").parquet(s"$dest/$sub/b0")
    }
    copy("members"); copy("reps"); copy("verified")
    fs.delete(new org.apache.hadoop.fs.Path(destRoot, "meta"), true)
    minhashSub(spark, path, "meta").coalesce(1)
      .write.mode("overwrite").parquet(s"$dest/meta/b0")
    LedgerFiles.publishManifest(fs, destRoot, WhatMinHash)
  }

  /** Incremental near-dup dedup of a NEW batch against a
    * [[writeMinHashRelation]] index — the production ingest shape at
    * 100 TB: the stored index is narrow (collapsed reps with
    * precomputed band hashes + the member map), the batch is small, and
    * neither the corpus text nor its signatures are ever reprocessed.
    * Only the batch side tokenizes/signs; candidates come from the
    * batch-bands × stored-bands equi-join with the same length
    * prefilter and skip-earlier-bands dedup as every other generator,
    * then the exact two-pointer Jaccard verifies against the stored
    * rep sets. Near-dup complement of [[dedupAgainstIndex]] (which
    * catches exact token-set matches only). `numHashes`/`bands` are
    * checked against the relation's stored meta — a mismatch fails
    * immediately instead of silently degrading recall.
    *
    * @return (a_id, b_id, jaccard) — a_id from the new batch, b_id an
    *         already-indexed document
    */
  def minHashPairsAgainst(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, id: String, text: String,
      numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    requireRelationMeta(spark, path, numHashes, bands, threshold)
    val storedReps = minhashSub(spark, path, "reps")
    val storedMembers = minhashSub(spark, path, "members")
    val taggedNew = graft.core.CacheGovernor.persistTracked(
      prepTokenDocs(newDocs, id, text).withColumn("_fp", xxhash64(col("_set"))))
    val repsNew = graft.core.CacheGovernor.persistTracked(
      taggedNew.groupBy("_fp").agg(first(col("_set")).as("_set")))
    val bandStored = storedReps
      .select(col("_fp"), size(col("_set")).as("_n"), col("_bhs"),
        posexplode(col("_bhs")))
      .withColumnRenamed("pos", "_band").withColumnRenamed("col", "_bandhash")
    val cand = bandedSigs(repsNew, numHashes, bands)
      .select(col("_fp").as("_fpa"), col("_n").as("_na"),
        col("_bhs").as("_bhsa"), col("_band"), col("_bandhash"))
      .join(bandStored.select(col("_fp").as("_fpb"), col("_n").as("_nb"),
        col("_bhs").as("_bhsb"), col("_band"), col("_bandhash")),
        Seq("_band", "_bandhash"))
      .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
        col("_nb") >= col("_na") * threshold - 1e-9)
      .filter(firstBandOnly)
      .select("_fpa", "_fpb")
    val verified = cand
      .join(repsNew.select(col("_fp").as("_fpa"), col("_set").as("_seta")), "_fpa")
      .join(storedReps.select(col("_fp").as("_fpb"), col("_set").as("_setb")), "_fpb")
      .withColumn("_i",
        graft.plans.VectorNative.sortedIntersectSize(col("_seta"), col("_setb")))
      .withColumn("jaccard",
        col("_i").cast("double") / (size(col("_seta")) + size(col("_setb")) - col("_i")))
      .filter(col("jaccard") >= threshold)
      .select("_fpa", "_fpb", "jaccard")
    verified
      .join(taggedNew.select(col("_fp").as("_fpa"), col("_id").as("a_id")), "_fpa")
      .join(storedMembers.select(col("_fp").as("_fpb"), col("_id").as("b_id")), "_fpb")
      .select("a_id", "b_id", "jaccard")
  }

  /** [[minHashPairs]] derived from a [[writeMinHashRelation]] table. */
  def minHashPairsFrom(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    expandPairs(minhashSub(spark, path, "members"),
      minhashSub(spark, path, "verified"))

  /** [[minHashClusters]] derived from a [[writeMinHashRelation]] table. */
  def minHashClustersFrom(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    clustersFrom(minhashSub(spark, path, "members"),
      minhashSub(spark, path, "verified"))

  /** [[minHashSignature]] over an already-hashed token set. */
  def minHashHashedSignature(hashedTokens: Column, numHashes: Int): Column = {
    val p = lit(2147483647L)
    val base = transform(hashedTokens, h => pmod(h, p))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(base,
        h => pmod(h * (i * 2 + 1) + i * lit(1013904223L), p))))
  }

  // ---- SimHash --------------------------------------------------------

  /** 60-bit SimHash over the token set: per bit, sum ±1 weighted by each
    * token hash's bit; the sign becomes the fingerprint bit (output bit
    * j comes from token-hash bit j). Near-dup docs land within small
    * Hamming distance. Token hashes are the PORTABLE md5-based 60-bit
    * family ([[graft.functions.PortableHash]]) — same family and bit
    * layout as the native [[graft.plans.TextHashNative.simHash]], which
    * is what lets q_dedup_simhash carry a DuckDB SQL oracle. Bit
    * positions unroll at plan-build time (shift amounts must be
    * literals). */
  def simHash(tokens: Column): Column = {
    val hashes = transform(tokens, t => graft.functions.PortableHash.md5Hash60(t))
    val bits: Seq[Column] = (0 until 60).map { j =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, 1L).otherwise(0L)
    }
    bits.zipWithIndex.map { case (b, j) => b * lit(1L << j) }.reduce(_ + _)
  }

  /** SimHash near-dup candidates: block on each of the four 15-bit
    * chunks of the 60-bit fingerprint (any pair within Hamming ≤
    * maxHamming of 3 must agree on at least one chunk when differing
    * bits spread — pigeonhole over 4 chunks guarantees it for ≤ 3
    * flipped bits), then verify Hamming. */
  def simHashPairs(
      df: DataFrame, id: String, text: String, maxHamming: Int = 3): DataFrame = {
    // spread raw rows if the scan is narrow — the 60-bit vote
    // computation is the most expensive per-row projection in the suite
    // (same argument as [[spreadIfNarrow]])
    val spread = spreadIfNarrow(df)
    // Collapse docs sharing an IDENTICAL simhash before the chunk join —
    // the same trick [[collapseVerifyExpand]] applies to token sets. A
    // dense cluster of k true duplicates otherwise inflates every chunk
    // bucket it lands in by k, and the blocking join by k². Hamming
    // depends only on the simhash, so within-fingerprint pairs are
    // exactly 0 and cross-fingerprint pairs inherit the representative
    // distance — output is identical to the uncollapsed join. The
    // native eval shares the portable md5-60 family and bit-j layout
    // with the HOF [[simHash]] (DedupSpec's collapse fixture and
    // ExtensionsSpec cross-check the two).
    // coalesce restores the HOF form's null-text value: aggregate over a
    // null token array folded each bit to 0 ⇒ simhash 0L, so null-text
    // docs pair with each other; bare null would drop out of the joins.
    val docs = graft.core.CacheGovernor.persistTracked(
      spread.select(col(id).as("_id"),
        coalesce(graft.plans.TextHashNative.simHash(col(text)), lit(0L)).as("_sh")))
    // the chunk join consumes only the fingerprint — distinct IS the collapse
    val reps = docs.select("_sh").distinct()
    val chunked = reps.select(col("_sh"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("_sh"), c * 15).bitwiseAND(0x7FFFL)): _*)))
      .withColumnRenamed("pos", "_chunk").withColumnRenamed("col", "_chunkval")
    val a = chunked.select(col("_sh").as("_sha"), col("_chunk"), col("_chunkval"))
    val b = chunked.select(col("_sh").as("_shb"), col("_chunk"), col("_chunkval"))
    val verified = a.join(b, Seq("_chunk", "_chunkval"))
      .filter(col("_sha") < col("_shb"))
      .dropDuplicates("_sha", "_shb")
      .withColumn("hamming", expr("bit_count(_sha ^ _shb)").cast("long"))
      .filter(col("hamming") <= maxHamming)
    val within = docs.select(col("_sh"), col("_id").as("a_id"))
      .join(docs.select(col("_sh"), col("_id").as("b_id")), "_sh")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(0L).as("hamming"))
    val cross = verified
      .join(docs.select(col("_sh").as("_sha"), col("_id").as("_ida")), "_sha")
      .join(docs.select(col("_sh").as("_shb"), col("_id").as("_idb")), "_shb")
      .select(least(col("_ida"), col("_idb")).as("a_id"),
        greatest(col("_ida"), col("_idb")).as("b_id"), col("hamming"))
    within.unionByName(cross)
  }

  // ---- n-gram Jaccard with prefix filtering ---------------------------

  /** Distinct contiguous word n-gram shingles. Guarded: Spark's
    * `sequence(1, k)` counts DOWN for k < 1, so short docs get an empty
    * shingle set explicitly. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Hashed distinct n-gram shingle set, built WITHOUT materializing
    * shingle strings: tokens hash once, each shingle identity is the
    * xxhash64 of the n-tuple of token hashes. Bijective with the string
    * shingle set modulo ~2⁻⁶⁴ collisions, so Jaccard values are
    * unchanged. Imperative single-pass eval (plans.TextHashNative;
    * value parity with the HOF form asserted in ExtensionsSpec) — this
    * projection was the dominant cost of the whole n-gram operator when
    * composed from interpreted per-element HOFs. Output is SORTED. */
  def shingleHashSet(text: Column, n: Int): Column =
    graft.plans.TextHashNative.shingleHashSet(text, n)

  /** n-gram Jaccard near-dup pairs via prefix filtering (PPJoin-style):
    * under a global shingle order, any pair with J ≥ θ must share one of
    * each document's first ⌊(1−θ)·|S|⌋+1 sorted shingles. Candidates are
    * an equi-join on prefix shingles — never O(n²) — then exact Jaccard
    * verifies. */
  def ngramJaccardPairs(
      df: DataFrame, id: String, text: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // spread raw rows before shingling if the scan is narrow — same
    // argument as [[spreadIfNarrow]]
    val spread = spreadIfNarrow(df)
    val docs = spread.select(col(id).as("_id"), shingleHashSet(col(text), n).as("_set"))
      // shingle-less docs (< n tokens) have no defined Jaccard (0/0) —
      // excluding them matches the oracle's NULL-comparison semantics
      .filter(size(col("_set")) > 0)
    collapseVerifyExpand(docs, reps => {
      // PPJoin prefix ordering by ASCENDING document frequency: a pair
      // with J ≥ θ must share one of each set's first ⌊(1−θ)|S|⌋+1
      // shingles under ANY global total order — ordering by rarity makes
      // the posting lists joined on as small as possible (lexicographic
      // ordering measured 3× slower: common shingles hot-spot the join)
      val ex = reps.select(col("_fp"), explode(col("_set")).as("_s"))
      // Only shingles shared by ≥ 2 representatives need a real df: a
      // df=1 shingle can never produce a candidate, and under the
      // (df, s) order all df=1 shingles tie at the front regardless of
      // exact count — so the broadcast side is the REPEATED vocabulary
      // only, a small fraction of the full one.
      val freq = ex.groupBy("_s").agg(count(lit(1)).as("_df"))
        .filter(col("_df") >= 2)
      // Prefix selection is IN-ROW: broadcast the repeated-shingle df
      // onto the exploded rows (no posting-list shuffle), regroup once
      // per representative, array_sort the (df, s) structs and slice.
      // This replaces the previous shuffle-join + window-sort + join-back
      // over the full posting list (profiled at ~65% of the operator
      // under driver bench conditions) with ONE posting-list shuffle.
      // At vocab scales past broadcast (~100s of MB) drop the hint and
      // the same plan degrades gracefully to a shuffle join.
      // Required prefix is |S| − ⌈θ|S|⌉ + 1. Computed as
      // n − floor(θ·n) + 1 (≥ required since floor ≤ ceil): errs toward
      // a LONGER prefix under any floating-point rounding of θ·n, so
      // completeness survives e.g. θ=0.8, n=10 where
      // floor(n·(1−θ)) = floor(2.0000000000000004−ε) could land on 1.
      // Each exploded row also carries `_pre`, the rep's full prefix
      // RE-SORTED BY HASH VALUE — the skip-earlier-prefixes filter
      // below compares the pair's prefix arrays with a two-pointer
      // merge, which needs one common order (the (df, s) order only
      // chooses WHICH shingles form the prefix).
      // persisted: both sides of the self-join consume this frame, and
      // without the pin each side re-runs the explode→df→regroup→sort
      // chain (and rebuilds the freq broadcast) from `reps`
      val posting = graft.core.CacheGovernor.persistTracked(
        ex.join(broadcast(freq), Seq("_s"), "left_outer")
          .groupBy("_fp")
          .agg(collect_list(struct(coalesce(col("_df"), lit(1L)).as("_df"),
            col("_s"))).as("_dfs"))
          .select(col("_fp"), size(col("_dfs")).as("_n"),
            array_sort(expr("transform(" +
              s"slice(array_sort(_dfs), 1, cast(size(_dfs) - floor(size(_dfs) * $threshold) + 1 as int)), " +
              "x -> x._s)")).as("_pre"))
          .select(col("_fp"), col("_n"), col("_pre"),
            explode(col("_pre")).as("_s")))
      // PPJoin length filter: J ≥ θ ⟹ θ·max(|A|,|B|) ≤ |A∩B| ≤
      // min(|A|,|B|), so each side must be ≥ θ× the other. The 1e-9
      // slack keeps boundary pairs (e.g. |A|=8, |B|=10, θ=0.8, J=0.8
      // exactly) safe from θ's binary-fraction rounding.
      //
      // Skip-earlier-prefixes (the minhash firstBandOnly trick, ported):
      // a collision row survives only if its shingle IS the pair's
      // MINIMUM shared prefix shingle — a symmetric, deterministic pick,
      // so with the _fpa < _fpb orientation filter each candidate pair
      // exits the join on exactly ONE row and the downstream
      // dropDuplicates shuffle over collision rows disappears
      // (candidatesDistinct = true). Near-dup pairs share most of their
      // prefixes, so collision rows run ~10-30× the pair count — the
      // codegen'd two-pointer [[graft.plans.VectorNative.minCommonSorted]]
      // evaluates per row without shuffling any of them.
      posting.select(col("_fp").as("_fpa"), col("_n").as("_na"),
          col("_pre").as("_prea"), col("_s"))
        .join(posting.select(col("_fp").as("_fpb"), col("_n").as("_nb"),
          col("_pre").as("_preb"), col("_s")), "_s")
        .filter(col("_fpa") < col("_fpb"))
        .filter(col("_na") >= col("_nb") * threshold - 1e-9 &&
          col("_nb") >= col("_na") * threshold - 1e-9)
        .filter(graft.plans.VectorNative.minCommonSorted(
          col("_prea"), col("_preb")) === col("_s"))
        .select("_fpa", "_fpb")
    }, threshold, candidatesDistinct = true)
  }
}
