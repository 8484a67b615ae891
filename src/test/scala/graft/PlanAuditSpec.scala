package graft

/** Physical-plan contracts for the scale-critical queries: the properties
  * that make these plans survive a 100 TB corpus are asserted, not just
  * printed by `app/ExplainAudit` — a refactor that silently reintroduces
  * a cartesian product or drops a broadcast fails HERE, not in
  * production.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("LSH/IVF kNN plans broadcast the query side and never go cartesian") {
    Seq("q41_cosine_knn_lsh", "q60_cosine_knn_ivf").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name lost its broadcast join")
      assert(!p.contains("CartesianProduct"), s"$name degraded to a cartesian product")
      // the candidate join must be a hash equi-join, not a nested loop
      // re-scanning the corpus per query row
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name fell back to nested-loop")
    }
  }

  test("embedding near-dup self-join is an equi-join on (table, bucket)") {
    // materialize = false: the production entry point checkpoints eagerly,
    // which would explain as an opaque LogicalRDD and make this vacuous —
    // inspect the LAZY plan of the same operator configuration as q42
    val df = graft.ops.VectorSim.cosineNearDups(
      graft.core.Tables.embeddings(spark, sf001), "vec_id", "embedding",
      threshold = 0.25, probeBits = 1, materialize = false)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Join"), "expected the bucket self-join in the lazy plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bucket self-join must stay a hash/sort-merge equi-join")
  }

  test("key-less range join stays an equi-join on the bin, never nested-loop") {
    // q65's only natural predicates are range comparisons — without the
    // bin decomposition Catalyst has no equi-key and plans
    // BroadcastNestedLoopJoin, which is O(points x intervals) at scale
    val p = plan("q65_range_join_click_windows")
    assert(p.contains("Join") &&
      (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin")),
      "range join must execute as a hash/sort-merge equi-join on the bin")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join degraded to nested-loop/cartesian")
  }

  test("relational scans keep pushdown and pruned read schemas") {
    val p = plan("q05_filter_project")
    val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(p)
      .filterNot(_.contains("[]")).toSeq
    assert(pushed.nonEmpty, "q05 filter no longer reaches the parquet scan")
    // projection + filter columns = 5 of lineitem's 16; the scan must stay
    // pruned to that, not read the whole table
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.exists(_.split(",").length <= 6),
      s"q05 scan reads more columns than the projection needs: $read")
  }

  test("star-schema revenue query broadcasts its dimension joins") {
    val p = plan("q02_revenue_by_nation")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      "q02 must broadcast both small dims (customer->nation joins)")
    assert(!p.contains("CartesianProduct"))
  }

  test("decontamination joins the train grams against BROADCAST eval grams") {
    // eval benchmark sets are tiny next to a training corpus: the gram
    // join must broadcast the eval side, never shuffle (or nested-loop)
    // the 100 TB train gram stream
    val p = plan("q68_decontamination")
    assert(p.contains("BroadcastHashJoin"), "q68 lost the eval-gram broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q68 gram join degraded")
  }

  test("sequence packing windows per shard, never a single global partition") {
    // a global running sum would serialize the corpus through one
    // partition; the packing window must be partitioned by the shard col
    val df = SparkEntry.queries("q69_sequence_packing")(spark, sf001)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("Window"), "expected a window operator in q69")
    assert("Arguments:.*windowspecdefinition\\(source".r.findFirstIn(p).isDefined ||
      p.contains("PartitionSpec: [source"),
      s"q69 window lost its per-source partitioning")
    assert(!p.contains("SinglePartition"),
      "q69 must not funnel the corpus through one partition")
  }

  test("bm25 never shuffles the corpus: broadcast stats + TakeOrdered top-k") {
    // the corpus side is two linear scans (score projection + the stats
    // aggregate); the only exchanges allowed are the 1-row stats
    // aggregate's and its broadcast back — a term- or doc-keyed corpus
    // shuffle here would be a regression to the explode formulation
    val p = plan("q81_bm25_search")
    assert(p.contains("TakeOrderedAndProject"), "q81 lost the top-k operator")
    assert(p.contains("BroadcastExchange"), "q81 stats must broadcast")
    // count physical operators via their unique detail headers "(n) Exchange"
    val exchanges = "(?m)^\\(\\d+\\) Exchange$".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"q81 grew $exchanges shuffle exchanges; only the 1-row stats agg may shuffle")
  }

  test("winnow dup pairs reuses the gram exchange for both join sides") {
    // the df-cap window and the self-join ride ONE gram-keyed shuffle;
    // losing the reuse doubles the exploded-gram exchange at 100 TB.
    // Exchange reuse materializes during adaptive execution, so run the
    // query and inspect the FINAL plan.
    val df = SparkEntry.queries("q83_winnow_dup_pairs")(spark, sf001)
    df.collect() // count() would execute a DIFFERENT QueryExecution
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("ReusedExchange"),
      "q83 self-join no longer reuses the gram-keyed exchange")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q83 pair join degraded")
  }

  test("batch bm25 ranks via the bounded aggregate, never a per-query window") {
    // the per-query top-k must be TopKPairs (map-side partial
    // ObjectHashAggregate): a row_number window here would shuffle every
    // scored row into one task per query and collapse parallelism to the
    // query count
    val p = plan("q87_bm25_batch")
    assert(p.contains("topk_pairs"), "q87 lost the bounded TopKPairs aggregate")
    assert("(?m)^\\(\\d+\\) Window$".r.findFirstIn(p).isEmpty,
      "q87 ranks through a Window operator — the corpus-sized-partition shape")
    assert(p.contains("ObjectHashAggregate"),
      "q87 TopKPairs must run as a (partial, map-side) ObjectHashAggregate")
    assert(p.contains("BroadcastExchange"), "q87 stats must broadcast")
    // the only nested-loop is the 1-row stats crossJoin (broadcast by
    // construction — q81's contract allows the same); no cartesian pairs
    assert(!p.contains("CartesianProduct"))
  }

  test("phrase search never shuffles: row-local positions + TakeOrdered cut") {
    val p = plan("q88_phrase_search")
    assert(p.contains("TakeOrderedAndProject"), "q88 lost the top-k operator")
    assert(!"(?m)^\\(\\d+\\) Exchange$".r.findFirstIn(p).isDefined,
      "q88 grew a shuffle exchange; positional matching is row-local")
    assert(!p.contains("Generate"), // no explode: positions stay in-array
      "q88 exploded the token array — the row-local filter formulation is gone")
  }

  test("scd2 merge joins only the current slice; history passes through join-free") {
    val p = plan("q89_scd2_merge")
    // exactly one join (full-outer current-vs-changes); the history
    // branch unions in with no join operator of its own
    val joins = "(?m)^\\(\\d+\\) SortMergeJoin|^\\(\\d+\\) BroadcastHashJoin|^\\(\\d+\\) ShuffledHashJoin".r
      .findAllIn(p).size
    assert(joins == 1, s"q89 has $joins join operators; the merge is ONE key join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("token-budget mixture broadcasts the budget table, one window per source") {
    val p = plan("q91_token_budget_mixture")
    assert(p.contains("BroadcastHashJoin"), "q91 must broadcast the budget join")
    assert("(?m)^\\(\\d+\\) Window$".r.findAllIn(p).size <= 2,
      "q91 grew extra windows; pos + cum_before ride ONE per-source sort")
    assert(!p.contains("CartesianProduct"))
  }

  test("lm quality scoring joins count tables, never cartesian") {
    val p = plan("q92_lm_quality_score")
    assert(!p.contains("CartesianProduct"), "q92 degraded to a cartesian product")
    // the vocab-size stats row must broadcast (1-row crossJoin)
    assert(p.contains("BroadcastExchange"), "q92 vocab stats must broadcast")
  }

  test("incremental decontamination probes a BROADCAST index read") {
    // the per-ingest probe must broadcast the (tiny) eval-gram set and
    // scan only the batch linearly — a shuffle join here would re-key
    // the whole batch's exploded grams
    val docs = graft.core.Tables.documents(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft-egplan").toString
    graft.ops.CorpusOps.writeEvalGramIndex(
      docs.filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(50)) === 0), "text", 4, dir)
    val p = graft.ops.CorpusOps.incrementalContamination(docs, "doc_id", "text", dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"), "probe lost the broadcast gram join")
    assert(!p.contains("SortMergeJoin"), "probe re-keys the batch grams")
  }

  test("hybrid RRF legs keep their shapes: broadcast cosine, no cartesian fusion") {
    val p = plan("q94_hybrid_rrf")
    // the cosine leg broadcasts its single query vector; the fusion join
    // on bounded top-k lists must never degrade to a cartesian product
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "cosine leg lost its broadcast")
    assert(!p.contains("CartesianProduct"), "fusion degraded to a cartesian product")
  }

  test("snapshot diff is one union + one key aggregation, no join at all") {
    val p = plan("q95_snapshot_diff")
    // each snapshot is scanned once into a union and the change feed is
    // derived by a single key-grouped aggregation (the dup-key gate rides
    // it) — no join, no cartesian, no per-side pre-pass
    assert(!p.contains("Join"), s"diff must not join the snapshots:\n$p")
    assert(p.contains("Union") && p.contains("Aggregate"),
      "expected the union + key-grouped aggregate shape")
    assert(!p.contains("CartesianProduct"))
  }

  test("stats drift is two 1-row aggregates, no data-sized join or window") {
    val p = plan("q98_stats_drift")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "drift monitor must never shuffle-join the snapshots")
    assert(!p.contains("Window"), "drift monitor needs no window")
    // the only joins are the broadcast of 1-row aggregate results
    assert(p.contains("HashAggregate"), "expected the wide stats aggregates")
  }

  test("bloom-pruned dedup probes inline (codegen filter), anti-join only on admits") {
    val p = plan("q101_bloom_incremental_dedup")
    // the bloom probe must be a row-local filter — no join, no shuffle of
    // its own; the only joins are the fp anti-join on the admitted branch
    assert(p.contains("bloom_might_contain"),
      "expected the native bloom probe expression in the plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "bloom dedup must never go cartesian/nested-loop")
    assert(p.contains("LeftAnti"), "expected the authoritative fp anti-join")
  }

  test("importance weighting broadcasts the bucket-count table, never the corpus") {
    val p = plan("q102_importance_weights")
    assert(p.contains("BroadcastHashJoin"),
      "bucket counts (<= numBuckets rows) must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "importance weights need no window")
  }

  test("importance selection cuts with TakeOrdered, not a global sort or window") {
    val p = plan("q103_importance_selection")
    assert(p.contains("TakeOrderedAndProject"),
      "top-fraction cut must be per-partition top-k + merge")
  }

  test("gap-fill windows per key and generates the calendar from span rows") {
    val p = plan("q105_daily_gap_fill")
    // the forward-fill window must be keyed (never a single global
    // partition) and the calendar explodes from per-key span rows
    assert(p.contains("Window"), "expected the forward-fill window")
    assert(p.contains("PartitionBy: [user_id") ||
      p.contains("partitionBy=[user_id") || p.contains("[user_id"),
      "forward-fill window must partition by the key")
    assert(p.contains("Generate"), "expected the sequence-explode calendar")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("cross-doc tile scrub shuffles on tile text only, never nested-loop") {
    val p = plan("q126_crossdoc_tile_scrub")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "tile winners join must stay an equi-join")
    assert(p.contains("partial_min") || p.contains("partial_count") ||
      p.contains("HashAggregate"), "winner min must partial-aggregate map-side")
  }

  test("collocations broadcast the unigram table and cut with TakeOrdered") {
    val p = plan("q127_collocations")
    assert(p.contains("BroadcastHashJoin"), "unigram joins must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "top-K must not global-sort")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("fuzzy decontamination broadcasts the eval side, never all-pairs") {
    val p = plan("q128_fuzzy_decontam")
    assert(p.contains("BroadcastHashJoin"), "eval postings must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must stay an equi-join on the shared shingle")
  }

  test("orphan audit is ONE lazy union plan — zero jobs at build time") {
    // the regression this pins: a per-FK-edge driver count loop would run
    // multi-stage aggregation jobs while BUILDING the frame. Parquet
    // footer/schema reads also surface as jobs, but those are single-
    // stage metadata reads — so assert no MULTI-STAGE job fires at build.
    @volatile var aggJobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.stageInfos.size > 1) aggJobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = SparkEntry.queries("q124_orphan_audit")(spark, sf001)
      Thread.sleep(500) // let any stray job-start events drain
      assert(aggJobs == 0,
        s"building the audit frame ran $aggJobs aggregation job(s)")
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("Union"), "expected one union of per-edge aggregates")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
      // still the same 3-row answer, in one action
      assert(df.collect().map(_.getString(0)).toSeq ==
        Seq("lineitem.l_orderkey", "lineitem.l_partkey", "orders.o_custkey"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dictionary tagging broadcasts the anchor table, never the corpus") {
    val p = plan("q144_dict_phrase_tags")
    assert(p.contains("BroadcastHashJoin"), "anchor join must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "dictionary matching must never scan doc x phrase")
  }

  test("moment stats read ONLY the persisted segments, never re-scan the batches") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("mom_plan").toString
    graft.ops.SketchStats.appendMomentsBatch(li, "l_quantity", dir, "b0",
      groupCols = Seq("l_returnflag"))
    val p = graft.ops.SketchStats.momentStats(spark, dir, Seq("l_returnflag"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("lineitem"), "serving must not touch the ingested table")
    assert(p.contains("seg=") || p.contains(dir.split('/').last),
      "serving must scan the segment store")
  }

  test("MMR rerank adds no shuffle beyond the candidate gather") {
    val emb = graft.core.Tables.embeddings(spark, sf001)
    import org.apache.spark.sql.functions._
    val df = graft.ops.VectorSim.mmrRerank(
      emb.filter(col("vec_id") < 4), emb, "vec_id", "embedding",
      topN = 10, k = 3, lam = 0.7)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the rerank stage sits above a materialization barrier (the tiny
    // per-query candidate frame is checkpointed so the optimizer cannot
    // inline the simM alias into the greedy lambdas); its whole plan
    // must therefore be pure row-local projection — no Exchange, no
    // Join, no Aggregate of any kind. The candidate stage's own shape
    // (broadcast brute kNN) is covered by the q40/q41 contracts.
    val tree = p.split("\n\n").head.linesIterator.toSeq
    assert(tree.exists(_.contains("Generate")), "expected the posexplode stage")
    tree.foreach(l => assert(!l.contains("Exchange") && !l.contains("Join") &&
      !l.contains("Aggregate") && !l.contains("CartesianProduct"),
      s"greedy MMR must stay row-local above the barrier:\n$l"))
  }

  test("frequent itemsets stay basket-keyed equi-joins with semi-join pruning") {
    val p = plan("q142_frequent_itemsets")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "apriori levels must join on the basket key, never cross")
    assert(p.contains("LeftSemi"), "downward-closure pruning (semi joins) missing")
  }

  test("funnel mining is one window pass — no per-user self-join") {
    val p = plan("q173_seq_patterns")
    assert(p.contains("Window"), "expected the running last-seen window")
    assert(!p.contains("CartesianProduct"), "funnel degraded to a cartesian")
    // the only nested-loop allowed is the 1-row total broadcast (the
    // stat-broadcast scalar); a second one would be a real self-join.
    // Count in the TREE section only (FormattedMode repeats node names
    // in the details section below the blank line)
    assert(p.split("\n\n").head.linesIterator
      .count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      "funnel grew a per-user self-join")
    // one data-sized exchange feeds the window (user_id); the rest of
    // the plan is the bounded |types|^2 aggregate + the tiny total
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 4, s"funnel plan grew $exchanges exchanges")
  }

  test("GD training broadcasts the 1-row weight frame every round") {
    val p = plan("q174_logreg_gd")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "weight frames must broadcast, never shuffle the feature side")
    // the feature frame is persisted: rounds must reuse InMemoryTableScan,
    // not re-run the orders x customer join per round
    assert(p.contains("InMemoryTableScan") || p.contains("Scan In-memory"),
      "GD rounds must reuse the persisted feature frame")
  }

  test("k-means rounds broadcast the centroid table, never shuffle it") {
    val p = plan("q171_kmeans_segments")
    assert(!p.contains("CartesianProduct"),
      "assignment must be broadcast x stream, not cartesian shuffle")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "centroids lost their broadcast")
  }

  test("KM survival risk sets come from windows, never a self-join") {
    val p = plan("q167_km_survival")
    assert(p.contains("Window"), "expected the descending cumulative risk window")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      "risk sets must not be computed by a duration self-join")
  }

  test("Spearman midranks come from rank windows, never a self-join") {
    val p = plan("q187_spearman_corr")
    assert(p.contains("Window"), "expected the rank/count midrank windows")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "midranks degraded to a per-value self-join")
  }

  test("AUC ranks run over the bounded distinct-score table") {
    val p = plan("q180_roc_auc")
    // the only aggregation wider than |distinct scores| is the input
    // group-by; the rank window and final sums are dimension-sized
    assert(p.contains("Window"), "expected the ordered-prefix rank window")
    assert(!p.contains("CartesianProduct"), "AUC must never cross-join")
  }

  test("bootstrap fan-out is one generate + keyed aggregate, no data re-shuffle per replicate") {
    val p = plan("q183_bootstrap_ci")
    assert(p.split("\n\n").head.linesIterator.exists(_.contains("Generate")),
      "expected the B-fold explode fan-out")
    assert(!p.contains("CartesianProduct"), "bootstrap must never cross-join the data side")
    val exchanges = p.split("\n\n").head.linesIterator
      .count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 6, s"bootstrap plan grew $exchanges exchanges")
  }

  test("rank-test prefix sums broadcast the per-partition offset table") {
    // globalCumSum's whole point is that NO window spans the full data —
    // the offsets re-enter as a broadcast; a SortMergeJoin on _pid would
    // mean the tiny table shuffled the big side
    Seq("q196_ks_test", "q197_mann_whitney", "q198_kruskal_wallis").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name lost the offset broadcast")
      // 1-row totals legitimately enter as broadcast cross joins (the
      // stat-broadcast scalar pattern); a CartesianProduct — both sides
      // unbroadcast — is the failure this contract guards against
      assert(!p.contains("CartesianProduct"),
        s"$name degraded to an unbroadcast cartesian")
    }
  }

  test("row-local kernels stay shuffle-free: html_to_text and PII redaction") {
    // the 100 TB claim for the stage-0 kernels is ZERO data movement:
    // scan → project(kernel) → the dump's final sort. Exactly one
    // exchange (the output ordering), no join, no aggregate.
    Seq("q222_html_text_extract", "q223_pii_redaction").foreach { name =>
      val p = plan(name)
      val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
      assert(exchanges <= 1, s"$name grew $exchanges exchanges (want <=1, the output sort)")
      assert(!p.contains("Join"), s"$name must not join")
      assert(!p.contains("HashAggregate"), s"$name must not aggregate")
    }
    // the URL ledger is one explode + ONE domain-keyed aggregation
    val p = plan("q225_url_domains")
    assert(!p.contains("Join"), "q225 must not join")
    assert(p.contains("Generate"), "q225 lost its URL explode")
  }

  test("domain blocklist joins the tiny list as a broadcast, never a cartesian") {
    // q231's blocklist is a handful of rows: it must enter the per-URL
    // frame as a BroadcastHashJoin (at 100 TB the URL side never moves
    // for it); the doc-level rejoin is doc_id-keyed and may shuffle
    val p = plan("q231_domain_blocklist")
    assert(p.contains("BroadcastHashJoin"), "q231 lost the blocklist broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "q231 degraded to a non-equi join")
    assert(p.contains("Generate"), "q231 lost its URL explode")
  }

  test("Adamic-Adar wedges close as equi-joins with a blocked hot-hub branch") {
    val p = plan("q201_adamic_adar")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "wedge/anti joins must stay hash/sort-merge equi-joins")
    assert(p.contains("LeftAnti"), "existing-edge removal lost its anti-join")
    // the skew guard (VERDICT r11): the plan must carry BOTH wedge
    // branches — the plain cold join and the hot branch's rank-cut
    // block replication (explode over a generated block sequence) whose
    // (v, i, j) join key spreads a hub over B² reducer cells
    assert(p.contains("explode(sequence("),
      "hot-hub blocked wedge branch (explode over block ids) missing")
    assert(p.contains("Union"),
      "cold/hot wedge branches must union before the pair aggregation")
  }

  test("CM serving reads only sketch segments and probe keys, never re-scans events per cell") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.events(spark, sf001)
    val dir = java.nio.file.Files.createTempDirectory("graft_cmplan").toString
    graft.ops.SketchStats.appendCmBatch(events, "user_id", dir, "b0", 64, 4)
    val served = graft.ops.SketchStats.cmEstimates(spark, dir,
      events.select("user_id").distinct())
    val p = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // exactly two scan families: the segment parquet and the probe keys
    assert(p.contains(dir.split('/').last), "expected the segment scan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the probe join must stay an equi-join on (d, bucket)")
  }

  test("domain split is one projection: no join, no aggregate, only the output sort") {
    // q236's 100 TB shape: scan → project(domain fold + hash bucket) →
    // sort. Any join or aggregate means the split stopped being
    // stateless.
    val p = plan("q236_domain_split")
    assert(!p.contains("Join"), "q236 must not join")
    assert(!p.contains("HashAggregate"), "q236 must not aggregate")
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"q236 grew $exchanges exchanges (want <=1, the output sort)")
  }

  test("canonical selection windows partition on the cluster rep, never globally") {
    // q239's argmax runs per cluster: every Window in the plan must
    // carry a partition spec (an unpartitioned window would funnel the
    // corpus through one task at 100 TB)
    val p = plan("q239_canonical_select")
    assert(p.contains("Window"), "q239 lost its argmax window")
    // a windowspecdefinition LEADS with its partition columns; the
    // argmax/size windows must both key on the cluster rep (an
    // unpartitioned spec would lead with an ASC/DESC order expr or the
    // frame itself)
    assert(p.contains("windowspecdefinition(cluster_rep"),
      "q239's windows must partition on cluster_rep")
  }

  test("budget select reuses the prefix-sum machinery: slice windows + broadcast offsets") {
    // q240 must show the globalCumSum shape — windows partitioned by the
    // slice id and the offset/budget scalars arriving as broadcasts; the
    // only unpartitioned window allowed is the per-slice offset fold
    // over the <= nSlices-row totals table
    val p = plan("q240_budget_select")
    assert(p.contains("Window"), "q240 lost the slice-local cumsum window")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastNestedLoopJoin"),
      "q240's offsets/budget must broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"), "q240 degraded to a cartesian")
  }

  test("ccnet buckets rank with slice-partitioned windows and a broadcast offset table") {
    // q245's groupedRank must never window-partition on the language
    // alone (a dominant language would funnel through one task at
    // 100 TB): every row_number window partitions on (_pid, lang), and
    // the (slice x lang) offset/size table arrives as a broadcast
    val p = plan("q245_ccnet_buckets")
    assert(p.contains("Window"), "q245 lost the slice-local rank window")
    assert(p.contains("BroadcastHashJoin"),
      "q245's offset table must broadcast-join back, not shuffle")
    assert(!p.contains("CartesianProduct"), "q245 degraded to a cartesian")
    // the rank window's partition spec includes the slice id — a spec
    // mentioning the group column without _pid is the skew funnel
    val windowLines = p.linesIterator.filter(l =>
      l.contains("row_number()") && l.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, "expected the grouped-rank window in the plan")
    windowLines.foreach(l =>
      assert(l.contains("_pid"), s"grouped-rank window lost its slice id: $l"))
  }

  test("source overlap pair join is gram-keyed, totals matrix from broadcasts") {
    val p = plan("q246_source_overlap")
    assert(!p.contains("CartesianProduct"), "q246 degraded to a cartesian")
    // the |sources|^2 pair frame may come from a nested-loop over the two
    // TINY totals frames (bounded by source cardinality) — but the
    // corpus-sized gram self-join must be a hash/sort-merge equi-join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"),
      "q246's gram self-join must stay an equi-join")
  }

  test("no driver-facing projection emits DecimalType (playbook rule 14, q211 class)") {
    // the q211 lesson (VERDICT r14 task 7): DECIMAL in a query's FINAL
    // schema rides the driver's decimal128 hash channel, which disagreed
    // between DuckDB→pandas and Spark-parquet→pyarrow for three rounds
    // while every value compared equal. tools/check.py bans it
    // driver-side; this is the same gate as an sbt contract no future
    // query can dodge. Internal DECIMAL accumulation stays fine — only
    // the driver-facing projection is audited. (The sibling §4.1b rule —
    // no raw unrounded transcendental double — is not schema-visible
    // and stays a per-query review rule.)
    def decimalIn(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.DecimalType => true
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => decimalIn(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => decimalIn(a.elementType)
      case m: org.apache.spark.sql.types.MapType =>
        decimalIn(m.keyType) || decimalIn(m.valueType)
      case _ => false
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = fn(spark, sf001).schema.fields
          .filter(f => decimalIn(f.dataType)).map(_.name)
        // constructed frames may persist intermediates (LSH docs, CC
        // labels, BPE vocab): drop them so 246 constructions don't
        // stack cached state for the rest of the suite
        spark.catalog.clearCache()
        if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"driver-facing DECIMAL columns (cast to BIGINT or round to " +
        s"double at the projection): ${offenders.mkString("; ")}")
  }

  test("SURVEY §2.15 headline and no_oracle list match the registry (doc cannot drift)") {
    // the r15 lesson (VERDICT r15 task 7): §2.15 bills itself as the
    // mechanical audit index, and its intro went stale the moment the
    // registry grew. Parse the ACTUAL documented numbers and the
    // documented designed-terminal no_oracle id list out of SURVEY.md
    // and assert them against SparkEntry — the doc now fails the build
    // when it lies.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val headline = """(\d+)/(\d+) are DuckDB-oracle""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY §2.15 headline 'N/M are DuckDB-oracle' missing"))
    val total = SparkEntry.queries.size
    val oracled = SparkEntry.oracleSql.size
    assert(headline.group(1).toInt == oracled &&
      headline.group(2).toInt == total,
      s"SURVEY §2.15 headline says ${headline.matched}; registry has " +
        s"$oracled/$total")
    // the documented no_oracle set: the backticked qNN ids inside the
    // intro sentence between the headline and 'designed-terminal'
    val intro = survey.substring(headline.end,
      survey.indexOf("designed-terminal"))
    val documented = """`(q\d+)`""".r.findAllMatchIn(intro)
      .map(_.group(1)).toSet
    val actual = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .map(_.split("_")(0))
    assert(documented == actual,
      s"SURVEY no_oracle list drifted: documented-only " +
        s"${(documented -- actual).toSeq.sorted.mkString(",")}; " +
        s"registry-only ${(actual -- documented).toSeq.sorted.mkString(",")}")
  }
}
