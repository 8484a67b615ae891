package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TextDedup

/** Measured scale curve for the near-dup dedup family — the local
  * evidence behind the 100 TB plan-shape claims: replicate the sf0.1
  * documents corpus 4x and 16x and verify wall time grows near-linearly
  * (no super-linear blowup from bucket skew or candidate explosion).
  *
  * Replication model: "a bigger corpus with the same duplicate density".
  * Each replica offsets doc ids AND rotates the letters of the text by a
  * replica-specific Caesar shift — a BIJECTIVE, length-preserving char
  * map, so every replica's near-dup structure is exactly isomorphic to
  * the base corpus (identical per-replica pair counts) while replica
  * vocabularies and char-gram spaces are disjoint. Replicating text
  * verbatim would create k-fold identical-document groups whose pair
  * output grows quadratically in k by construction; tagging tokens with
  * a constant replica marker (the first attempt) is just as wrong in a
  * subtler way — the marker itself becomes a shared substring in every
  * 12-gram, collapsing the winnow gram space and inflating within-
  * replica pairs 16x. Both measure the corpus generator, not the
  * operators. The exact-verify q58 path blocks on (lang, replica):
  * bounded block size under growth IS that operator's scale contract
  * (an unbounded blocking key is quadratic by definition — the blocking
  * column is the caller's scale lever).
  *
  * Each scale's corpus is materialized to parquet first, so the timed
  * region is the operator over a real scan, not the replication
  * transform. Shuffle partitions scale WITH the data (cpus * k — constant
  * rows per partition), because that is the cluster model the curve is
  * evidence for: a fixed partition count at growing data measures spill
  * onset on one machine, not the operator's scaling (measured here: q38
  * at 16x took 96 s with 32 partitions vs 43 s with 256). Cells are
  * min-of-2 so a first-touch JIT/page-cache outlier cannot fake a
  * super-linear step. Sanity assertion (exit 2 on failure): stepping
  * 1x->4x and 4x->16x each cost at most `slack` * 4x the wall time —
  * fixed overhead makes small scales look sub-linear, so only the upper
  * bound is asserted.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.app.ScaleCurve
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val slack = args.headOption.map(_.toDouble).getOrElse(1.8)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-curve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bounded plan-description strings (see core.HostAnchor)
      .config("spark.sql.maxPlanStringLength",
        graft.core.HostAnchor.maxPlanStringLength)
      // long-GC hardening (r16): with a 64g heap and a bursty host, a
      // stop-the-world pause can outlive the default heartbeat budget,
      // and in local mode the "executor" then declares ITS OWN driver
      // dead — an RPC self-destruct observed killing a mid-curve session
      // (exit 56). A single-JVM harness has nothing to gain from tight
      // liveness probes.
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      // NO spark.speculation (r16, ADVICE r15): it is a silent no-op
      // under local[N] — TaskSchedulerImpl starts the speculation thread
      // only when !isLocal — so the r15 A/B "improvement" was host
      // variance. The mitigations that actually run in this harness are
      // min-of-2 per cell plus the ONE targeted retry below; a real
      // cluster submission should enable speculation (quantile 0.75 /
      // multiplier 2.0) for the same bimodal stalled-tail class.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_scale").toString
    val scales = Seq(1, 4, 16)
    val base = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang")

    // rotate each character class separately so the map stays a
    // bijection over letters AND digits — a lowercase-only rotation
    // would leave digit/uppercase-heavy docs byte-identical across
    // replicas, quietly reintroducing quadratic cross-replica pairs
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rotCls(s: String, i: Int) = s.drop(i % s.length) + s.take(i % s.length)
    val alphabet = lower + upper + digits
    def replicated(k: Int): DataFrame = (0 until k).map { i =>
      val rot = rotCls(lower, i) + rotCls(upper, i) + rotCls(digits, i)
      val text =
        if (i == 0) col("text") else translate(col("text"), alphabet, rot)
      base.select(
        (col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"),
        text.as("text"),
        concat(col("lang"), lit(s"_r$i")).as("blk"))
    }.reduce(_ unionByName _)

    scales.foreach { k =>
      replicated(k).write.mode("overwrite").parquet(s"$work/x$k")
      ()
    }
    def corpus(k: Int): DataFrame = spark.read.parquet(s"$work/x$k")

    // q144's base dictionary: the 1x corpus's top bigrams/trigrams, with
    // the same per-replica rotation map the corpus replication applies
    def rotPhrase(p: String, i: Int): String = {
      val rot = rotCls(lower, i) + rotCls(upper, i) + rotCls(digits, i)
      p.map { c => val j = alphabet.indexOf(c); if (j < 0) c else rot(j) }
    }
    val basePhrases: Seq[String] = {
      import graft.ops.CorpusOps
      val bound = corpus(1).select(graft.core.Cols.wsTokens(col("text")).as("_t"))
      val counts = bound
        .select(explode(concat(CorpusOps.wordGrams(col("_t"), 2),
          CorpusOps.wordGrams(col("_t"), 3))).as("phrase"))
        .groupBy("phrase").agg(count(lit(1)).as("c"))
        .withColumn("n", size(split(col("phrase"), " ")))
      counts.persist()
      def top(n: Int, k: Int) = counts.filter(col("n") === n)
        .orderBy(desc("c"), asc("phrase")).limit(k)
        .select("phrase").collect().map(_.getString(0)).toSeq
      val ps = top(2, 8) ++ top(3, 4)
      counts.unpersist(false)
      ps
    }

    val ops: Seq[(String, DataFrame => Long)] = Seq(
      "q38_minhash_neardups" -> (d =>
        TextDedup.minhashNearDups(d, "text", "doc_id", threshold = 0.5).count()),
      "q55_minhash_dedup_clusters" -> (d =>
        TextDedup.minhashDedupClusters(d, "text", "doc_id").count()),
      "q58_trigram_jaccard_neardups" -> (d =>
        TextDedup.jaccardPairs(d, "text", "doc_id", "blk",
          threshold = 0.35, shingleLen = 3).count()),
      "q79_incremental_minhash_neardups" -> { d =>
        val old = d.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        val fresh = d.filter(pmod(col("doc_id"), lit(5)) === 0)
        TextDedup.incrementalNearDups(fresh,
          TextDedup.minhashSignatures(old, "text", "doc_id"),
          "text", "doc_id").count()
      },
      "q83_winnow_dup_pairs" -> (d =>
        TextDedup.winnowDupPairs(d, "text", "doc_id",
          k = 12, w = 10, minShared = 2).count()),
      // any-length exact-substring spans (r15): gram count + semi join +
      // per-doc window — replicas' gram spaces are disjoint (Caesar
      // rotation), so duplicated-gram mass and spans grow linearly
      "q249_exact_substring" -> (d =>
        TextDedup.exactSubstringSpans(d, "text", "doc_id",
          minTokens = 8).count()),
      "q101_bloom_incremental_dedup" -> { d =>
        val old = d.filter(pmod(col("doc_id"), lit(7)) =!= 0)
        val fresh = d.filter(pmod(col("doc_id"), lit(7)) === 0)
        val fpIndex = old.select(TextDedup.fingerprint(col("text")).as("fp")).distinct()
        val bloom = old.select(TextDedup.fpProbeKey(col("text")).as("k"))
          .stat.bloomFilter("k", 2000000L, 0.01)
        TextDedup.bloomPrunedIncrementalExactDedup(fresh, fpIndex, bloom,
          "text", "doc_id").count()
      },
      "q102_importance_weights" -> (d =>
        graft.ops.CorpusOps.importanceWeights(d, "text", "doc_id",
          col("blk").startsWith("en"), numBuckets = 4096).count()),
      // synthetic per-replica names: the doubled replica digit keeps
      // cross-replica name distance >= 2 > k, so pair structure stays
      // replica-isomorphic (no quadratic cross-replica pairs)
      "q108_fuzzy_name_pairs" -> (d =>
        graft.ops.EditJoin.levenshteinSelfJoin(
          d.select(col("doc_id"), format_string("%d%d#%09d",
            floor(col("doc_id") / 1000000000L).cast("int"),
            floor(col("doc_id") / 1000000000L).cast("int"),
            pmod(col("doc_id"), lit(1000000000L))).as("nm")),
          "doc_id", "nm", k = 1).count()),
      // the dictionary GROWS with the corpus (base top-12 phrases plus
      // their per-replica rotation images — the realistic regime: bigger
      // corpus, bigger blocklist), and each replica's matches are
      // isomorphic to the base's, so output must stay linear
      "q144_dict_phrase_tags" -> { d =>
        val k = d.agg(max(floor(col("doc_id") / 1000000000L)))
          .head.getLong(0).toInt + 1
        val dict = (0 until k).flatMap(i => basePhrases.map(rotPhrase(_, i)))
          .distinct.sorted.zipWithIndex
          .map { case (p, j) => (p, j + 1) }
        import spark.implicits._
        graft.ops.DictTag.tagDictionary(d, "doc_id", "text",
          dict.toDF("phrase", "phrase_id")).count()
      },
      // replica vocabularies are disjoint, so every KN count table grows
      // linearly and the score joins stay key-hashed — linear end to end
      "q141_kn_lm_score" -> (d =>
        graft.ops.LmScore.knBigramScore(
          d.filter(pmod(col("doc_id"), lit(7)) =!= 0),
          d.filter(pmod(col("doc_id"), lit(7)) === 0),
          "doc_id", "text").count()),
      // tokenizer induction: the merge rounds run over the DISTINCT-WORD
      // table (grows ~k with disjoint replica vocabs); round count fixed
      "q143_wordpiece_compression" -> { d =>
        val freqs = graft.ops.Bpe.wordFreqs(d, "text")
        freqs.persist()
        val rules = graft.ops.WordPiece.trainWordPieceOnFreqs(freqs, nMerges = 10)
        val n = graft.ops.WordPiece
          .tokenCompression(d, "text", "doc_id", freqs, rules).count()
        freqs.unpersist(false)
        n
      },
      "q145_unigram_compression" -> { d =>
        val freqs = graft.ops.Bpe.wordFreqs(d, "text")
        freqs.persist()
        val vocab = graft.ops.UnigramLm.trainUnigramOnFreqs(freqs,
          vocabSize = 300, seedSize = 600, emIters = 1)
        val n = graft.ops.UnigramLm
          .tokenCompression(d, "text", "doc_id", vocab).count()
        freqs.unpersist(false)
        n
      },
      // labels = the 5 base langs shared across replicas (replica
      // vocabularies are disjoint, so the count table grows linearly and
      // the test-token x 5-class cross stays linear); classifying against
      // a class set that itself grew with the corpus would be quadratic
      // by definition, which is the caller's lever, not the operator's
      "q149_nb_lang_classifier" -> { d =>
        val labeled = d.withColumn("lang", substring_index(col("blk"), "_", 1))
        graft.ops.NaiveBayes.trainScore(
          labeled.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          labeled.filter(pmod(col("doc_id"), lit(5)) === 0),
          "doc_id", "text", "lang").count()
      },
      // row-local fold, zero shuffles: the purest linear cell — any
      // super-linear step here would indict the harness, not the operator
      "q156_random_projection" -> { d =>
        graft.ops.VectorSim.signProject(
          d.select(col("doc_id"),
            transform(sequence(lit(0), lit(31)),
              i => pmod(xxhash64(col("doc_id") * 37 + i), lit(1000L))
                .cast("float") / 1000f).as("emb")),
          "doc_id", "emb", dIn = 32, dOut = 8).count()
      },
      // chunk-level dedup: replica vocabularies are disjoint, so chunk
      // groups never cross replicas — one chunk-keyed shuffle that must
      // stay linear in corpus bytes
      "q206_chunk_dedup" -> (d =>
        graft.ops.CorpusOps.chunkDedup(d, "text", "doc_id",
          chunkLen = 100).count()),
      // count-min build + probe: cell table bounded (depth x width) however
      // many rows; build is one pass, serving joins depth rows per key
      "q202_cm_frequency" -> { d =>
        val cmDir = java.nio.file.Files.createTempDirectory("graft_cmscale").toString
        graft.ops.SketchStats.appendCmBatch(d, "doc_id", cmDir, "all",
          width = 4096, depth = 4)
        graft.ops.SketchStats.cmEstimates(spark, cmDir,
          d.select("doc_id").distinct()).count()
      },
      // stateless projection + hash bucket: domain-grain split must be
      // scan-linear (counting only the 'val' side forces the full chain)
      "q236_domain_split" -> { d =>
        val host = concat(lit("sub"), (col("doc_id") % 7).cast("string"),
          lit(".site"), (col("doc_id") % 101).cast("string"), lit(".org"))
        d.select(graft.ops.CorpusOps.registrableDomain(host).as("domain"))
          .filter(pmod(xxhash64(col("domain")), lit(10)) < 1).count()
      },
      // cluster chain + per-cluster argmax window: replica-isomorphic
      // clusters keep window partitions bounded, so the argmax adds one
      // linear pass over the q55 cell's cost
      "q239_canonical_select" -> { d =>
        import org.apache.spark.sql.expressions.Window
        val clusters = TextDedup.minhashDedupClusters(d, "text", "doc_id",
          numHashes = 128, bands = 8)
        val qual = d.select(col("doc_id"),
          size(array_distinct(graft.core.Cols.wsTokens(col("text"))))
            .cast("long").as("nd"))
        val w = Window.partitionBy("cluster_rep").orderBy(desc("nd"), asc("id"))
        val n = clusters.join(qual, col("id") === col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).count()
        spark.catalog.clearCache()
        n
      },
      // distributed prefix sum at growing n: slice-local windows +
      // boundary collects must stay linear (the rank-machinery cell)
      "q240_budget_select" -> { d =>
        val toks = graft.core.Cols.wsTokens(col("text"))
        val stats = d.select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("nd"))
        val cm = graft.analytics.StatQueries.globalCumSum(stats,
          Seq(desc("nd"), asc("doc_id")), Seq("n_tokens"),
          bucketKey = Some(-col("nd")))
        val t = cm.agg(floor(max("cum_n_tokens") / 2).cast("long").as("budget"))
        val n = cm.crossJoin(broadcast(t))
          .filter(col("cum_n_tokens") <= col("budget")).count()
        spark.catalog.clearCache()
        n
      },
      // grouped exact rank (q245's mechanism): slices come from the
      // GLOBAL order, so per-group cost is data-bounded regardless of
      // group skew; group count grows with replicas (blk carries the
      // replica suffix), exercising the (slice × group) offset table
      "q245_grouped_ntile" -> { d =>
        val toks = graft.core.Cols.wsTokens(col("text"))
        val stats = d.select(col("doc_id"), col("blk"),
          size(array_distinct(toks)).cast("long").as("nd"))
        val ranked = graft.analytics.StatQueries.groupedRank(stats,
          Seq("blk"), Seq(desc("nd"), asc("doc_id")), -col("nd"))
        val n = ranked.filter(graft.analytics.StatQueries
          .ntileFromRank(col("grn"), col("gn"), 3) === 1).count()
        spark.catalog.clearCache()
        n
      },
      // source-pair gram overlap (q246): per-gram pair fan-out is
      // bounded by how many sources share the gram (replicas rotate the
      // alphabet, so grams never cross replicas — fan-out stays flat
      // while gram volume scales linearly)
      "q246_source_overlap" -> { d =>
        val g = d.select(col("blk"),
          explode(graft.ops.CorpusOps.wordGrams(
            graft.core.Cols.wsTokens(col("text")), 4)).as("gram"))
          .distinct()
        g.as("a").join(g.as("b"),
            col("a.gram") === col("b.gram") && col("a.blk") < col("b.blk"))
          .groupBy(col("a.blk"), col("b.blk")).agg(count(lit(1)))
          .count()
      },
    )

    // ---- events replication for the sequence/drift family: new users
    // per replica (offset ids), identical per-user series — pattern and
    // fold structure is exactly replica-isomorphic, so funnel supports,
    // CUSUM folds, and GD gradients must all scale linearly in users
    val baseEvents = graft.core.Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type", "value")
    def replicatedEvents(k: Int): DataFrame = (0 until k).map { i =>
      baseEvents.select(
        (col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        (col("user_id") + lit(i.toLong * 1000000000L)).as("user_id"),
        col("ts"), col("event_type"), col("value"))
    }.reduce(_ unionByName _)
    scales.foreach { k =>
      replicatedEvents(k).write.mode("overwrite").parquet(s"$work/ev_x$k")
      ()
    }
    def eventsAt(k: Int): DataFrame = spark.read.parquet(s"$work/ev_x$k")

    val evOps: Seq[(String, DataFrame => Long)] = Seq(
      // one window pass + bounded pair aggregate: user-count linear
      "q173_seq_patterns(events)" -> { d =>
        val types = Seq("click", "error", "purchase", "signup", "view")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val e = d.select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        val withLasts = types.foldLeft(e) { case (df, t) =>
          df.withColumn(s"l_$t",
            max(when(col("event_type") === t, col("us"))).over(w))
        }
        withLasts.select(col("user_id"), col("event_type").as("next_type"),
            col("us"),
            explode(array(types.map(t =>
              struct(lit(t).as("prev_type"), col(s"l_$t").as("l_us"))): _*)).as("p"))
          .filter(col("p.prev_type") =!= col("next_type") &&
            col("p.l_us").isNotNull &&
            (col("us") - col("p.l_us")) <= 604800000000L)
          .select(col("user_id"), col("p.prev_type"), col("next_type"))
          .distinct().count()
      },
      // row-local fold per user after one stats pass: user-count linear
      "q179_cusum_fold(events)" -> { d =>
        val st = d.groupBy("user_id").agg(
            count(lit(1)).as("n"),
            graft.core.Det.dsum(col("value")).as("sx"),
            graft.core.Det.dsum(col("value") * col("value")).as("sxx"))
          .filter(col("n") >= 20)
          .select(col("user_id"),
            (col("sx") / col("n")).as("mu"),
            sqrt(col("sxx") / col("n") -
              (col("sx") / col("n")) * (col("sx") / col("n"))).as("sd"))
        d.join(broadcast(st), "user_id")
          .groupBy("user_id", "mu", "sd")
          .agg(array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("evs"))
          .withColumn("vals", transform(col("evs"), e => e.getField("value")))
          .select(col("user_id"),
            aggregate(col("vals"), lit(0.0), (acc, x) =>
              greatest(lit(0.0), acc + (x - col("mu") - lit(0.5) * col("sd"))))
              .as("s"))
          .count()
      },
    )

    // one warmup pass at 1x so JIT/codegen compilation is not billed to
    // the first measured cell
    ops.foreach { case (_, f) => f(corpus(1)); () }
    evOps.foreach { case (_, f) => f(eventsAt(1)); () }

    var ok = true
    println(f"${"query"}%-36s ${"1x(s)"}%8s ${"4x(s)"}%8s ${"16x(s)"}%8s " +
      f"${"4x/1x"}%6s ${"16x/4x"}%6s")
    // targeted rerun filter (comma-separated name prefixes): adjudicating
    // one bimodal cell should not cost a full-curve session
    val onlyCells = sys.env.get("SPARK_GRAFT_CURVE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def measure(name: String, f: DataFrame => Long, at: Int => DataFrame): Unit = {
      if (!onlyCells.forall(_.exists(name.startsWith))) return
      def timesOnce(): Seq[Double] = scales.map { k =>
        // constant rows per shuffle partition across scales — see scaladoc
        spark.conf.set("spark.sql.shuffle.partitions", (cpus.toInt * k).toString)
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          f(at(k))
          (System.nanoTime() - t0) / 1e9
        }
        runs.min
      }
      def passOf(t: Seq[Double]) =
        t(1) / t(0) <= slack * 4 && t(2) / t(1) <= slack * 4
      var t = timesOnce()
      var retried = false
      if (!passOf(t)) {
        // ONE targeted retry before declaring super-linear: the host's
        // 16x cells are bimodal (measured r12: three consecutive clean
        // runs each put a DIFFERENT single cell at ~35-55 s vs its usual
        // 7-34 s — a host-level stall, not the operator; one stall even
        // stamped two adjacent cells with the identical 34.75 s). A
        // transient stall re-rolls on retry; a genuinely super-linear
        // operator fails the retry too, so the gate still catches real
        // regressions.
        retried = true
        val t2 = timesOnce()
        t = t.zip(t2).map { case (a, b) => math.min(a, b) }
      }
      val r41 = t(1) / t(0); val r164 = t(2) / t(1)
      val pass = passOf(t)
      ok &&= pass
      println(f"$name%-36s ${t(0)}%8.2f ${t(1)}%8.2f ${t(2)}%8.2f " +
        f"$r41%6.2f $r164%6.2f ${if (retried) " (retried)" else ""}" +
        f"${if (pass) "" else "  <-- SUPER-LINEAR"}")
    }
    ops.foreach { case (name, f) => measure(name, f, corpus) }
    evOps.foreach { case (name, f) => measure(name, f, eventsAt) }

    // ---- co-purchase graph replication for the link-prediction cell:
    // disjoint replica graphs (offset vertex ids), identical per-replica
    // wedge structure, so Adamic-Adar candidate generation must scale
    // linearly in replicas. Base graph = a deterministic 10% order slice
    // of sfDir's lineitem (the full sf0.1 graph's 148M wedges would make
    // a 16x cell minutes-long without adding scaling signal).
    // Prepared + warmed + measured AFTER the long-standing cells: when
    // this section ran BEFORE them, the extra pre-measurement JVM
    // history (JIT/codegen/GC state) pushed q38's 16x cell from its
    // documented ~34 s to 46-55 s on identical binaries — the same
    // order-dependent shared-JVM class adjudicated in bench_notes_r12.
    val li0 = graft.core.Tables.lineitem(spark, sfDir)
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    // persisted for the 1+4+16 = 21 replica projections below — uncached,
    // the lineitem self-join re-ran once per replica (review finding)
    val baseEdges = li0.as("a").join(li0.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().persist()
    scales.foreach { k =>
      (0 until k).map { i =>
        baseEdges.select((col("u") + lit(i.toLong * 1000000000L)).as("u"),
          (col("v") + lit(i.toLong * 1000000000L)).as("v"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/edges_x$k")
      ()
    }
    baseEdges.unpersist(false)
    def edgesAt(k: Int): DataFrame = spark.read.parquet(s"$work/edges_x$k")
    val graphOps: Seq[(String, DataFrame => Long)] = Seq(
      // wedge volume is Σ deg² — replica-disjoint, so linear in k; the
      // hot/cold blocked join bounds any one center's cell fan-out.
      // clearCache after each run: adamicAdarTopK persists its adjacency
      // frame per invocation, and 7+ invocations would otherwise stack
      // cached copies for the session (review finding)
      "q201_adamic_adar(edges)" -> { d =>
        val n = graft.ops.LinkPredict.adamicAdarTopK(d, "u", "v",
          minCommon = 2, topK = 5).count()
        d.sparkSession.catalog.clearCache()
        n
      },
    )
    graphOps.foreach { case (_, f) => f(edgesAt(1)); () } // warmup
    graphOps.foreach { case (name, f) => measure(name, f, edgesAt) }

    // ---- multimodal replication: k× more planted-clone images/audio
    // (disjoint id spaces, one clone per base) — decode + hash is
    // row-local and the pigeonhole pair join is keyed on 8 chunk rows
    // per item, so both cells must scale linearly in corpus size
    scales.foreach { k =>
      graft.ops.ImageHash.plantedPngCorpus(spark, nBase = 150 * k)
        .write.mode("overwrite").parquet(s"$work/img_x$k")
      graft.ops.AudioHash.plantedWavCorpus(spark, nBase = 300 * k)
        .write.mode("overwrite").parquet(s"$work/wav_x$k")
      ()
    }
    def imagesAt(k: Int): DataFrame = spark.read.parquet(s"$work/img_x$k")
    def wavsAt(k: Int): DataFrame = spark.read.parquet(s"$work/wav_x$k")
    val mediaOps: Seq[(String, DataFrame => Long)] = Seq(
      "q221_image_phash(images)" -> { d =>
        val n = graft.ops.ImageHash.phashNearDups(
          graft.ops.ImageHash.pngHashes(d, "media_id", "png"),
          "media_id", "dhash", maxHamming = 6).count()
        d.sparkSession.catalog.clearCache()
        n
      },
      "q224_audio_fp(wavs)" -> { d =>
        val n = graft.ops.AudioHash.fingerprintNearDups(
          graft.ops.AudioHash.wavHashes(d, "media_id", "wav"),
          "media_id", maxHamming = 6).count()
        d.sparkSession.catalog.clearCache()
        n
      },
    )
    def mediaAt(name: String): Int => DataFrame =
      if (name.contains("audio")) wavsAt else imagesAt
    mediaOps.foreach { case (name, f) => f(mediaAt(name)(1)); () } // warmup
    mediaOps.foreach { case (name, f) => measure(name, f, mediaAt(name)) }

    // ---- round-13 cells: video near-dups (frame fan-out is bounded per
    // video, the per-frame-index pigeonhole join is keyed — linear in
    // corpus size) and the WARC container walk (row-local per container;
    // container COUNT scales, per-container record count is fixed).
    // Container build is prep, not billed to the measured cell.
    scales.foreach { k =>
      graft.ops.VideoHash.plantedMp4Corpus(spark, nBase = 60 * k)
        .write.mode("overwrite").parquet(s"$work/vid_x$k")
      ()
    }
    scales.foreach { k =>
      graft.ingest.WarcIngest.packContainers(
          corpus(k).select(
            (col("doc_id") - pmod(col("doc_id"), lit(20L))).as("cid"),
            col("doc_id"),
            concat(lit("<html><head><title>t</title></head><body><p>"),
              col("text"), lit("</p></body></html>")).as("_html")),
          "2024-01-01T00:00:00Z", id => s"https://corpus.test/doc/$id")
        .write.mode("overwrite").parquet(s"$work/warc_x$k")
      ()
    }
    def videosAt(k: Int): DataFrame = spark.read.parquet(s"$work/vid_x$k")
    def warcsAt(k: Int): DataFrame = spark.read.parquet(s"$work/warc_x$k")
    val r13Ops: Seq[(String, DataFrame => Long, Int => DataFrame)] = Seq(
      ("q233_video_neardups(videos)", { (d: DataFrame) =>
        import d.sparkSession.implicits._
        val n = graft.ops.VideoHash.videoNearDups(
          graft.ops.VideoHash.frameHashes(d.as[graft.ops.Multimodal.MediaRow]),
          "media_id", minFrames = 3, maxHamming = 6).count()
        d.sparkSession.catalog.clearCache()
        n
      }, videosAt _),
      ("q232_warc_walk(containers)", { (d: DataFrame) =>
        val n = graft.ingest.WarcIngest.htmlResponses(
            graft.ingest.WarcIngest.readWarc(d, "cid", "warc"))
          .select(graft.functions.HtmlExtract.htmlToText(col("html")))
          .count()
        d.sparkSession.catalog.clearCache()
        n
      }, warcsAt _),
    )
    r13Ops.foreach { case (_, f, at) => f(at(1)); () } // warmup
    r13Ops.foreach { case (name, f, at) => measure(name, f, at) }

    // ---- round-16 cells, prepared + measured after the long-standing
    // ones (the shared-JVM ordering rule above).

    // (a) Iterative-graph family (VERDICT r15 task 5): q148/q138 are
    // per-round join+agg chains over the SAME co-purchase edges as the
    // q201 cell — replica-disjoint graphs, so each round's
    // contribution join and degree agg must scale linearly in edges.
    // Teleport/start sources sit in replica 0 (the global-3-smallest
    // rule, exactly the registry query's shape): the scaling cost under
    // test is the per-round full-edge join, not the frontier.
    def bothDirs(d: DataFrame): DataFrame =
      d.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(d.select(col("v").as("src"), col("u").as("dst")))
    val graphIterOps: Seq[(String, DataFrame => Long)] = Seq(
      "q148_personalized_pr(edges)" -> { d =>
        val e = bothDirs(d)
        val sources = e.select(col("src").as("node")).distinct()
          .orderBy("node").limit(3).collect().map(_.getLong(0)).toSeq
        val n = graft.ops.PageRank.personalizedPageRank(e, "src", "dst",
          sources, iters = 3).count()
        d.sparkSession.catalog.clearCache()
        n
      },
      "q138_bfs_hops(edges)" -> { d =>
        val e = bothDirs(d)
        val start = e.agg(min("src")).head.getLong(0)
        val n = graft.ops.Components.bfsHops(e, "src", "dst", start,
          maxHops = 4).count()
        d.sparkSession.catalog.clearCache()
        n
      },
    )
    graphIterOps.foreach { case (_, f) => f(edgesAt(1)); () } // warmup
    graphIterOps.foreach { case (name, f) => measure(name, f, edgesAt) }

    // (b) RETRO exact-substring probe (VERDICT r15 task 3's cell): the
    // batch is FIXED (replica 0's %5 slice) while the corpus grows, so
    // the newly-saturated gram set and the affected-doc re-scan are
    // CONSTANT across scales — the probe's wall time must stay near
    // flat (only the pruned index read grows), demonstrating cost
    // tracks the saturated set, not the corpus. Index builds are prep,
    // not billed to the measured cell.
    val retroBatchP = col("doc_id") < 1000000000L &&
      pmod(col("doc_id"), lit(5)) === 0
    scales.foreach { k =>
      val c = corpus(k)
      TextDedup.writeGramCountIndex(c.filter(!retroBatchP), "text",
        "doc_id", minTokens = 8, s"$work/gidx_x$k")
      TextDedup.appendGramCountBatchKeyed(c.filter(retroBatchP), "text",
        "doc_id", s"$work/gidx_x$k", "b1")
      ()
    }
    // k rides in as a literal column on the handed-in frame — deriving
    // it from max(doc_id) would bill a full corpus scan to the timed
    // cell whose whole claim is near-flat cost (review r16); reading
    // one row of a literal is constant
    def corpusK(k: Int): DataFrame = corpus(k).withColumn("_kk", lit(k))
    val retroOps: Seq[(String, DataFrame => Long)] = Seq(
      "q256_retro_probe(fixed batch)" -> { d =>
        val k = d.select("_kk").head.getInt(0)
        graft.ops.TextDedup.retroExactSubstringSpans(
          d.filter(!retroBatchP), "text", "doc_id",
          s"$work/gidx_x$k", "b1").count()
      },
    )
    retroOps.foreach { case (_, f) => f(corpusK(1)); () } // warmup
    retroOps.foreach { case (name, f) => measure(name, f, corpusK) }

    // (c) IVF decontamination front at eval-suite scale (VERDICT r15
    // task 8): anchors FIXED (an eval suite's size doesn't grow with
    // the crawl), corpus k× — replicas offset ids and cyclically rotate
    // embedding dims (intra-replica cosine structure preserved exactly;
    // vectors stay unit-class). The nprobe-bounded candidate join must
    // scale linearly in corpus vectors. Recall telemetry vs the exact
    // path runs on the REAL sfDir vectors so the (numCells, nprobe)
    // operating point is measured, not defaulted — quoted in the bench
    // notes.
    val baseVecs = graft.core.Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding")
    val vecDim = baseVecs.head.getAs[scala.collection.Seq[Float]](1).length
    val anchors = baseVecs.filter(col("vec_id") % 40 === 0)
    graft.ops.VectorSim.writeEvalAnchorIndex(anchors, "vec_id",
      "embedding", s"$work/aidx")
    scales.foreach { k =>
      (0 until k).map { i =>
        baseVecs.select(
          (col("vec_id") + lit(i.toLong * 1000000000L)).as("vec_id"),
          transform(sequence(lit(0), lit(vecDim - 1)),
            j => element_at(col("embedding"),
              pmod(j + lit(i), lit(vecDim)) + 1)).as("embedding"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$work/vec_x$k")
      ()
    }
    def vecsAt(k: Int): DataFrame = spark.read.parquet(s"$work/vec_x$k")
    val ivfOps: Seq[(String, DataFrame => Long)] = Seq(
      "q251_ivf_decontam(vectors)" -> { d =>
        graft.ops.VectorSim.incrementalSemanticDecontamIvf(
          d, "vec_id", "embedding", s"$work/aidx", threshold = 0.25).count()
      },
    )
    ivfOps.foreach { case (_, f) => f(vecsAt(1)); () } // warmup
    ivfOps.foreach { case (name, f) => measure(name, f, vecsAt) }
    val recall = graft.ops.VectorSim.semanticDecontamIvfRecall(
      anchors, baseVecs.filter(col("vec_id") % 40 =!= 0),
      "vec_id", "embedding", threshold = 0.25)
    println(f"q251 IVF front recall vs exact @ $sfDir (numCells=16, nprobe=8): $recall%.3f")
    ok &&= recall >= 0.9
    if (recall < 0.9)
      println("  <-- RECALL GATE FAILED (>= 0.9 required)")

    spark.stop()
    if (!ok) sys.exit(2)
  }
}
