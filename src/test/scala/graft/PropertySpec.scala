package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions._
import graft.clean.Cleaning
import graft.core.Det
import graft.features.Features

/** Property-based invariants (SURVEY §5.2.3): the runtime checks the
  * reference performs become generated-input properties.
  */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8) // each trial runs Spark jobs; keep tight

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val doubles = Gen.listOfN(40, Gen.chooseNum(-1e6, 1e6))
    .suchThat(_.nonEmpty)

  property("dsum equals BigDecimal-exact sum of 6dp-rounded values") =
    forAll(doubles) { xs =>
      val rounded = xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val expected = rounded.sum.toDouble
      val got = xs.toDF("v").agg(Det.dsum(col("v"))).collect()(0).getDouble(0)
      got == expected
    }

  property("IQR clip output stays within computed fences") =
    forAll(doubles) { xs =>
      val df = xs.toDF("v")
      val clipped = Cleaning.clipOutliersIqr(df, exclude = Nil)
      val qs = df.agg(expr("percentile(v, 0.25)"), expr("percentile(v, 0.75)"))
        .collect()(0)
      val (q1, q3) = (qs.getDouble(0), qs.getDouble(1))
      val (lo, hi) = (q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1))
      val mm = clipped.agg(min("v"), max("v")).collect()(0)
      mm.getDouble(0) >= lo - 1e-9 && mm.getDouble(1) <= hi + 1e-9
    }

  property("impute leaves no nulls") =
    forAll(Gen.listOfN(30, Gen.option(Gen.chooseNum(-100.0, 100.0)))) { xs =>
      xs.exists(_.isDefined) ==> {
        val imputed = Cleaning.imputeNulls(xs.toDF("v"))
        imputed.filter(col("v").isNull).count() == 0
      }
    }

  property("ntile bucket sizes differ by at most 1") =
    forAll(Gen.chooseNum(10, 80), Gen.long) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val df = (0 until n).map(i => (f"U$i%05d", rnd.nextInt(1000)))
        .toDF("user_id", "rfm_frequency")
      val bucket = Features.quantileBucket(df, "rfm_frequency", "user_id",
        5, Seq(1, 2, 3, 4, 5), ascending = true)
      val sizes = df.select(bucket.as("b")).groupBy("b").count()
        .collect().map(_.getLong(1))
      sizes.max - sizes.min <= 1
    }

  property("pd.cut: values at bin edges fall in the right-closed bin") =
    forAll(Gen.chooseNum(1, 999)) { x =>
      val got = Seq(x).toDF("v")
        .select(Features.cut(col("v"), Seq(0, 250, 500, 750, 1000),
          Seq("a", "b", "c", "d")).as("c"))
        .collect()(0).getString(0)
      val expected =
        if (x <= 250) "a" else if (x <= 500) "b" else if (x <= 750) "c" else "d"
      got == expected
    }

  private val floatVecs = Gen.listOfN(12,
    Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))).suchThat(_.nonEmpty)

  property("nearest_centroids: valid distinct indices matching a scala argmax") =
    forAll(floatVecs, Gen.chooseNum(1, 4)) { (vs, nprobe) =>
      val cents = Array.tabulate(4, 8)((c, i) => if (i % 4 == c) 1.0f else 0.1f)
      val got = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "v")
        .select(col("id"),
          graft.functions.IvfExprs.nearestCentroids(col("v"), cents, nprobe).as("p"))
        .orderBy("id").collect().map(_.getSeq[Int](1).toSeq)
      got.zip(vs).forall { case (probes, v) =>
        val dots = cents.map(_.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum)
        val expected = dots.zipWithIndex
          .sortBy { case (d, i) => (-d, i) }.map(_._2).take(nprobe).toSeq
        probes == expected && probes.distinct.size == probes.size
      }
    }

  property("winnowing fingerprints are a subset of the doc's gram hashes") =
    forAll(Gen.listOfN(3, Gen.alphaNumStr.suchThat(_.length >= 1))) { texts =>
      import graft.analytics.TextQueries
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
        .select(col("id"), TextQueries.charGramHashes(col("text"), 5).as("_g"))
        .select(col("id"), col("_g"),
          TextQueries.winnowFromGrams(col("_g"), 8).as("fps"))
      df.collect().forall { r =>
        val grams = r.getSeq[Long](1).toSet
        val fps = r.getSeq[Long](2).toSet
        fps.nonEmpty && fps.subsetOf(grams)
      }
    }

  property("packSequences: offsets are contiguous and chunks exactly cover tokens") =
    forAll(Gen.listOfN(12, Gen.chooseNum(0L, 300L))) { counts =>
      import graft.ops.CorpusOps
      val ctx = 128L
      val df = counts.zipWithIndex.map { case (n, i) =>
        (if (i % 2 == 0) "a" else "b", i.toLong, n)
      }.toDF("src", "id", "n")
      val rows = CorpusOps.packSequences(df, "src", "id", "n", ctx)
        .select("src", "id", "n", "tok_start", "chunk_first", "n_chunks")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .groupBy(_._1)
      rows.values.forall { shard =>
        val s = shard.sortBy(_._2)
        val contiguous = s.zip(s.drop(1)).forall { case (a, b) => a._4 + a._3 == b._4 }
        s.head._4 == 0L && contiguous && s.forall { case (_, _, n, start, first, spans) =>
          if (n == 0) spans == 0L
          else first == start / ctx && spans == (start + n - 1) / ctx - first + 1
        }
      }
    }

  property("connectedComponents labels match a single-node union-find oracle") =
    forAll(Gen.listOfN(10, Gen.zip(Gen.chooseNum(1L, 12L), Gen.chooseNum(1L, 12L)))) { es =>
      import graft.ops.Components
      val nodes = (1L to 12L).toDF("id")
      val edges = es.toDF("src", "dst")
      val got = Components.connectedComponents(nodes, edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map((1L to 12L).map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb
      }
      val want = (1L to 12L).map { i =>
        i -> (1L to 12L).filter(j => find(j) == find(i)).min
      }.toMap
      got == want
    }

  // mixes ASCII with multi-byte chars so the fused kernel's char→byte
  // offset walk is stressed on every UTF-8 width (2-byte é, 3-byte 漢,
  // 4-byte 😀 — one code point each to UTF8String, in both the composed
  // substr path and the kernel's walk)
  private val textGen = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString), 2 -> Gen.const(" "),
    1 -> Gen.const("é"), 1 -> Gen.const("漢"), 1 -> Gen.const("😀"),
  )).map(_.mkString)

  property("fused winnow_select_grams equals the composed gram-array form") =
    forAll(textGen, Gen.chooseNum(1, 6), Gen.chooseNum(1, 5)) { (text, k, w) =>
      val df = Seq(Tuple1(text)).toDF("text")
      val grams = when(length(col("text")) < k, array(col("text")))
        .otherwise(transform(sequence(lit(1), length(col("text")) - lit(k - 1)),
          i => col("text").substr(i, lit(k))))
      val composed = df.select(col("text"), grams.as("_t"))
        .select(graft.functions.WinnowExprs.winnowSelect(col("_t"), w))
        .collect()(0).getSeq[String](0).toSeq
      val fused = df.select(
        graft.functions.WinnowExprs.winnowSelectGrams(col("text"), k, w))
        .collect()(0).getSeq[String](0).toSeq
      fused == composed
    }

  // random snapshot pair: keyed rows with a handful of groups and
  // 6dp-representable measures (the decimal contract's domain), so every
  // insert/delete/in-group-update/group-migration combination occurs
  private val snapshotGen: Gen[List[(Long, String, Double)]] =
    Gen.listOf(for {
      k <- Gen.chooseNum(0L, 24L)
      g <- Gen.oneOf("a", "b", "c")
      m <- Gen.chooseNum(-1000000, 1000000).map(_ / 100.0)
    } yield (k, g, m)).map(_.distinctBy(_._1))

  property("CDC-maintained count/sum view is bit-identical to recompute") =
    forAll(snapshotGen, snapshotGen) { (v0, v1) =>
      (v0.nonEmpty && v1.nonEmpty) ==> {
        import graft.warehouse.{IncrementalAgg, VersionedTable}
        val dir = java.nio.file.Files
          .createTempDirectory("graft_iaprop").toString + "/t"
        VersionedTable.commit(v0.toDF("k", "g", "m"), dir)
        VersionedTable.commit(v1.toDF("k", "g", "m"), dir)
        def rows(df: org.apache.spark.sql.DataFrame) =
          IncrementalAgg.present(df, "g").orderBy("g").collect()
            .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
        val maintained = IncrementalAgg.applyCdc(
          IncrementalAgg.countSumView(
            VersionedTable.read(spark, dir, Some(0L)), "g", "m"),
          VersionedTable.diffValues(spark, dir, 0L, 1L, Seq("k")), "g", "m")
        val direct = IncrementalAgg.countSumView(
          VersionedTable.read(spark, dir, Some(1L)), "g", "m")
        rows(maintained) == rows(direct)
      }
    }

  // pins the q211 regression: globalRank/globalCumSum ride a SAMPLED
  // range exchange consumed by two subplans — without the persist, the
  // branches can see different boundaries and silently corrupt results
  // (SURVEY playbook rule 13). Property: for ANY data + duplicate
  // structure, rank and 5-column cumsum equal the single-threaded replay.
  private val rankRows = Gen.listOfN(60,
    Gen.zip(Gen.chooseNum(-50L, 50L), Gen.chooseNum(0L, 5L)))
    .suchThat(_.nonEmpty)

  property("globalRank == sorted replay for any duplicate structure") =
    forAll(rankRows) { xs =>
      val withId = xs.zipWithIndex.map { case ((v, w), i) => (v, w, i.toLong) }
      val df = withId.toDF("v", "w", "id")
      val got = graft.analytics.StatQueries
        .globalRank(df, Seq(col("v"), col("id")))
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = withId.sortBy(t => (t._1, t._3)).zipWithIndex
        .map { case (t, i) => t._3 -> (i + 1L) }.toMap
      got == expect
    }

  // the grouped sibling (q245's mechanism): for ANY group skew and
  // duplicate structure, per-group rank and group size equal the
  // single-threaded per-group replay. The generator is deliberately
  // skewed (one group draws 3/5 of the rows) — the funnel shape the
  // helper exists to avoid.
  private val groupedRows = Gen.listOfN(80,
    Gen.zip(Gen.frequency(3 -> Gen.const("big"), 1 -> Gen.const("mid"),
      1 -> Gen.const("tiny")), Gen.chooseNum(-30L, 30L)))
    .suchThat(_.nonEmpty)

  property("groupedRank == per-group sorted replay under any skew") =
    forAll(groupedRows) { xs =>
      val withId = xs.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val df = withId.toDF("g", "v", "id")
      val got = graft.analytics.StatQueries.groupedRank(df, Seq("g"),
          Seq(col("v"), col("id")), col("v"))
        .select("g", "id", "grn", "gn").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val expect = withId.groupBy(_._1).flatMap { case (g, rows) =>
        val sorted = rows.sortBy(t => (t._2, t._3))
        sorted.zipWithIndex.map { case (t, i) =>
          (g, t._3) -> (i + 1L, rows.length.toLong) }
      }.toMap
      got == expect
    }

  property("globalCumSum (2 cols) == sorted replay") =
    forAll(rankRows) { xs =>
      val grouped = xs.groupBy(_._1).toSeq
        .map { case (v, g) => (v, g.map(_._2).sum, g.length.toLong) }
      val df = grouped.toDF("v", "s", "c")
      val got = graft.analytics.StatQueries
        .globalCumSum(df, Seq(col("v")), Seq("s", "c"))
        .collect().map(r => r.getLong(0) -> (r.getAs[Long]("cum_s"), r.getAs[Long]("cum_c")))
        .toMap
      var (rs, rc) = (0L, 0L)
      grouped.sortBy(_._1).forall { case (v, s, c) =>
        rs += s; rc += c
        got(v) == ((rs, rc))
      }
    }
}
