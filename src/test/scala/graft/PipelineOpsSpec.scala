package graft

import graft.queries.{GraphOps, RetrievalOps}
import org.apache.spark.sql.functions._

/** Structural properties of the round-4 curation/analytics additions that
  * the DuckDB hash gate can't see: PageRank mass conservation and ranking
  * shape, DSIR target discrimination, perplexity-bucket monotonicity, and
  * SCD2 interval algebra. */
class PipelineOpsSpec extends SparkSpec {

  // ------------------------------------------------------------ PageRank
  test("pagerank: star graph ranks the hub first, leaves tie, mass ~ 1") {
    import spark.implicits._
    // star: hub 1 connected to leaves 2..5
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    val pr = GraphOps.pageRankScores(e).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 5)
    val leaves = Seq(2L, 3L, 4L, 5L).map(pr)
    assert(leaves.distinct.size == 1, s"symmetric leaves must tie: $leaves")
    assert(pr(1L) > leaves.head, "hub must outrank leaves")
    // total mass stays ~1: quantization drift bounded by iters * n * grid
    val mass = pr.values.sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass drifted: $mass")
  }

  test("pagerank: regular graph (cycle) is uniform at 1/n on the grid") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val pr = GraphOps.pageRankScores(e).collect().map(_.getDouble(1))
    // every node of a 2-regular cycle keeps exactly the uniform rank
    assert(pr.forall(p => math.abs(p - 0.25) < 2e-6), pr.mkString(","))
  }

  // ------------------------------------------------------------ DSIR
  test("dsir: target-language docs score higher than off-target on average") {
    val scores = RetrievalOps.dsirScores(
      Catalog.table(spark, sf0001, "documents"))
      .collect().map(r => (r.getString(1), r.getDouble(3)))
    val (en, rest) = scores.partition(_._1 == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[(String, Double)]) = xs.map(_._2).sum / xs.length
    assert(mean(en) > mean(rest),
      s"target slice must score higher: en=${mean(en)} rest=${mean(rest)}")
  }

  // ------------------------------------------------------------ ppl buckets
  test("ppl buckets: per-language avg_h is monotone head <= middle <= tail") {
    val rows = Registry.byName("r_ppl_buckets").run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val total = rows.map(_._3).sum
    val nDocs = Catalog.table(spark, sf0001, "documents")
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(total == nDocs, s"bucketed $total of $nDocs docs")
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val by = rs.map(r => r._2 -> r._4).toMap
      for {
        a <- by.get("head"); b <- by.get("middle")
      } assert(a <= b, s"$lang head $a > middle $b")
      for {
        b <- by.get("middle"); c <- by.get("tail")
      } assert(b <= c, s"$lang middle $b > tail $c")
    }
  }

  // ------------------------------------------------------------ dup ngrams
  test("dup ngrams: outputs are real 8-grams with doc spread >= 2") {
    val rows = Registry.byName("t_dup_ngrams").run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (ng, nDocs, nOcc) =>
      assert(ng.split(" ").length == 8, s"not an 8-gram: '$ng'")
      assert(nDocs >= 2, s"'$ng' spread $nDocs")
      assert(nOcc >= nDocs, s"'$ng' occurrences $nOcc < docs $nDocs")
    }
  }

  // ------------------------------------------------------------ hash split
  test("split: every doc assigned once, fractions near 80/10/10, rerun-stable") {
    val rows = Registry.byName("p_split").run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._3).sum
    assert(total == Catalog.table(spark, sf0001, "documents").count())
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val frac = bySplit("train").toDouble / total
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
    // determinism: identical assignment on a second run
    val again = Registry.byName("p_split").run(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.sortBy(t => (t._1, t._2)).toSeq == again.sortBy(t => (t._1, t._2)).toSeq)
  }

  // ------------------------------------------------------------ SCD2
  test("scd2: versions are contiguous, intervals chain, one current per user") {
    val rows = Registry.byName("e_scd2").run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getBoolean(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq,
        s"user $user versions not contiguous")
      // interval chaining: valid_to(i) == valid_from(i+1); only the last
      // version is open-ended / current
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $user gap between v${a._2} and v${b._2}")
          assert(a._3 != b._3, s"user $user consecutive versions share type")
        case _ => ()
      }
      assert(sorted.count(_._6) == 1 && sorted.last._6,
        s"user $user must have exactly one current version (the last)")
    }
    // run-collapse must conserve events
    val nEvents = Catalog.table(spark, sf0001, "events")
      .filter(col("user_id") < 20).count()
    assert(rows.map(_._7).sum == nEvents)
  }

  // ------------------------------------------------------------ gopher rules
  test("gopher rules: crafted violations trip exactly the intended flags") {
    import spark.implicits._
    val good = (("word" + (1 to 30).mkString(" word")) + // 30 distinct 5-6 char words
      " the a of and " + ("term" + (31 to 50).mkString(" term"))) // stopwords + 20 more
    val docs = Seq(
      ("s", good),                               // keeps: every rule passes
      ("s", "the a " + Seq.fill(60)("spam").mkString(" ")), // ttr + domtok
      ("s", "tiny the a doc"),                   // too few words
      ("s", ("quux" + (1 to 60).mkString(" quux"))) // no stopwords
    ).toDF("source", "text")
    val f = graft.queries.TextOps.gopherFlags(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(f(0) == ((0L, 0L, 0L, 0L, 0L)), s"clean doc flagged: ${f(0)}")
    assert(f(1) == ((0L, 0L, 0L, 1L, 1L)), s"spam doc must trip exactly ttr+domtok: ${f(1)}")
    assert(f(2)._1 == 1L, s"short doc must trip nwords: ${f(2)}")
    assert(f(3)._3 == 1L, s"stopword-free doc must trip stop: ${f(3)}")
  }

  test("gopher rules: registry rollup conserves the document count") {
    val rows = Registry.byName("t_gopher_rules").run(spark, sf0001).collect()
    val nDocs = Catalog.table(spark, sf0001, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "per-source n_docs must sum to corpus")
    rows.foreach { r =>
      val (docs, keep) = (r.getLong(1), r.getLong(2))
      val viol = (3 to 7).map(r.getLong).sum
      assert(keep <= docs && keep >= 0)
      // every kept doc has zero violations, so violations bound the drops
      assert(docs - keep <= viol, s"${r.getString(0)}: drops exceed violations")
    }
  }

  // ------------------------------------------------------------ drift monitor
  test("drift monitor: an injected per-dim shift ranks that dim first") {
    import spark.implicits._
    // ref half: constant vectors; new half: identical except dim 3 += 1.0
    val rows = (0L until 20L).map { id =>
      val base = Array(0.5f, -0.25f, 0.125f, 0.75f)
      if (id < 10) (id, base) else (id, Array(base(0), base(1), base(2) + 1.0f, base(3)))
    }
    val e = rows.toDF("vec_id", "embedding")
    val d = graft.queries.VectorOps.driftScores(e, cut = 10L)
      .orderBy(col("drift").desc, col("dim")).collect()
      .map(r => (r.getInt(0), r.getDouble(3)))
    assert(d.length == 4)
    assert(d.head._1 == 3 && math.abs(d.head._2 - 1.0) < 1e-6,
      s"shifted dim must lead: ${d.toSeq}")
    assert(d.tail.forall(_._2 == 0.0), s"unshifted dims must show zero drift: ${d.toSeq}")
  }

  // ------------------------------------------------------------ hybrid RRF
  test("feature hash: buckets bounded, label matches score sign, tokens conserved") {
    val rows = Registry.byName("t_feature_hash").run(spark, sf0001).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (nFeat, nTok, score, label) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(nFeat >= 1 && nFeat <= 4096, "feature count within hash space")
      assert(nTok >= nFeat, "sparse features can't exceed token count")
      assert(label === (if (score >= 0) "pos" else "neg"))
    }
    // n_tokens must equal the raw whitespace token count (nothing dropped
    // by the hashing trick — every token lands in some bucket)
    val d = Catalog.table(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    rows.foreach(r => assert(r.getLong(2) === d(r.getLong(0)), s"doc ${r.getLong(0)}"))
  }

  test("basket pairs: lift and counts agree with direct per-order recomputation") {
    val rows = Registry.byName("a_basket_pairs").run(spark, sf0001).collect()
    assert(rows.length === 20)
    val items = Catalog.table(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val perPart = items.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val nOrders = byOrder.size.toLong
    rows.foreach { r =>
      val (p1, p2, nBoth) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val direct = byOrder.values.count(s => s(p1) && s(p2)).toLong
      assert(nBoth === direct, s"pair ($p1,$p2)")
      assert(r.getLong(3) === perPart(p1) && r.getLong(4) === perPart(p2))
      val lift = (nBoth * nOrders).toDouble / (perPart(p1) * perPart(p2)).toDouble
      val expected = new java.math.BigDecimal(lift) // Spark round() = HALF_UP
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
      assert(r.getDouble(5) === expected, s"lift ($p1,$p2)")
    }
  }

  test("hybrid rrf: per-query top-5, scores bounded and monotone, legs agree") {
    val rows = Registry.byName("r_hybrid_rrf").run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 5).toSeq, s"q$q ranks not 1..5")
      // monotone non-increasing fused score down the ranking
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 >= b._4, s"q$q rrf not monotone")
        case _ => ()
      }
      sorted.foreach { case (_, _, nId, rrf, rs_, rd) =>
        assert(nId != q, s"q$q retrieved itself")
        assert(rs_ >= 0 && rs_ <= 20 && rd >= 0 && rd <= 20)
        assert(rs_ > 0 || rd > 0, s"q$q fused a row present in neither leg")
        // RRF bound: two rank-1 legs give the max 2/61
        assert(rrf > 0.0 && rrf <= 2.0 / 61.0 + 1e-9, s"q$q rrf out of range: $rrf")
      }
    }
  }

  // ------------------------------------------------------------ containment
  test("containment: finds a short doc pasted inside a long one that jaccard misses") {
    // doc 1 = 12 words, all of it verbatim inside doc 2's 120 words:
    // containment(1 in 2) = 1.0, jaccard ≈ |A|/|B| ≈ 0.08 — under any
    // sane near-dup threshold, which is exactly the leak case
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val big = (small.split(" ") ++ (13 to 120).map(i => s"w$i")).mkString(" ")
    val other = (200 to 260).map(i => s"z$i").mkString(" ")
    val d = spark.createDataFrame(Seq(
      (1L, small), (2L, big), (3L, other))).toDF("doc_id", "text")
    val pairs = queries.TextOps.containmentPairs(d, 0.8).collect()
    assert(pairs.length === 1)
    val r = pairs.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 1.0, s"cont_a: ${r.getDouble(2)}") // A fully inside B
    assert(r.getDouble(4) < 0.5, s"jaccard should miss this pair: ${r.getDouble(4)}")
  }

  // ------------------------------------------------------------ salted join
  test("x_salted_join: executes as a shuffled hash join (not broadcast), salt spreads keys") {
    val df = queries.Extras.saltedJoin.run(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must exercise the shuffle path:\n${plan.take(2000)}")
    // and the join key must include the salt column (the skew-spread)
    assert(plan.contains("salt"), "salt column missing from the physical join")
  }

  // ------------------------------------------------------------ weighted sample
  test("t_weighted_sample: deterministic across runs and weight-biased") {
    val a = queries.TextOps.weightedSample.run(spark, sf0001).collect()
    val b = queries.TextOps.weightedSample.run(spark, sf0001).collect()
    assert(a.toSeq === b.toSeq, "priority sample must be run-stable")
    // weight bias: sampled docs' mean n_chars should exceed the corpus mean
    val sampledMean = a.map(_.getLong(2)).sum.toDouble / a.length
    val corpusMean = Catalog.table(spark, sf0001, "documents")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    info(f"sampled mean chars $sampledMean%.0f vs corpus $corpusMean%.0f")
    assert(sampledMean > corpusMean,
      "char-weighted sampling should prefer longer docs")
  }
}
