package graft

import graft.queries.GraphOps
import org.apache.spark.sql.functions._

/** Connected-components dedup clustering: structural properties that the
  * DuckDB hash gate can't see — convergence on adversarial shapes and
  * transitive consistency of the labeling. */
class GraphOpsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("a_id", "b_id")
    GraphOps.ccLabels(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph collapses to one component labeled by its min id") {
    // a path 1-2-3-4-5 needs label propagation across 4 hops — the
    // worst diameter-per-edge shape for min-label
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(labels.values.toSet == Set(1L))
    assert(labels.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("disjoint components keep distinct min-id labels") {
    val labels = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(labels(10L) == 10L && labels(11L) == 10L && labels(12L) == 10L)
    assert(labels(20L) == 20L && labels(21L) == 20L)
    assert(labels(30L) == 30L && labels(31L) == 30L)
  }

  test("reliable-checkpoint mode produces the identical labeling") {
    // spark.graft.reliableCheckpointDir switches the loop's lineage cuts
    // from localCheckpoint (executor memory — dies with an executor) to
    // reliable checkpoint in a durable dir (survives executor loss on a
    // real cluster). Same fixpoint, same labels — only durability changes.
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val base = cc(pairs)
    spark.conf.set("spark.graft.reliableCheckpointDir", dir)
    try {
      val reliable = cc(pairs)
      assert(reliable == base, "reliable-checkpoint labeling diverged")
      // the durable dir must actually have been used
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => p.toFile.isFile).count()
      assert(wrote > 0, "no checkpoint files written to the reliable dir")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpointDir")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("t_dedup_clusters labels are transitively consistent with the pair graph") {
    val d = Catalog.table(spark, sf0001, "documents")
    val pairs = queries.TextOps.minhashPairs(d.select(col("doc_id"), col("text")), 0.5)
      .select(col("a_id"), col("b_id"))
    val labels = Registry.byName("t_dedup_clusters").run(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
    // every label is the min doc_id of its member set
    labels.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
  }

  test("edge-iterator triangle count equals brute-force enumeration on seeded random graphs") {
    import spark.implicits._
    // the distributed edge-iterator must agree with O(V^3) brute force on
    // graphs it was never tuned for — 20 seeded Erdős–Rényi graphs
    val rng = new scala.util.Random(42)
    (1 to 20).foreach { trial =>
      val n = 5 + rng.nextInt(12)
      val p = 0.15 + rng.nextDouble() * 0.5
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rng.nextDouble() < p
      } yield (u.toLong, v.toLong)).toSeq
      val brute = (for {
        a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
        if edges.contains((a.toLong, b.toLong)) &&
          edges.contains((b.toLong, c.toLong)) &&
          edges.contains((a.toLong, c.toLong))
      } yield 1).size.toLong
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val paths = e.select(col("u").as("a"), col("v").as("b"))
          .join(e.select(col("u").as("b"), col("v").as("c")), "b")
        val tri = paths.join(
          e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c")).count()
        assert(tri === brute,
          s"trial $trial (n=$n, |E|=${edges.size}): edge-iterator $tri vs brute $brute")
      }
    }
  }

  test("frontier BFS equals brute-force shortest hops on seeded random graphs") {
    import spark.implicits._
    // the per-round frontier/anti-join machinery must agree with a
    // driver-side Dijkstra-on-unit-weights on shapes it was never tuned
    // for — including nodes beyond the hop budget (absent from output)
    val rng = new scala.util.Random(7)
    (1 to 8).foreach { trial =>
      val n = 6 + rng.nextInt(10)
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rng.nextDouble() < 0.25
      } yield (u.toLong, v.toLong)).toSeq
      if (edges.nonEmpty) {
        val got = GraphOps.bfsHopsFrom(edges.toDF("u", "v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute force: BFS from the 3 smallest present node ids
        val present = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        val seeds = present.take(3)
        val nbr = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .map { case (k, vs) => k -> vs.map(_._2) }
        var dist = seeds.map(_ -> 0L).toMap
        var frontier = seeds.toSet
        for (h <- 1 to 3) {
          val nxt = frontier.flatMap(nbr.getOrElse(_, Nil)) -- dist.keySet
          dist = dist ++ nxt.map(_ -> h.toLong)
          frontier = nxt
        }
        assert(got === dist, s"trial $trial (n=$n, |E|=${edges.size})")
      }
    }
  }

  test("k-core peel equals brute-force peel on seeded random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (1 to 8).foreach { trial =>
      val n = 6 + rng.nextInt(10)
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n
        if rng.nextDouble() < 0.3
      } yield (u.toLong, v.toLong)).toSeq
      if (edges.nonEmpty) {
        val (df, _) = GraphOps.kCorePeel(edges.toDF("u", "v"), 2)
        val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute-force confluent peel
        var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
        var changed = true
        def deg(s: Set[Long]) = edges.filter(e => s(e._1) && s(e._2))
          .flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        while (changed) {
          val d = deg(alive)
          val kept = alive.filter(v => d.getOrElse(v, 0L) >= 2)
          changed = kept != alive
          alive = kept
        }
        assert(got === deg(alive).toMap, s"trial $trial (n=$n, |E|=${edges.size})")
      }
    }
  }

  test("g_kcore engine fixpoint lands within the oracle's unrolled round budget") {
    // the DuckDB oracle unrolls 12 peel rounds; the engine loop must
    // converge at least that fast on the fixture graph or the two sides
    // would diverge at the gate
    val e = GraphOps.coSupplyEdges(Catalog.table(spark, sf0001, "lineitem"))
    val (_, rounds) = GraphOps.kCorePeel(e, 2)
    assert(rounds <= 12, s"engine needed $rounds rounds, oracle unrolls 12")
  }

  test("g_jaccard_links scores are consistent with direct neighbor-set computation") {
    val rows = Registry.byName("g_jaccard_links").run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // recompute neighbor sets directly from the same edge derivation
    val e = queries.GraphOps.coSupplyEdges(Catalog.table(spark, sf0001, "lineitem"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbr = (e ++ e.map(_.swap)).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    rows.foreach { r =>
      val (u, v) = (r.getLong(0), r.getLong(1))
      val inter = nbr(u).intersect(nbr(v)).size
      val union = nbr(u).union(nbr(v)).size
      assert(r.getLong(2) === inter.toLong, s"common($u,$v)")
      assert(math.abs(r.getDouble(5) - inter.toDouble / union) < 1e-6,
        s"jaccard($u,$v)")
    }
  }

  test("p_dedup_canonical keeps the longest member of every cluster") {
    val d = Catalog.table(spark, sf0001, "documents")
    val nTok = d.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val clusters = Registry.byName("t_dedup_clusters").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val verdicts = Registry.byName("p_dedup_canonical").run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = clusters.groupBy(_._2)
    assert(verdicts.length == byCluster.size)
    verdicts.foreach { case (cid, kept, n) =>
      val members = byCluster(cid).map(_._1)
      assert(members.length == n)
      assert(members.contains(kept))
      // kept is max-token (ties min id)
      val best = members.maxBy(m => (nTok(m), -m))
      assert(kept == best, s"cluster $cid kept $kept, expected $best")
    }
  }
}
