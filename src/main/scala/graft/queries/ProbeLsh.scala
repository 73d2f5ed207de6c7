package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main for the near-dup band-join families at replica scale
  * (round-9: the r8 100× proof showed t_minhash_lsh 247× and
  * t_simhash_neardup 469× for 100× data — this measures WHERE the time
  * goes stage by stage, so the fix targets the real quadratic rather
  * than a guessed one).
  *
  * usage: ProbeLsh <sfDir> [shufflePartitions] [minhash|simhash|both]
  *
  * Prints per-stage row counts and wall times: signature build, dup
  * collapse, band rows, band-join candidates (pre- and post-distinct),
  * verified pairs. Stage boundaries are forced with noop writes so each
  * number is one stage's cost, not a prefix re-execution.
  */
object ProbeLsh {

  private def timed[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def cnt(tag: String, df: DataFrame): Long = timed(tag) {
    val n = df.count()
    println(s"[probe]   rows: $n")
    n
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeLsh <sfDir> [parts] [minhash|simhash|both]")
    val dir = args(0)
    val spark = graft.GraftSession.get()
    args.lift(1).filter(_ != "-").foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
    // arbitrary conf overrides for A/B probing, e.g.
    // GRAFT_PROBE_CONF="spark.sql.codegen.wholeStage=false,spark.x=y"
    // ';' is the preferred entry separator (values may then contain ',');
    // plain ','-separated remains accepted for values without commas
    sys.env.get("GRAFT_PROBE_CONF").foreach { raw =>
      val sep = if (raw.contains(";")) ";" else ","
      raw.split(sep).map(_.trim).filter(_.nonEmpty).foreach { kv =>
        require(kv.contains("="), s"bad GRAFT_PROBE_CONF entry (no '='): '$kv'")
        val Array(k, v) = kv.split("=", 2)
        println(s"[probe] conf $k=$v")
        spark.conf.set(k, v)
      }
    }
    val which = args.lift(2).getOrElse("both")
    println(s"[probe] dir=$dir parts=${spark.conf.get("spark.sql.shuffle.partitions")}")

    val docs = TextOps.spread(graft.Catalog.table(spark, dir, "documents"))
    if (which == "minhash" || which == "both") probeMinhash(spark, docs)
    if (which == "simhash" || which == "both") probeSimhash(spark, docs)
    if (which == "simhash2") probeSimhashCollapsed(spark, docs)
    spark.stop()
  }

  /** Collapsed-pipeline breakdown: where does the output-sized tail go —
    * expansion join or the contract orderBy? */
  private def probeSimhashCollapsed(spark: SparkSession, docs: DataFrame): Unit = {
    println("[probe] == simhash collapsed ==")
    val grouped = timed("collapse (checkpoint)") {
      TextOps.simhashDf(docs)
        .groupBy(col("simhash"))
        .agg(min(col("doc_id")).as("gid"),
          collect_list(col("doc_id")).as("members"),
          count(lit(1)).as("gn"))
        .localCheckpoint()
    }
    println(s"[probe]   groups: ${grouped.count()}")
    val bands = grouped
      .select(col("gid"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bh", expr("shiftright(simhash, band * 15) & 32767"))
    val candReps = timed("rep cands (checkpoint)") {
      bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
            col("x.gid") < col("y.gid"))
        .select(col("x.gid").as("ga"), col("y.gid").as("gb"),
          col("x.simhash").as("a_sh"), col("y.simhash").as("b_sh"))
        .distinct()
        .withColumn("hamming", expr("cast(bit_count(a_sh ^ b_sh) as int)"))
        .filter(col("hamming") <= 3)
        .select(col("ga"), col("gb"), col("hamming"))
        .localCheckpoint()
    }
    println(s"[probe]   verified rep pairs: ${candReps.count()}")
    val mem = grouped.select(col("gid"), explode(col("members")).as("doc_id"))
    val repPairs = candReps.union(
      grouped.filter(col("gn") >= 2)
        .select(col("gid").as("ga"), col("gid").as("gb"), lit(0).as("hamming")))
    val expanded = repPairs
      .join(mem.select(col("gid").as("ga"), col("doc_id").as("da")), "ga")
      .join(mem.select(col("gid").as("gb"), col("doc_id").as("db")), "gb")
      .filter(col("ga") =!= col("gb") || col("da") < col("db"))
      .select(least(col("da"), col("db")).as("a_id"),
        greatest(col("da"), col("db")).as("b_id"), col("hamming"))
    timed("expansion noop (UNsorted)") {
      expanded.write.format("noop").mode("overwrite").save()
    }
    if (!sys.env.contains("GRAFT_PROBE_SKIP_SORTED"))
      timed("expansion noop (sorted)") {
        expanded.orderBy(col("a_id"), col("b_id"))
          .write.format("noop").mode("overwrite").save()
      }
  }

  private def probeMinhash(spark: SparkSession, docs: DataFrame): Unit = {
    println("[probe] == minhash LSH ==")
    val sig = timed("sig build (checkpoint)") {
      TextOps.minhashSig(docs).localCheckpoint()
    }
    println(s"[probe]   sig rows: ${sig.count()}")
    val sigCols = (0 until 16).map(i => col(s"s$i"))
    val keyed = sig.select(
      (col("doc_id") +: sigCols :+ array_sort(col("arr")).as("ak")): _*)
    val grouped = timed("dup collapse (checkpoint)") {
      keyed.groupBy(sigCols :+ col("ak"): _*)
        .agg(min(col("doc_id")).as("gid"),
          collect_list(col("doc_id")).as("members"),
          count(lit(1)).as("gn"))
        .localCheckpoint()
    }
    println(s"[probe]   groups: ${grouped.count()}")
    val bandCols = (0 until 4).map(b =>
      md5(concat_ws(",", (0 until 4).map(i => col(s"s${b * 4 + i}")): _*)
        .cast("binary")).as(s"bh$b"))
    val bands = grouped.select(col("gid") +: bandCols: _*)
      .select(col("gid"), explode(expr(
        "array(struct(0 AS band, bh0 AS bh), struct(1 AS band, bh1 AS bh)," +
          " struct(2 AS band, bh2 AS bh), struct(3 AS band, bh3 AS bh))")).as("bb"))
      .select(col("gid"), col("bb.band").as("band"), col("bb.bh").as("bh"))
      .localCheckpoint()
    cnt("band rows", bands)
    // bucket occupancy profile: how quadratic is the self-join going to be?
    timed("bucket histogram") {
      val occ = bands.groupBy(col("band"), col("bh")).count()
        .agg(count(lit(1)).as("buckets"), max(col("count")).as("max_occ"),
          sum(col("count") * (col("count") - 1) / 2).as("intra_pairs"))
        .head()
      println(s"[probe]   buckets=${occ.getLong(0)} max_occ=${occ.getLong(1)} " +
        s"intra_pairs=${occ.getAs[Any](2)}")
    }
    val rawCands = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.gid") < col("y.gid"))
      .select(col("x.gid").as("ga"), col("y.gid").as("gb"))
    cnt("cand join (pre-distinct)", rawCands)
    val cands = timed("cand distinct (checkpoint)") { rawCands.distinct().localCheckpoint() }
    println(s"[probe]   cands: ${cands.count()}")
    val sets = grouped.select(col("gid"), col("ak"))
    val verified = cands
      .join(sets.select(col("gid").as("ga"), col("ak").as("a_arr")), "ga")
      .join(sets.select(col("gid").as("gb"), col("ak").as("b_arr")), "gb")
      .select(col("ga"), col("gb"),
        size(array_intersect(col("a_arr"), col("b_arr"))).as("n_common"),
        size(col("a_arr")).as("a_sz"), size(col("b_arr")).as("b_sz"))
      .select(col("ga"), col("gb"),
        round(col("n_common").cast("double") /
          (col("a_sz") + col("b_sz") - col("n_common")), 6).as("jacc"))
      .filter(col("jacc") >= 0.5)
    cnt("verify (rep pairs)", verified)
    val mem = grouped.select(col("gid"), explode(col("members")).as("doc_id"))
      .localCheckpoint()
    val repPairs = verified.union(
      grouped.filter(col("gn") >= 2)
        .select(col("gid").as("ga"), col("gid").as("gb"), lit(1.0).as("jacc")))
    val expanded = repPairs
      .join(mem.select(col("gid").as("ga"), col("doc_id").as("da")), "ga")
      .join(mem.select(col("gid").as("gb"), col("doc_id").as("db")), "gb")
      .filter(col("ga") =!= col("gb") || col("da") < col("db"))
    cnt("expansion join", expanded)
  }

  private def probeSimhash(spark: SparkSession, docs: DataFrame): Unit = {
    println("[probe] == simhash near-dup ==")
    val sh = timed("simhash build (checkpoint)") {
      TextOps.simhashDf(docs).localCheckpoint()
    }
    println(s"[probe]   docs: ${sh.count()}")
    println(s"[probe]   distinct simhash: ${sh.select(col("simhash")).distinct().count()}")
    val bands = sh
      .select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bh", expr("shiftright(simhash, band * 15) & 32767"))
      .localCheckpoint()
    timed("bucket histogram") {
      val occ = bands.groupBy(col("band"), col("bh")).count()
        .agg(count(lit(1)).as("buckets"), max(col("count")).as("max_occ"),
          sum(col("count") * (col("count") - 1) / 2).as("intra_pairs"))
        .head()
      println(s"[probe]   buckets=${occ.getLong(0)} max_occ=${occ.getLong(1)} " +
        s"intra_pairs=${occ.getAs[Any](2)}")
    }
    val rawCand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.simhash").as("a_sh"), col("y.simhash").as("b_sh"))
    cnt("cand join (pre-distinct)", rawCand)
    val cand = timed("cand distinct") { rawCand.distinct() }
    val verified = cand
      .withColumn("hamming", expr("cast(bit_count(a_sh ^ b_sh) as int)"))
      .filter(col("hamming") <= 3)
    cnt("distinct+verify", verified)
  }
}
