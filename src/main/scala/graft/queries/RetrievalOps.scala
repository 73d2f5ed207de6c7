package graft.queries

import graft.{Catalog, GQuery}
import graft.util.Num._
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text retrieval & LM-scoring over the documents corpus — the query-side
  * companions to the curation operators in [[TextOps]] (no reference
  * counterpart: north-star extension layer). Both queries keep the
  * engine's determinism discipline: every floating-point value that is
  * aggregated goes through the fix6 grid first ([[graft.util.Num]]), so
  * per-doc sums are exact integer arithmetic and hash-gate cross-engine;
  * `ln` outputs are quantized to the same grid before any accumulation
  * (JVM `Math.log` and libm `log` are not guaranteed bit-identical — the
  * 1e-6 grid absorbs the ≤1-ulp divergence).
  */
object RetrievalOps {

  def queries: Seq[GQuery] = Seq(bm25Search, docPerplexity, dsirSelect, pplBuckets,
    hybridRrf, mmrRerank, rankEval)

  // ------------------------------------------------------------ rank eval
  /** Offline retrieval-quality evaluation: precision/recall/MRR/nDCG at
    * k ∈ {1,5,10,20} of the [[bm25Scored]] run, with graded relevance
    * labels derived deterministically from the corpus itself (rel(doc) =
    * how many of the query terms the doc contains, 0–3) — the eval
    * harness every retrieval pipeline needs next to its index.
    *
    * Distribution shape: labels come from the same single corpus scan
    * BM25 already does; the run's top-20 is TakeOrderedAndProject and
    * every downstream frame (ranked list, ideal-gain list, k-grid) is
    * ≤ 20 rows and broadcast — corpus size only enters through the two
    * scans. The ideal DCG comes from the corpus-wide rel HISTOGRAM
    * (4 counters), not a global sort of per-doc gains.
    *
    * Determinism: ranks are tie-broken by doc_id in both engines; each
    * DCG term is quantized to the fix6 grid and accumulated exactly
    * (dsum), so nDCG hash-gates despite log2. */
  // lazy: declared above the bm25 helpers it closes over; `queries` is a
  // def, so forcing happens after object init completes
  lazy val rankEval: GQuery = GQuery(
    "r_rank_eval",
    "precision/recall/MRR/nDCG at k of the BM25 run vs term-coverage labels",
    (spark, dir) => {
      val d = TextOps.spread(Catalog.table(spark, dir, "documents"))
        .select(col("doc_id"),
          expr(s"token_counts(text, '$bmTermsCsv')").as("tc"))
      // graded relevance from total query-term frequency (presence alone is
      // near-universal on this corpus — tf buckets actually discriminate).
      // c = Σ per-term counts from the one-pass kernel — value-identical
      // to the interpreted size(filter(tk, x -> x='spark' or ...)) it
      // replaces (each token matches at most one distinct term), and the
      // NULL-text row yields NULL c → rel 0 on both forms.
      val rel = d.select(col("doc_id"),
          bmTerms.indices.map(i => col("tc").getItem(i + 1)).reduce(_ + _).as("c"))
        .select(col("doc_id"),
          when(col("c") >= 6, 3).when(col("c") >= 3, 2)
            .when(col("c") >= 1, 1).otherwise(0).as("rel"))
      val shortlist = bm25Scored(spark, dir)
        .orderBy(col("score").desc, col("doc_id")).limit(20)
      // rank over the bounded 20-row shortlist (single-partition window is
      // fine HERE: the shortlist is constant-size at any corpus scale)
      val run = shortlist.select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("rank"))
      // ONE relevance scan (r14): the global label counts and the ≤20
      // shortlist (rank, rel) pairs come out of a single aggregate over
      // rel left-joined to the broadcast run, checkpointed as one row —
      // previously each broadcast consumer (stats ×2, ranked) re-ran the
      // interpreted filter(tk, ...) corpus scan. The pairs are pivoted
      // through 20 conditional max() columns (NOT collect_list, which
      // would demote the stage to a non-codegen ObjectHashAggregate —
      // measured 3× task time) and exploded back to rows; downstream
      // aggregates are unchanged and order-independent (sum/max/dsum),
      // so this is value-identical to the old inner join.
      val aggCols = Seq(
        sum(when(col("rel") >= 1, 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("rel") === 3, 1L).otherwise(0L)).as("c3"),
        sum(when(col("rel") === 2, 1L).otherwise(0L)).as("c2"),
        sum(when(col("rel") === 1, 1L).otherwise(0L)).as("c1")) ++
        (1 to 20).map(k =>
          max(when(col("rank") === k, col("rel"))).as(s"r$k"))
      val snap = rel.join(broadcast(run), Seq("doc_id"), "left")
        .agg(aggCols.head, aggCols.tail: _*)
        .localCheckpoint()
      val stats = snap.select(col("n_rel"), col("c3"), col("c2"), col("c1"))
      val ranked = snap
        .select(posexplode(array((1 to 20).map(k => col(s"r$k")): _*))
          .as(Seq("p0", "relv")))
        .filter(col("relv").isNotNull)
        .select((col("p0") + 1).cast("int").as("rank"), col("relv").as("rel"))
      val gain = (pow(lit(2.0d), col("rel")) - lit(1.0d)) /
        log2(col("rank").cast("double") + lit(1.0d))
      val ideal = spark.range(1, 21).select(col("id").as("rank"))
        .crossJoin(broadcast(stats))
        .select(col("rank"),
          when(col("rank") <= col("c3"), 3)
            .when(col("rank") <= col("c3") + col("c2"), 2)
            .when(col("rank") <= col("c3") + col("c2") + col("c1"), 1)
            .otherwise(0).as("rel"))
      val ks = spark.createDataFrame(Seq(Tuple1(1), Tuple1(5), Tuple1(10), Tuple1(20)))
        .toDF("k")
      val perK = ks.crossJoin(broadcast(ranked)).filter(col("rank") <= col("k"))
        .groupBy(col("k"))
        .agg(sum(when(col("rel") >= 1, 1L).otherwise(0L)).as("n_hits"),
          max(when(col("rel") >= 1, lit(1.0d) / col("rank").cast("double"))
            .otherwise(lit(0.0d))).as("mrr"),
          dsum(gain).as("dcg"))
      val idealK = ks.crossJoin(broadcast(ideal)).filter(col("rank") <= col("k"))
        .groupBy(col("k")).agg(dsum(gain).as("idcg"))
      perK.join(broadcast(idealK), "k").crossJoin(broadcast(stats))
        .select(col("k"), col("n_hits"),
          round(col("n_hits").cast("double") / col("k").cast("double"), 6).as("precision"),
          round(col("n_hits").cast("double") / col("n_rel").cast("double"), 6).as("recall"),
          round(col("mrr"), 6).as("mrr"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"))
        .orderBy(col("k"))
    },
    Some(s"""
      WITH $bm25SqlCtes,
      d2 AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      rel AS (SELECT doc_id,
                CASE WHEN c >= 6 THEN 3 WHEN c >= 3 THEN 2
                     WHEN c >= 1 THEN 1 ELSE 0 END AS rel
              FROM (SELECT doc_id,
                           len(list_filter(tk, x ->
                             ${bmTerms.map(t => s"x = '$t'").mkString(" OR ")})) AS c
                    FROM d2) cnt),
      rstats AS (SELECT SUM(CASE WHEN rel >= 1 THEN 1 ELSE 0 END) AS n_rel,
                        SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS c3,
                        SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS c2,
                        SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS c1
                 FROM rel),
      run AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
              FROM (SELECT * FROM bmscore ORDER BY score DESC, doc_id LIMIT 20) s),
      ranked AS (SELECT rank, rel FROM run JOIN rel USING (doc_id)),
      ideal AS (SELECT i AS rank,
                       CASE WHEN i <= c3 THEN 3
                            WHEN i <= c3 + c2 THEN 2
                            WHEN i <= c3 + c2 + c1 THEN 1 ELSE 0 END AS rel
                FROM (SELECT unnest(range(1, 21)) AS i) pos CROSS JOIN rstats),
      ks AS (SELECT unnest([1, 5, 10, 20]) AS k),
      per_k AS (SELECT k,
                       CAST(SUM(CASE WHEN rel >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
                       MAX(CASE WHEN rel >= 1
                                THEN CAST(1 AS DOUBLE) / CAST(rank AS DOUBLE)
                                ELSE CAST(0 AS DOUBLE) END) AS mrr,
                       ${dsumSql("(POW(2, rel) - 1) / LOG2(CAST(rank AS DOUBLE) + 1)")} AS dcg
                FROM ks CROSS JOIN ranked WHERE rank <= k GROUP BY k),
      ideal_k AS (SELECT k,
                       ${dsumSql("(POW(2, rel) - 1) / LOG2(CAST(rank AS DOUBLE) + 1)")} AS idcg
                  FROM ks CROSS JOIN ideal WHERE rank <= k GROUP BY k)
      SELECT k, n_hits,
             ROUND(CAST(n_hits AS DOUBLE) / CAST(k AS DOUBLE), 6) AS precision,
             ROUND(CAST(n_hits AS DOUBLE) / CAST(n_rel AS DOUBLE), 6) AS recall,
             ROUND(mrr, 6) AS mrr,
             ROUND(dcg / idcg, 6) AS ndcg
      FROM per_k JOIN ideal_k USING (k) CROSS JOIN rstats
      ORDER BY k"""))

  // ------------------------------------------------------------ BM25
  private val bmK1 = 1.2
  private val bmB = 0.75
  private val bmTerms = Seq("spark", "join", "window")

  /** BM25 keyword search, Lucene-style idf = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Distribution shape (r14): per-doc term frequencies come out of the
    * scan itself via the one-pass [[graft.functions.TokenCounts]] kernel
    * (`tc = [dl, tf_spark, tf_join, tf_window]`), so the old
    * explode → filter → groupBy(doc_id, dl, tok) term-frequency SHUFFLE
    * (every matching token occurrence crossed the wire) is gone
    * entirely; corpus stats (N, exact avgdl) AND the per-term document
    * frequencies are ONE tiny aggregate broadcast back; per-doc scores
    * are a fix6-exact integer sum over ≤|terms| contributions computed
    * in the scan projection (value-identical to the removed
    * groupBy(doc_id)+dsum: both sum the same per-term fix6 longs); the
    * final top-10 is TakeOrderedAndProject — NO exchange of any kind
    * before the top-k, at any corpus size. Docs with zero matching
    * terms are filtered out, exactly the row set the inner tf join
    * produced. */
  /** Shared BM25 scoring frame `(doc_id, score)` — consumed by
    * [[bm25Search]] (top-10) and [[mmrRerank]] (top-20 shortlist). */
  private[queries] val bmTermsCsv = bmTerms.mkString(",")
  private def bm25Scored(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val d = TextOps.spread(Catalog.table(spark, dir, "documents"))
      .select(col("doc_id"),
        expr(s"token_counts(text, '$bmTermsCsv')").as("tc"))
    val tfL = (i: Int) => col("tc").getItem(i + 1)
    val dlD = col("tc").getItem(0).cast("double")
    // ONE corpus aggregate: N, exact avgdl, and every term's df
    val statsAgg = Seq(count(lit(1)).as("n_docs"),
      davg(dlD).as("avgdl")) ++
      bmTerms.indices.map(i =>
        sum(when(tfL(i) > 0, 1L).otherwise(0L)).as(s"df$i"))
    // idf on the fix6 grid: ln is the one operator without a
    // bit-identical cross-engine guarantee. Same expression as the old
    // per-row form, evaluated once over the same (n_docs, df) longs.
    val idfCols = bmTerms.indices.map { i =>
      (floor(
        log(lit(1.0d) + (col("n_docs").cast("double") - col(s"df$i") + 0.5d) /
          (col(s"df$i").cast("double") + 0.5d)) * 1000000.0d + 0.5d) /
        1000000.0d).as(s"idf$i")
    }
    val stats = d.agg(statsAgg.head, statsAgg.tail: _*)
      .select(Seq(col("n_docs"), col("avgdl")) ++ idfCols: _*)
    // per-term contribution, exact shape of the old per-row `contrib`
    val qterm = bmTerms.indices.map { i =>
      val tfD = tfL(i).cast("double")
      val c = col(s"idf$i") * (tfD * lit(bmK1 + 1.0d)) /
        (tfD +
          lit(bmK1) * (lit(1.0d - bmB) + lit(bmB) * dlD / col("avgdl")))
      when(tfL(i) > 0, fix6(c)).otherwise(0L)
    }
    d.filter(bmTerms.indices.map(tfL).reduce(_ + _) > 0)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(qterm.reduce(_ + _).cast("double") / 1000000.0d, 6).as("score"))
  }

  /** Oracle twin of [[bm25Scored]]: CTE block ending in a
    * `bmscore(doc_id, score)` view — shared by both retrieval oracles. */
  private val bm25SqlCtes: String = s"""
      d AS (SELECT doc_id, string_split(text, ' ') AS tk,
                   len(string_split(text, ' ')) AS dl
            FROM documents),
      stats AS (SELECT COUNT(*) AS n_docs, ${davgSql("CAST(dl AS DOUBLE)")} AS avgdl
                FROM d),
      tf AS (SELECT doc_id, dl, tok, COUNT(*) AS tf
             FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM d) t
             WHERE tok IN (${bmTerms.map("'" + _ + "'").mkString(", ")})
             GROUP BY doc_id, dl, tok),
      df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      contrib AS (
        SELECT tf.doc_id,
               (FLOOR(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) /
                               (CAST(df AS DOUBLE) + 0.5)) * 1000000 + 0.5)
                / 1000000.0) *
               (CAST(tf AS DOUBLE) * ${bmK1 + 1.0}) /
               (CAST(tf AS DOUBLE) +
                $bmK1 * (1.0 - $bmB + $bmB * CAST(dl AS DOUBLE) / avgdl)) AS c
        FROM tf JOIN df USING (tok) CROSS JOIN stats),
      bmscore AS (
        SELECT doc_id, ROUND(${dsumSql("c")}, 6) AS score
        FROM contrib GROUP BY doc_id)"""

  val bm25Search: GQuery = GQuery(
    "r_bm25_search",
    s"BM25 top-10 documents for query terms ${bmTerms.mkString("/")}",
    (spark, dir) =>
      bm25Scored(spark, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10),
    Some(s"""
      WITH $bm25SqlCtes
      SELECT doc_id, score FROM bmscore
      ORDER BY score DESC, doc_id
      LIMIT 10"""))

  // ------------------------------------------------------------ doc perplexity
  /** Per-document bigram cross-entropy under the corpus's own MLE bigram
    * model: H(d) = −(1/|bigrams(d)|) Σ ln c(w1,w2)/c(w1·) — the classic
    * KenLM-style quality/outlier score (every document bigram occurs in
    * the corpus at least once, so P > 0 by construction; no smoothing
    * needed for self-scoring). Reports the 20 most "surprising" docs.
    *
    * Distribution: bigrams come from an in-row array zip (no self-join);
    * the two count tables are plain two-phase aggregates; scoring joins
    * on (w1, w2) / (w1) — key-partitioned shuffles ∝ corpus tokens; each
    * ln is quantized to the fix6 grid, per-doc sums are exact integers,
    * and the top-20 is TakeOrderedAndProject (no global window). */
  val docPerplexity: GQuery = GQuery(
    "r_doc_perplexity",
    "top-20 highest bigram cross-entropy docs under the corpus bigram LM",
    (spark, dir) => {
      val d = TextOps.spread(Catalog.table(spark, dir, "documents"))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
      val bi = d.select(col("doc_id"),
        explode(expr("zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1)," +
          " (a, b) -> named_struct('w1', a, 'w2', b))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .select(col("doc_id"),
          log(col("c2").cast("double") / col("c1").cast("double")).as("lp"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(-dsum(col("lp")) / count(lit(1)), 6).as("h"))
        .orderBy(col("h").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      bi AS (SELECT doc_id, bg[1] AS w1, bg[2] AS w2
             FROM (SELECT doc_id,
                          unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)])) AS bg
                   FROM d) t),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             ROUND(-${dsumSql("ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))")}
                   / COUNT(*), 6) AS h
      FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
      GROUP BY doc_id
      ORDER BY h DESC, doc_id
      LIMIT 20"""))

  // ------------------------------------------------------------ DSIR
  /** Hashed-n-gram feature buckets for importance resampling. 256 buckets
    * keeps the weight table broadcastable at ANY corpus size — the table is
    * bounded by the feature space, not the data. */
  private val dsirB = 256

  /** ln quantized onto the fix6 grid (JVM Math.log and libm log are not
    * bit-identical; the grid absorbs the ≤1-ulp divergence). */
  private def q6ln(c: Column): Column =
    floor(log(c) * 1000000.0d + 0.5d) / 1000000.0d
  private def q6lnSql(e: String): String =
    s"FLOOR(ln($e) * 1000000 + 0.5) / 1000000.0"

  /** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
    * score each raw document by the log-likelihood ratio of a target
    * distribution over hashed unigram features vs the raw distribution —
    * here target = the corpus's own `lang = 'en'` slice, the classic
    * "select web data that looks like the curated set" move. Laplace +1
    * smoothing keeps every bucket finite.
    *
    * Distribution shape: the feature space is FIXED (256 buckets), so both
    * count tables and the per-bucket weight table are tiny broadcasts no
    * matter the corpus size; scoring is one token scan joined against the
    * broadcast weights, then a per-doc exact fix6 mean — no shuffle grows
    * with anything but the document count. Every ln lands on the fix6 grid
    * before the exact integer sum. */
  /** The scoring core, factored for structural tests: docs(doc_id, lang,
    * text) → every doc scored (doc_id, lang, n_tok, score). */
  private[graft] def dsirScores(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // r14: checkpointed — three consumers (raw counts, target counts,
    // the per-doc scoring join) each re-ran the corpus scan + token
    // explode + the md5-based h60 bucket hash
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        (TextOps.h60(col("tok")) % dsirB).as("b"))
      .localCheckpoint()
    val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = tok.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val tot = raw.agg(sum(col("cr")).as("nr"))
      .crossJoin(tgt.agg(sum(col("ct")).as("nt")))
    val weights = raw
      .join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        (q6ln((coalesce(col("ct"), lit(0L)) + 1L).cast("double") /
            (col("nt") + dsirB).cast("double")) -
          q6ln((col("cr") + 1L).cast("double") /
            (col("nr") + dsirB).cast("double"))).as("w"))
    tok.join(broadcast(weights), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tok"), rnd6(davg(col("w"))).as("score"))
  }

  val dsirSelect: GQuery = GQuery(
    "r_dsir_select",
    "DSIR top-20 docs by hashed-unigram log-likelihood ratio (target lang = en)",
    (spark, dir) => {
      dsirScores(TextOps.spread(Catalog.table(spark, dir, "documents")))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },
    Some(s"""
      WITH tok AS (
        SELECT doc_id, lang, (${TextOps.h60Sql("tok")}) % $dsirB AS b
        FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
              FROM documents) t),
      raw AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY b),
      tgt AS (SELECT b, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY b),
      tot AS (SELECT (SELECT COUNT(*) FROM tok) AS nr,
                     (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS nt),
      w AS (SELECT raw.b,
                   ${q6lnSql(s"CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / CAST(nt + $dsirB AS DOUBLE)")}
                 - ${q6lnSql(s"CAST(cr + 1 AS DOUBLE) / CAST(nr + $dsirB AS DOUBLE)")} AS w
            FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot)
      SELECT doc_id, lang, COUNT(*) AS n_tok, ${rnd6Sql(davgSql("w"))} AS score
      FROM tok JOIN w USING (b)
      GROUP BY doc_id, lang
      ORDER BY score DESC, doc_id
      LIMIT 20"""))

  // ------------------------------------------------------------ ppl buckets
  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
    * every document under the corpus bigram LM (same statistic as
    * [[docPerplexity]]), cut the corpus into head/middle/tail at the exact
    * cross-entropy terciles, and report per-language bucket profiles — the
    * standard "keep the head, drop the tail" curation summary.
    *
    * Distribution shape: per-doc scores are the [[docPerplexity]] pipeline
    * (key-partitioned count-table joins); the two tercile boundaries come
    * from ONE exact-percentile aggregate broadcast back (the
    * a_rfm_segments pattern — no global window, no single-task sort; at
    * 100 TB swap `percentile` for `approx_percentile` without changing the
    * plan shape). Bucket assignment compares in fix6 space, absorbing
    * sub-grid interpolation divergence between engines (both are R-7). */
  val pplBuckets: GQuery = GQuery(
    "r_ppl_buckets",
    "head/middle/tail bigram cross-entropy terciles per language",
    (spark, dir) => {
      val d = TextOps.spread(Catalog.table(spark, dir, "documents"))
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
        .filter(size(col("tk")) >= 2)
      // r14: h (2 consumers: tercile bounds + bucket assignment) is
      // checkpointed — un-materialized, each reference re-ran the whole
      // bigram scoring pipeline. (Checkpointing the exploded `bi` frame
      // itself was measured WORSE at 10× — corpus-sized string
      // materialization costs more than the saved re-explodes.)
      val bi = d.select(col("doc_id"), col("lang"),
        explode(expr("zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1)," +
          " (a, b) -> named_struct('w1', a, 'w2', b))")).as("bg"))
        .select(col("doc_id"), col("lang"),
          col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val h = bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .select(col("doc_id"), col("lang"),
          log(col("c2").cast("double") / col("c1").cast("double")).as("lp"))
        .groupBy(col("doc_id"), col("lang"))
        .agg(round(-dsum(col("lp")) / count(lit(1)), 6).as("h"))
        .localCheckpoint()
      val bounds = h.agg(expr(
        "percentile(h, array(CAST(1 AS DOUBLE) / 3, CAST(2 AS DOUBLE) / 3))").as("hb"))
      h.crossJoin(broadcast(bounds))
        .select(col("lang"),
          when(fix6(col("h")) <= fix6(element_at(col("hb"), 1)), "head")
            .when(fix6(col("h")) <= fix6(element_at(col("hb"), 2)), "middle")
            .otherwise("tail").as("bucket"),
          col("h"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), rnd6(davg(col("h"))).as("avg_h"))
        .orderBy(col("lang"), col("bucket"))
    },
    Some(s"""
      WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
                 WHERE len(string_split(text, ' ')) >= 2),
      bi AS (SELECT doc_id, lang, bg[1] AS w1, bg[2] AS w2
             FROM (SELECT doc_id, lang,
                          unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)])) AS bg
                   FROM d) t),
      c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY w1, w2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
      h AS (SELECT doc_id, lang,
                   ROUND(-${dsumSql("ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE))")}
                         / COUNT(*), 6) AS h
            FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
            GROUP BY doc_id, lang),
      bounds AS (SELECT quantile_cont(h, [CAST(1 AS DOUBLE) / 3, CAST(2 AS DOUBLE) / 3]) AS hb
                 FROM h),
      b AS (SELECT lang,
                   CASE WHEN ${fix6Sql("h")} <= ${fix6Sql("hb[1]")} THEN 'head'
                        WHEN ${fix6Sql("h")} <= ${fix6Sql("hb[2]")} THEN 'middle'
                        ELSE 'tail' END AS bucket,
                   h
            FROM h CROSS JOIN bounds)
      SELECT lang, bucket, COUNT(*) AS n_docs, ${rnd6Sql(davgSql("h"))} AS avg_h
      FROM b
      GROUP BY lang, bucket
      ORDER BY lang, bucket"""))

  // ------------------------------------------------------------ hybrid RRF
  private val rrfK = 60
  private val rrfDepth = 20

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al., SIGIR
    * 2009 — the standard production fusion rule): for each query item
    * (doc_id < 3, whose text AND embedding both exist — the tables share
    * the id space), fuse a SPARSE lexical ranking (distinct-unigram
    * Jaccard against every corpus doc) with a DENSE ranking (exact cosine
    * over the embedding column) by RRF score Σ 1/(k + rank), k = 60, over
    * the top-20 of each leg; report the fused top-5.
    *
    * Scale shape: the sparse leg is an INVERTED-INDEX join — the (tiny)
    * query token set broadcasts against one corpus token scan, so
    * candidates are bounded by docs sharing ≥1 query token, never
    * all-pairs; the dense leg is the broadcast-query brute scan
    * ([[VectorOps]] v_knn_brute's shape — swap in the IVF-PQ index for the
    * 100 TB corpus without touching the fusion). Both rank windows and the
    * fusion window partition BY QUERY — parallel across the query set, no
    * global window. Determinism: Jaccard is one IEEE division of exact
    * integer counts, RRF terms are 1/(60+rank) of exact ranks — both
    * bit-identical across engines; ties break on n_id. */
  val hybridRrf: GQuery = GQuery(
    "r_hybrid_rrf",
    "hybrid search: unigram-Jaccard + cosine legs fused by reciprocal rank",
    (spark, dir) => {
      val d = TextOps.spread(Catalog.table(spark, dir, "documents"))
      val e = Catalog.table(spark, dir, "embeddings")
      val dtok = d.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      val nd = dtok.groupBy(col("doc_id")).agg(count(lit(1)).as("nd"))
      val qtok = dtok.filter(col("doc_id") < 3)
        .select(col("doc_id").as("q_id"), col("tok"))
      val nq = qtok.groupBy(col("q_id")).agg(count(lit(1)).as("nq"))
      val inter = dtok.join(broadcast(qtok), "tok")
        .filter(col("doc_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("doc_id"))
        .agg(count(lit(1)).as("inter"))
      val jac = inter.join(nd, "doc_id").join(broadcast(nq), "q_id")
        .select(col("q_id"), col("doc_id").as("n_id"),
          (col("inter").cast("double") /
            (col("nd") + col("nq") - col("inter")).cast("double")).as("jac"))
      val ws = Window.partitionBy(col("q_id")).orderBy(col("jac").desc, col("n_id"))
      val sparse = jac.withColumn("rank_s", row_number().over(ws))
        .filter(col("rank_s") <= rrfDepth)
        .select(col("q_id"), col("n_id"), col("rank_s"))
      val q = e.filter(col("vec_id") < 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val scored = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          VectorOps.cosineSimCols("embedding", "q_emb").as("sim"))
      val wd = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
      val dense = scored.withColumn("rank_d", row_number().over(wd))
        .filter(col("rank_d") <= rrfDepth)
        .select(col("q_id"), col("n_id"), col("rank_d"))
      val fused = sparse.join(dense, Seq("q_id", "n_id"), "full")
        .select(col("q_id"), col("n_id"),
          (when(col("rank_s").isNotNull,
            lit(1.0d) / (lit(rrfK.toDouble) + col("rank_s").cast("double")))
            .otherwise(lit(0.0d)) +
            when(col("rank_d").isNotNull,
              lit(1.0d) / (lit(rrfK.toDouble) + col("rank_d").cast("double")))
              .otherwise(lit(0.0d))).as("rrf"),
          coalesce(col("rank_s"), lit(0)).as("rank_s"),
          coalesce(col("rank_d"), lit(0)).as("rank_d"))
      val wf = Window.partitionBy(col("q_id")).orderBy(col("rrf").desc, col("n_id"))
      fused.withColumn("rk", row_number().over(wf))
        .filter(col("rk") <= 5)
        .select(col("q_id"), col("rk"), col("n_id"),
          round(col("rrf"), 6).as("rrf"), col("rank_s"), col("rank_d"))
        .orderBy(col("q_id"), col("rk"))
    },
    Some(s"""
      WITH dtok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                    FROM documents),
      nd AS (SELECT doc_id, COUNT(*) AS nd FROM dtok GROUP BY doc_id),
      qtok AS (SELECT doc_id AS q_id, tok FROM dtok WHERE doc_id < 3),
      nq AS (SELECT q_id, COUNT(*) AS nq FROM qtok GROUP BY q_id),
      inter AS (SELECT q_id, doc_id, COUNT(*) AS inter
                FROM dtok JOIN qtok USING (tok)
                WHERE doc_id <> q_id
                GROUP BY q_id, doc_id),
      jac AS (SELECT q_id, doc_id AS n_id,
                     CAST(inter AS DOUBLE) / CAST(nd + nq - inter AS DOUBLE) AS jac
              FROM inter JOIN nd USING (doc_id) JOIN nq USING (q_id)),
      sparse AS (SELECT q_id, n_id, rank_s FROM (
                   SELECT q_id, n_id,
                          CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY jac DESC, n_id) AS INTEGER) AS rank_s
                   FROM jac) t WHERE rank_s <= $rrfDepth),
      q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
            WHERE vec_id < 3),
      scored AS (SELECT q_id, e.vec_id AS n_id,
                        ${VectorOps.dotSql("e.embedding", "q_emb")} /
                        (sqrt(${VectorOps.dotSql("e.embedding", "e.embedding")}) *
                         sqrt(${VectorOps.dotSql("q_emb", "q_emb")})) AS sim
                 FROM embeddings e CROSS JOIN q
                 WHERE e.vec_id <> q_id),
      dense AS (SELECT q_id, n_id, rank_d FROM (
                  SELECT q_id, n_id,
                         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY sim DESC, n_id) AS INTEGER) AS rank_d
                  FROM scored) t WHERE rank_d <= $rrfDepth),
      fused AS (SELECT COALESCE(s.q_id, d.q_id) AS q_id,
                       COALESCE(s.n_id, d.n_id) AS n_id,
                       (CASE WHEN rank_s IS NOT NULL
                             THEN CAST(1 AS DOUBLE) / (CAST($rrfK AS DOUBLE) + rank_s)
                             ELSE CAST(0 AS DOUBLE) END +
                        CASE WHEN rank_d IS NOT NULL
                             THEN CAST(1 AS DOUBLE) / (CAST($rrfK AS DOUBLE) + rank_d)
                             ELSE CAST(0 AS DOUBLE) END) AS rrf,
                       COALESCE(rank_s, 0) AS rank_s,
                       COALESCE(rank_d, 0) AS rank_d
                FROM sparse s FULL JOIN dense d
                  ON s.q_id = d.q_id AND s.n_id = d.n_id)
      SELECT q_id, rk, n_id, ROUND(rrf, 6) AS rrf, rank_s, rank_d
      FROM (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
                           ORDER BY rrf DESC, n_id) AS INTEGER) AS rk
            FROM fused) t
      WHERE rk <= 5
      ORDER BY q_id, rk"""))

  // ------------------------------------------------------------ MMR rerank
  private val mmrShort = 20
  private val mmrPicks = 8

  /** Maximal Marginal Relevance diversification (Carbonell & Goldstein
    * 1998) over the BM25 shortlist: greedily pick the doc maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked, λ = 0.7 —
    * the standard redundancy-removal rerank between retrieval and a
    * context window. Engine-exact throughout: relevance is the fix6
    * BM25 score normalized to integer permille of the query's best
    * score, inter-doc similarity is distinct-unigram Jaccard in integer
    * permille ((1000·|∩|) div |∪| — both operands positive, so trunc
    * and floor division agree), and the MMR objective is the all-BIGINT
    * 7·rel_pm − 3·maxsim_pm with doc_id tie-breaks. Scale shape: the
    * corpus-sized work is exactly [[bm25Scored]] (one scan, broadcast
    * stats, TakeOrdered shortlist); the greedy argmax loop runs as ONE
    * single-task `mapPartitions` over the tagged union of the
    * ≤[[mmrShort]]-row shortlist and its pairwise-Jaccard table —
    * executor-side (never a driver collect), picks·shortlist integer
    * ops in a single task. The previous shape — the loop unrolled into
    * [[mmrPicks]]−1 rounds of tiny joins, localCheckpointed every
    * second pick — was pure scheduling floor (2.4 s of sub-ms jobs at
    * sf0.1): sequential greedy selection over BOUNDED state belongs in
    * one task, the inverse of the AdaptiveGate lesson (adaptive rounds
    * pay only when there is data for runtime stats to size). */
  val mmrRerank: GQuery = GQuery(
    "r_mmr_rerank",
    s"MMR-diversified top-$mmrPicks rerank of the BM25 top-$mmrShort shortlist",
    (spark, dir) => {
      val short0 = bm25Scored(spark, dir)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(mmrShort)
        .select(col("doc_id"),
          expr("CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT)").as("f"))
      val fmax = short0.agg(max(col("f")).as("fmax"))
      val short = short0.crossJoin(broadcast(fmax))
        .select(col("doc_id"), expr("(1000 * f) div fmax").as("rel_pm"))
        .localCheckpoint()
      val toksOf = Catalog.table(spark, dir, "documents")
        .join(short.select(col("doc_id")), "doc_id")
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ta"))
      val pairs = toksOf.as("x").join(toksOf.as("y"),
          col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
          expr("(1000 * size(array_intersect(x.ta, y.ta)))" +
            " div size(array_distinct(concat(x.ta, y.ta)))").as("jac_pm"))
      import spark.implicits._
      val picks = mmrPicks
      // tagged union (kind 0 = shortlist row, kind 1 = pair row) into one
      // task; the greedy loop is plain Long arithmetic, bit-identical to
      // the unrolled relational form (and to the oracle's CTE chain)
      val tagged = short.select(lit(0L).as("kind"), col("doc_id").as("a"),
          lit(0L).as("b"), col("rel_pm").as("v"))
        .unionAll(pairs.select(lit(1L).as("kind"), col("a_id").as("a"),
          col("b_id").as("b"), col("jac_pm").as("v")))
        .as[(Long, Long, Long, Long)]
      tagged.coalesce(1).mapPartitions { it =>
        val rows = it.toVector
        val rel = rows.collect { case (0L, d, _, r) => d -> r }.toMap
        val jac = rows.collect { case (1L, a, b, j) => (a, b) -> j }.toMap
        val chosen = scala.collection.mutable.ArrayBuffer[Long]()
        (1 to picks).iterator.flatMap { step =>
          val cands = rel.keysIterator.filterNot(chosen.contains).toSeq
          if (cands.isEmpty) Iterator.empty
          else {
            val best = cands.map { d =>
              val ms =
                if (chosen.isEmpty) 0L
                else chosen.iterator.map(b => jac.getOrElse((d, b), 0L)).max
              (d, rel(d), ms, 7L * rel(d) - 3L * ms)
            }.minBy { case (d, _, _, m) => (-m, d) }
            chosen += best._1
            Iterator.single((step, best._1, best._2, best._3, best._4))
          }
        }
      }.toDF("mmr_rk", "doc_id", "rel_pm", "maxsim_pm", "mmr")
        .orderBy(col("mmr_rk"))
    },
    Some {
      val steps = (2 to mmrPicks).map { t =>
        val prev = s"sel_${t - 1}"
        s"""
        ms_$t AS (SELECT a_id AS doc_id, MAX(jac_pm) AS maxsim_pm
                  FROM pairs JOIN $prev s ON s.doc_id = pairs.b_id
                  GROUP BY a_id),
        pick_$t AS (
          SELECT $t AS mmr_rk, c.doc_id, c.rel_pm,
                 COALESCE(m.maxsim_pm, 0) AS maxsim_pm,
                 7 * c.rel_pm - 3 * COALESCE(m.maxsim_pm, 0) AS mmr
          FROM short c
          LEFT JOIN ms_$t m ON m.doc_id = c.doc_id
          WHERE c.doc_id NOT IN (SELECT doc_id FROM $prev)
          ORDER BY mmr DESC, c.doc_id LIMIT 1),
        sel_$t AS MATERIALIZED (
          SELECT * FROM $prev UNION ALL
          SELECT doc_id, rel_pm, maxsim_pm, mmr FROM pick_$t)"""
      }.mkString(",")
      s"""
      WITH $bm25SqlCtes,
      short0 AS (SELECT doc_id,
                        CAST(FLOOR(score * 1000000 + 0.5) AS BIGINT) AS f
                 FROM bmscore
                 ORDER BY score DESC, doc_id LIMIT $mmrShort),
      short AS MATERIALIZED (
        SELECT doc_id,
               CAST((1000 * f) // (SELECT MAX(f) FROM short0) AS BIGINT)
                 AS rel_pm
        FROM short0),
      tk2 AS (SELECT d2.doc_id, list_distinct(string_split(d2.text, ' ')) AS ta
              FROM documents d2 JOIN short USING (doc_id)),
      pairs AS MATERIALIZED (
        SELECT x.doc_id AS a_id, y.doc_id AS b_id,
               CAST((1000 * len(list_intersect(x.ta, y.ta)))
                    // len(list_distinct(x.ta || y.ta)) AS BIGINT) AS jac_pm
        FROM tk2 x JOIN tk2 y ON x.doc_id <> y.doc_id),
      sel_1 AS MATERIALIZED (
        SELECT doc_id, rel_pm, CAST(0 AS BIGINT) AS maxsim_pm,
               7 * rel_pm AS mmr
        FROM short ORDER BY 7 * rel_pm DESC, doc_id LIMIT 1),$steps,
      fin AS (SELECT 1 AS mmr_rk, doc_id, rel_pm, maxsim_pm, mmr FROM sel_1
              ${(2 to mmrPicks).map(t =>
                s"UNION ALL SELECT $t, doc_id, rel_pm, maxsim_pm, mmr FROM pick_$t")
                .mkString(" ")})
      SELECT mmr_rk, doc_id, rel_pm, maxsim_pm, CAST(mmr AS BIGINT) AS mmr
      FROM fin ORDER BY mmr_rk"""
    })
}
