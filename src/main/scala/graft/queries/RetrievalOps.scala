package graft.queries

import graft.{Catalog, GQuery}
import graft.util.Num._
import org.apache.spark.sql.Column
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

  def queries: Seq[GQuery] = Seq(bm25Search, docPerplexity, dsirSelect, pplBuckets)

  // ------------------------------------------------------------ BM25
  private val bmK1 = 1.2
  private val bmB = 0.75
  private val bmTerms = Seq("spark", "join", "window")

  /** BM25 keyword search, Lucene-style idf = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * Distribution shape: ONE corpus scan produces (doc, term, tf) for
    * query terms only (the filter is inside the explode projection, so
    * non-query tokens never leave the scan); df and the corpus stats
    * (N, exact avgdl) are tiny aggregates broadcast back; per-doc scores
    * are a fix6-exact integer sum over ≤|terms| contributions; the final
    * top-10 is TakeOrderedAndProject — NO global window, no single-task
    * sort, at any corpus size. */
  val bm25Search: GQuery = GQuery(
    "r_bm25_search",
    s"BM25 top-10 documents for query terms ${bmTerms.mkString("/")}",
    (spark, dir) => {
      val d = TextOps.spread(Catalog.table(spark, dir, "documents"))
        .select(col("doc_id"), split(col("text"), " ").as("tk"))
        .select(col("doc_id"), col("tk"), size(col("tk")).as("dl"))
      val stats = d.agg(count(lit(1)).as("n_docs"),
        davg(col("dl").cast("double")).as("avgdl"))
      val tf = d.select(col("doc_id"), col("dl"), explode(col("tk")).as("tok"))
        .filter(col("tok").isInCollection(bmTerms))
        .groupBy(col("doc_id"), col("dl"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      // idf on the fix6 grid: ln is the one operator without a
      // bit-identical cross-engine guarantee
      val idf6 = (floor(
        log(lit(1.0d) + (col("n_docs").cast("double") - col("df") + 0.5d) /
          (col("df").cast("double") + 0.5d)) * 1000000.0d + 0.5d) / 1000000.0d)
      val contrib = col("idf") * (col("tf").cast("double") * lit(bmK1 + 1.0d)) /
        (col("tf").cast("double") +
          lit(bmK1) * (lit(1.0d - bmB) + lit(bmB) * col("dl").cast("double") / col("avgdl")))
      tf.join(broadcast(df), "tok")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), idf6.as("idf"), col("tf"), col("dl"), col("avgdl"))
        .select(col("doc_id"), contrib.as("c"))
        .groupBy(col("doc_id"))
        .agg(round(dsum(col("c")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },
    Some(s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk,
                        len(string_split(text, ' ')) AS dl
                 FROM documents),
      stats AS (SELECT COUNT(*) AS n_docs, ${davgSql("CAST(dl AS DOUBLE)")} AS avgdl
                FROM d),
      tf AS (SELECT doc_id, dl, tok, COUNT(*) AS tf
             FROM (SELECT doc_id, dl, unnest(tk) AS tok FROM d) t
             WHERE tok IN (${bmTerms.map("'" + _ + "'").mkString(", ")})
             GROUP BY doc_id, dl, tok),
      df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      scored AS (
        SELECT tf.doc_id,
               (FLOOR(ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) /
                               (CAST(df AS DOUBLE) + 0.5)) * 1000000 + 0.5)
                / 1000000.0) *
               (CAST(tf AS DOUBLE) * ${bmK1 + 1.0}) /
               (CAST(tf AS DOUBLE) +
                $bmK1 * (1.0 - $bmB + $bmB * CAST(dl AS DOUBLE) / avgdl)) AS c
        FROM tf JOIN df USING (tok) CROSS JOIN stats)
      SELECT doc_id, ROUND(${dsumSql("c")}, 6) AS score
      FROM scored
      GROUP BY doc_id
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
    val tok = docs
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), col("lang"),
        (TextOps.h60(col("tok")) % dsirB).as("b"))
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
      .agg(count(lit(1)).as("n_tok"), round(davg(col("w")), 6).as("score"))
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
      SELECT doc_id, lang, COUNT(*) AS n_tok, ROUND(${davgSql("w")}, 6) AS score
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
      val bounds = h.agg(expr(
        "percentile(h, array(CAST(1 AS DOUBLE) / 3, CAST(2 AS DOUBLE) / 3))").as("hb"))
      h.crossJoin(broadcast(bounds))
        .select(col("lang"),
          when(fix6(col("h")) <= fix6(element_at(col("hb"), 1)), "head")
            .when(fix6(col("h")) <= fix6(element_at(col("hb"), 2)), "middle")
            .otherwise("tail").as("bucket"),
          col("h"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), round(davg(col("h")), 6).as("avg_h"))
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
      SELECT lang, bucket, COUNT(*) AS n_docs, ROUND(${davgSql("h")}, 6) AS avg_h
      FROM b
      GROUP BY lang, bucket
      ORDER BY lang, bucket"""))
}
