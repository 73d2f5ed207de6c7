package graft.queries

import graft.{Catalog, GQuery}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Near-duplicate CLUSTERING: the step between pair generation and actual
  * corpus dedup. LSH emits pairs (a~b, b~c); removing "the second doc of
  * every pair" (as p_clean_corpus deliberately does for its bounded scope)
  * is not transitively consistent — a~b, b~c must collapse a,b,c into ONE
  * cluster keeping ONE representative. That closure is connected
  * components over the pair graph (reference analog: the dedup stage a
  * distributed engine runs between candidate generation and output;
  * DataFusion itself has no recursion operator either — both engines need
  * an iterative driver, which here is a Spark job loop).
  *
  * Algorithm: min-label propagation. Every node starts labeled with its
  * own id; each round every node takes the min of its own and its
  * neighbors' labels; fixpoint = each component uniformly carries its
  * smallest member id. Rounds needed = graph diameter, and near-dup
  * components are dense and tiny (dozens of members, diameter 2-4), so
  * the loop runs ~3 rounds regardless of corpus size — the 100 TB cost
  * is (rounds × one shuffle of the (node,label) edge join), all
  * proportional to |pairs|, never to corpus². For adversarially long
  * path-shaped graphs the alternating large-star/small-star algorithm
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) converges in O(log² n) rounds with the same per-round shape;
  * min-label is the right call for near-dup graphs specifically.
  *
  * Determinism: min() is order-free, so the labeling is unique — safe to
  * hash-compare across engines. The DuckDB oracle computes the same
  * closure with a recursive CTE (Spark has no recursive CTE; the job
  * loop IS the Spark-native equivalent, with `localCheckpoint` cutting
  * the per-round lineage growth — on a multi-tenant cluster prefer
  * reliable `checkpoint` to survive executor loss).
  */
object GraphOps {

  def queries: Seq[GQuery] = Seq(dedupClusters, dedupCanonical)

  /** Connected-component labels (id, lbl) for every node of the
    * undirected pair graph. One (node,label)-shuffle join per round;
    * converges when no label changes. */
  private[graft] def ccLabels(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .select(col("a_id").as("u"), col("b_id").as("v"))
      .union(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .localCheckpoint() // pairs cost an LSH pipeline — never recompute it per round
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      require(rounds <= 60, "cc did not converge in 60 rounds — not a near-dup-shaped graph")
      val nbrMin = edges
        .join(labels.select(col("id").as("u"), col("lbl").as("ulbl")), "u")
        .groupBy(col("v").as("id")).agg(min(col("ulbl")).as("nbr"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("nbr"), col("lbl"))).as("lbl"))
        .localCheckpoint()
      changed = next
        .join(labels.select(col("id"), col("lbl").as("old")), "id")
        .filter(col("lbl") =!= col("old")).count()
      labels = next
    }
    labels
  }

  /** Recursive-CTE closure over the `pairs` view: ends in a `cc` view of
    * (id, lbl) — the oracle twin of [[ccLabels]]. */
  private val ccSql = """
      edges AS (SELECT a_id AS u, b_id AS v FROM pairs
                UNION SELECT b_id, a_id FROM pairs),
      reach AS (SELECT DISTINCT u AS id, u AS r FROM edges
                UNION
                SELECT re.id, e.v FROM reach re JOIN edges e ON re.r = e.u),
      cc AS (SELECT id, MIN(r) AS lbl FROM reach GROUP BY id)"""

  val dedupClusters: GQuery = GQuery(
    "t_dedup_clusters",
    "connected components over LSH near-dup pairs (transitive closure)",
    (spark, dir) => {
      val d = Catalog.table(spark, dir, "documents")
      ccLabels(TextOps.minhashPairs(TextOps.spread(d).select(col("doc_id"), col("text")), 0.5))
        .select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH RECURSIVE ${TextOps.minhashPairsSql("SELECT doc_id, text FROM documents", 0.5)},
      $ccSql
      SELECT id AS doc_id, lbl AS cluster_id FROM cc
      ORDER BY doc_id"""))

  /** The full dedup decision: per cluster keep the highest-quality member
    * (longest token count, ties to smallest doc_id) — the CCNet/RefinedWeb
    * "keep best of cluster" policy rather than "keep first seen". Output
    * is the per-cluster verdict; the surviving corpus is then one
    * left_anti join of documents against (members - kept). */
  val dedupCanonical: GQuery = GQuery(
    "p_dedup_canonical",
    "per near-dup cluster: canonical keeper by token count + member count",
    (spark, dir) => {
      val d = Catalog.table(spark, dir, "documents")
      val cl = ccLabels(TextOps.minhashPairs(TextOps.spread(d).select(col("doc_id"), col("text")), 0.5))
      val nt = d.select(col("doc_id").as("id"), size(split(col("text"), " ")).as("n_tok"))
      val sizes = cl.groupBy(col("lbl")).agg(count(lit(1)).as("n_members"))
      val w = Window.partitionBy(col("lbl")).orderBy(col("n_tok").desc, col("id"))
      cl.join(nt, "id")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .join(sizes, "lbl")
        .select(col("lbl").as("cluster_id"), col("id").as("kept_doc"), col("n_members"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      WITH RECURSIVE ${TextOps.minhashPairsSql("SELECT doc_id, text FROM documents", 0.5)},
      $ccSql,
      nt AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
      ranked AS (SELECT cc.lbl, cc.id,
                        ROW_NUMBER() OVER (PARTITION BY cc.lbl
                          ORDER BY nt.n_tok DESC, cc.id) AS rn
                 FROM cc JOIN nt ON nt.doc_id = cc.id),
      sizes AS (SELECT lbl, COUNT(*) AS n_members FROM cc GROUP BY lbl)
      SELECT r.lbl AS cluster_id, r.id AS kept_doc, s.n_members
      FROM ranked r JOIN sizes s ON s.lbl = r.lbl
      WHERE r.rn = 1 ORDER BY cluster_id"""))
}
