package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin`, on in GraftSession) covers sort-merge
  * joins at runtime; explicit salting is the deterministic fallback for
  * the cases AQE can't split (e.g. skewed aggregation keys, or
  * shuffled-hash joins against a replicable build side).
  */
object Skew {

  /** Salted equi-join: each probe row takes one of `nSalts` sub-keys and
    * the build side is replicated once per salt, so a hot key's rows
    * spread over nSalts reducers. Join RESULTS are salt-placement-
    * independent (every probe row meets exactly its key's build rows
    * whatever salt it lands on), so the seeded-random salt is safe.
    * Build side must tolerate replication (dimension-shaped). */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, nSalts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit one null-padded copy of every unmatched
    // build row PER SALT REPLICA — refuse rather than silently duplicate
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin replicates the build side; joinType '$joinType' would " +
        "duplicate unmatched build rows — use inner/left variants")
    val salts = probe.sparkSession.range(nSalts)
      .select(col("id").cast("int").as("__salt"))
    val probeS = probe.withColumn("__salt",
      (rand(42) * nSalts).cast("int"))
    val buildS = build.crossJoin(broadcast(salts))
    probeS.join(buildS,
        probeS(probeKey) === buildS(buildKey) && probeS("__salt") === buildS("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key — caps any single reducer's input at
    * ~1/nSalts of the hottest key. The salt carries per-row entropy
    * (seeded random): deriving it from row VALUES would collapse a hot
    * key with constant values onto one salt and mitigate nothing.
    * Double values are accumulated via [[graft.util.Num.fix6]] fixed-point
    * (exact, associative), so results are fully salt-placement- AND
    * order-independent — a raw sum(double) would drift by re-association
    * across salt layouts; other numeric types sum exactly as-is. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      nSalts: Int): DataFrame = {
    val isDouble = df.schema(valueCol).dataType ==
      org.apache.spark.sql.types.DoubleType
    val partial =
      if (isDouble) sum(graft.util.Num.fix6(col(valueCol)))
      else sum(col(valueCol))
    val out = df
      .withColumn("__salt", (rand(42) * nSalts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("__total"), sum(col("__n")).as("n"))
    val total =
      if (isDouble) (col("__total").cast("double") / 1000000.0d)
      else col("__total")
    out.select(col(key), total.as(s"sum_$valueCol"), col("n"))
  }
}
