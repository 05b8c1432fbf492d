package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stages 4 + 6 of the reference pipeline (engine.py:275-319,
  * 340-367): web verification of low-confidence clusters and
  * canonical-name enrichment.
  *
  * Scale shape: the verifier is called once per DISTINCT name (the
  * reference dedups enrichment the same way, engine.py:344), inside a
  * mapPartitions pass — per-partition client setup, Spark-task
  * parallelism instead of a 5-thread pool — and results broadcast-join
  * back to rows. Verification never changes clustering or canonical
  * election (SURVEY.md Appendix A.6). */
object Enrichment {

  /** X1 + W1 — verify one representative of each cluster with
    * confidence < 0.90 and a non-empty base name; annotate all
    * members with `web_canonical` (null when the verifier agrees or
    * abstains, engine.py:305-317). */
  def webVerify(full: DataFrame, verifier: Verifier)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val toVerify = full
      .filter(col("confidence") < 0.90 && col("base_name") =!= "")
      .groupBy("cluster_id").agg(min_by(col("base_name"), col("row_order")).as("rep_base"))
      .select("cluster_id", "rep_base")
    val verified = toVerify.as[(Long, String)].mapPartitions { it =>
      it.map { case (cid, base) =>
        val res = verifier.verifyName(base).filter(_ != base.toUpperCase)
        (cid, res.orNull)
      }
    }.toDF("cluster_id", "web_canonical")
      .filter(col("web_canonical").isNotNull)
    full.join(broadcast(verified), Seq("cluster_id"), "left")
  }

  /** Stage 6 + X2 — enrich each distinct canonical name once
    * (website + industry), broadcast back to every row. */
  def enrich(full: DataFrame, verifier: Verifier)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val enriched = full.select(col("canonical_name")).distinct()
      .as[String].mapPartitions { it =>
        it.map(name => (name, verifier.findDomain(name), verifier.classifyIndustry(name)))
      }.toDF("canonical_name", "website", "industry")
    full.join(broadcast(enriched), Seq("canonical_name"), "left")
  }
}
