package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation => Cur}

/** Corpus-curation declared queries ([[graft.operators.Curation]]):
  * deterministic split assignment, per-domain caps, and mixture
  * rebalancing over the `documents` table. All three sit under the
  * EXACT DuckDB oracle — the bucket hash is md5, computed identically
  * by both engines (`conv(substr(md5(x),1,8),16,10)` ≡
  * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`), so even the sampling
  * decisions hash-compare, not just the aggregate shapes.
  */
object Curation {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Oracle fragment: the same 32-bit salted md5 bucket Spark computes. */
  private def bucketSql(salt: String, buckets: Int): String =
    s"CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 8)) " +
      s"AS BIGINT) % $buckets"

  /** Deterministic 80/10/10 train/val/test assignment keyed on doc_id:
    * the split a document lands in is a pure function of (salt, key) —
    * rerunning, repartitioning, or scaling the cluster can't move a
    * document across the split boundary (the property a training
    * pipeline needs to keep eval data out of training). Reported as
    * per-(split, lang) corpus stats.
    */
  private def splitAssign(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("split", Cur.splitAssign(col("doc_id"), "split-v1",
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split", "lang")

  private val splitAssignSql =
    s"""WITH b AS (
       |  SELECT lang, n_chars, ${bucketSql("split-v1", 100)} AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'val'
       |            ELSE 'test' END AS split,
       |  lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** Per-domain contribution cap: each source contributes at most its
    * 10 longest documents (doc_id tiebreak), the anti-domination gate a
    * mixture pipeline applies before token budgeting. One keyed window
    * shuffle; reported per source.
    */
  private def domainCap(spark: SparkSession, dir: String): DataFrame =
    Cur.capPerGroup(docs(spark, dir), col("source"),
      Seq(col("n_chars").desc, col("doc_id").asc), n = 10)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"),
        min("n_chars").as("min_chars"))
      .orderBy("source")

  private val domainCapSql =
    """WITH ranked AS (
      |  SELECT source, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  min(n_chars) AS min_chars
      |FROM ranked WHERE rn <= 10
      |GROUP BY source ORDER BY source""".stripMargin

  /** Uniform-mixture rebalance: every source deterministically
    * downsampled toward the smallest source's size
    * (`bucket * n_src < n_min * 10000` — integer arithmetic, exactly
    * reproducible). The per-source counts are a tiny broadcast; the
    * fact side never shuffles. Reported per source with the exact and
    * achieved sizes side by side.
    */
  private def mixUniform(spark: SparkSession, dir: String): DataFrame =
    Cur.uniformMixture(docs(spark, dir), col("source"), col("doc_id"),
      salt = "mix-v1")
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"), sum("n_chars").as("total_chars"))
      .orderBy("source")

  private val mixUniformSql =
    s"""WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
       |m AS (SELECT min(n_src) AS n_min FROM c),
       |b AS (
       |  SELECT d.source, d.n_chars, c.n_src, m.n_min,
       |    ${bucketSql("mix-v1", 10000)} AS bucket
       |  FROM documents d JOIN c USING (source) CROSS JOIN m)
       |SELECT source, count(*) AS n_sampled,
       |  CAST(sum(n_chars) AS BIGINT) AS total_chars
       |FROM b WHERE bucket * n_src < n_min * 10000
       |GROUP BY source ORDER BY source""".stripMargin

  val all: Seq[NamedQuery] = Seq(
    NamedQuery("d_split_assign", splitAssign, Some(splitAssignSql)),
    NamedQuery("d_domain_cap", domainCap, Some(domainCapSql)),
    NamedQuery("d_mix_uniform", mixUniform, Some(mixUniformSql)))
}
