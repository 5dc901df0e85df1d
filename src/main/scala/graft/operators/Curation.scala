package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus curation for LLM training data — the composed filter a
  * pretraining pipeline runs over raw documents: quality gates
  * (token-count bounds), language allow-list, then exact-duplicate
  * collapse keeping the smallest id per normalized-text fingerprint.
  *
  * Shape at scale: features + language ID + fingerprint are ONE
  * codegen'd projection fused with the scan (no UDFs); the dedup
  * keeper is a single hash aggregation on the fingerprint plus a
  * co-keyed semi-join (AQE broadcasts the keeper side when small) —
  * two shuffles total regardless of corpus size, both keyed on the
  * fingerprint. Near-dup removal composes on top via
  * [[Dedup.minhashLsh]] output ids when the corpus warrants it.
  */
object Curation {

  val defaultLangs: Seq[String] = TextAnalysis.stopwords.keys.toSeq.sorted

  def curate(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      minTokens: Long = 20,
      maxTokens: Long = 1000000,
      langs: Seq[String] = defaultLangs): DataFrame = {
    val t = col(textCol)
    val featured = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(t).cast("long").as("n_tokens"),
      TextAnalysis.langId(t).as("lang_pred"),
      TextAnalysis.fingerprintMd5(t).as("fp"))
    val filtered = featured.where(
      col("n_tokens").between(minTokens, maxTokens) &&
        col("lang_pred").isin(langs: _*))
    val keepers = filtered.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    filtered.join(keepers, Seq("fp", "doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("lang_pred"))
  }
}
