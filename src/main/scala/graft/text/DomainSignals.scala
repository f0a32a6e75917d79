package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host/domain-level curation signals — the per-registrable-domain
  * rollup (doc count, token mass, exact-duplicate rate, quality-rule
  * hit-rate) web-corpus curation uses to build domain blocklists and
  * sampling weights (the Dolma/RefinedWeb/C4 recipe level ABOVE
  * per-document rules: a domain whose pages are 40% boilerplate
  * duplicates or 60% quality-rule failures gets down-weighted or
  * dropped wholesale, catching spam farms that per-document gates
  * see only one page at a time).
  *
  * Scale shape: one [[GopherRules.gopherSignals]] projection pass, one
  * content-digest groupBy (the exact-dedup shape — map-side
  * combinable), one id-keyed equi-join to reunite the two per-doc
  * signals, then ONE groupBy(domain) rollup whose output is
  * domain-vocabulary-sized. No windows, no collects; every aggregate
  * partial-combines, so at a trillion documents the only full-data
  * shuffles are the digest and id exchanges. Ratios are exact integer
  * PPM (count · 1e6 div total — the house recipe), so the table
  * hash-compares across engines.
  */
object DomainSignals {

  /** Per-domain rollup: `(domainCol, n_docs, n_tokens, dup_docs,
    * dup_ppm, fail_docs, quality_fail_ppm)` where `dup_docs` counts
    * documents whose exact content occurs more than once ANYWHERE in
    * the corpus (cross-domain boilerplate counts against every domain
    * carrying it) and `fail_docs` counts documents failing the
    * [[GopherRules.gopherSignals]] composite keep verdict.
    */
  def domainSignals(docs: DataFrame, domainCol: String, idCol: String,
                    textCol: String, stopwords: Seq[String],
                    minTokens: Long = 50): DataFrame = {
    val sig = GopherRules
      .gopherSignals(docs, idCol, textCol, stopwords, minTokens = minTokens)
      .select(col(idCol), col("n_tokens"), col("keep"))
    val fp = docs.select(col(idCol), col(domainCol),
      md5(col(textCol)).as("__fp"))
    val dupCounts = fp.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
    fp.join(dupCounts, "__fp")
      .join(sig, idCol)
      .groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("dup_docs"),
        sum(when(!col("keep"), 1L).otherwise(0L)).as("fail_docs"))
      .select(col(domainCol), col("n_docs"), col("n_tokens"),
        col("dup_docs"),
        expr("dup_docs * 1000000L div n_docs").as("dup_ppm"),
        col("fail_docs"),
        expr("fail_docs * 1000000L div n_docs").as("quality_fail_ppm"))
  }
}
