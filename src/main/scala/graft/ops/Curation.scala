package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Corpus-curation filters a pretraining pipeline runs between "raw crawl"
  * and "training set": benchmark decontamination and repetition scoring.
  * Complements [[Dedup]] (inter-document redundancy) with the two
  * intra-pipeline checks the dedup family doesn't cover — overlap with a
  * held-out eval set, and within-document repetition.
  *
  * Scale design:
  *   - decontamination: the eval side (benchmark suites) is MBs against a
  *     100 TB corpus, so its distinct n-gram set is broadcast and the whole
  *     corpus-side probe is a map-side hash join — the only shuffle is the
  *     final per-doc partial-aggregated count.
  *   - repetition stats: per-row array expressions where possible (the
  *     duplicate-3-gram fraction never leaves the row); the top-2-gram
  *     count is a two-level aggregation — (doc, gram) then doc — whose
  *     second level is shuffle-free because rows of one doc are already
  *     co-located after the first groupBy.
  *
  * Both follow the published curation recipes: n-gram-overlap
  * decontamination as in the GPT-3 appendix-C / PaLM protocols (13-gram
  * collisions against eval sets; 3-token shingles here so the synthetic
  * corpus exercises the operator), and repetition filters as in Gopher
  * (Rae et al. 2021, "Scaling Language Models", table A1: fraction of
  * tokens in the most common n-gram, fraction of duplicated n-grams).
  */
object Curation {

  /** Documents of the corpus split sharing at least one distinct 3-token
    * shingle with the eval split (`doc_id % evalMod == 0` defines eval —
    * stand-in for a benchmark table). Returns one row per contaminated
    * corpus doc: (doc_id, n_grams, n_overlap, contam_frac), ordered.
    *
    * The eval gram set is explicitly `broadcast` — at production scale it
    * is the distinct n-grams of benchmark suites (MBs), never the corpus.
    */
  def decontaminate(docs: DataFrame, evalMod: Int = 17): DataFrame = {
    val grams = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_t"))
      .select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingles3(col("_t")))).as("sh"))
    val evalGrams = grams.where(col("doc_id") % evalMod === 0)
      .select("sh").distinct().withColumn("hit", lit(1L))
    grams.where(col("doc_id") % evalMod =!= 0)
      .join(broadcast(evalGrams), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
      .where(col("n_overlap") > 0)
      .select(col("doc_id"), col("n_grams"), col("n_overlap"),
        TextAnalysis.round6(col("n_overlap").cast("double") / col("n_grams"))
          .as("contam_frac"))
      .orderBy("doc_id")
  }

  /** Gopher-style within-document repetition statistics, one row per doc:
    * (doc_id, n_tok, top2_cnt, top2_frac, dup3_frac) where `top2_frac` is
    * the fraction of 2-grams accounted for by the single most frequent
    * 2-gram and `dup3_frac` the fraction of 3-grams that are repeats of an
    * earlier 3-gram in the same doc. High values of either mark
    * low-quality boilerplate/spam for corpus filtering. */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_t"))
    val perRow = base.select(
      col("doc_id"),
      size(col("_t")).cast(LongType).as("n_tok"),
      size(TextAnalysis.shingles3(col("_t"))).cast(LongType).as("n3"),
      size(array_distinct(TextAnalysis.shingles3(col("_t"))))
        .cast(LongType).as("n3d"))
    val top2 = base
      .select(col("doc_id"), explode(TextAnalysis.shingles2(col("_t"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(max("cnt").as("top2_cnt"), sum("cnt").as("n2"))
    perRow.join(top2, Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("top2_cnt"),
        TextAnalysis.round6(col("top2_cnt").cast("double") / col("n2"))
          .as("top2_frac"),
        TextAnalysis.round6((col("n3") - col("n3d")).cast("double") / col("n3"))
          .as("dup3_frac"))
      .orderBy("doc_id")
  }
}
