package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** TRAINED multi-class domain classifier — the mixture-curation shape
  * the published data recipes run (DoReMi reweights domains, DCLM and
  * CCNet route documents through trained classifiers before any gate),
  * as Spark aggregations over the SAME hashed word-unigram per-mille
  * features the trained quality classifier uses
  * ([[QualityClassifier.featureFrame]]).
  *
  * Labels bootstrap from a rule-based keyword annotator (argmax of four
  * disjoint topic-word groups — the quality classifier's label pattern;
  * swapping in human or LLM domain labels changes one DataFrame). The
  * corpus's `lang`/`source` COLUMNS are deliberately not used: both are
  * assigned independently of the text in the synthetic corpus (measured
  * — marker words are uniform across their values, and the rule-based
  * lang heuristic degenerates to one class here), so no text model can
  * recover them; the keyword label is text-derived, DIVERSE
  * (154/143/108/95 at sf0.01), and genuinely learnable.
  *
  * Model: per-domain Rocchio centroids, nearest-centroid classification
  * in its LINEAR form: argmax_dom 2·(x·c_dom) − ‖c_dom‖² (the integer-
  * exact expansion of argmin ‖x − c‖², the doc's own ‖x‖² being
  * class-independent). The −‖c‖² bias is load-bearing: a bare dot (and
  * equivalently the one-vs-rest difference w = c − mean(others), whose
  * argmax is algebraically the SAME as the bare dot since x·Σc is
  * class-independent) measured 47.8% here — every prediction drifts
  * toward the largest-norm class; the norm correction lifts it to 74.4%
  * train accuracy against the 30.8% majority baseline (balanced per
  * class: 68–80% on all four), the residual error being the 64-bucket
  * hash collisions between marker and filler words. Everything is integer
  * arithmetic (features per-mille, centroids per-mille scaled by
  * [[QualityClassifier.Scale]], margins exact long sums), so the DuckDB
  * oracle replays training AND classification bit-for-bit — including
  * argmax ties, which both sides break domain-ascending.
  *
  * Scale shape (100 TB): labeling is the annotator's map-side pass;
  * training is one (label, f) integer aggregation collected at
  * |domains|·(NumBuckets+1) rows; scoring is MAP-SIDE ONLY — the weight
  * matrix rides as literal arrays, the x vector is built once per row,
  * and each class margin is one zip_with dot (the
  * [[QualityClassifier.scoreQuery]] margin precedent), no join, no
  * shuffle at all (the label is a per-row projection, composed inline).
  *
  * The bias bucket (f = 64, constant 1000 per doc and hence per
  * centroid) cancels to w = 0 in the difference and is skipped in both
  * engines.
  */
object DomainClassifier {

  import QualityClassifier.{NumBuckets, Scale}

  /** Fixed class list, alphabetical (the tie-break order). */
  val Domains: Seq[String] = Seq("compute", "relate", "store", "stream")

  /** The annotator's keyword groups — disjoint corpus-vocabulary words,
    * one group per domain. */
  val DomainMarkers: Map[String, Seq[String]] = Map(
    "compute" -> Seq("scan", "filter", "sort"),
    "relate"  -> Seq("join", "merge", "hash"),
    "stream"  -> Seq("stream", "batch", "window"),
    "store"   -> Seq("table", "column", "row"))

  /** Bootstrap labels: argmax of the four marker-group counts with the
    * alphabetical first-match tie-break (mirrored by the oracle's CASE
    * chain). One map-side pass. */
  def labels(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), labelCol.as("label"))

  /** The annotator as a single map-side expression over `text` — a pure
    * per-row projection, so scoring composes it inline instead of
    * self-joining the corpus against its own labels. Marker counting runs
    * in the [[graft.functions.TokenHashFeatures]] kernel's marker-only
    * mode (numBuckets = 0: one byte-scan pass, no token array, no md5). */
  private def labelCol: org.apache.spark.sql.Column =
    labelColFromCounts(
      graft.functions.TextExpressions.tokenHashFeatures(
        col("text"), 0, Domains.map(DomainMarkers)))

  /** The annotator's argmax over the four already-counted marker groups
    * (layout: [total, cnt_compute, cnt_relate, cnt_store, cnt_stream] —
    * the kernel's marker-only mode), alphabetical first-match tie-break. */
  private def labelColFromCounts(f: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val cnt = Domains.zipWithIndex.map { case (d, g) =>
      d -> element_at(f, g + 2) }
    val maxCnt = greatest(cnt.map(_._2): _*)
    cnt.tail.foldLeft(
      when(cnt.head._2 === maxCnt, cnt.head._1)) {
      case (acc, (d, c)) => acc.when(c === maxCnt, d)
    }
  }

  /** Per-domain centroids: c_{dom,f} = (Σ_{docs∈dom} v_f) · Scale
    * / n_dom (truncating long division, matching DuckDB `//`). Returns
    * domain → NumBuckets+1 longs; absent (domain, f) pairs are 0. One
    * integer aggregation + one |domains|·(NumBuckets+1)-row collect. */
  def trainCentroids(docs: DataFrame): Map[String, Array[Long]] = {
    val lab = labels(docs)
    val fx = QualityClassifier.featureFrame(docs).join(lab, "doc_id")
    val n = lab.groupBy("label").agg(count(lit(1)).as("n"))
    val rows = fx.groupBy("label", "f")
      .agg(sum(col("v")).as("s"))
      .join(n, "label")
      .select(col("label"), col("f"),
        expr(s"(s * $Scale) div n").as("c"))
      .collect()
    val cents = Domains.map(_ -> Array.fill(NumBuckets + 1)(0L)).toMap
    rows.foreach { r =>
      cents.get(r.getString(0))
        .foreach(_(r.getInt(1)) = r.getLong(2))
    }
    cents
  }

  /** Classify every document map-side against literal centroids:
    * margin_dom = 2·Σ_{f<64} x_f·c_f − ‖c‖² with x_f = per-mille bucket
    * ratio · Scale recomputed from the token array in the row (the
    * margin-expression precedent); the x vector is built ONCE per row
    * (the 64 bucket scans are the expensive part), each class margin is
    * a cheap zip_with dot over it, and the squared norm folds in as a
    * literal. The bias dim (x = c = Scale²) shifts every margin by the
    * same constant and is skipped. Output: (doc_id, pred_domain, label,
    * correct), ordered. */
  def scoreQuery(docs: DataFrame,
                 cents: Map[String, Array[Long]]): DataFrame = {
    Domains.foreach(l => require(cents.contains(l) &&
      cents(l).length == NumBuckets + 1,
      s"domain score: missing/miswidth centroids for $l"))
    // one fused tokenize+hash+bucket+marker-count kernel pass per row
    // (TokenHashFeatures — it replaced the split-regex + token-array +
    // md5-per-token front-end the 100× probes measured as this row's
    // dominant remaining cost; the four label marker groups ride in the
    // SAME pass), then x as one 64-element transform over the counts
    val xSql =
      s"transform(_cnt, c -> ((c * ${Scale}L) div _n) * ${Scale}L)"
    def marginSql(c: Array[Long]): String = {
      val content = c.take(NumBuckets)
      val cArr = content.map(_ + "L").mkString("array(", ", ", ")")
      val normSq = content.map(v => v * v).sum
      s"""aggregate(zip_with(_x, $cArr, (x, c) -> 2L * x * c),
         |  0L, (acc, v) -> acc + v) - ${normSq}L""".stripMargin
    }
    val scored = docs
      .select(col("doc_id"),
        graft.functions.TextExpressions.tokenHashFeatures(
          col("text"), NumBuckets, Domains.map(DomainMarkers)).as("_f"))
      .select(col("doc_id"),
        labelColFromCounts(expr(s"slice(_f, ${NumBuckets + 1}, " +
          s"${1 + Domains.size})")).as("label"),
        element_at(col("_f"), NumBuckets + 1).as("_n"),
        expr(s"slice(_f, 1, $NumBuckets)").as("_cnt"))
      .select(col("doc_id"), col("label"), expr(xSql).as("_x"))
      .select(Seq(col("doc_id"), col("label")) ++
        Domains.map(l =>
          expr(marginSql(cents(l))).cast(LongType).as(s"_m_$l")): _*)
    val maxMargin = greatest(Domains.map(l => col(s"_m_$l")): _*)
    // first match in alphabetical order == the oracle's (margin DESC,
    // domain asc) row_number pick
    val pred = Domains.tail.foldLeft(
      when(col(s"_m_${Domains.head}") === maxMargin, Domains.head)) {
      (acc, l) => acc.when(col(s"_m_$l") === maxMargin, l)
    }
    scored
      .select(col("doc_id"), pred.as("pred_domain"), col("label"))
      .withColumn("correct", col("pred_domain") === col("label"))
      .orderBy("doc_id")
  }

  /** Build-once/score-many centroids through [[FingerprintStore]] (the
    * qualweights precedent): one (domain, f, c) row per centroid cell. A
    * warm call reads |domains|·(NumBuckets+1) parquet rows and runs ZERO
    * training jobs before the map-only score. */
  def centroidStore(spark: SparkSession, docs: DataFrame,
                    sourcePath: String,
                    storeRoot: Option[String] = None)
      : Map[String, Array[Long]] = {
    val stored = FingerprintStore.getOrBuild(spark, sourcePath,
      "domcents", s"v1-rocchio-b$NumBuckets-kwlab-${Domains.mkString("")}",
      storeRoot) {
      import spark.implicits._
      trainCentroids(docs).toSeq.sortBy(_._1)
        .flatMap { case (l, c) =>
          c.zipWithIndex.map { case (cv, f) => (l, f.toLong, cv) }
        }
        .toDF("domain", "f", "c")
        .coalesce(1) // 5 x 65 rows: one file, one footer
    }
    val cents = Domains.map(_ -> Array.fill(NumBuckets + 1)(0L)).toMap
    stored.collect().foreach(r =>
      cents.get(r.getString(0))
        .foreach(_(r.getLong(1).toInt) = r.getLong(2)))
    cents
  }
}
