package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Contracts of the trained quality classifier: deterministic integer
  * training, map-side scoring consistent with the training-side margin
  * aggregation, and the warm weights store serving without retraining. */
class QualityClassifierSpec extends SparkSuite {

  import spark.implicits._

  // mixed-quality corpus: stopword-rich prose (high heuristic quality)
  // vs punctuation-heavy low-stopword noise — both label classes present
  private def corpus = Seq(
    (0L, "the cat sat on the mat with a hat and the dog"),
    (1L, "the quick brown fox is in the barn for the winter"),
    (2L, "zzz qqq ### !!! *** ??? %%% @@@ ^^^ &&&"),
    (3L, "xk jq vw ## @@ !! ?? %% ^^ && ** (( ))"),
    (4L, "a man and a plan and a canal is on the map"),
    (5L, "#### $$$$ %%%% ^^^^ &&&& **** (((( ))))"))
    .toDF("doc_id", "text")

  test("labels split the corpus; training is deterministic and the " +
    "trained model separates the classes on its training set") {
    val labs = QualityClassifier.labels(corpus).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(labs.values.toSet == Set(true, false), s"need both classes: $labs")
    val w1 = QualityClassifier.train(corpus)
    val w2 = QualityClassifier.train(corpus)
    assert(w1.toSeq == w2.toSeq, "training must be bit-deterministic")
    val scored = QualityClassifier.scoreQuery(corpus, w1).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(scored.forall { case (_, (pred, label)) => pred == label },
      s"centroid+fine-tune must separate this tiny set: $scored")
  }

  test("map-side scoring margin equals the training-side aggregation " +
    "margin for every document (the two paths share the ratio features)") {
    val w = QualityClassifier.train(corpus)
    val wlit = typedLit(w.toSeq)
    // training-side margin: explode -> ratio -> sum(v * w) per doc
    val toks = corpus.select(col("doc_id"),
      explode(TextAnalysis.tokens(col("text"))).as("t"))
      .select(col("doc_id"),
        (TextAnalysis.hash16(col("t")) % QualityClassifier.NumBuckets)
          .cast("int").as("f"))
    val cnts = toks.groupBy("doc_id", "f").agg(count(lit(1)).as("cnt"))
    val tots = toks.groupBy("doc_id").agg(count(lit(1)).as("tot"))
    val agg = cnts.join(tots, "doc_id")
      .select(col("doc_id"), col("f"), expr("(cnt * 1000) div tot").as("v"))
      .where(col("v") > 0)
      .unionByName(tots.select(col("doc_id"),
        lit(QualityClassifier.NumBuckets).cast("int").as("f"),
        lit(1000L).as("v")))
      .groupBy("doc_id")
      .agg(sum(col("v") * element_at(wlit, col("f") + 1)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scored = QualityClassifier.scoreQuery(corpus, w).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored == agg,
      s"map-side margins diverge from the aggregation path: $scored vs $agg")
  }

  test("weightsStore: warm read returns the fresh-trained weights from " +
    "the published artifact without running training jobs") {
    val src = tmpDir("qual-store-src") + "/documents.parquet"
    corpus.write.parquet(src)
    val docs = spark.read.parquet(src)
    val root = tmpDir("qual-store")
    val fresh = QualityClassifier.train(docs)
    assert(QualityClassifier.weightsStore(spark, docs, src,
      storeRoot = Some(root)).toSeq == fresh.toSeq)
    var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      assert(QualityClassifier.weightsStore(spark, docs, src,
        storeRoot = Some(root)).toSeq == fresh.toSeq)
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
    } finally spark.sparkContext.removeSparkListener(l)
    // warm read = parquet listing + sort sampling + collect (~4 jobs);
    // retraining runs the centroid aggregations + 2 jobs per epoch
    assert(jobs <= 9, s"warm weightsStore ran $jobs jobs — it retrained")
    assert(new java.io.File(root).listFiles().map(_.getName)
      .exists(_.startsWith("graft_sigstore_qualweights_v3-rocchio")))
  }
}
