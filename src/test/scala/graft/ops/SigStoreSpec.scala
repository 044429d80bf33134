package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Publish-protocol tests for the persistent band-bucket signature store —
  * the concurrency and crash-recovery contracts documented on
  * [[Dedup.bandBucketStore]]: exactly one complete store survives a
  * builder race, and a partial store (crashed publish) self-repairs
  * instead of poisoning every later call. */
class SigStoreSpec extends SparkSuite {

  import spark.implicits._

  // 3 docs × 4 bands = 12 band-bucket rows in a complete store
  private def corpus = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 45L),
    (2L, "one two three four five six seven eight nine", "en", "s", 44L),
    (4L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 45L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")
  private val ExpectedRows = 3L * Dedup.NumBands

  /** Fresh (sourcePath, storeRoot URI, root dir) triple per test. */
  private def freshKey(): (String, String, java.io.File) = {
    val src = java.nio.file.Files.createTempDirectory("sigsrc").toFile
    java.nio.file.Files.write(new java.io.File(src, "marker").toPath,
      "x".getBytes("UTF-8"))
    val rootDir = java.nio.file.Files.createTempDirectory("sigroot").toFile
    (src.getPath, rootDir.toURI.toString, rootDir)
  }

  private def walk(f: java.io.File): Seq[java.io.File] =
    if (f.isDirectory) f +: f.listFiles().toSeq.flatMap(walk) else Seq(f)

  test("two concurrent builders of the same fingerprint race to exactly " +
    "one complete store: no doubled rows, no leftover temp dirs, both " +
    "callers read the winner") {
    val (src, root, rootDir) = freshKey()
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { _ =>
      val t = new Thread(() => {
        try {
          gate.await()
          // both threads enter the build path together (neither can see a
          // published store yet), exercising the rename-loser eviction
          results.add(
            Dedup.bandBucketStore(spark, corpus, src, "race", Some(root))
              .count())
        } catch { case t: Throwable => errors.add(t) }
      })
      t.start(); t
    }
    gate.countDown()
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"builder threw: ${errors.peek()}")
    // both callers read a complete, single-copy store
    assert(results.toArray.toSeq == Seq(ExpectedRows, ExpectedRows))
    val storeDir = new java.io.File(
      Dedup.sigStorePath(spark, src, "race", root).toUri)
    assert(new java.io.File(storeDir, "_SUCCESS").exists())
    assert(spark.read.parquet(storeDir.getPath).count() == ExpectedRows)
    // the loser's temp dir is gone — from the root AND from inside the
    // store (a lost rename races the winner and lands as a subdir there)
    assert(!walk(rootDir).exists(_.getName.contains(".tmp-")),
      s"leftover temp under $rootDir")
  }

  test("a partial store (directory without _SUCCESS) is evicted and " +
    "rebuilt, not permanently poisoned") {
    val (src, root, _) = freshKey()
    val storeDir = new java.io.File(
      Dedup.sigStorePath(spark, src, "heal", root).toUri)
    // simulate a crashed / non-atomic publish: dir present, marker absent
    assert(storeDir.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(storeDir, "part-00000-junk.parquet").toPath,
      "not parquet".getBytes("UTF-8"))
    // pre-fix this threw bandBucketStore's completeness require — forever
    val healed = Dedup.bandBucketStore(spark, corpus, src, "heal", Some(root))
    assert(healed.count() == ExpectedRows)
    assert(new java.io.File(storeDir, "_SUCCESS").exists())
    assert(!new java.io.File(storeDir, "part-00000-junk.parquet").exists(),
      "partial-store junk survived the eviction")
    // and the healed store serves the next call unchanged
    assert(Dedup.bandBucketStore(spark, corpus, src, "heal", Some(root))
      .count() == ExpectedRows)
  }
}
