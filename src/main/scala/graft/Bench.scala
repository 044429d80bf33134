package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Bench {

  /** Execute a query's OWN physical plan and count its rows at the RDD
    * layer. `df.count()` re-optimizes the plan UNDER the count: column
    * pruning strips every map-side projection (a pure-map query times as
    * a bare parquet-scan count) and distinct-key join elimination can
    * drop a row-preserving left join's entire build subtree (the round-17
    * finding: `dedup_substring_remove` "counted" in 0.58 s at the 100×
    * probe while its real plan — the full posting-join detection chain —
    * runs ~25 s; `text_token_count_bpe`'s flat 0.15 s rows were scan
    * counts, not BPE encodes). `queryExecution.toRdd` executes the plan
    * the query DECLARES — every projected column materializes, the output
    * sort runs — which is the work Verify's parquet dump pays minus file
    * I/O, so bench rows now bound the cost a consumer actually sees. */
  private def runPlan(df: org.apache.spark.sql.DataFrame): Long =
    if (LegacyCountAction) df.count() else df.queryExecution.toRdd.count()

  /** `GRAFT_BENCH_ACTION=count` reproduces the pre-17 measured action —
    * ONLY for the cross-round like-for-like bridge (BASELINE.md round
    * 17); its numbers under-measure map work and eliminated joins, and
    * the artifact records which action ran so a bridge set can never
    * masquerade as an official one. */
  private val LegacyCountAction =
    sys.env.get("GRAFT_BENCH_ACTION").contains("count")

  /** Cumulative stop-the-world GC time across all collectors (ms). */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** First three /proc/loadavg fields as "1m,5m,15m" ('' off-Linux). */
  private def loadAvg(): String =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).mkString(",")
      finally src.close()
    } catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadBefore = loadAvg()
    // Steady-state methodology: run every query once at the smallest scale
    // factor first. Cold-run cost is dominated by fixed overhead (janino
    // codegen compile, planner warm-up — ~3-7 s per complex pipeline,
    // data-independent), which at production scale amortizes to nothing;
    // timing it against sf0.1 would measure the JIT, not the engine.
    val warmDir = {
      val small = new java.io.File(
        new java.io.File(sfDir).getParentFile, "sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try runPlan(fn(spark, warmDir)) catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // median-of-3 per query: the variance protocol. Single runs produced
    // phantom cross-round swings (worst observed: 4.3x on the same code);
    // the median rejects one GC/scheduler outlier in either direction
    // without hiding real cost. Caches are CLEARED after every timed rep:
    // a few operators (simhashPairs, connectedComponents) cache interior
    // tables for within-query reuse, and without clearing those entries
    // accumulate across the warm pass + every query x 3 reps in one JVM —
    // measured +56% on the whole-suite total from storage/GC pressure —
    // while making later reps of the SAME query read leftover cached data
    // instead of doing the full scan the protocol promises.
    //
    // Adjudication telemetry (round-11): alongside each median the JSON
    // carries the raw per-rep times, the query's GC-time delta summed over
    // its 3 reps, and its suite position, plus suite-level loadavg
    // before/after — so a driver-vs-builder spike (like round 10's 6-10x
    // on four CONTIGUOUS queries) is diagnosable from the artifact alone:
    // one outlier rep with a matching GC/loadavg signature says machine
    // stall; three uniformly slow reps with quiet GC says plan.
    // A failing query must surface as an ERROR, not as its time-to-crash:
    // round 13 proved the old `catch → -1L` swallow launders analysis
    // failures into phantom "speedups" (failure latency ~0.06 s read as a
    // 2x win). An errored query records `err` instead of reps, is excluded
    // from the suite total, and forces a nonzero exit so the driver
    // artifact shows red.
    case class QStat(median: Double, reps: Seq[Double], gcMs: Long, pos: Int,
                     err: Option[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), pos) =>
        val gc0 = gcMillis()
        var err: Option[String] = None
        val times = (1 to 3).flatMap { _ =>
          if (err.isDefined) None // one crash condemns the query; don't re-crash x3
          else {
            val t0 = System.nanoTime()
            try { runPlan(fn(spark, sfDir)) } catch {
              case e: Throwable =>
                err = Some(s"${e.getClass.getSimpleName}: " +
                  Option(e.getMessage).getOrElse("").linesIterator
                    .take(1).mkString.take(200))
            }
            val dt = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            if (err.isDefined) None else Some(dt)
          }
        }
        // err on ANY rep condemns the whole query to -1 — a median over
        // the surviving reps would be the partial-timing laundering round
        // 13 was eliminating, just one rep later.
        val median =
          if (err.isDefined || times.isEmpty) -1.0
          else times.sorted.apply(times.size / 2)
        name -> QStat(median, times, gcMillis() - gc0, pos, err)
    }.toMap
    // Sink-writer throughput: the one genuinely custom write path
    // (GroupFileWriter's group-per-object streaming) timed per codec AND
    // per line format (JSONL + CSV — the two line-oriented reference
    // formats) so a writer regression shows up in BENCH, not only in byte
    // goldens. 200k ~120-byte lines across 64 groups to local FS per run;
    // each entry reports seconds and uncompressed-input MB/s (bytes
    // processed per second — codec-comparable, unlike output MB/s which
    // would reward weak compression).
    val sinkWrite = {
      import graft.config.{CompressionType => C, FormatType}
      val base = java.nio.file.Files.createTempDirectory("graft_sinkbench")
      val nRows = 200000L
      val nGroups = 64
      def df(fmt: FormatType) = {
        val line = fmt match {
          case FormatType.Csv =>
            // offset,base64(payload) — the reference's raw comma-join shape
            concat(col("id").cast("string"), lit(","),
              lpad(md5(col("id").cast("string")), 96, "x"))
          case _ =>
            concat(lit("{\"offset\":"), col("id").cast("string"),
              lit(",\"payload\":\""),
              lpad(md5(col("id").cast("string")), 96, "x"), lit("\"}"))
        }
        spark.range(nRows)
          .select(col("id").as("offset"),
            concat(lit("bench-topic-"), (col("id") % nGroups).cast("string"),
              lit("." + fmt.name)).as("_filename"),
            line.as("_line"))
      }
      // uncompressed input bytes (lines + newlines) per format, for MB/s
      val fmts = Seq(FormatType.Jsonl, FormatType.Csv)
      val fmtBytes = fmts.map { f =>
        f -> df(f).agg(sum(length(col("_line")) + 1)).head().getLong(0)
      }.toMap
      val codecs = Seq(C.None, C.Gzip, C.Snappy, C.Zstd)
      val times = for (f <- fmts; c <- codecs) yield {
        val out = base.resolve(f.name + "_" + c.name).toUri.toString
        val t0 = System.nanoTime()
        graft.formats.GroupFileWriter.writeLines(df(f), out, f, c)
        val sec = (System.nanoTime() - t0) / 1e9
        (s"${f.name}_${c.name}", sec, fmtBytes(f) / 1e6 / sec)
      }
      // best-effort cleanup; the JVM exits right after either way
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(base).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
      (times, nRows, nGroups)
    }
    val loadAfter = loadAvg()
    // The driver captures only a BOUNDED tail of the stdout (2000 chars in
    // rounds 17-18 — both rounds' BENCH_r{N}.json came back "parsed": null
    // because the full per-query telemetry line overflowed it). Split the
    // output: the FULL artifact (per-query medians, reps, gc, sink table)
    // goes to a file (GRAFT_BENCH_JSON, default bench_runs/bench_full.json
    // — what bench_reps.sh installs as run{i}.json), and stdout's LAST
    // line is a compact totals JSON guaranteed to fit the tail window.
    // (build.sbt sets `Global / showSuccess := false` for the same reason —
    // otherwise sbt's "[success] Total time" line lands after ours.)
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    // errored queries keep a numeric (but impossible) -1 in the queries map
    // so downstream numeric parsers don't trip; the err text lives in
    // telemetry and n_errors flags the artifact as red at the top level
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v.median) }
      .mkString("{", ",", "}")
    val tel = results.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        "\"" + k + "\":{\"pos\":" + v.pos +
          ",\"reps\":[" + v.reps.map(f3).mkString(",") + "]" +
          ",\"gc_ms\":" + v.gcMs +
          v.err.fold("")(e => ",\"err\":" + jstr(e)) + "}"
      }
      .mkString("{", ",", "}")
    val nErrors = results.values.count(_.err.isDefined)
    val sw = (sinkWrite._1.map { case (k, sec, mbs) =>
      "\"" + k + "\":{\"sec\":" + f3(sec) + ",\"mb_s\":" + f3(mbs) + "}"
    } ++
      Seq("\"rows\":" + sinkWrite._2, "\"groups\":" + sinkWrite._3))
      .mkString("{", ",", "}")
    val total = results.values.collect {
      case s if s.err.isEmpty => s.median
    }.sum
    spark.stop()
    // n_queries mirrors Verify's COUNTS line into the bench artifact, so
    // BENCH_r{N}.json is self-describing about suite size (doc counts
    // cite COUNTS; the bench JSON can now be cross-checked against it)
    val action = if (LegacyCountAction) "count" else "plan"
    val fullJson = s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_errors":$nErrors,"action":"$action","queries":$qs,"telemetry":$tel,"sink_write":$sw,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","sf":"$sfDir"}"""
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_BENCH_JSON", "bench_runs/bench_full.json"))
    Option(fullPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(fullPath,
      (fullJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // compact stdout line: totals + the 5 slowest query medians (for
    // at-a-glance triage) + the path of the full artifact. ~400 chars for
    // a 200-query suite — well inside the 2000-char driver tail.
    val medQ = {
      val ms = results.values.collect {
        case s if s.err.isEmpty => s.median }.toSeq.sorted
      if (ms.isEmpty) -1.0 else ms(ms.size / 2)
    }
    val top5 = results.toSeq.filter(_._2.err.isEmpty)
      .sortBy(-_._2.median).take(5)
      .map { case (k, v) => "\"" + k + "\":" + f3(v.median) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_errors":$nErrors,"median_query":${f3(medQ)},"action":"$action","slowest":$top5,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","sf":"$sfDir","full_json":"${fullPath.toString}"}""")
    if (nErrors > 0) {
      Console.err.println(s"BENCH RED: $nErrors queries errored")
      sys.exit(1)
    }
  }
}
