package graft

import org.apache.spark.sql.functions._

/** Extra benchmarks + plan dumps for the optimization round (guide §1:
  * measure first; §1.4: isolate the computation being timed). NOT part of
  * the driver metric — `Bench.scala` is frozen; this main isolates the two
  * timed paths (index build, batched query) so a change can be A/B'd in
  * minutes instead of a full multi-child Bench run, and dumps
  * `.explain("formatted")` for the declared contract queries
  * (plans/r06/<query>_{before,after}.txt evidence).
  *
  * Usage:
  *   runMain graft.BenchExtra build <cpus> <scale> <reps>
  *   runMain graft.BenchExtra query <cpus> <scale> <reps> <qreps>
  *   runMain graft.BenchExtra plans <suffix> [queryName ...]
  */
object BenchExtra {

  /** Same config the frozen bench uses (Bench.main), duplicated because
    * that one is a local value inside the frozen main. */
  def benchCfg: IndexBuild.Config = IndexBuild.Config(numPartitions = 64,
    bucketWidth = 4096, headDf = 1000, blockSize = Codec.BlockSize,
    headSampleInv = 32, flushEntries = 1000000L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def timed(body: => Unit): Double = {
      val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
    }
    args.headOption match {
      case Some("build") =>
        val Array(_, c, sc, nr) = args
        val spark = Bench.session(c.toInt)
        try {
          val base = Stats.readDocuments(spark, sfDir)
          val baseRow = base.agg(count(lit(1)), sum(octet_length(col("text")))).head()
          val docs = Bench.scaleUp(base, sc.toInt, baseRow.getLong(0), slices = 64,
            baseBytes = baseRow.getLong(1))
          val dir = "/root/repo/target/benchextra-index"
          val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
          // warmup at 1/8 scale (JIT), untimed
          val warmDocs = Bench.scaleUp(base, math.max(1, sc.toInt / 8),
            baseRow.getLong(0), slices = 64, baseBytes = baseRow.getLong(1))
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
          IndexBuild.writeIndex(spark, warmDocs, dir, benchCfg)
          val secs = (1 to nr.toInt).map { _ =>
            fs.delete(new org.apache.hadoop.fs.Path(dir), true)
            timed(IndexBuild.writeIndex(spark, docs, dir, benchCfg))
          }
          val nDocs = baseRow.getLong(0) * sc.toInt
          println(f"""{"extra":"build","cpus":${c.toInt},"n_docs":$nDocs,"secs":[${secs.map(s => f"$s%.3f").mkString(",")}],"best_docs_per_sec":${nDocs / secs.min}%.0f}""")
        } finally spark.stop()

      case Some("query") =>
        val Array(_, c, sc, nr, qr) = args
        val spark = Bench.session(c.toInt)
        try {
          val base = Stats.readDocuments(spark, sfDir)
          val baseRow = base.agg(count(lit(1)), sum(octet_length(col("text")))).head()
          val docs = Bench.scaleUp(base, sc.toInt, baseRow.getLong(0), slices = 64,
            baseBytes = baseRow.getLong(1))
          val dir = "/root/repo/target/benchextra-index"
          val serveDir = "/root/repo/target/benchextra-serve"
          val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
          Seq(dir, serveDir).foreach(d =>
            fs.delete(new org.apache.hadoop.fs.Path(d), true))
          IndexBuild.writeIndex(spark, docs, dir, benchCfg)
          IndexBuild.deriveDocPartitioned(spark, dir, serveDir)
          val handle = QueryEngine.openIndex(spark, serveDir)
          QueryEngine.runOnHandle(spark, handle, QuerySet.queryTerms).count() // warm
          val batch = Bench.queryBatch(qr.toInt)
          var hits = 0L
          val secs = (1 to nr.toInt).map { _ =>
            timed { hits = QueryEngine.runOnHandle(spark, handle, batch).count() }
          }
          println(f"""{"extra":"query","cpus":${c.toInt},"nq":${batch.size},"secs":[${secs.map(s => f"$s%.3f").mkString(",")}],"best_ms_per_q":${secs.min * 1000 / batch.size}%.3f,"hits":$hits}""")
        } finally spark.stop()

      case Some("timeq") =>
        // Wall time of every declared contract query at a driver-like SF
        // (build side effects + one count() action), to find outliers in
        // the correctness surface. Usage: timeq <sfDir> [names...]
        val qsf = args(1)
        val names = if (args.length > 2) args.drop(2).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[8]")
          .config("spark.sql.shuffle.partitions", "8")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.local.dir", Bench.localDir)
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        try {
          val rows = names.map { n =>
            val t0 = System.nanoTime()
            val c = SparkEntry.queries(n)(spark, qsf).count()
            val s = (System.nanoTime() - t0) / 1e9
            println(f"$n%-28s ${s}%7.2fs rows=$c")
            (n, s)
          }
          println(f"TOTAL ${rows.map(_._2).sum}%.1fs")
        } finally spark.stop()

      case Some("plans") =>
        // .explain("formatted") of declared contract queries at sf0.001 —
        // the judge's evidence files (plans/r06/). Building the DataFrame
        // runs any index-build side effects; the final query itself is
        // only planned, not executed.
        val suffix = args(1)
        val names = if (args.length > 2) args.drop(2).toSeq
                    else SparkEntry.queries.keys.toSeq.sorted
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[8]")
          .config("spark.sql.shuffle.partitions", "8")
          .config("spark.ui.enabled", "false")
          .config("spark.local.dir", Bench.localDir)
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val outDir = java.nio.file.Paths.get("/root/repo/plans/r06")
        java.nio.file.Files.createDirectories(outDir)
        try names.foreach { n =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
          println(f"$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
        } finally spark.stop()

      case _ =>
        System.err.println("usage: BenchExtra build|query|plans ...")
        sys.exit(2)
    }
  }
}
