package graft

import org.apache.spark.sql.functions._

/** Same-JVM A/B harness for build-config variants (NOT part of the
  * driver contract). The shared host swings 2× between runs, so config
  * comparisons are only meaningful when variants alternate inside ONE
  * session/window with best-of-N each — this main does exactly that and
  * prints one line per variant.
  *
  *   AB_CPUS=16 SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchAb"
  *
  * AB_MODE=codec compares the posting codecs (VByte vs PForDelta) on the
  * full lifecycle: timed term-index build, segments bytes on disk, and
  * timed batched query over the derived serving layout.
  */
object BenchAb {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("AB_CPUS", "16").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "800").toInt
    val reps = sys.env.getOrElse("AB_REPS", "3").toInt
    val mode = sys.env.getOrElse("AB_MODE", "partitions")
    val spark = Bench.session(cpus)
    val base = Stats.readDocuments(spark, sfDir)
    val row = base.agg(count(lit(1)), sum(octet_length(col("text")))).head()
    val baseN = row.getLong(0)
    val docs = Bench.scaleUp(base, scale, baseN, slices = cpus * 4,
      baseBytes = row.getLong(1))
    def cfg(p: Int, codec: Int = Codec.VByteId) = IndexBuild.Config(
      numPartitions = p, bucketWidth = 4096, headDf = 1000,
      blockSize = Codec.BlockSize, headSampleInv = 32, codec = codec)
    val variants: Seq[(String, IndexBuild.Config)] =
      if (mode == "codec")
        Seq("vbyte" -> cfg(64), "pfor" -> cfg(64, Codec.PForId))
      else
        Seq("P32" -> cfg(32), "P64" -> cfg(64), "P128" -> cfg(128), "P256" -> cfg(256))
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = s"/root/repo/target/ab-index-c$cpus"
    val serveDir = s"/root/repo/target/ab-serve-c$cpus"
    def timedBuild(c: IndexBuild.Config): Double = {
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      val t = System.nanoTime()
      IndexBuild.writeIndex(spark, docs, dir, c)
      (System.nanoTime() - t) / 1e9
    }
    // warmup: tiny build + one full-size build (JIT + page cache)
    IndexBuild.writeIndex(spark, base, dir + "-warm", variants.head._2)
    timedBuild(variants.head._2)
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val qtimes = scala.collection.mutable.Map.empty[String, List[Double]]
    val sizes = scala.collection.mutable.Map.empty[String, Long]
    val batch = Bench.queryBatch(sys.env.getOrElse("SPARK_GRAFT_QREPS", "50").toInt)
    for (_ <- 1 to reps; (name, c) <- variants) {
      val s = timedBuild(c)
      times(name) = s :: times.getOrElse(name, Nil)
      if (mode == "codec") {
        sizes(name) = fs.getContentSummary(
          new org.apache.hadoop.fs.Path(s"$dir/segments")).getLength
        // raw block bytes BEFORE parquet page compression: the scaled
        // bench corpus is an N× replica, so byte-aligned VByte streams
        // repeat verbatim and snappy erases them; raw size is the
        // codec-vs-codec number that transfers to non-replicated text
        if (!sizes.contains(name + "_raw")) {
          import spark.implicits._
          sizes(name + "_raw") = IndexBuild.readSegments(spark, dir)
            .map(r => r.blocks.iterator.map(_.bytes.length.toLong).sum)
            .reduce(_ + _)
        }
        fs.delete(new org.apache.hadoop.fs.Path(serveDir), true)
        IndexBuild.deriveDocPartitioned(spark, dir, serveDir)
        val handle = QueryEngine.openIndex(spark, serveDir)
        QueryEngine.runOnHandle(spark, handle, QuerySet.queryTerms).count() // warm
        val tq = System.nanoTime()
        QueryEngine.runOnHandle(spark, handle, batch).count()
        val qs = (System.nanoTime() - tq) / 1e9
        handle.close() // release the serving cache: this loop opens reps × variants handles
        qtimes(name) = qs :: qtimes.getOrElse(name, Nil)
        System.err.println(f"[ab] $name build=$s%.2fs query=$qs%.2fs bytes=${sizes(name)}")
      } else System.err.println(f"[ab] $name $s%.2fs")
    }
    variants.foreach { case (name, _) =>
      val ts = times(name)
      val extra =
        if (mode == "codec")
          f" segBytes=${sizes(name)} rawBytes=${sizes(name + "_raw")} " +
            f"queryBest=${qtimes(name).min}%.2fs " +
            f"qAll=${qtimes(name).map(t => f"$t%.1f").mkString(",")}"
        else ""
      println(f"AB $name best=${ts.min}%.2fs all=${ts.map(t => f"$t%.1f").mkString(",")}$extra")
    }
    spark.stop()
  }
}
