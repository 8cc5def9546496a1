package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r9 verdict #6 — the streaming-ceiling EXPERIMENT (one-off manual
  * runner, not part of `sbt test`): BASELINE.md attributes st7/st14's
  * 100× walls to a ~160–180 k rows/s micro-batch engine constant.
  * That was an assertion; this runner makes it evidence (or finds the
  * knob that moves it). Matrix over the st14 shape (the purest
  * engine-throughput case: output = every input row through one
  * flatMapGroupsWithState kernel, state 1 row/user):
  *
  *   - shuffle/state partitions 8 (the declared queries' setting) vs
  *     32 vs 200;
  *   - state-store provider: default (HDFSBackedStateStore, in-memory
  *     + file sync) vs RocksDB;
  *   - micro-batch size ladder: 24 files at maxFilesPerTrigger
  *     1 / 8 / 24 → 24 / 3 / 1 batches over the same 10 M rows;
  *   - a STATELESS pass-through (same source → memory sink, no
  *     state) separating engine overhead from the stateful kernel.
  *
  * Run: `SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.StreamCeiling [nRows]"`
  * Results are recorded in BASELINE.md §streaming-ceiling.
  */
object StreamCeiling {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fixture: n rows over 1500 users, ascending event time, 24
    // time-disjoint files with ascending mtimes (the arrival
    // contract: FileStreamSource batches by mtime, so batches replay
    // in event-time order and cross-batch state walks forward)
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_stream_ceiling_$n")
    if (!new java.io.File(dir, "_done").exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      spark.range(n).toDF("event_id").selectExpr(
          "event_id",
          "pmod(event_id * 2654435761, 1500) AS user_id",
          "1704067200000000 + event_id * 25920 AS tUs", // ~30 d span
          "pmod(event_id * 104729, 20000) AS vc")
        .withColumn("part", expr(s"event_id div ${n / 24 + 1}"))
        .repartitionByRange(24, col("part"))
        .sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(dir.toString)
      val parts = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      java.nio.file.Files.write(new java.io.File(dir, "_done").toPath, "1".getBytes)
    }
    val schema = spark.read.parquet(dir.toString).schema

    var runId = 0
    def run(label: String, partitions: Int, provider: String,
            mfpt: Int, stateless: Boolean): Unit = {
      runId += 1
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      if (provider == "rocksdb")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import ss.implicits._
      val src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", mfpt.toString)
        .parquet(s"$dir/*.parquet")
        .select(col("user_id"), col("event_id"), col("tUs"), col("vc"))
      val sink = s"ceil_$runId"
      val t0 = System.nanoTime()
      val q = (if (stateless) src
               else graft.streaming.StreamOps.streamEwma(src.as[graft.streaming.StreamOps.EvC]).toDF())
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = ss.table(sink).count()
      println(f"[ceiling] $label%-34s partitions=$partitions%-3d provider=$provider%-7s " +
        f"mfpt=$mfpt%-2d  $rows%9d rows  $dt%7.2f s  ${rows / dt / 1e3}%7.0f krows/s")
      ss.sql(s"DROP TABLE IF EXISTS $sink")
      System.gc()
    }

    // JIT warm-up outside the comparison (small stateless + stateful)
    run("warmup-stateless", 8, "default", 24, stateless = true)
    run("warmup-stateful", 8, "default", 24, stateless = false)
    println("== matrix ==")
    run("stateless-baseline", 8, "default", 8, stateless = true)
    run("declared-shape (st14 config)", 8, "default", 8, stateless = false)
    run("partitions-32", 32, "default", 8, stateless = false)
    run("partitions-200", 200, "default", 8, stateless = false)
    run("rocksdb", 8, "rocksdb", 8, stateless = false)
    run("rocksdb-32", 32, "rocksdb", 8, stateless = false)
    run("batch-ladder mfpt=1 (24 batches)", 8, "default", 1, stateless = false)
    run("batch-ladder mfpt=24 (1 batch)", 8, "default", 24, stateless = false)
    spark.stop()
  }
}
