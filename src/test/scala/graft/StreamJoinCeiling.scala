package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 verdict #4 — the st7 DUAL-SIDED JOIN-STATE experiment (one-off
  * manual runner, not part of `sbt test`): StreamCeiling (r9)
  * falsified the "~170 k rows/s engine constant" for stateful
  * aggregation, but st7's ×100 wall (110.4 s isolated at 10 M events)
  * was attributed to stream-stream join state WITHOUT a controlled
  * matrix. This runner reproduces the st7 shape — two watermarked
  * sides of one file stream, equi-join on user with a 6-hour range
  * predicate — at 10 M rows / 1500 users / 24 time-disjoint files,
  * and sweeps the same knobs:
  *
  *   - shuffle/state partitions 8 vs 32;
  *   - state-store provider default (HDFSBacked) vs RocksDB;
  *   - files-per-batch ladder 1 / 4 / 8 / 24 (24 = ONE AvailableNow
  *     batch — the watermark never advances mid-batch, so both full
  *     streams buffer in the join state before any eviction: the
  *     pathology the declared st7 caps mfpt at 8 to avoid);
  *   - watermark tightness 1 h (declared) vs 10 min (less state
  *     retained; results identical on an in-order stream);
  *   - a stateless pass-through (both filters, no join) separating
  *     scan+filter cost from the join-state kernel.
  *
  * Purchases are ~1% of events (id % 97 = 13 — coprime to the user
  * cycle, see the fixture note) so the 6-hour join output stays
  * bounded (~5.7 M pairs at 10 M rows); the sink is `noop`, so the
  * measured wall
  * is scan + shuffle + join-state, not sink materialization. Every
  * config must report the SAME output-row count (in-order arrival ⇒
  * no late data ⇒ watermark tightness and batching change state
  * size, never results).
  *
  * Run: `SPARK_DRIVER_MEM=24g sbt "Test/runMain graft.StreamJoinCeiling [nRows]"`
  * Results are recorded in BASELINE.md §stream-join-ceiling.
  */
object StreamJoinCeiling {
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

    // fixture: n rows over 1500 users, ascending event time (~30 d),
    // ~1% purchases, 24 time-disjoint files with ascending mtimes
    // (FileStreamSource batches by mtime ⇒ batches replay in
    // event-time order and cross-batch watermarks walk forward)
    // v2: purchase selector modulus (97) coprime to the user cycle —
    // v1 used id % 20 while user_id = (id·2654435761) mod 1500 with
    // 2654435761 ≡ 1 (mod 20), making purchase and click user sets
    // DISJOINT (any affine user map preserves the id-mod-20 class);
    // with 97 every user purchases every 97th of its events (~10.5 h
    // apart ⇒ ~0.6 matches per click in the 6 h window)
    val dir = new java.io.File(sys.props("java.io.tmpdir"), s"graft_stream_join_v2_$n")
    if (!new java.io.File(dir, "_done").exists()) {
      org.apache.commons.io.FileUtils.deleteQuietly(dir)
      spark.range(n).toDF("event_id").selectExpr(
          "event_id",
          "pmod(event_id * 2654435761, 1500) AS user_id",
          "timestamp_micros(1704067200000000 + event_id * 259200) AS ts", // ~30 d
          "CASE WHEN event_id % 97 = 13 THEN 'purchase' ELSE 'click' END AS event_type")
        .withColumn("part", expr(s"event_id div ${n / 24 + 1}"))
        .repartitionByRange(24, col("part"))
        .sortWithinPartitions("event_id")
        .drop("part")
        .write.mode("overwrite").parquet(dir.toString)
      val parts = dir.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L) }
      java.nio.file.Files.write(new java.io.File(dir, "_done").toPath, "1".getBytes)
    }
    val schema = spark.read.parquet(dir.toString).schema

    var runId = 0
    def run(label: String, partitions: Int, provider: String,
            mfpt: Int, wmDelay: String, joined: Boolean): Long = {
      runId += 1
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      // r11 (ADVICE): recentProgress is capped at
      // numRecentProgressUpdates (default 100) — at mfpt=1 with a
      // bigger n the summed output-row count would silently
      // undercount. Retain every batch's progress (24-file fixture ⇒
      // ≤ 24 batches + idle ticks, far under 10000), and the matrix
      // asserts the same-count invariant below instead of just
      // printing it.
      ss.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
      if (provider == "rocksdb")
        ss.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // def, not val: two INDEPENDENT readStream instances (the st7
      // shape) — each side scans the files itself; a single shared
      // instance would make this a stream self-join, a different plan
      def src = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", mfpt.toString)
        .parquet(s"$dir/*.parquet")
      val clicks = src.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", wmDelay)
      val buys = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("b_ts"))
        .withWatermark("b_ts", wmDelay)
      val out =
        if (joined)
          clicks.join(buys,
            col("user_id") === col("b_user") &&
            col("b_ts") >= col("c_ts") &&
            col("b_ts") <= col("c_ts") + expr("INTERVAL 6 HOURS"))
        else clicks // stateless baseline: same scan + filter, no join state
      val t0 = System.nanoTime()
      val q = out
        .writeStream.format("noop")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dt = (System.nanoTime() - t0) / 1e9
      val rows = q.recentProgress.map(p => p.sink.numOutputRows max 0L).sum
      println(f"[joinceil] $label%-36s partitions=$partitions%-3d provider=$provider%-7s " +
        f"mfpt=$mfpt%-2d wm=$wmDelay%-7s  $rows%9d rows  $dt%7.2f s  ${n / dt / 1e3}%7.0f krows-in/s")
      System.gc()
      rows
    }

    // JIT warm-up outside the comparison
    run("warmup-stateless", 32, "default", 8, "1 hour", joined = false)
    run("warmup-join", 32, "default", 8, "1 hour", joined = true)
    println("== matrix ==")
    run("stateless-baseline (clicks only)", 32, "default", 8, "1 hour", joined = false)
    val joinedRows = Seq(
      run("declared-shape (st7 config)", 32, "default", 8, "1 hour", joined = true),
      run("partitions-8", 8, "default", 8, "1 hour", joined = true),
      run("rocksdb-32", 32, "rocksdb", 8, "1 hour", joined = true),
      run("rocksdb-8", 8, "rocksdb", 8, "1 hour", joined = true),
      run("batch-ladder mfpt=1 (24 batches)", 32, "default", 1, "1 hour", joined = true),
      run("batch-ladder mfpt=4 (6 batches)", 32, "default", 4, "1 hour", joined = true),
      run("batch-ladder mfpt=24 (1 batch: buffer-all)", 32, "default", 24, "1 hour", joined = true),
      run("watermark-10min", 32, "default", 8, "10 minutes", joined = true))
    // the scaladoc invariant, ENFORCED: in-order arrival ⇒ no late
    // data ⇒ every joined config must emit the identical pair count
    require(joinedRows.distinct.size == 1,
      s"joined configs disagree on output rows: $joinedRows")
    println(s"[joinceil] invariant OK: all ${joinedRows.size} joined configs " +
      s"emitted ${joinedRows.head} rows")
    spark.stop()
  }
}
