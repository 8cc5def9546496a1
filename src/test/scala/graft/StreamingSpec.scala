package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

/** §2.10 — streaming variants agree with their batch counterparts when
  * driven to completion over the same fixture (memory sink). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("tumbling windowed aggregation matches batch groupBy") {
    // complete mode: append would hold back the last (unfinalized)
    // window — watermark semantics, not a bug.
    val streamed = StreamOps.runOnce(spark, sf, "win_agg",
      ev => StreamOps.windowedAgg(ev, width = "1 hour", watermark = "0 seconds"),
      outputMode = "complete")
    val batch = graft.core.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.agg(sum("n")).head.getLong(0) ===
      batch.agg(sum("n")).head.getLong(0))
    assert(streamed.count() === batch.count())
  }

  test("session windows produce the same session count as gaps-and-islands") {
    val streamed = StreamOps.runOnce(spark, sf, "sess_agg",
      ev => StreamOps.sessionAgg(ev, gap = "30 minutes", watermark = "0 seconds"),
      outputMode = "complete")
    val batchSessions = graft.ops.TsOps.sessionize(
      graft.core.Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t_us")),
      Seq("user_id"), "t_us", "event_id", 1800000000L)
      .select("user_id", "session").distinct().count()
    assert(streamed.count() === batchSessions)
  }

  test("watermark drops late data in append mode (declared §2.10 contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{window => twindow}
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
    val agg = df.withWatermark("ts", "10 minutes")
      .groupBy(twindow(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("late_demo")
      .outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    mem.addData((t(0), 1.0), (t(5), 2.0))     // window [10:00,10:10)
    q.processAllAvailable()
    mem.addData((t(40), 3.0))                  // advances watermark to 10:30
    q.processAllAvailable()
    mem.addData((t(1), 99.0))                  // LATE: before the watermark
    q.processAllAvailable()
    mem.addData((t(55), 4.0))                  // pushes watermark past 10:40
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_demo").collect()
    // the finalized [10:00,10:10) window must count 2 — the late event
    // at 10:01 was dropped, not merged
    val w0 = rows.find(_.getStruct(0).getTimestamp(0).toString.contains("10:00"))
    assert(w0.isDefined, s"first window missing: ${rows.mkString(";")}")
    assert(w0.get.getAs[Long]("n") === 2L)
  }

  test("stateful flare trigger fires on an injected spike train") {
    import spark.implicits._
    val E = 1704067200000000L
    val rows = (0 until 600).map { i =>
      val spike = if (i == 200 || i == 400) 50.0 else 0.0
      StreamOps.Ev(1L, i.toLong, E + i * 60000000L, 100.0 + spike + (i % 7) * 0.1)
    }
    val hits = StreamOps.flareTrigger(rows.toDS(), thr = 0.8).collect()
    assert(hits.exists(h => h.event_id == 200))
    assert(hits.exists(h => h.event_id == 400))
    assert(hits.length < 20, s"too many triggers: ${hits.length}")
  }
}
