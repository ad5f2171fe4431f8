package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps
import graft.sources.{FeedXml, LogLines}
import graft.multimodal.BinaryMeta

class StreamingSourcesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("src05 OTLP envelope flattening inherits resource/scope context per record") {
    import graft.sources.OtlpEnvelope
    def rec(sev: Int, body: String) = (ts(0), sev, body, Map("k" -> "v"))
    def scope(name: String, recs: Seq[(Timestamp, Int, String, Map[String, String])]) = (name, recs)
    val env = Seq(Tuple1(Seq(
      (Map("service.name" -> "alt-backend"),
        Seq(scope("scopeA", Seq(rec(9, "ok"), rec(17, "boom"))),
            scope("scopeB", Seq(rec(21, "fatal"))))),
      (Map("service.name" -> "pre-processor"),
        Seq(scope("scopeC", Seq(rec(5, "debug")))))
    ))).toDF("resource_logs")
      .select(col("resource_logs").cast(
        "array<struct<resource_attrs:map<string,string>,scope_logs:array<struct<scope_name:string," +
        "log_records:array<struct<ts:timestamp,severity_number:int,body:string,attrs:map<string,string>>>>>>>"))
    val flat = OtlpEnvelope.flattenLogs(env)
    assert(flat.count() == 4)
    val byBody = flat.collect().map(r => r.getAs[String]("body") ->
      (r.getAs[Map[String, String]]("resource_attrs")("service.name"), r.getAs[String]("scope_name"))).toMap
    assert(byBody("boom") == ("alt-backend", "scopeA"))
    assert(byBody("fatal") == ("alt-backend", "scopeB"))
    assert(byBody("debug") == ("pre-processor", "scopeC"))
    val roll = OtlpEnvelope.severityRollup(flat).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(roll("alt-backend") == (3L, 2L)) // sev 17 and 21 are errors
    assert(roll("pre-processor") == (1L, 0L))
  }

  test("st01 windowed counts aggregate by tumbling window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = StreamOps.windowedCounts(
      mem.toDF.toDF("ts", "event_type"), "10 minutes", "30 minutes")
    val q = df.writeStream.format("memory").queryName("st01").outputMode("append").start()
    try {
      mem.addData((ts(0), "view"), (ts(1), "view"), (ts(2), "error"))
      q.processAllAvailable()
      mem.addData((ts(120), "view")) // advances watermark past first window
      q.processAllAvailable()
      val rows = spark.sql("SELECT event_type, n FROM st01").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.get("view").contains(2L) && rows.get("error").contains(1L))
    } finally q.stop()
  }

  test("st09 streaming top-k emits bounded summaries per closed window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = StreamOps.windowedTopK(
      mem.toDF.toDF("ts", "user"), "user", k = 2, capacity = 16,
      windowLen = "10 minutes", watermark = "30 minutes")
    val q = df.writeStream.format("memory").queryName("st09").outputMode("append").start()
    try {
      mem.addData((ts(0), "u1"), (ts(1), "u1"), (ts(2), "u1"), (ts(3), "u2"), (ts(4), "u3"))
      q.processAllAvailable()
      mem.addData((ts(120), "u9")) // advances watermark past the first window
      q.processAllAvailable()
      val rows = spark.sql("SELECT rank, item, est, err FROM st09 ORDER BY rank").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(1) == "u1" && rows(0).getLong(2) == 3L && rows(0).getLong(3) == 0L)
      assert(rows(1).getInt(0) == 2 && rows(1).getLong(2) == 1L)
    } finally q.stop()
  }

  test("src06 jsonl parse quarantines malformed lines with the raw text intact") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("service", StringType), StructField("level", StringType),
      StructField("ms", LongType)))
    val lines = Seq(
      """{"service":"api","level":"info","ms":12}""",
      """{"service":"db","level":"error","ms":40}""",
      """not json at all""",
      """{"service":"api","level":""", // truncated
      "", // blank lines must quarantine, not surface as all-null rows
      "   ",
      """{"service":"worker","level":"info","ms":7}""")
      .toDF("value")
    val good = graft.sources.JsonLines.parsed(lines, schema).collect()
    assert(good.length == 3)
    assert(good.map(_.getAs[String]("service")).sorted.toSeq == Seq("api", "db", "worker"))
    val bad = graft.sources.JsonLines.quarantine(lines, schema).collect()
      .map(_.getAs[String]("raw_line"))
    assert(bad.toSet == Set("not json at all", """{"service":"api","level":""", "", "   "))
  }

  test("st10 native session_window merges events within the gap and splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val df = StreamOps.sessionWindowCounts(
      mem.toDF.toDF("ts", "user_id"), gap = "10 minutes", watermark = "30 minutes")
    val q = df.writeStream.format("memory").queryName("st10").outputMode("append").start()
    try {
      // u1: two events 5 min apart (one session), a third 40 min later (new session)
      mem.addData((ts(0), 1L), (ts(5), 1L), (ts(45), 1L), (ts(3), 2L))
      q.processAllAvailable()
      mem.addData((ts(240), 9L)) // push watermark past all sessions
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, n_events FROM st10 WHERE user_id = 1 ORDER BY session_start")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq == Seq((1L, 2L), (1L, 1L)), rows.mkString(","))
      val u2 = spark.sql("SELECT n_events FROM st10 WHERE user_id = 2").collect()
      assert(u2.map(_.getLong(0)).toSeq == Seq(1L))
    } finally q.stop()
  }

  test("st08 stream-stream interval join matches views within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val df = StreamOps.purchaseAfterViewStream(
      views.toDF.toDF("user_id", "event_id", "ts"),
      purchases.toDF.toDF("user_id", "event_id", "ts"),
      joinWindowSec = 600, watermark = "30 minutes")
    val q = df.writeStream.format("memory").queryName("st08").outputMode("append").start()
    try {
      // user 1: purchase at t9 matches views at t0 and t8 (<= 10 min
      // back); purchase at t20 matches neither (12 and 20 min back);
      // user 2: view AFTER the purchase never matches
      views.addData((1L, 100L, ts(0)), (1L, 101L, ts(8)), (2L, 200L, ts(15)))
      purchases.addData((1L, 900L, ts(9)), (1L, 901L, ts(20)), (2L, 902L, ts(10)))
      q.processAllAvailable()
      val rows = spark.sql("SELECT purchase_id, view_id FROM st08").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((900L, 100L), (900L, 101L)), rows.toString)
    } finally q.stop()
  }

  test("st07 streaming error rate emits closed windows with correct ratios") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = StreamOps.windowedErrorRate(
      mem.toDF.toDF("ts", "event_type"), "10 minutes", "30 minutes")
    val q = df.writeStream.format("memory").queryName("st07").outputMode("append").start()
    try {
      mem.addData((ts(0), "view"), (ts(1), "error"), (ts(2), "view"), (ts(3), "error"))
      q.processAllAvailable()
      mem.addData((ts(120), "view")) // push watermark, close first window
      q.processAllAvailable()
      val rows = spark.sql("SELECT n_errors, n_total, error_rate FROM st07").collect()
      assert(rows.exists(r => r.getLong(0) == 2 && r.getLong(1) == 4 && r.getDouble(2) == 0.5),
        rows.mkString(","))
    } finally q.stop()
  }

  test("st03 streaming dedup drops redelivered events") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = StreamOps.dedupStream(mem.toDF.toDF("event_id", "ts"))
    val q = df.writeStream.format("memory").queryName("st03").outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM st03").head.getLong(0) == 3L)
    } finally q.stop()
  }

  test("st12 keyed dedup drops a re-stamped redelivery that st03's form would keep") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    // event 1 delivered, then redelivered 5 min later with a NEW timestamp
    mem.addData((1L, ts(0)), (2L, ts(1)))
    mem.addData((1L, ts(5)))
    val out = StreamOps.dedupStreamKeyed(mem.toDF.toDF("event_id", "ts"))
    val q = out.writeStream.format("memory").queryName("st12_out")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val ids = spark.table("st12_out").collect().map(_.getAs[Long]("event_id"))
    assert(ids.sorted.sameElements(Array(1L, 2L)), ids.mkString(","))
  }

  test("st02 stateful sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.SessionInput]
    val out = StreamOps.sessionize(mem.toDS(), gapSec = 600, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("st02").outputMode("append").start()
    try {
      // user 7: two events close together, then a 40-min gap, then one more
      mem.addData(StreamOps.SessionInput(7L, ts(0)), StreamOps.SessionInput(7L, ts(5)))
      q.processAllAvailable()
      mem.addData(StreamOps.SessionInput(7L, ts(45)))
      q.processAllAvailable()
      mem.addData(StreamOps.SessionInput(7L, ts(120))) // push watermark
      q.processAllAvailable()
      val sessions = spark.sql("SELECT user_id, n_events FROM st02").collect()
      assert(sessions.exists(r => r.getLong(0) == 7L && r.getInt(1) == 2),
        s"expected closed 2-event session, got ${sessions.mkString(",")}")
    } finally q.stop()
  }

  test("st02 late in-watermark event extends the session START") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.SessionInput]
    val out = StreamOps.sessionize(mem.toDS(), gapSec = 600, watermark = "30 minutes")
    val q = out.writeStream.format("memory").queryName("st02b").outputMode("append").start()
    try {
      mem.addData(StreamOps.SessionInput(9L, ts(10)))
      q.processAllAvailable()
      mem.addData(StreamOps.SessionInput(9L, ts(5))) // late, within watermark + gap
      q.processAllAvailable()
      mem.addData(StreamOps.SessionInput(9L, ts(120))) // push watermark, close session
      q.processAllAvailable()
      val s = spark.sql("SELECT start, n_events FROM st02b WHERE user_id = 9").collect()
      assert(s.exists(r => r.getTimestamp(0).getTime == ts(5).getTime && r.getInt(1) == 2),
        s"expected session starting at the late event, got ${s.mkString(",")}")
    } finally q.stop()
  }

  test("st02 consecutive late events merge into one late session") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.SessionInput]
    val out = StreamOps.sessionize(mem.toDS(), gapSec = 600, watermark = "4 hours")
    val q = out.writeStream.format("memory").queryName("st02c").outputMode("append").start()
    try {
      mem.addData(StreamOps.SessionInput(11L, ts(180)))
      q.processAllAvailable()
      // two late events, within the gap of EACH OTHER but far before the
      // open session — must close as ONE 2-event session, not two singles
      mem.addData(StreamOps.SessionInput(11L, ts(0)), StreamOps.SessionInput(11L, ts(5)))
      q.processAllAvailable()
      val s = spark.sql("SELECT n_events FROM st02c WHERE user_id = 11").collect()
      assert(s.map(_.getInt(0)).toSeq == Seq(2), s.mkString(","))
    } finally q.stop()
  }

  test("st04 stream-static enrichment join") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val out = StreamOps.enrich(mem.toDF.toDF("user_id", "value"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("st04").outputMode("append").start()
    try {
      mem.addData((1L, 10.0), (2L, 5.0), (3L, 1.0)) // user 3 has no dim row
      q.processAllAvailable()
      val rows = spark.sql("SELECT user_id, tier FROM st04").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == Map(1L -> "gold", 2L -> "basic")) // inner join drops 3
    } finally q.stop()
  }

  test("src01 log line parsing + rollup") {
    val lines = Seq(
      "2026-01-15T10:00:00.123Z INFO alt-backend request served path=/v1/feeds",
      "2026-01-15T10:00:01.000Z ERROR alt-backend upstream timeout",
      "2026-01-15T10:00:02.000Z INFO news-creator summary generated",
      "not a structured line at all").toDF("value")
    val parsed = LogLines.parse(lines)
    assert(parsed.count() == 4)
    assert(parsed.filter(col("level").isNull).count() == 1) // unparseable kept
    // matching-but-invalid timestamp token must not crash (ANSI cast)
    val weird = LogLines.parse(Seq("stdout INFO svc msg").toDF("value")).collect()
    assert(weird.length == 1 && weird.head.isNullAt(0))
    val counts = LogLines.levelCounts(parsed).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts.get(("alt-backend", "INFO")).contains(1L))
    assert(counts.get(("alt-backend", "ERROR")).contains(1L))
  }

  test("src02 feed xml → articles") {
    val items = Seq(
      ("https://example.org/feed",
       "<item><title>Hello</title><link>https://example.org/a1</link>" +
       "<pubDate>Mon, 05 Jan 2026 10:00:00 +0000</pubDate>" +
       "<description>first post</description></item>"),
      ("https://example.org/feed",
       "<item><title>World</title><link>https://example.org/a2</link>" +
       "<pubDate>Tue, 06 Jan 2026 11:30:00 +0000</pubDate>" +
       "<description>second post</description></item>")
    ).toDF("feed_url", "item_xml")
    val arts = FeedXml.articles(items).collect()
    assert(arts.length == 2)
    // RFC-822 named zone + 1-digit day (the RSS 2.0 spec's own example
    // shape) and garbage must both survive parsing
    val extra = FeedXml.articles(Seq(
      ("f", "<item><title>T</title><link>u1</link>" +
            "<pubDate>Wed, 2 Oct 2002 13:00:00 GMT</pubDate><description>d</description></item>"),
      ("f", "<item><title>U</title><link>u2</link>" +
            "<pubDate>not a date</pubDate><description>d</description></item>")).toDF("feed_url", "item_xml"))
      .collect()
    assert(extra.find(_.getAs[String]("title") == "T").get.getAs[Timestamp]("published_at") != null)
    assert(extra.find(_.getAs[String]("title") == "U").get.getAs[Timestamp]("published_at") == null)
    val a1 = arts.find(_.getAs[String]("title") == "Hello").get
    assert(a1.getAs[String]("link") == "https://example.org/a1")
    assert(a1.getAs[Timestamp]("published_at") != null)
    assert(arts.map(_.getAs[Long]("article_id")).distinct.length == 2)
  }

  test("st05 end-to-end: file log stream → parse → per-service error counts") {
    // the rask-log-forwarder → ClickHouse SLI pipeline as one streaming
    // query: text file source → LogLines.parse → rollup → sink
    val dir = java.nio.file.Files.createTempDirectory("graft-logs").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "a.log").toPath,
      """2026-01-15T10:00:00.000Z INFO alt-backend ok
        |2026-01-15T10:00:01.000Z ERROR alt-backend boom
        |2026-01-15T10:00:02.000Z ERROR news-creator fail
        |garbage line
        |""".stripMargin)
    val stream = spark.readStream.text(dir.getAbsolutePath)
    val counts = LogLines.levelCounts(LogLines.parse(stream))
    val q = counts.writeStream.format("memory").queryName("st05")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT service, level, n FROM st05").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(rows.get(("alt-backend", "ERROR")).contains(1L))
      assert(rows.get(("news-creator", "ERROR")).contains(1L))
      assert(rows.get(("alt-backend", "INFO")).contains(1L))
    } finally q.stop()
  }

  test("st06 foreachBatch projection maintains latest state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-proj").toFile.getAbsolutePath + "/proj"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = StreamOps.maintainProjection(
      mem.toDF.toDF("user_id", "ts", "state"), "user_id", "ts", path)
    try {
      mem.addData((1L, ts(0), "created"), (2L, ts(1), "created"))
      q.processAllAvailable()
      mem.addData((1L, ts(10), "updated")) // newer state for user 1
      q.processAllAvailable()
      mem.addData((2L, ts(0), "stale"))    // OLDER than user 2's state — must not win
      q.processAllAvailable()
      val proj = spark.read.parquet(path).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(proj == Map(1L -> "updated", 2L -> "created"), proj.toString)
    } finally q.stop()
  }

  test("src04 ingestion pipeline: parse → strip → quality gate → dedup") {
    def item(link: String, date: String, desc: String) =
      s"<item><title>T</title><link>$link</link><pubDate>$date</pubDate>" +
      s"<description>$desc</description></item>"
    val items = Seq(
      ("f1", item("u1", "Mon, 05 Jan 2026 10:00:00 +0000",
        "<p>The quick &amp; clean article body here</p>")),
      ("f2", item("u2", "Tue, 06 Jan 2026 10:00:00 +0000",
        "The quick &amp; clean article body here")),   // same text post-strip, later date
      ("f1", item("u3", "Mon, 05 Jan 2026 11:00:00 +0000", "<b>ok</b>")) // fails quality gate
    ).toDF("feed_url", "item_xml")
    val corpus = graft.sources.Ingest.feedToCorpus(items).collect()
    assert(corpus.length == 1, corpus.mkString(","))
    val a = corpus.head
    assert(a.getAs[String]("link") == "u1") // earliest published copy wins
    assert(a.getAs[String]("text") == "The quick & clean article body here")
  }

  test("mm01 binary feature extraction is deterministic with typed schema") {
    val media = Seq(
      BinaryMeta.MediaRow(1L, "image", Array[Byte](1, 2, 3, 4)),
      BinaryMeta.MediaRow(2L, "image", Array[Byte](9, 9, 9)),
      BinaryMeta.MediaRow(3L, "audio", Array[Byte](5, 4, 3, 2, 1))).toDS()
    val feats = BinaryMeta.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.n_bytes).sameElements(Array(4, 3, 5)))
    assert(feats.forall(f => f.width >= 256 && f.height >= 256))
    // determinism: same input → same features
    val again = BinaryMeta.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.sameElements(again))
    val stats = BinaryMeta.featureStats(BinaryMeta.extractFeatures(media)).collect()
    assert(stats.map(_.getString(0)).toSet == Set("image", "audio"))
  }

  test("mm03 phash near-dup pairs: duplicate payloads pair at hamming 0, unrelated ones don't") {
    val payloadA = Array.tabulate(128)(i => (i * 7 % 127).toByte)
    val payloadB = Array.tabulate(128)(i => (i * 13 % 127).toByte)
    val media = Seq(
      BinaryMeta.MediaRow(1L, "image", payloadA),
      BinaryMeta.MediaRow(2L, "image", payloadA.clone), // exact duplicate
      BinaryMeta.MediaRow(3L, "image", payloadB),
      BinaryMeta.MediaRow(4L, "image", payloadB.reverse)).toDS()
    val pairs = BinaryMeta.phashPairs(media).collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"), r.getAs[Int]("hamming")))
    assert(pairs.toSeq == Seq((1L, 2L, 0)), pairs.mkString(","))
  }

  test("mm02 video frame sampling bounds output per asset and skips non-video") {
    val vid = Array.tabulate(64 * 30)(i => (i % 127).toByte) // 30 stub frames
    val media = Seq(
      BinaryMeta.MediaRow(1L, "video", vid),
      BinaryMeta.MediaRow(2L, "image", Array[Byte](1, 2, 3)),
      BinaryMeta.MediaRow(3L, "video", Array.tabulate(64 * 200)(_.toByte)) // long video
    ).toDS()
    val frames = BinaryMeta.sampleFrames(media, everyN = 10, maxFrames = 4)
      .collect().groupBy(_.media_id)
    assert(!frames.contains(2L)) // non-video skipped
    // 30 frames @ stride 10 -> indices 0,10,20
    assert(frames(1L).map(_.frame_idx).sorted.sameElements(Array(0, 10, 20)))
    // 200 frames capped at maxFrames
    assert(frames(3L).length == 4)
    // deterministic slices, 64 bytes each
    assert(frames(1L).forall(_.frame_bytes.length == 64))
    assert(frames(1L).find(_.frame_idx == 10).get.frame_bytes
      .sameElements(vid.slice(640, 704)))
  }

  test("mm04 audio chunking overlaps by window minus hop, bounds fan-out, keeps a short tail") {
    // 1000 samples of PCM16 (2000 bytes)
    val pcm = Array.tabulate(2000)(i => (i % 101).toByte)
    val media = Seq(
      BinaryMeta.MediaRow(1L, "audio", pcm),
      BinaryMeta.MediaRow(2L, "video", pcm),                    // non-audio skipped
      BinaryMeta.MediaRow(3L, "audio", Array.tabulate(2 * 100000)(_.toByte)) // long recording
    ).toDS()
    val wins = BinaryMeta.chunkAudio(media, windowSamples = 480, hopSamples = 320, maxWindows = 16)
      .collect().groupBy(_.media_id)
    assert(!wins.contains(2L))
    val w1 = wins(1L).sortBy(_.window_idx)
    // starts at 0, 320, 640, 960 (tail); 1000-sample asset -> 4 windows
    assert(w1.map(_.start_sample).sameElements(Array(0L, 320L, 640L, 960L)))
    assert(w1.map(_.n_samples).sameElements(Array(480, 480, 360, 40))) // tails truncate
    // consecutive windows share window-hop samples: window k's bytes from
    // offset hop must equal window k+1's head (sample overlap = 160)
    val shared = 480 - 320
    assert(w1(0).window_bytes.slice(320 * 2, 480 * 2)
      .sameElements(w1(1).window_bytes.slice(0, shared * 2)))
    // long recording capped
    assert(wins(3L).length == 16)
    // bytes round-trip: window 1 of asset 1 is pcm[640, 1600)
    assert(w1(1).window_bytes.sameElements(pcm.slice(640, 1600)))
  }

  test("st15 streaming sentence dedup keeps first occurrences across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamOps.sentenceDedupStream(mem.toDF.toDF("doc_id", "ts", "text"))
    val q = out.writeStream.format("memory").queryName("st15").outputMode("append").start()
    try {
      mem.addData((1L, ts(0), "First point. Shared point."))
      q.processAllAvailable()
      // second doc repeats a sentence from batch 1 AND within itself
      mem.addData((2L, ts(1), "Shared point. New point. New point."))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id, sentence FROM st15").collect()
        .map(r => (r.getLong(0), r.getString(1).trim))
      assert(kept.count(_._2 == "Shared point.") == 1, s"cross-batch dup kept: ${kept.toSeq}")
      assert(kept.count(_._2 == "New point.") == 1, s"in-batch dup kept: ${kept.toSeq}")
      assert(kept.filter(_._1 == 1L).map(_._2).toSet ==
        Set("First point.", "Shared point."))
      assert(kept.filter(_._1 == 2L).map(_._2).toSet == Set("New point."))
    } finally q.stop()
  }

  test("st17 streaming SLI projection emits every metric per closed window, batch-exact rates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, java.lang.Long, String, java.lang.Double, String)]
    val out = StreamOps.sliMetricsStream(
      mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = out.writeStream.format("memory").queryName("st17").outputMode("append").start()
    def at(s: String) = Timestamp.valueOf(s)
    try {
      // minute :00: 4 events, 2 errors, 2 users; minute :01: 1 clean event
      mem.addData(
        (1L, at("2024-01-01 00:00:10"), 1L, "view", 1.0, "{}"),
        (2L, at("2024-01-01 00:00:20"), 1L, "error", 1.0, "{}"),
        (3L, at("2024-01-01 00:00:30"), 2L, "view", 1.0, "{}"),
        (4L, at("2024-01-01 00:00:40"), 2L, "error", 1.0, "{}"),
        (5L, at("2024-01-01 00:01:10"), 3L, "view", 1.0, "{}"))
      q.processAllAvailable()
      // advance the watermark past both window ends + 2h to close them
      mem.addData((6L, at("2024-01-01 05:00:00"), 4L: java.lang.Long,
        "view", 1.0: java.lang.Double, "{}"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT bucket, metric, value FROM st17").collect()
        .map(r => (r.getAs[Timestamp]("bucket").toString.take(16), r.getAs[String]("metric")) ->
          r.getAs[Double]("value")).toMap
      assert(rows(("2024-01-01 00:00", "log_throughput")) == 4.0, s"got $rows")
      assert(rows(("2024-01-01 00:00", "error_rate")) == 0.5)
      assert(rows(("2024-01-01 00:00", "active_users")) == 2.0)
      // all durations < 100 ms → apdex 1.0 (the new-metric-is-a-column
      // claim holds in the streaming form too)
      assert(rows(("2024-01-01 00:00", "apdex")) == 1.0)
      assert(rows(("2024-01-01 00:01", "log_throughput")) == 1.0)
      assert(rows(("2024-01-01 00:01", "error_rate")) == 0.0)
    } finally q.stop()
  }

  test("st18 streaming golden signals: producer gating and exact columns match the batch MV") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, String, Map[String, String])]
    val out = StreamOps.goldenSignalsStream(
      mem.toDF.toDF("ts", "service_name", "fields"))
    val q = out.writeStream.format("memory").queryName("st18").outputMode("append").start()
    try {
      mem.addData(
        (at("2024-01-01 00:00:10"), "plecto-proxy",
          Map("method" -> "GET", "path" -> "/a", "status" -> "200",
              "client" -> "c", "duration_ms" -> "10.0")),
        (at("2024-01-01 00:00:20"), "plecto-proxy",
          Map("method" -> "GET", "path" -> "/a", "status" -> "500",
              "client" -> "c", "duration_ms" -> "30.0")),
        (at("2024-01-01 00:00:30"), "nginx",
          Map("http_method" -> "GET", "http_path" -> "/a", "http_status" -> "200",
              "http_size" -> "100", "http_ip" -> "i", "http_ua" -> "u")),
        // a rogue third producer and a shape-stripped nginx row: the
        // stream runs the IDENTICAL normalize body, so both must be
        // gated out before they can corrupt the windowed SLO
        (at("2024-01-01 00:00:40"), "rogue-proxy",
          Map("method" -> "GET", "path" -> "/x", "status" -> "500", "client" -> "r")),
        (at("2024-01-01 00:00:50"), "nginx", Map("http_ip" -> "10.0.0.9")))
      q.processAllAvailable()
      mem.addData((at("2024-01-01 05:00:00"), "nginx",
        Map("http_method" -> "GET", "http_path" -> "/z", "http_status" -> "200",
            "http_size" -> "1", "http_ip" -> "i", "http_ua" -> "u")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM st18").collect()
        .map(r => r.getAs[Timestamp]("bucket").toString.take(16) -> r).toMap
      val r = rows("2024-01-01 00:00")
      // exact columns are batch-identical (HttpLogsSpec's fixture values)
      assert(r.getAs[Long]("n_requests") == 3L)
      assert(r.getAs[Long]("n_errors") == 1L)
      assert(r.getAs[Double]("error_rate") == 0.3333)
      assert(r.getAs[Long]("total_bytes") == 100L)
      // p95 via the mergeable sketch: the order statistic at rank
      // ceil(0.95*3) of centi-ms {0, 1000, 3000} = 3000 -> 30.0 ms
      // (the batch sibling interpolates to 26.0 — documented difference)
      assert(r.getAs[Double]("p95_latency_ms") == 30.0)
    } finally q.stop()
  }

  test("st19 live field-shape drift: a renamed key flags missing and novel on window close") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def at(s: String) = Timestamp.valueOf(s)
    // baseline: the producer's historical shape is {k1, k2}, 10 rows
    val baseline = graft.operators.DataQuality.fieldShapeBaseline(
      (1 to 10).map(_ => (at("2024-01-01 00:00:00"), "svc", Map("k1" -> "a", "k2" -> "b")))
        .toDF("ts", "service_name", "fields"))
    val mem = MemoryStream[(Timestamp, String, Map[String, String])]
    val counts = StreamOps.windowedKeyCounts(
      mem.toDF.toDF("ts", "service_name", "fields"), windowLen = "1 minute")
    val q = counts.writeStream.format("memory").queryName("st19").outputMode("append").start()
    try {
      // the deploy renames k2 -> k2b: every streamed row carries the new shape
      mem.addData((1 to 6).map(i =>
        (at(s"2024-01-02 10:00:1$i"), "svc", Map("k1" -> "a", "k2b" -> "b"))): _*)
      q.processAllAvailable()
      mem.addData((at("2024-01-02 15:00:00"), "svc", Map("k1" -> "x", "k2" -> "y")))
      q.processAllAvailable()
      val out = StreamOps.shapeDriftVsBaseline(spark.table("st19"), baseline)
        .filter(col("bucket") === at("2024-01-02 10:00:00")).collect()
        .map(r => r.getAs[String]("key") -> r).toMap
      val k2 = out("k2")
      assert(k2.getAs[Long]("n_with_key") == 0L, "k2 vanished from the window")
      assert(k2.getAs[Int]("missing") == 1 && k2.getAs[Int]("novel") == 0)
      val k1 = out("k1")
      assert(k1.getAs[Int]("missing") == 0 && k1.getAs[Int]("novel") == 0)
      val k2b = out("k2b")
      assert(k2b.getAs[Int]("novel") == 1 && k2b.getAs[Long]("n_with_key") == 6L)
    } finally q.stop()
  }

  test("st16 novel-template alert fires once per template across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamOps.novelTemplateStream(mem.toDF.toDF("ts", "line"))
    val q = out.writeStream.format("memory").queryName("st16").outputMode("append").start()
    try {
      // two lines minting the SAME template in ONE batch, the later
      // ts listed first — the elected sample must be the earliest by
      // (ts, line), not an arbitrary partition's row
      mem.addData(
        (ts(5), "error id=9 failed"),
        (ts(0), "error id=1 failed"),
        (ts(1), "ok user=5 served"))
      q.processAllAvailable()
      // same template as "error id=1 failed" (digits masked) — no alert;
      // a genuinely new template — alert
      mem.addData(
        (ts(2), "error id=2 failed"),
        (ts(3), "warn limit=9 exceeded"))
      q.processAllAvailable()
      val alerts = spark.sql("SELECT template, line FROM st16").collect()
        .map(r => r.getString(0) -> r.getString(1))
      assert(alerts.length == 3, s"got ${alerts.toSeq}")
      assert(alerts.count(_._1 == "error <*> failed") == 1)
      // the alert sample is the FIRST line that minted the template
      assert(alerts.collect { case ("error <*> failed", l) => l }.head == "error id=1 failed")
      assert(alerts.exists(_._1 == "warn <*> exceeded"))
    } finally q.stop()
  }

  test("st14 streaming quality gate drops rule violators at ingest, parity with batch") {
    implicit val sqlCtx = spark.sqlContext
    val good = (Seq("the", "of", "and", "that", "with", "words", "flow", "cleanly") ++
      (1 to 50).map(i => s"token$i")).mkString(" ")
    val bullets = (1 to 60).map(i => s"- item$i the of and that with be to have").mkString("\n")
    val mem = MemoryStream[(Long, String, String)]
    val gated = StreamOps.qualityGate(mem.toDF.toDF("doc_id", "source", "text"))
    val q = gated.writeStream.format("memory").queryName("st14").outputMode("append").start()
    try {
      mem.addData((1L, "a", good), (2L, "a", bullets))
      q.processAllAvailable()
      val kept = spark.sql("SELECT doc_id FROM st14").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L), s"gate kept $kept")
      // batch/stream parity: the same rows through the batch battery
      val batch = graft.operators.TextOps.gopherRulesOn(
        Seq((1L, "a", good), (2L, "a", bullets)).toDF("doc_id", "source", "text"))
        .filter(col("keep")).collect().map(_.getAs[Long]("doc_id")).toSet
      assert(batch == kept)
    } finally q.stop()
  }

  test("st20 streaming SLO violations: exact 1% gate, closed windows bit-match the batch form") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, String, String)]
    val out = StreamOps.sloViolationsStream(
      mem.toDF.toDF("ts", "service_name", "severity_text"))
    val q = out.writeStream.format("memory").queryName("st20").outputMode("append").start()
    try {
      // svc A, window 00:00-00:05: 100 rows, exactly 1 error → NOT a violation
      // svc B, same window: 100 rows, 2 errors → violation at 2%
      // svc B, window 00:05-00:10: 1 of 2 → violation at 50%
      val a = (1 to 99).map(i => (at(f"2024-01-01 00:00:${10 + i % 40}%02d"), "A", "INFO")) :+
        ((at("2024-01-01 00:01:00"), "A", "ERROR"))
      val b = (1 to 98).map(i => (at(f"2024-01-01 00:02:${i % 50}%02d"), "B", "INFO")) ++
        Seq((at("2024-01-01 00:03:00"), "B", "ERROR"),
            (at("2024-01-01 00:03:10"), "B", "FATAL"),
            (at("2024-01-01 00:06:00"), "B", "INFO"),
            (at("2024-01-01 00:06:30"), "B", "ERROR"))
      mem.addData(a ++ b: _*)
      q.processAllAvailable()
      mem.addData((at("2024-01-01 05:00:00"), "A", "INFO")) // close the windows
      q.processAllAvailable()
      val rows = spark.sql("SELECT service_name, time_bucket, error_rate_pct, sample_count FROM st20")
        .collect().map(r => (r.getString(0), r.getAs[Timestamp](1).toString) ->
          ((r.getDouble(2), r.getLong(3)))).toMap
      assert(!rows.keySet.exists(_._1 == "A"), s"A's exactly-1% window must not alert: $rows")
      assert(rows(("B", "2024-01-01 00:00:00.0")) == ((2.0, 100L)))
      assert(rows(("B", "2024-01-01 00:05:00.0")) == ((50.0, 2L)))
      // parity: the same rows through the batch detector, same buckets
      val batchRows = graft.operators.HealthScore.sloViolationsOn(
        (a ++ b).toDF("ts", "service_name", "severity_text"), limit = 1000)
        .collect().map(r => (r.getString(0), r.getAs[Timestamp](1).toString) ->
          ((r.getDouble(2), r.getLong(3)))).toMap
      assert(batchRows == rows, s"batch $batchRows vs stream $rows")
    } finally q.stop()
  }

  test("st21 streaming health scorecard: the batch penalty ladder per closed window") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, String, String, java.lang.Double)]
    val out = StreamOps.serviceHealthStream(
      mem.toDF.toDF("ts", "service_name", "severity_text", "duration_ms"))
    val q = out.writeStream.format("memory").queryName("st21").outputMode("append").start()
    try {
      // svc A hour 00: 2 errors of 10 at 600 ms → error_rate 20% →
      // −40; p95 600 > 500 → −5 ⇒ score 55 Degraded.
      // svc B hour 00: clean, fast → 100 Healthy.
      val rows =
        (1 to 8).map(i => (at(f"2024-01-01 00:10:$i%02d"), "A", "INFO", 600.0: java.lang.Double)) ++
        Seq((at("2024-01-01 00:20:00"), "A", "ERROR", 600.0: java.lang.Double),
            (at("2024-01-01 00:21:00"), "A", "FATAL", 600.0: java.lang.Double)) ++
        (1 to 5).map(i => (at(f"2024-01-01 00:30:$i%02d"), "B", "INFO", 50.0: java.lang.Double))
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((at("2024-01-01 05:00:00"), "B", "INFO", 1.0: java.lang.Double))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT service_name, error_rate, p95_ms, health_score, health_status FROM st21")
        .collect().map(r => r.getString(0) -> r).toMap
      assert(got("A").getDouble(1) == 20.0)
      assert(got("A").getDouble(2) == 600.0)
      assert(got("A").getInt(3) == 55 && got("A").getString(4) == "Degraded",
        "error ladder −40, latency ladder −5")
      assert(got("B").getInt(3) == 100 && got("B").getString(4) == "Healthy")
    } finally q.stop()
  }

  test("st29 streaming stage health: per-window success rates + the strict-< alert bands") {
    implicit val sqlCtx = spark.sqlContext
    def at(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Timestamp, String, String)]
    val out = StreamOps.pipelineHealthStream(mem.toDF.toDF("ts", "stage", "status"))
    val q = out.writeStream.format("memory").queryName("st29").outputMode("append").start()
    try {
      // fetch: 19/20 = exactly 0.95 → ok (strict <); classify: 9/10 =
      // exactly 0.90 → warn, the running row counts against (:104);
      // summarize: 2/4 → critical
      val rows =
        (1 to 19).map(i => (at(f"2024-01-01 00:10:$i%02d"), "fetch", "completed")) ++
        Seq((at("2024-01-01 00:20:00"), "fetch", "failed")) ++
        (1 to 9).map(i => (at(f"2024-01-01 00:30:$i%02d"), "classify", "completed")) ++
        Seq((at("2024-01-01 00:31:00"), "classify", "running")) ++
        Seq((at("2024-01-01 00:40:00"), "summarize", "completed"),
            (at("2024-01-01 00:40:10"), "summarize", "completed"),
            (at("2024-01-01 00:41:00"), "summarize", "failed"),
            (at("2024-01-01 00:41:30"), "summarize", "failed"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData((at("2024-01-01 05:00:00"), "fetch", "completed")) // close hour 00
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT stage, n_logs, n_completed, success_rate, alert_level FROM st29 " +
        "WHERE bucket = timestamp'2024-01-01 00:00:00'")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
      assert(got("fetch") == ((20L, 19L, 0.95, "ok")), s"exactly 0.95 is NOT below warn: $got")
      assert(got("classify") == ((10L, 9L, 0.9, "warn")), s"exactly 0.90 is NOT below critical: $got")
      assert(got("summarize") == ((4L, 2L, 0.5, "critical")), s"$got")
    } finally q.stop()
  }

  test("st22 triage-at-ingest: the tx46 cascade runs stateless on a stream, batch-identical") {
    // the st14 discipline: a stateless gate reuses the IDENTICAL batch
    // operator body in streaming — here the whole 11-category triage
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.Triage.withCleaned(
        mem.toDF.toDF("doc_id", "content"))
      .select(col("doc_id"), graft.operators.Triage.category.as("category"))
    val q = out.writeStream.format("memory").queryName("st22").outputMode("append").start()
    try {
      val batchRows = Seq(
        (1L, "oops: 404 Not Found"),
        (2L, "GitHub Linux tech notes"),
        (3L, "   "),
        (4L, "go https://example.com/a/1 https://example.org/path/to/x"),
        (5L, "a perfectly ordinary short line"))
      mem.addData(batchRows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, category FROM st22")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = graft.operators.Triage.withCleaned(
          batchRows.toDF("doc_id", "content"))
        .select(col("doc_id"), graft.operators.Triage.category.as("category"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed(1L) == "error_message" && streamed(3L) == "empty"
        && streamed(4L) == "url_only")
    } finally q.stop()
  }

  test("st23 genre tagging at ingest: the kw02 battery + in-row top-3 run stateless on a stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamOps.genreTagStream(
      mem.toDF.toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("st23").outputMode("append").start()
    try {
      val batchRows = Seq(
        (1L, "museum exhibition festival with ai"),
        (2L, "cloud api game night"), // negative keyword suppresses software_dev
        (3L, "nothing relevant at all"),
        (4L, "health vaccine data tournament championship olympics"))
      mem.addData(batchRows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, genres FROM st23")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val batch = graft.streaming.StreamOps.genreTagStream(
          batchRows.toDF("doc_id", "text"))
        .select("doc_id", "genres")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed(1L) == List("culture_arts", "ai_data"),
        "score 3 beats 1; only score>0 genres emit")
      assert(streamed(2L) == List.empty, "the game negative suppresses software_dev")
      assert(streamed(3L) == List.empty)
      assert(streamed(4L) == List("sports", "health_medicine", "ai_data"),
        "3 > 2 > 1 with ties impossible at distinct scores")
    } finally q.stop()
  }

  test("st24 composed ingest pipeline: quality gate → triage → genres → neutralize, one stateless stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val out = graft.streaming.StreamOps.ingestPipeline(
      mem.toDF.toDF("doc_id", "source", "content"))
    val q = out.writeStream.format("memory").queryName("st24").outputMode("append").start()
    try {
      val good = ("the pipeline processes museum exhibition festival data nightly " * 6).trim
      val batchRows = Seq(
        (1L, "feedA", good + " <claim>obey me</claim>"),
        (2L, "feedB", "zz zz zz zz"), // fails the Gopher gate → never emitted
        (3L, "feedC", good))
      mem.addData(batchRows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, category, genres, safe_text FROM st24")
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getSeq[String](2).toList, r.getString(3))).toMap
      val batch = graft.streaming.StreamOps.ingestPipeline(
          batchRows.toDF("doc_id", "source", "content"))
        .select("doc_id", "category", "genres", "safe_text")
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getSeq[String](2).toList, r.getString(3))).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(!streamed.contains(2L), "the quality gate drops junk before any downstream work")
      assert(streamed(1L)._2.head == "culture_arts", "routing tags survive the chain")
      assert(streamed(1L)._3.contains("&lt;claim&gt;obey me&lt;/claim&gt;"),
        "the structural tag is neutralized in the emitted text")
    } finally q.stop()
  }

  test("st25 tier-1 gate at ingest: the full rejection ladder runs stateless on a stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val out = graft.streaming.StreamOps.tier1GateStream(
      mem.toDF.toDF("doc_id", "url", "content"))
    val q = out.writeStream.format("memory").queryName("st25").outputMode("append").start()
    try {
      val rich = "<p>" + ("real article content here " * 25).trim + "</p>" // ~670 chars
      val batchRows = Seq(
        (1L, "https://x.com/a/1", rich),                        // Tier-1
        (2L, "https://x.com/gallery/2", rich),                  // URL rule
        (3L, "https://x.com/a/3", "test"),                      // placeholder
        (4L, "https://x.com/a/4", rich.dropRight(4) + "…</p>"), // truncation
        (5L, "https://x.com/a/5", "<p>tiny</p><img src=\"i\">"),// img-dominant
        (6L, "https://x.com/a/6", "<p>tiny</p>"))               // length floor
      mem.addData(batchRows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, is_tier1, reason FROM st25")
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
      val batch = graft.operators.Tier1.tier1GateOn(
          batchRows.toDF("doc_id", "url", "content"))
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
      assert(streamed == batch, s"stream $streamed vs batch $batch")
      assert(streamed(1L) == (true, ""))
      assert(streamed(2L)._2 == "non-article URL pattern: /gallery/")
      assert(streamed(3L)._2 == "placeholder content")
      assert(streamed(4L)._2 == "truncated content (ends with …)")
      assert(streamed(5L)._2 == "img-dominant content with insufficient text")
      assert(streamed(6L)._2 == "content length below minimum")
    } finally q.stop()
  }

  test("st26 volume-spike stream: alerts on bucket close, carries the last non-empty bucket as previous") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Timestamp)]
    def at(min: Int, s: Int = 0) = new Timestamp(1700000000000L + min * 60000L + s * 1000L)
    val out = graft.streaming.StreamOps.volumeSpikeStream(
      mem.toDF.toDF("service", "ts").as[graft.streaming.StreamOps.VolInput],
      bucketSec = 60, watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("st26").outputMode("append").start()
    try {
      // a: minute 0 has 2 events, minute 1 has 5 (spike ×2.5), minute 2 has 1 (no spike)
      // b: 3 then 4 — never more than double
      // c: 2 in minute 0, then 5 in minute 3 — the empty minutes don't reset "previous"
      mem.addData((1 to 2).map(i => ("a", at(0, i))) ++ (1 to 3).map(i => ("b", at(0, i))) ++
        (1 to 2).map(i => ("c", at(0, i))): _*)
      q.processAllAvailable()
      mem.addData((1 to 5).map(i => ("a", at(1, i))) ++ (1 to 4).map(i => ("b", at(1, i))): _*)
      q.processAllAvailable()
      mem.addData(Seq(("a", at(2, 1))) ++ (1 to 5).map(i => ("c", at(3, i))): _*)
      q.processAllAvailable()
      // advance event time far past every open bucket so timeouts close them
      mem.addData(("z", at(60)))
      q.processAllAvailable()
      mem.addData(("z", at(61)))
      q.processAllAvailable()
      val alerts = spark.sql("SELECT service, recent, previous, ratio FROM st26")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(alerts == Set(("a", 5L, 2L, 2.5), ("c", 5L, 2L, 2.5)),
        s"got $alerts")
    } finally q.stop()
  }

  test("st26: an in-watermark straggler for an earlier bucket still counts (buckets close on the watermark, not on the first later event)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(String, Timestamp)]
    def at(min: Int, s: Int = 0) = new Timestamp(1700000000000L + min * 60000L + s * 1000L)
    val out = graft.streaming.StreamOps.volumeSpikeStream(
      mem.toDF.toDF("service", "ts").as[graft.streaming.StreamOps.VolInput],
      bucketSec = 60, watermark = "2 minutes")
    val q = out.writeStream.format("memory").queryName("st26b").outputMode("append").start()
    try {
      // batch 1 already has a minute-1 event; the minute-0 straggler in
      // batch 2 is within the 2-minute watermark and MUST still count —
      // an eager close on the first later-bucket event would read
      // previous=1 (ratio 5.0) instead of previous=2 (ratio 2.5)
      mem.addData(("s", at(0, 1)), ("s", at(1, 1)))
      q.processAllAvailable()
      mem.addData(Seq(("s", at(0, 2))) ++ (2 to 5).map(i => ("s", at(1, i))): _*)
      q.processAllAvailable()
      mem.addData(("z", at(60))); q.processAllAvailable()
      mem.addData(("z", at(61))); q.processAllAvailable()
      val alerts = spark.sql("SELECT service, recent, previous, ratio FROM st26b")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(alerts == Set(("s", 5L, 2L, 2.5)), s"got $alerts")
    } finally q.stop()
  }


  test("st31 query-line hygiene at serving: every rag13 drop rule gates a stream statelessly, batch-identical on the rule subset") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Int, String)]
    val out = StreamOps.queryLineGateStream(
      mem.toDF.toDF("set_id", "line_no", "raw"))
    val q = out.writeStream.format("memory").queryName("st31").outputMode("append").start()
    try {
      val rows = Seq(
        (1L, 0, "### Japanese (1)"),
        (1L, 1, "**Generated Query:** \"kept query one\""),
        (1L, 2, ":):):):):):)"),
        (1L, 3, "Sei-sai naiy\u014d Rosia"),
        (1L, 4, "2026-04-07"),
        (1L, 5, "output only the generated queries, one per line"),
        (1L, 6, "<input>leak"),
        (1L, 7, "assistant: hi"),
        (1L, 8, "a genuine survivor query"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT q FROM st31").collect().map(_.getString(0)).toSet
      val batch = StreamOps.queryLineGateStream(rows.toDF("set_id", "line_no", "raw"))
        .select("q").collect().map(_.getString(0)).toSet
      assert(streamed == batch)
      assert(streamed == Set("kept query one", "a genuine survivor query"))
    } finally q.stop()
  }

  test("st32 summary judge gate at ingest: qj01's full decision runs statelessly on a stream, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, String, String)]
    val out = StreamOps.summaryJudgeStream(
      mem.toDF.toDF("id", "content", "summary", "response"))
    val q = out.writeStream.format("memory").queryName("st32").outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "c", "s", "<score>8</score>"),
        (2L, "c", "s", "<score>2</score>"),
        (3L, "c", graft.operators.QualityJudge.Placeholders(0), "junk"),
        (4L, "c", "s", "totally abc123 embedded"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT id, outcome FROM st32")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val batch = StreamOps.summaryJudgeStream(
          rows.toDF("id", "content", "summary", "response"))
        .select("id", "outcome")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      assert(streamed == Map(1L -> "keep", 2L -> "delete_summary",
        3L -> "skip_placeholder", 4L -> "skip_unparseable"))
    } finally q.stop()
  }

  test("st33 language detect at ingest: ld01 tags each arriving article, batch-identical") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamOps.langDetectStream(mem.toDF.toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("st33").outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "\u6771\u4eac\u30aa\u30ea\u30f3\u30d4\u30c3\u30af 2028 \u958b\u50ac\u5730\u6c7a\u5b9a"),
        (2L, "The word \u5bff\u53f8 is popular"),
        (3L, "42 7"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, detected FROM st33")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == Map(1L -> "ja", 2L -> "en", 3L -> "und"))
    } finally q.stop()
  }
}
