package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** The DSv2 WARC/WET reader: record framing, gzip-member layout,
  * multi-file partitioning, header surfacing, and payload pruning. */
class WarcSourceSpec extends SparkTestBase {

  private def recs(n: Int, off: Int = 0) = (0 until n).map { i =>
    val k = i + off
    ("conversion", s"https://example.org/page/$k",
      "2024-03-01T12:00:00Z", "text/plain",
      s"document body $k — ${"x" * k}".getBytes("UTF-8"))
  }

  private def writeFile(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createTempDirectory("warc").toFile
    val f = new java.io.File(dir, name)
    Files.write(f.toPath, bytes)
    f.getPath
  }

  test("plain WET stream: framing, headers, payload round-trip, warc_date") {
    val rs = ("warcinfo", null, "2024-03-01T12:00:00Z",
      "application/warc-fields", "software: graft-fixture\r\n".getBytes("UTF-8")) +: recs(3)
    val path = writeFile("f.wet", Warc.writeRecords(rs, gzipPerRecord = false))
    val rows = Warc.read(spark, path).orderBy("record_id").collect()
    assert(rows.length === 4)
    val byUri = rows.filter(!_.isNullAt(2))
      .map(r => r.getString(2) -> r).toMap
    assert(byUri.keySet === (0 until 3)
      .map(i => s"https://example.org/page/$i").toSet)
    val r1 = byUri("https://example.org/page/1")
    assert(r1.getString(1) === "conversion")
    assert(new String(r1.getAs[Array[Byte]]("payload"), "UTF-8") ===
      "document body 1 — x")
    assert(r1.getLong(r1.fieldIndex("content_length")) ===
      "document body 1 — x".getBytes("UTF-8").length.toLong)
    assert(r1.getAs[java.sql.Timestamp]("warc_date").toInstant.toString ===
      "2024-03-01T12:00:00Z")
    // full header map is surfaced verbatim
    assert(r1.getAs[Map[String, String]]("headers")("WARC-Type") === "conversion")
    // warcinfo has no Target-URI -> null column
    val wi = rows.filter(_.getString(1) == "warcinfo")
    assert(wi.length === 1 && wi.head.isNullAt(2))
  }

  test("gzip-per-record members (Common Crawl layout) decode as one stream") {
    val path = writeFile("f.wet.gz", Warc.writeRecords(recs(5), gzipPerRecord = true))
    val got = Warc.read(spark, path)
      .select("target_uri", "content_length").orderBy("target_uri").collect()
    assert(got.length === 5)
    assert(got.map(_.getString(0)).toSeq ===
      (0 until 5).map(i => s"https://example.org/page/$i"))
    // content_length matches the actual UTF-8 payload byte count
    assert(got.map(_.getLong(1)).toSeq ===
      recs(5).map(_._5.length.toLong))
  }

  test("directory scan: one partition per file, files concatenate") {
    val dir = Files.createTempDirectory("warcdir").toFile
    Files.write(new java.io.File(dir, "a.wet.gz").toPath,
      Warc.writeRecords(recs(2), gzipPerRecord = true))
    Files.write(new java.io.File(dir, "b.wet").toPath,
      Warc.writeRecords(recs(3, off = 10), gzipPerRecord = false))
    val df = Warc.read(spark, dir.getPath)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 5)
    assert(df.select("target_uri").distinct().count() === 5)
  }

  test("distributed writer round-trip: read(write(df)) == df, per-partition files") {
    import spark.implicits._
    val n = 500
    val in = spark.range(n).select(
        lit("conversion").as("record_type"),
        concat(lit("https://rt.example/"), col("id")).as("target_uri"),
        to_timestamp(lit("2024-03-01 12:00:00")).as("warc_date"),
        lit("text/plain").as("content_type"),
        encode(concat(lit("body-"), col("id"),
          lit(" é世界")), "UTF-8").as("payload"))
      .repartition(4)
    val dir = Files.createTempDirectory("warcw").toString
    Warc.write(in, dir, gzipPerRecord = true)
    // one file per (non-empty) input partition
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.length === 4 && files.forall(_.endsWith(".warc.gz")))
    val back = Warc.read(spark, dir)
    assert(back.rdd.getNumPartitions === 4)
    val got = back.select(col("target_uri"),
        decode(col("payload"), "UTF-8").as("body"),
        col("warc_date"), col("content_type"), col("record_type"))
      .collect()
    assert(got.length === n)
    got.foreach { r =>
      val id = r.getString(0).stripPrefix("https://rt.example/")
      assert(r.getString(1) === s"body-$id é世界",
        s"payload mismatch for $id")
      assert(r.getAs[java.sql.Timestamp](2).toInstant.toString ===
        "2024-03-01T12:00:00Z")
      assert(r.getString(3) === "text/plain")
      assert(r.getString(4) === "conversion")
    }
    // record ids are globally unique without coordination
    assert(back.select("record_id").distinct().count() === n)
  }

  test("streaming ingest: new archive files picked up incrementally, exactly once") {
    val dir = Files.createTempDirectory("warcstream").toFile
    Files.write(new java.io.File(dir, "part-00000.wet.gz").toPath,
      Warc.writeRecords(recs(2), gzipPerRecord = true))
    val q = Warc.readStream(spark, dir.getPath)
      .select("target_uri", "content_length")
      .writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM warc_stream").head.getLong(0) === 2L)
      // a newly landed archive becomes exactly one new batch of rows
      Files.write(new java.io.File(dir, "part-00001.wet.gz").toPath,
        Warc.writeRecords(recs(3, off = 10), gzipPerRecord = true))
      q.processAllAvailable()
      val rows = spark.sql("SELECT target_uri FROM warc_stream").collect()
        .map(_.getString(0))
      assert(rows.length === 5, s"expected 5 rows, got ${rows.toSeq}")
      assert(rows.distinct.length === 5, "no record ingested twice")
      // an idle cycle with no new files adds nothing
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM warc_stream").head.getLong(0) === 5L)
    } finally q.stop()
  }

  test("streaming from a SINGLE file path ingests that file (not <file>/<file>)") {
    val path = writeFile("solo.wet.gz",
      Warc.writeRecords(recs(4), gzipPerRecord = true))
    val q = Warc.readStream(spark, path)
      .select("target_uri")
      .writeStream.format("memory").queryName("warc_solo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM warc_solo").head.getLong(0) === 4L)
    } finally q.stop()
  }

  test("nonexistent path fails fast with the path in the message, not an NPE") {
    val batch = intercept[Exception] {
      Warc.read(spark, "/no/such/warc/dir").count()
    }
    assert(batch.getMessage != null &&
      batch.getMessage.contains("/no/such/warc/dir"))
  }

  test("payload pruning: headers-only census never materializes payload") {
    val path = writeFile("f.wet.gz", Warc.writeRecords(recs(4), gzipPerRecord = true))
    val census = Warc.read(spark, path)
      .groupBy("record_type")
      .agg(count(lit(1)).as("n"), sum("content_length").as("bytes"))
    // plan-level: the pruned read schema must not contain payload
    val scan = census.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(!scan.contains("payload"),
      s"payload should be pruned from the scan:\n$scan")
    val r = census.collect().head
    assert(r.getString(0) === "conversion" && r.getLong(1) === 4L)
    assert(r.getLong(2) === recs(4).map(_._5.length.toLong).sum)
  }
}
