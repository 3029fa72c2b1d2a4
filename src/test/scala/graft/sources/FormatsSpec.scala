package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTest

/** §2.2 source/sink surface: every supported batch format round-trips the
  * events table losslessly; the streaming file source picks up appended
  * files. */
class FormatsSpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-fmt-").toString

  test("parquet/orc/json/csv/xml round trips preserve rows and values") {
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value")
    val expected = ev.agg(
      count(lit(1)), sum("event_id"),
      sum(col("value").cast("decimal(18,2)"))).first()
    for (fmt <- Formats.Supported) {
      val dir = s"${tmp()}/$fmt"
      Formats.write(ev, dir, fmt)
      val back = Formats.read(spark, dir, fmt, ev.schema)
      val got = back.agg(
        count(lit(1)), sum("event_id"),
        sum(col("value").cast("decimal(18,2)"))).first()
      assert(got == expected, s"format=$fmt")
    }
  }

  test("binaryFile source ingests raw media files with path/length/content") {
    // The multimodal ingestion path: opaque payloads land as BinaryType
    // rows (path, modificationTime, length, content) — feed `content`
    // straight into Multimodal.decode-style pipelines.
    val dir = tmp()
    val payloads = Map("a.bin" -> "alpha-payload", "b.bin" -> "bee")
    payloads.foreach { case (name, body) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, name), body.getBytes("UTF-8"))
    }
    val df = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
    val rows = df.collect().map { r =>
      val name = r.getString(0).split('/').last
      name -> (r.getLong(1), new String(r.getAs[Array[Byte]](2), "UTF-8"))
    }.toMap
    assert(rows.keySet == payloads.keySet)
    payloads.foreach { case (name, body) =>
      assert(rows(name) == (body.length.toLong, body), name)
    }
  }

  test("JDBC round trip via embedded Derby; filter pushes to the database") {
    // the dimension-table import/export path over the built-in JDBC
    // relation provider, driven against the in-process Derby engine on
    // the Spark classpath (no network, no external service)
    val url = "jdbc:derby:memory:graftFmtSpec;create=true"
    val dim = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type")
      .filter(col("event_id") < 500)
    Formats.writeJdbc(dim, url, "dim_events")
    // parallel range read: 4 partitions over the id space
    val back = Formats.readJdbc(spark, url, "dim_events",
      Some(("event_id", 0L, 500L, 4)))
    assert(back.rdd.getNumPartitions == 4,
      "partitionColumn bounds must split the read into parallel queries")
    val exp = dim.agg(count(lit(1)), sum("event_id"), sum("user_id")).first()
    assert(back.agg(count(lit(1)), sum("event_id"), sum("user_id")).first()
      == exp)
    // predicate pushdown: the filter must reach the remote query, not a
    // Spark-side Filter over a full-table cursor
    val filtered = Formats.readJdbc(spark, url, "dim_events")
      .filter(col("user_id") === 7L)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("user_id"),
      s"filter must push into the JDBC scan:\n$plan")
    assert(filtered.count() ==
      dim.filter(col("user_id") === 7L).count())
  }

  test("malformed JSON rows: PERMISSIVE captures, DROPMALFORMED drops, schema kept") {
    // the dirty-upstream reality of a 100 TB ingest: a reader must not
    // die on (or silently mangle) the bad 0.01% — Spark's built-in
    // parse modes, pinned
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.json"),
      Seq("""{"id": 1, "v": "ok"}""",
        """{"id": broken!!""",
        """{"id": 3, "v": "fine"}""").mkString("\n").getBytes("UTF-8"))
    val schema = "id BIGINT, v STRING, _corrupt STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(dir)
    // cache first: corrupt-record introspection requires the full row
    val rows = permissive.cache().collect()
    assert(rows.length == 3)
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("_corrupt"))) == 1,
      "exactly the broken line must land in the corrupt column")
    assert(permissive.filter(col("_corrupt").isNull)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    permissive.unpersist()
    val dropped = spark.read.schema("id BIGINT, v STRING")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L),
      "DROPMALFORMED must keep only the parseable rows")
  }

  test("rate source streams monotonically increasing (timestamp, value) rows") {
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
      .writeStream.format("memory").queryName("rate_out").outputMode("append")
      .option("checkpointLocation", tmp()).start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var n = 0L
      while (n == 0 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        q.processAllAvailable()
        n = spark.table("rate_out").count()
      }
      assert(n > 0, "rate source produced no rows within 30s")
      val vals = spark.table("rate_out").orderBy("value")
        .collect().map(_.getAs[Long]("value"))
      assert(vals.toSeq == (0L until vals.length).toSeq, "values not dense from 0")
    } finally q.stop()
  }

  test("streaming file source processes files appended across batches") {
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
    val dir = tmp()
    ev.filter(col("event_id") % 2 === 0).write.parquet(s"$dir/part0")
    // stream over the directory of parquet dirs via glob
    val stream = Formats.readStream(spark, s"$dir/part*", "parquet", ev.schema)
      .groupBy().agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("file_src_out")
      .outputMode("complete")
      .option("checkpointLocation", tmp()).start()
    q.processAllAvailable()
    val n0 = spark.table("file_src_out").first().getLong(0)
    ev.filter(col("event_id") % 2 === 1).write.parquet(s"$dir/part1")
    q.processAllAvailable()
    val n1 = spark.table("file_src_out").first().getLong(0)
    q.stop()
    val total = ev.count()
    assert(n0 < total && n1 == total)
  }

  test("avro round trip via the graft-avro DSv2 source preserves rows and values") {
    // spark-avro is an external module this environment does not ship;
    // the graft-avro source serves §2.2's Avro row through the DSv2
    // extension point on avro-core (AvroFiles scaladoc)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").cast("double").as("value"))
    val dir = tmp()
    AvroFiles.write(ev, dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("event_id", "user_id", "event_type", "value"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toString).sorted.toSeq
    assert(key(back) == key(ev), "avro round trip must be lossless")
    // more than one file = more than one read partition (file-granular
    // parallelism, the binaryFile trade)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".avro")) >= 1)
  }

  test("avro schema evolution: merged-by-name schema; old files read NULL for new columns") {
    val dir = tmp()
    import spark.implicits._
    // generation 1 writes (id, v); generation 2 adds a `tag` column
    AvroFiles.write(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"), dir)
    AvroFiles.write(
      Seq((3L, 30.0, "new")).toDF("id", "v", "tag").repartition(1), dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq("id", "v", "tag"),
      s"merged schema must union fields by name: ${back.schema}")
    val rows = back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSeq
    assert(rows == Seq((1L, 10.0, null), (2L, 20.0, null),
      (3L, 30.0, "new")),
      s"gen-1 rows must read the evolved column as NULL: ${rows.toList}")
  }

  test("avro scan prunes columns: ReadSchema carries only the projected fields") {
    val dir = tmp()
    import spark.implicits._
    AvroFiles.write(Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "x"), dir)
    val pruned = spark.read.format("graft-avro").load(dir).select("id")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") || plan.contains("graft-avro") ||
      pruned.queryExecution.optimizedPlan.schema.fieldNames.toSeq == Seq("id"))
    assert(pruned.queryExecution.executedPlan.collectLeaves()
      .exists(_.schema.fieldNames.toSeq == Seq("id")),
      s"the scan itself must read only `id`:\n$plan")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("avro streaming sink: foreachBatch appends one container generation per micro-batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // the streaming write path for the graft-avro container: each
    // micro-batch is one AvroFiles.write call (its own job id, so
    // generations compose under the merged-by-name reader), riding
    // foreachBatch's sequential-commit contract like the store ingests
    val dir = tmp()
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = input.toDF().toDF("id", "s").writeStream
      .option("checkpointLocation", tmp())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          AvroFiles.write(b.toDF(), dir); ()
      }
      .start()
    try {
      input.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      input.addData((3L, "c")); q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "both micro-batch generations must read back merged")
  }
}
