package graft.sources

import graft.SparkTestSession
import graft.gen.RtbGenerator
import graft.rtb.RtbIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Avro wire leg of S1: Confluent-framed encode/decode round-trips
  * the nested OpenRTB rows bit-for-bit, the registry's BACKWARD gate
  * accepts add-with-default and rejects type changes (the Schema
  * Registry semantics of the reference's setup.sh:47-52), and a reader
  * evolves across mixed writer versions in one pass.
  */
class AvroWireSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def requestsDf = {
    import spark.implicits._
    val funnel = RtbGenerator.generate(42L, 200, 1704103200000L, 3600000L,
      RtbGenerator.Rates(0.05, 0.05, 0.05, 0.05))
    spark.createDataset(funnel.requests).toDF()
  }

  test("encode→decode round-trips the nested rows exactly") {
    val df = requestsDf.localCheckpoint()
    val registry = new WireRegistry
    val schema = AvroWire.schemaFor(df)
    val id = registry.register("bid-requests-value", schema)
    val decoded = df
      .select(AvroWire.toWire(struct(df.columns.map(col): _*), schema, id).as("value"))
      .select(AvroWire.fromWire(col("value"), schema, registry.writers).as("r"))
      .select("r.*")
    assert(decoded.exceptAll(df).count() == 0 && df.exceptAll(decoded).count() == 0)
  }

  test("BACKWARD gate: add-with-default accepted, type change rejected") {
    val df = requestsDf
    val registry = new WireRegistry
    val v1 = AvroWire.schemaFor(df)
    registry.register("s", v1)
    // v2 = v1 + a nullable (defaulted) column — the canonical compatible
    // evolution: the v2 READER fills the default on v1 bytes
    val v2 = AvroWire.schemaFor(df.withColumn("schema_rev", lit(2).cast("int")))
    registry.register("s", v2)
    // v3 changes an existing field's type (int → string): the reader
    // cannot resolve old writer bytes — must be rejected
    val v3 = AvroWire.schemaFor(
      df.withColumn("schema_rev", lit(2).cast("int"))
        .withColumn("at", col("at").cast("string")))
    val err = intercept[IllegalArgumentException](registry.register("s", v3))
    assert(err.getMessage.contains("BACKWARD"))
    // the registry state is unchanged by the rejected attempt
    assert(registry.latest("s")._2 == v2)
  }

  test("a v2 reader decodes mixed v1/v2 writer bytes in one pass") {
    val df = requestsDf.localCheckpoint()
    val registry = new WireRegistry
    val v1 = AvroWire.schemaFor(df)
    val id1 = registry.register("s", v1)
    val dfV2 = df.withColumn("schema_rev", lit(2))
    val v2 = AvroWire.schemaFor(dfV2)
    val id2 = registry.register("s", v2)

    val oldBytes = df.limit(50)
      .select(AvroWire.toWire(struct(df.columns.map(col): _*), v1, id1).as("value"))
    val newBytes = dfV2.limit(50)
      .select(AvroWire.toWire(struct(dfV2.columns.map(col): _*), v2, id2).as("value"))
    val decoded = oldBytes.unionAll(newBytes)
      .select(AvroWire.fromWire(col("value"),
        registry.latest("s")._2, registry.writers).as("r"))
      .select("r.*")
    assert(decoded.count() == 100)
    // v1 frames surface the evolved field as its null default; v2 carry it
    assert(decoded.filter(col("schema_rev").isNull).count() == 50)
    assert(decoded.filter(col("schema_rev") === 2).count() == 50)
    // and the non-evolved payload survives both paths
    assert(decoded.select("id").distinct().count() ==
      df.limit(50).select("id").distinct().count())
  }

  test("decode rejects unframed bytes and unknown schema ids with clear errors") {
    import spark.implicits._
    val df = requestsDf.limit(5).localCheckpoint()
    val registry = new WireRegistry
    val schema = AvroWire.schemaFor(df)
    val id = registry.register("s", schema)
    val frames = df
      .select(AvroWire.toWire(struct(df.columns.map(col): _*), schema, id).as("value"))

    // bytes missing the magic/frame → actionable failure, not garbage rows
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("value")
    val e1 = intercept[Exception] {
      bad.select(AvroWire.fromWire(col("value"), schema, registry.writers)).collect()
    }
    assert(e1.getMessage != null)

    // a frame whose id the registry does not know → named in the error
    val e2 = intercept[Exception] {
      frames.select(AvroWire.fromWire(col("value"), schema, Map(999 -> schema)))
        .collect()
    }
    assert(e2.getMessage.contains("unknown writer schema id") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("unknown writer schema id")))
  }

  test("wireIngestion: the statement set fed from framed binary == typed ingestion") {
    import spark.implicits._
    import graft.streaming.Jobs
    import graft.tables.TableCatalog
    implicit val sqlCtx = spark.sqlContext
    def fresh(name: String): String = {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_avro_wire", name)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f))
      java.nio.file.Files.createDirectories(p)
      p.toString
    }
    val funnel = RtbGenerator.generate(7L, 300, 1704103200000L, 3600000L,
      RtbGenerator.Rates(0.05, 0.05, 0.05, 0.05))
    val typedDfs = Seq(
      spark.createDataset(funnel.requests).toDF(),
      spark.createDataset(funnel.responses).toDF(),
      spark.createDataset(funnel.impressions).toDF(),
      spark.createDataset(funnel.clicks).toDF())

    // register each stream's writer schema under its topic subject, then
    // encode every event into the Kafka payload shape
    val registry = new WireRegistry
    val frames = typedDfs.zip(Jobs.wireSubjects).map { case (df, subject) =>
      val schema = AvroWire.schemaFor(df)
      val id = registry.register(subject, schema)
      df.select(AvroWire.toWire(struct(df.columns.map(col): _*), schema, id).as("value"))
        .as[Array[Byte]].collect()
    }

    val cat = new TableCatalog(spark, fresh("wh"), Jobs.ingestionTableDefs(spark))
    val srcs = Seq.fill(4)(MemoryStream[Array[Byte]])
    val pipe = Jobs.wireIngestion(srcs(0).toDF(), srcs(1).toDF(),
      srcs(2).toDF(), srcs(3).toDF(), registry, cat, fresh("ckpt"))
    try {
      srcs.zip(frames).foreach { case (s, f) => s.addData(f.toSeq) }
      pipe.processAllAvailable()
    } finally pipe.stop()

    // every landed table must equal the typed batch recompute
    val flatReqs = RtbIngest.flattenRequests(typedDfs(0))
    val expect = Seq(
      Jobs.cleanTable -> RtbIngest.cleanRequests(flatReqs),
      Jobs.rejectedTable -> RtbIngest.rejectedRequests(flatReqs),
      Jobs.bidsTable -> RtbIngest.flattenBids(typedDfs(1)),
      Jobs.impressionsTable -> typedDfs(2)
        .withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp"))),
      Jobs.clicksTable -> typedDfs(3)
        .withColumn("event_ts", RtbIngest.parseTs(col("event_timestamp"))))
    for ((name, want) <- expect) {
      val got = cat.table(name).readLogical()
      assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
        s"table $name must equal the typed-path recompute")
    }
  }

  test("wireIngestion via FrameSource: file-staged topics land the same tables") {
    import spark.implicits._
    import graft.streaming.Jobs
    import graft.tables.TableCatalog
    def fresh(name: String): String = {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_frame_src", name)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.delete(f))
      java.nio.file.Files.createDirectories(p)
      p.toString
    }
    val funnel = RtbGenerator.generate(11L, 200, 1704103200000L, 3600000L,
      RtbGenerator.Rates(0.05, 0.05, 0.05, 0.05))
    val typedDfs = Seq(
      spark.createDataset(funnel.requests).toDF(),
      spark.createDataset(funnel.responses).toDF(),
      spark.createDataset(funnel.impressions).toDF(),
      spark.createDataset(funnel.clicks).toDF())
    val registry = new WireRegistry
    val topicRoot = fresh("topics")
    // stage each topic's frames as parquet under root/<topic>/ — the
    // FileFrameSource contract (a single-partition topic emulation)
    typedDfs.zip(Jobs.wireSubjects).zip(Jobs.wireTopics).foreach {
      case ((df, subject), topic) =>
        val schema = AvroWire.schemaFor(df)
        val id = registry.register(subject, schema)
        df.select(AvroWire.toWire(struct(df.columns.map(col): _*), schema, id).as("value"))
          .write.parquet(s"$topicRoot/$topic")
    }
    val cat = new TableCatalog(spark, fresh("wh"), Jobs.ingestionTableDefs(spark))
    val pipe = Jobs.wireIngestion(spark, new FileFrameSource(topicRoot),
      registry, cat, fresh("ckpt"))
    try pipe.processAllAvailable() finally pipe.stop()
    val flatReqs = RtbIngest.flattenRequests(typedDfs(0))
    val want = RtbIngest.cleanRequests(flatReqs)
    val got = cat.table(Jobs.cleanTable).readLogical()
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "clean_requests from the FrameSource path must equal the typed recompute")
    assert(cat.table(Jobs.clicksTable).readLogical().count() ==
      typedDfs(3).count())
  }

  test("streamed wire decode equals the batch flatten (the S1 source shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val df = requestsDf.localCheckpoint()
    val registry = new WireRegistry
    val schema = AvroWire.schemaFor(df)
    val id = registry.register("bid-requests-value", schema)
    val frames = df
      .select(AvroWire.toWire(struct(df.columns.map(col): _*), schema, id).as("value"))
      .as[Array[Byte]].collect()

    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Array[Byte]]
    val out = RtbIngest.flattenRequests(
      src.toDF().select(AvroWire.fromWire(col("value"), schema, registry.writers).as("r"))
        .select("r.*"))
    val q = out.writeStream.format("memory").queryName("avro_wire_flat")
      .outputMode("append").start()
    try {
      src.addData(frames.take(100))
      src.addData(frames.drop(100))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("avro_wire_flat")
    val batch = RtbIngest.flattenRequests(df)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "wire-decoded streaming flatten must equal the typed batch flatten")
  }
}
