package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroSourceSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"avro_$name").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def readBack(dir: String): DataFrame =
    spark.read.format("graft-avro").load(dir)

  test("round-trip: primitives, date/timestamp logical types, nulls") {
    val dir = tmpDir("prims")
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType)))
    val rows = Seq(
      Row(true, 1, 10L, 1.5f, 2.5, "alpha", Array[Byte](1, 2, 3),
        Date.valueOf("2020-01-31"), Timestamp.valueOf("2020-01-31 12:34:56.789012")),
      Row(false, -2, -20L, -1.5f, -2.5, "", Array[Byte](),
        Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.0")),
      Row(null, null, null, null, null, null, null, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val back = readBack(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r => r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }).toSet
    val want = rows.map(_.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }).toSet
    assert(got == want)
  }

  test("round-trip: arrays, string-keyed maps, nested structs") {
    val dir = tmpDir("nested")
    val df = Seq(
      (1L, Seq("a", "b"), Map("x" -> 1, "y" -> 2), ("inner", 7)),
      (2L, Seq.empty[String], Map.empty[String, Int], (null.asInstanceOf[String], 0)))
      .toDF("id", "arr", "m", "st")
    df.write.format("graft-avro").mode("overwrite").save(dir)
    val back = readBack(dir).orderBy("id")
      .select(col("id"), col("arr"), map_entries(col("m")).as("me"), col("st"))
    val want = df.orderBy("id")
      .select(col("id"), col("arr"), map_entries(col("m")).as("me"), col("st"))
    assert(back.collect().toSeq == want.collect().toSeq)
  }

  test("sync-marker splits: one large file fans out to many partitions, exact row set") {
    val dir = tmpDir("split")
    val df = spark.range(20000).select(col("id"),
      concat(lit("row-"), col("id")).as("tag"))
    df.coalesce(1).write.format("graft-avro")
      .mode("overwrite").option("compression", "none").save(dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 1, "fixture must be a single container file")
    val split = spark.read.format("graft-avro").option("splitBytes", "65536").load(dir)
    assert(split.rdd.getNumPartitions > 1,
      s"a ${files.head.length()}-byte file at 64 KB splits must fan out")
    assert(split.count() == 20000)
    assert(split.agg(sum("id")).head().getLong(0) == 20000L * 19999 / 2)
    // no row lost or duplicated at block boundaries
    assert(split.select("id").distinct().count() == 20000)
  }

  test("column pruning reaches the scan (reader schema projects, not post-hoc)") {
    val dir = tmpDir("prune")
    spark.range(100).select(col("id"), lit("payload").as("big"), (col("id") * 2).as("v"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    val q = readBack(dir).select("v")
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("v"),
      s"scan must read only [v], got ${scans.head.output.map(_.name)}")
    assert(q.agg(sum("v")).head().getLong(0) == 9900)
  }

  test("append adds files; overwrite truncates prior data") {
    val dir = tmpDir("modes")
    val one = spark.range(10).select(col("id"))
    one.write.format("graft-avro").mode("overwrite").save(dir)
    one.write.format("graft-avro").mode("append").save(dir)
    assert(readBack(dir).count() == 20)
    spark.range(5).select(col("id"))
      .write.format("graft-avro").mode("overwrite").save(dir)
    assert(readBack(dir).count() == 5)
    // no stray .tmp files survive a commit
    assert(!new java.io.File(dir).listFiles().exists(_.getName.endsWith(".tmp")))
  }

  test("schema inference matches the written Spark schema") {
    val dir = tmpDir("infer")
    val df = Seq((1, 2L, 0.5, "s")).toDF("i", "l", "d", "s")
    df.write.format("graft-avro").mode("overwrite").save(dir)
    assert(readBack(dir).schema == df.schema)
  }
}
