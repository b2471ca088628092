package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Sinks, SchemaNormalizer}
import graft.sources.Tables

class SinksSpec extends AnyFunSuite {
  import SparkSuite._

  test("json.gz sink round-trips with schema.json sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val src = Tables.nation(spark, sf)
    val glob = Sinks.writeJsonGz(src, dir, "NATION-Table", partitions = Some(2))
    assert(glob == s"$dir/nation_table/part-*.json.gz")

    val files = new java.io.File(s"$dir/nation_table").listFiles()
    assert(files.exists(_.getName.endsWith(".json.gz")), "no gzip json parts written")
    assert(files.exists(_.getName == "schema.json"))

    val schemaJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/nation_table/schema.json"))
    assert(schemaJson.contains("\"name\": \"n_nationkey\"")
      && schemaJson.contains("\"type\": \"INT64\""))

    val back = spark.read.json(s"$dir/nation_table/part-*.json.gz")
    assert(back.count() == src.count())
    assert(back.columns.sorted.sameElements(src.columns.sorted))
  }

  test("empty table still gets data parts, sidecar, and a clean read-back") {
    // the reference's own TODO flags ".json sidecar file missing for
    // empty tables"; this sink writes it unconditionally
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-empty").toString
    val src = Tables.nation(spark, sf).filter("n_nationkey < 0")
    assert(src.count() == 0)
    for (fmt <- Seq("json", "csv", "parquet")) {
      val glob = Sinks.write(src, s"$dir/$fmt", "empty_t", fmt)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$fmt/empty_t/schema.json")), s"$fmt sidecar")
      val back = Sinks.read(spark, glob, fmt, src.schema)
      assert(back.count() == 0, s"$fmt read-back")
      assert(back.schema.fieldNames.sameElements(src.schema.fieldNames))
    }
  }

  test("schema normalizer rewrites column names only") {
    val df = Tables.nation(spark, sf).withColumnRenamed("n_name", "N Name-X")
    val out = SchemaNormalizer(df)
    assert(out.columns.contains("n_name_x"))
    assert(out.count() == df.count())
  }

  test("sizeBytes sums part files for the adaptive sizing loop") {
    val dir = java.nio.file.Files.createTempDirectory("graft-size").toString
    Sinks.writeJsonGz(Tables.region(spark, sf), dir, "region")
    assert(Sinks.sizeBytes(dir, "region") > 0)
    assert(Sinks.sizeBytes(dir, "absent") == 0)
  }
}
