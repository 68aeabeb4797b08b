package graft.write

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.time.LocalDate

class DatePartitionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-dpt").toString

  test("writeRun lands one partition per run date; rerun replaces only that day") {
    val root = tmp()
    val t = new DatePartitionedTable(spark, root)
    t.writeRun(Seq((1, "a"), (2, "b")).toDF("id", "v"), LocalDate.of(2024, 1, 15))
    t.writeRun(Seq((3, "c")).toDF("id", "v"), LocalDate.of(2024, 1, 16))
    assert(t.read().count() === 3)

    // capture day-15's files, rerun day-16 with different data
    val day15Files = Paths.get(root, "run_date=2024-01-15").toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    t.writeRun(Seq((30, "c2"), (31, "c3")).toDF("id", "v"), LocalDate.of(2024, 1, 16))

    // day 16 replaced wholesale; day 15 untouched (same files)
    assert(t.readDay(LocalDate.of(2024, 1, 16)).select("id").as[Int].collect().toSet === Set(30, 31))
    assert(t.readDay(LocalDate.of(2024, 1, 15)).select("id").as[Int].collect().toSet === Set(1, 2))
    val day15After = Paths.get(root, "run_date=2024-01-15").toFile.listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(day15After === day15Files, "dynamic overwrite touched a partition it shouldn't")
  }

  test("readDay prunes partitions (PartitionFilters in the scan, not a full scan)") {
    val root = tmp()
    val t = new DatePartitionedTable(spark, root)
    t.writeRun(Seq((1, "a")).toDF("id", "v"), LocalDate.of(2024, 1, 15))
    t.writeRun(Seq((2, "b")).toDF("id", "v"), LocalDate.of(2024, 1, 16))
    val df = t.readDay(LocalDate.of(2024, 1, 16))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*run_date[^\\]]*\\].*"), plan)
    assert(df.count() === 1)
  }

  test("run-twice ≡ run-once (idempotent daily pipeline law)") {
    val t = new DatePartitionedTable(spark, tmp())
    val day = LocalDate.of(2024, 2, 1)
    t.writeRun(Seq((1, "x"), (2, "y")).toDF("id", "v"), day)
    t.writeRun(Seq((1, "x"), (2, "y")).toDF("id", "v"), day)
    assert(t.read().count() === 2)
  }
}
