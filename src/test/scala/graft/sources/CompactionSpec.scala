package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Nil
    walk(new java.io.File(dir))
  }

  test("compact merges small files and preserves every row") {
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft-compact").toString
    val path = s"$dir/t"
    val df = (0L until 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    df.repartition(16).write.parquet(path) // simulate streaming small files
    assert(parquetFiles(path).size === 16)
    val before = spark.read.parquet(path).collect().map(_.toString).sorted

    Sinks.compact(spark, path, numFiles = 2)

    assert(parquetFiles(path).size === 2)
    val after = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(after === before)
    // no swap debris left behind
    assert(!new java.io.File(s"${path}__staging").exists)
    assert(!new java.io.File(s"${path}__old").exists)
  }

  test("compact preserves ambiguous string partition values verbatim") {
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft-compact-str").toString
    val path = s"$dir/t"
    // "0" and "00" are distinct partitions; partition TYPE INFERENCE would
    // read both back as int 0 and silently merge them on rewrite
    Seq((1L, "0"), (2L, "00")).toDF("id", "p")
      .write.partitionBy("p").parquet(path)

    Sinks.compact(spark, path, numFiles = 1, partitionCols = Seq("p"))

    assert(new java.io.File(s"$path/p=0").isDirectory)
    assert(new java.io.File(s"$path/p=00").isDirectory)
    assert(spark.read.parquet(path).count() === 2)
  }

  test("compact preserves a hive-partitioned layout") {
    import spark.implicits._
    val dir  = Files.createTempDirectory("graft-compact-part").toString
    val path = s"$dir/t"
    val df = (0L until 400L).map(i => (i, (i % 4).toString)).toDF("id", "p")
    df.repartition(8).write.partitionBy("p").parquet(path)
    assert(parquetFiles(path).size > 8) // 8 files × up to 4 partitions

    Sinks.compact(spark, path, numFiles = 4, partitionCols = Seq("p"))

    // salted shuffle key: at most numFiles files per hive partition, and
    // NOT one giant file per partition (parallelism preserved)
    (0 to 3).foreach { pv =>
      val n = parquetFiles(s"$path/p=$pv").size
      assert(n >= 1 && n <= 4, s"p=$pv has $n files")
    }
    assert(new java.io.File(s"$path/p=0").isDirectory) // layout preserved
    // hive partition values read back type-inferred (p=0 → int)
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.get(1).toString)).sorted
    assert(rows.length === 400)
    assert(rows.map(_._1).toSeq === (0L until 400L))
  }
}
