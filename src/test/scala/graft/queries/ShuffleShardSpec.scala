package graft.queries

import graft.{SparkSpec, Tables}
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Semantics of the q86 deterministic shuffle + sharding: the shard CASE
  * chain against an independent numeric computation, balance, determinism,
  * and the [[graft.sources.ShuffledShards]] layout contract (key-sorted
  * files, disjoint ranges, shard directories).
  */
class ShuffleShardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("shard equals the numeric hex-range computation, and shards balance") {
    val out = graft.SparkEntry.queries("q86_shuffle_shard")(spark, sf).collect()
    assert(out.nonEmpty)
    val n = 8
    out.foreach { r =>
      val key   = r.getAs[String]("shuffle_key")
      val shard = r.getAs[Int]("shard")
      // independent truth: the key as a number, binned into n equal ranges
      // by the same floor(i/n·2^32) boundaries
      val k = java.lang.Long.parseLong(key, 16)
      val expect = (1 until n)
        .find(i => k < math.floor(i.toDouble / n * 4294967296.0).toLong)
        .map(_ - 1).getOrElse(n - 1)
      assert(shard === expect, s"doc ${r.getLong(0)} key $key")
    }
    // balance: each shard within ±50% of the uniform share (loose binomial
    // bound at corpus size)
    val byShard = out.groupBy(_.getAs[Int]("shard")).view.mapValues(_.length)
    val share = out.length.toDouble / n
    assert(byShard.size === n)
    byShard.foreach { case (s, c) =>
      assert(c > share * 0.5 && c < share * 1.5, s"shard $s count $c")
    }
  }

  test("the shuffle is deterministic and independent of the other streams") {
    val a = graft.SparkEntry.queries("q86_shuffle_shard")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    val b = graft.SparkEntry.queries("q86_shuffle_shard")(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
    // ':shuf' keys differ from the ':mix' sample keys (stream independence)
    val both = Tables.documents(spark, sf)
      .select(col("doc_id"),
        TextQueries.shuffleKeyCol.as("k1"),
        substring(md5(concat(col("doc_id").cast("string"), lit(":mix"))), 1, 8)
          .as("k2"))
    assert(both.filter(col("k1") === col("k2")).count() <
      both.count() / 100 + 1)
  }

  test("writeShuffled: shard dirs, key-sorted files, disjoint file ranges") {
    val dir = Files.createTempDirectory("graft-shuf").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val framed = docs.join(
      TextQueries.shuffleShardsOf(docs.select("doc_id")), "doc_id")
    graft.sources.ShuffledShards.writeShuffled(framed, dir, numFiles = 16)
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    // every shard directory exists
    assert(back.select("shard").distinct().count() === 8L)
    // within every file, rows are sorted by key; across files (within a
    // shard) ranges are disjoint
    val perFile = back
      .withColumn("f", input_file_name())
      .groupBy(col("shard"), col("f"))
      .agg(min("shuffle_key").as("lo"), max("shuffle_key").as("hi"),
        count(lit(1)).as("cnt"))
      .collect()
    perFile.groupBy(_.getAs[Int]("shard")).foreach { case (_, files) =>
      val ranges = files.map(r =>
        (r.getAs[String]("lo"), r.getAs[String]("hi"))).sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hiA), (loB, _)) => assert(hiA <= loB)
        case _ =>
      }
    }
    // in-file sort: per-file sorted sample equals its natural read order
    val oneFile = perFile.maxBy(_.getAs[Long]("cnt")).getAs[String]("f")
    val keys = spark.read.parquet(oneFile.replace("file://", ""))
      .select("shuffle_key").collect().map(_.getString(0)).toSeq
    assert(keys === keys.sorted)
  }
}
