package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sinks

/** Training-export sink: deterministic JSONL shards + manifest. */
class SinksSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  private def corpus = {
    val s = spark
    import s.implicits._
    (1 to 100).map(i => (i.toLong, s"doc number $i", i % 3)).toDF("doc_id", "text", "grp")
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sink").toString

  test("export round-trips: manifest counts sum to the corpus, rows read back equal") {
    val dir = tmpDir()
    Sinks.writeJsonlShards(corpus, "doc_id", dir, numShards = 4)
    val manifest = Sinks.jsonlManifest(spark, dir).collect()
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 100L)
    assert(manifest.length >= 1 && manifest.length <= 4)
    val back = spark.read.json(dir)
    assert(back.count() == 100L)
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ==
      (1L to 100L).toSet)
  }

  test("re-export of the same corpus is content-identical shard for shard") {
    val (d1, d2) = (tmpDir(), tmpDir())
    // Scramble the input partitioning the second time: shard contents
    // must be a function of the data alone.
    Sinks.writeJsonlShards(corpus, "doc_id", d1, numShards = 4)
    Sinks.writeJsonlShards(corpus.repartition(7), "doc_id", d2, numShards = 4)
    def sig(dir: String) = Sinks
      .jsonlManifest(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("n_rows"), r.getAs[String]("fingerprint")))
      .sortBy(_._2)
      .toSeq
    assert(sig(d1) == sig(d2))
  }

  test("maxRecordsPerFile caps every shard file") {
    val dir = tmpDir()
    Sinks.writeJsonlShards(corpus, "doc_id", dir, numShards = 2,
      maxRecordsPerFile = 10)
    val manifest = Sinks.jsonlManifest(spark, dir).collect()
    assert(manifest.forall(_.getAs[Long]("n_rows") <= 10L))
    assert(manifest.map(_.getAs[Long]("n_rows")).sum == 100L)
  }
}
