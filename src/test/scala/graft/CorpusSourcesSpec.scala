package graft

import graft.sources.CorpusSources
import org.apache.spark.sql.{functions => F}

class CorpusSourcesSpec extends SparkSpec {

  test("embeddings reader validates schema and normalizes columns") {
    val e = CorpusSources.embeddings(spark, "/root/testdata/sf0.001/embeddings.parquet")
    assert(e.columns.toSeq == Seq("id", "vec"))
    assert(e.schema("vec").dataType.simpleString == "array<double>")
    assert(e.count() > 0)
    val bad = intercept[IllegalArgumentException] {
      CorpusSources.embeddings(spark, "/root/testdata/sf0.001/documents.parquet")
    }
    assert(bad.getMessage.contains("vec_id/id"))
  }

  test("documents reader requires doc_id and text") {
    val d = CorpusSources.documents(spark, "/root/testdata/sf0.001/documents.parquet")
    assert(d.columns.contains("doc_id") && d.columns.contains("text"))
    intercept[IllegalArgumentException] {
      CorpusSources.documents(spark, "/root/testdata/sf0.001/embeddings.parquet")
    }
  }

  test("json corpus reader extracts nested paths and tolerates corrupt lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "corpus.jsonl")
    val w = new java.io.PrintWriter(f)
    w.println("""{"meta":{"id":1},"body":{"descriptions":[{"value":"first doc"}]},"lang":"en"}""")
    w.println("""{"meta":{"id":2},"body":{"descriptions":[{"value":"second doc"}]},"lang":"de"}""")
    w.println("""{"meta":{"id":3},"body":{}}""") // missing text path
    w.println("""not json at all""")
    w.close()
    val docs = CorpusSources.jsonCorpus(
      spark, f.getAbsolutePath,
      idPath = "meta.id",
      textPath = "body.descriptions[0].value",
      fields = Map("lang" -> "lang"))
    val rows = docs.orderBy("doc_id").collect()
    assert(rows.length == 2, s"got ${rows.length}")
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "first doc")
    assert(rows(0).getString(2) == "en" && rows(1).getString(2) == "de")
    val corrupt = CorpusSources.jsonCorpusCorruptCount(
      spark, f.getAbsolutePath, "meta.id", "body.descriptions[0].value")
    assert(corrupt == 2L, s"got $corrupt")
  }
}
