package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("binaryFile source reads raw blobs with length metadata") {
    val df = Multimodal.readBinaryFiles(spark, "/root/reference/files/*.bin")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("length") === r.getAs[Array[Byte]]("content").length.toLong)
    }
  }

  test("blob table schema: binary data + typed metadata struct") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val schema = blobs.schema
    assert(schema("data").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val r = blobs.head()
    assert(r.getAs[Array[Byte]]("data").nonEmpty)
  }

  test("feature extraction is deterministic and matches the stub contract") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val a = Multimodal.extractFeatures(blobs).collect().sortBy(_.id)
    val b = Multimodal.extractFeatures(blobs).collect().sortBy(_.id)
    assert(a.map(f => (f.id, f.n_bytes, f.checksum)).toSeq ===
           b.map(f => (f.id, f.n_bytes, f.checksum)).toSeq)
    // n_bytes equals the utf-8 length of the source text
    val lens = Tables.documents(spark, SparkSuite.sf0001)
      .selectExpr("doc_id", "octet_length(text) AS n").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n").toLong).toMap
    a.take(50).foreach(f => assert(f.n_bytes === lens(f.id)))
    // histogram buckets sum to min(256, n_bytes)
    a.take(50).foreach(f =>
      assert(f.head_histogram.sum.toLong === math.min(256L, f.n_bytes)))
  }
}
