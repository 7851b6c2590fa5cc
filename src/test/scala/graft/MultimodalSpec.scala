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

  test("resize caps bytes at w*h, keeps order, and rewrites meta") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val out = Multimodal.resized(blobs, 8, 4).collect()
    val srcLen = blobs.selectExpr("id", "octet_length(data) AS n").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("n")).toMap
    out.foreach { r =>
      val d = r.getAs[Array[Byte]]("data")
      assert(d.length === math.min(srcLen(r.getAs[Long]("id")), 32))
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") === 8)
    }
    // subsampling preserves content: a resized blob's bytes all occur
    // in the source in order (stride sampling never reorders)
    val one = Multimodal.asBlobTable(
      spark.createDataFrame(Seq((1L, "abcdefghijklmnop"))).toDF("doc_id", "text"),
      "doc_id", "text")
    val d = Multimodal.resized(one, 2, 2).head().getAs[Array[Byte]]("data")
    assert(new String(d, "UTF-8") === "aeim") // stride 4 over 16 bytes
  }

  test("frameSample yields n frames whose concatenation is the blob") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val frames = Multimodal.frameSample(blobs, 4).collect()
      .groupBy(_.id).map { case (id, fs) =>
        id -> fs.sortBy(_.frame_idx).map(_.frame).reduce(_ ++ _)
      }
    val src = blobs.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("data")).toMap
    assert(frames.size === src.size)
    frames.foreach { case (id, joined) => assert(joined.sameElements(src(id))) }
    // short-blob edge: 2 bytes into 4 frames = three empty + the rest
    val tiny = Multimodal.asBlobTable(
      spark.createDataFrame(Seq((9L, "xy"))).toDF("doc_id", "text"),
      "doc_id", "text")
    val t = Multimodal.frameSample(tiny, 4).collect().sortBy(_.frame_idx)
    assert(t.map(_.frame.length).toSeq === Seq(0, 0, 0, 2))
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
