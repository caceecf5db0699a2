package graft

import graft.functions.Multimodal
import graft.functions.Multimodal.MediaRecord

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, bytes: Array[Byte]) = MediaRecord(id, bytes, "image/fake")

  test("decodeMeta batches per partition and emits deterministic meta") {
    val ds = Seq(
      rec(1L, Array[Byte](1, 2, 3, 4)),
      rec(2L, Array[Byte](9, 9, 9, 9, 9, 9)),
      rec(3L, Array.empty[Byte])).toDS().repartition(2)
    val out = Multimodal.decodeMeta(ds).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out(0).ok && out(0).n_bytes == 4 && out(0).width >= 64 && out(0).height >= 64)
    assert(!out(2).ok && out(2).format == "empty")
    // determinism: same payload → same meta on a rerun
    val again = Multimodal.decodeMeta(ds).collect().sortBy(_.media_id)
    assert(out.toSeq.map(m => (m.width, m.height)) == again.toSeq.map(m => (m.width, m.height)))
  }

  test("resize stub bounds payload size; frame sampling explodes chunks") {
    val ds = Seq(rec(1L, Array.fill[Byte](100)(7))).toDS()
    val resized = Multimodal.resizeStub(ds, maxDim = 10).collect().head
    assert(resized.payload.length == 10)
    val frames = Multimodal.frameSampleStub(ds, chunkBytes = 10, everyK = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sorted
    // 10 chunks of 10 bytes, every 2nd → frames 0,2,4,6,8
    assert(frames.map(_._1).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_._2 == 10))
  }

  test("metadata projection prunes the binary column from the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    Seq((1L, Array[Byte](1, 2, 3), "image/fake", 3L))
      .toDF("media_id", "payload", "mime_type", "n_bytes")
      .write.mode("overwrite").parquet(dir)
    val scan = Multimodal.metaProjection(spark.read.parquet(dir))
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("media_id"))
    assert(!plan.split("ReadSchema").last.contains("payload"),
      s"binary column not pruned from scan: $plan")
    assert(scan.collect().head.getLong(2) == 3L)
  }
}
