package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.ext.Multimodal.{MediaFeatures, MediaRow}

class MultimodalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val media = Multimodal.mediaTable(spark, sf).as[MediaRow]

  test("media table: binary content with typed metadata columns") {
    val schema = media.schema
    assert(schema("content").dataType.typeName === "binary")
    assert(media.count() === graft.tables.Tables.documents(spark, sf).count())
    val types = media.select("media_type").distinct().as[String].collect().toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("feature extraction preserves rows and emits fixed-dim features") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() === media.count())
    val sample = feats.take(10)
    sample.foreach { f =>
      assert(f.feature.length === Multimodal.MediaCodec.FeatureDim)
      assert(f.width >= 1 && f.width <= 640)
      assert(f.height >= 1 && f.height <= 480)
    }
  }

  test("decode stub is deterministic across partitionings") {
    val a = Multimodal.extractFeatures(media.repartition(8).as[MediaRow])
      .collect().sortBy(_.doc_id).map(_.feature.toSeq)
    val b = Multimodal.extractFeatures(media.coalesce(1).as[MediaRow])
      .collect().sortBy(_.doc_id).map(_.feature.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("frame sampling fans out only videos, stride respected") {
    val feats = Multimodal.extractFeatures(media)
    val frames = Multimodal.sampleFrames(feats, stride = 10)
    val perDoc = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), first("n_frames").as("f"))
      .collect()
    perDoc.foreach { r =>
      val expected = (r.getAs[Int]("f") + 9) / 10
      assert(r.getAs[Long]("n") === expected)
    }
    assert(frames.count() > 0)
  }

  test("resize stub preserves aspect ratio within the max dimension") {
    val feats = Multimodal.extractFeatures(media)
    val resized = Multimodal.resizeMeta(feats, maxDim = 100).collect()
    resized.foreach { f =>
      assert(f.width <= 100 && f.height <= 100)
      assert(f.width >= 1 && f.height >= 1)
    }
    // un-resized metadata unchanged for already-small media
    val before = feats.collect().map(f => f.doc_id -> f).toMap
    resized.filter(f => before(f.doc_id).width <= 100 &&
      before(f.doc_id).height <= 100).foreach { f =>
      assert(f.width === before(f.doc_id).width)
      assert(f.height === before(f.doc_id).height)
    }
  }

  test("features feed the similarity operators (cosine over array<float>)") {
    import graft.functions.VectorFunctions.cosine_sim
    val feats = Multimodal.extractFeatures(media).toDF()
    val self = feats.select(cosine_sim(col("feature"), col("feature")).as("c"))
      .agg(min("c"), max("c")).collect()(0)
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-9)
  }
}
