package graft

import graft.ext.Text
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col

class TextSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("lang_id recognizes real multilingual sentences") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy"),
      (2L, "der hund ist nicht mit der katze im haus"),
      (3L, "el perro y el gato en la casa de la abuela"),
      (4L, "le chat est dans la maison pour le dîner"),
      (5L, "这 是 一个 中文 句子 的 例子"),
      (6L, "qwerty zxcvb asdfgh")
    ).toDF("id", "text")
    val m = df.select(col("id"), lang_id(col("text")).as("l")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) === "en")
    assert(m(2L) === "de")
    assert(m(3L) === "es")
    assert(m(4L) === "fr")
    assert(m(5L) === "zh")
    assert(m(6L) === "und")
  }

  test("token stats cover all documents") {
    val rows = Text.tokenStats(spark, sf).collect()
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === graft.tables.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_tokens") > 0)
      assert(r.getAs[Double]("chars_per_token") > 0)
    }
  }

  test("exact dedup keeps one doc per fingerprint") {
    val rows = Text.exactDedup(spark, sf).collect()
    assert(rows.map(_.getAs[String]("fp")).distinct.length === rows.length)
    val totalCopies = rows.map(_.getAs[Long]("n_copies")).sum
    assert(totalCopies === graft.tables.Tables.documents(spark, sf).count())
  }

  test("ngram jaccard pairs are symmetric-free and above threshold") {
    val rows = Text.ngramJaccard(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getAs[Double]("jaccard") >= 0.12)
    }
  }
}
