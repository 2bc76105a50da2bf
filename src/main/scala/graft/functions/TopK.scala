package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation for similarity search.
  *
  * The window formulation (row_number over partitionBy(query)) must
  * shuffle EVERY scored candidate row to the query's partition before
  * ranking — O(Q·N) rows through the exchange. This Aggregator keeps a
  * bounded buffer per query per map task, so partial aggregation reduces
  * each partition's contribution to ≤k rows before the shuffle: the
  * exchange carries O(Q·k·partitions) rows regardless of N. At 100 TB
  * candidate scans this is the difference between a shuffle measured in
  * TB and one measured in MB.
  *
  * Ordering: score desc, id asc (stable tie-break, matching the
  * window/oracle formulation).
  */
object TopK {

  case class Scored(id: Long, score: Double)

  private val MaxSlack = 4 // buffer grows to k*MaxSlack before trimming

  class TopKAggregator(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    private def trim(buf: Seq[Scored]): Seq[Scored] =
      buf.sortWith(better).take(k)

    override def zero: Seq[Scored] = Vector.empty

    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = {
      val b = buf :+ in
      if (b.length > k * MaxSlack) trim(b) else b
    }

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      trim(a ++ b)

    override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf)

    // ExpressionEncoder (not kryo): the output stays a Catalyst
    // array<struct<id,score>> that downstream SQL can explode/index.
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column function: top-k (id, score) structs per group.
    * Usage: df.groupBy("query_id").agg(top_k(3)(col("id"), col("score"))) */
  def top_k(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKAggregator(k), Encoders.product[Scored])
    (id: Column, score: Column) => f(id, score)
  }
}
