package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Zero-extra-pass pipeline telemetry via `Dataset.observe`.
  *
  * A 100 TB curation run cannot afford a second "how many rows did the
  * filter drop" scan — every audit pass is a full corpus read. Spark's
  * observe API accumulates named aggregate metrics ON THE SAME TASKS
  * that execute the query (an `AggregatingAccumulator` per partition,
  * merged on the driver), so input counts, null rates, and drop
  * tallies ride the production job for free. This helper packages the
  * `Observation` handshake: attach metrics to any stage of a frame,
  * run ONE action, then read the metrics map.
  *
  * Constraints inherited from the API (worth knowing at scale): the
  * metric expressions must be aggregates without distinct/filter
  * clauses, and the values describe the rows that FLOWED THROUGH the
  * observed node in that action — a limit/pruned plan above it sees
  * fewer rows, which is exactly what an ingest audit wants to know.
  * Streaming queries observe per micro-batch via the listener instead
  * (`QueryProgress.observedMetrics`) — same expressions, same plan
  * node.
  *
  * Reference: none — the reference has no telemetry surface; this is
  * the operability side of the north-star extensions (SURVEY §7.4).
  */
object Telemetry {

  /** `df` with `metrics` observed under `name`, plus the handle to
    * read them after the next action on the returned frame. Metric
    * values are read with `observation.get` (blocks until an action
    * completes) — one action, one set of values. */
  def observed(df: DataFrame, name: String,
      metrics: (String, Column)*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "Telemetry.observed: no metrics given")
    val obs = Observation(name)
    val cols = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, cols.head, cols.tail: _*), obs)
  }

  /** The STREAMING spelling: `Observation` refuses streaming frames
    * (one handle, many micro-batches), so streams observe by NAME and
    * the per-micro-batch values surface on every progress event —
    * `query.recentProgress.map(_.observedMetrics.get(name))` (or a
    * StreamingQueryListener for push delivery). Same expressions, same
    * plan node, same zero-extra-pass property per micro-batch. */
  def observedStream(df: DataFrame, name: String,
      metrics: (String, Column)*): DataFrame = {
    require(metrics.nonEmpty, "Telemetry.observedStream: no metrics given")
    val cols = metrics.map { case (n, c) => c.as(n) }
    df.observe(name, cols.head, cols.tail: _*)
  }
}
