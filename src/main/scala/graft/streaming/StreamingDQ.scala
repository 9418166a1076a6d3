package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.quality.Rule

/** Structured-Streaming data-quality monitoring: the reference's
  * batch DQ loop (detect → score), recast as a continuous watermarked
  * windowed aggregation over an event stream.
  *
  * Works identically on any streaming DataFrame (Kafka, file source,
  * rate, MemoryStream in tests): transformations only — callers pick
  * the sink/trigger.
  */
object StreamingDQ {

  /** Windowed DQ rates for one column + rule set: per window, total /
    * null / out-of-format / proper counts and score. Late data beyond
    * the watermark is dropped, keeping state bounded (mandatory for
    * an unbounded 100 TB/day stream).
    */
  def windowedDqScore(stream: DataFrame, tsCol: String, column: String,
                      rules: Seq[Rule], windowDur: String = "1 minute",
                      watermark: String = "2 minutes"): DataFrame = {
    val c = col(column)
    val viol = Rule.anyViolation(c, rules)
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"))
      .agg(
        count(lit(1)).as("total"),
        count(when(c.isNull, 1)).as("null_records"),
        count(when(c.isNotNull && viol, 1)).as("out_of_format_records"))
      .select(
        col("w.start").as("window_start"),
        col("total"), col("null_records"), col("out_of_format_records"),
        (col("total") - col("null_records") - col("out_of_format_records"))
          .as("proper_format_records"),
        round((col("total") - col("null_records") - col("out_of_format_records"))
          * 100.0 / col("total"), 2).as("dq_score"))
  }

  /** Streaming dedup on a key with bounded state:
    * dropDuplicatesWithinWatermark keeps each key only while its
    * event time can still collide inside the watermark.
    */
  def streamingDedup(stream: DataFrame, tsCol: String, keyCols: Seq[String],
                     watermark: String = "2 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Windowed per-type event counts (profiling a stream the way the
    * batch profiler does a table).
    */
  def windowedTypeCounts(stream: DataFrame, tsCol: String, typeCol: String,
                         windowDur: String = "1 minute",
                         watermark: String = "2 minutes"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur).as("w"), col(typeCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"), col(typeCol), col("cnt"))
}
