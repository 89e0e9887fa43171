package graft.io

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.schema.DocResult

/** Per-run extraction statistics as a typed Aggregator (SURVEY §2.9: typed
  * UDAF for lineage metrics) — usable with `ds.select(SpanStats.agg)` or
  * observed on the result stream. */
case class SpanStatsRow(docs: Long, spans: Long, max_spans: Long, chars: Long)

object SpanStats extends Aggregator[DocResult, SpanStatsRow, SpanStatsRow] {

  override def zero: SpanStatsRow = SpanStatsRow(0L, 0L, 0L, 0L)

  override def reduce(b: SpanStatsRow, d: DocResult): SpanStatsRow =
    SpanStatsRow(
      b.docs + 1,
      b.spans + d.spans.length,
      math.max(b.max_spans, d.spans.length.toLong),
      b.chars + d.spans.iterator.map(_.text.length.toLong).sum)

  override def merge(a: SpanStatsRow, b: SpanStatsRow): SpanStatsRow =
    SpanStatsRow(a.docs + b.docs, a.spans + b.spans,
      math.max(a.max_spans, b.max_spans), a.chars + b.chars)

  override def finish(r: SpanStatsRow): SpanStatsRow = r

  override def bufferEncoder: Encoder[SpanStatsRow] = Encoders.product[SpanStatsRow]
  override def outputEncoder: Encoder[SpanStatsRow] = Encoders.product[SpanStatsRow]
}
