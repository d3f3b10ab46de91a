package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom mergeable aggregate: exact top-k items by count (ties broken
  * lexicographically), emitted as a comma-joined string.
  *
  * The Aggregator contract is the mergeable-state shape that matters at
  * scale: `reduce` builds per-partition partial maps, `merge` combines
  * partials on the reduce side, `finish` ranks once per group — no
  * row-by-row shuffle of raw tokens beyond the partials. Exact counting
  * keeps the map as big as the group's vocabulary (bounded here); a
  * 100 TB corpus swaps the buffer for a SpaceSaving/count-min sketch with
  * the same Aggregator plumbing.
  */
final case class TopTokens(k: Int) extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], t: String): Map[String, Long] =
    b.updated(t, b.getOrElse(t, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (t, n)) => acc.updated(t, acc.getOrElse(t, 0L) + n) }

  override def finish(m: Map[String, Long]): String =
    m.toSeq.sortBy { case (t, n) => (-n, t) }.take(k).map(_._1).mkString(",")

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
