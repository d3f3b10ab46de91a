package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed mergeable rollup over decoded media features: asset count,
  * total payload bytes, and the mean of per-asset mean byte values.
  *
  * The double mean is made order-independent the house way (see
  * `ops/Similarity.s4LabelCentroids`): each per-asset mean is quantized
  * once — `floor(x·1e7)` as a long (IEEE multiply + floor are
  * bit-identical in any engine) — partials sum in exact integer
  * arithmetic, and `finish` performs the one final double division. This
  * is the `Aggregator` contract on the TYPED path
  * (`KeyValueGroupedDataset.agg` over a case-class Dataset), the shape
  * that survives merges from any partitioning.
  */
final case class FeatureRollup()
    extends Aggregator[graft.ops.Multimodal.MediaFeatures, (Long, Long, Long), (Long, Long, Double)] {

  override def zero: (Long, Long, Long) = (0L, 0L, 0L)

  override def reduce(b: (Long, Long, Long),
      f: graft.ops.Multimodal.MediaFeatures): (Long, Long, Long) =
    (b._1 + 1L, b._2 + f.nBytes, b._3 + math.floor(f.meanByte * 1.0e7).toLong)

  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, a._2 + b._2, a._3 + b._3)

  override def finish(r: (Long, Long, Long)): (Long, Long, Double) =
    (r._1, r._2, r._3.toDouble / 1.0e7 / r._1)

  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.product[(Long, Long, Long)]
  override def outputEncoder: Encoder[(Long, Long, Double)] =
    Encoders.product[(Long, Long, Double)]
}
