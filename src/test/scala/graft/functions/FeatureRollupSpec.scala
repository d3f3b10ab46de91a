package graft.functions

import graft.ops.Multimodal.MediaFeatures
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The Aggregator contract FeatureRollup must honor for distributed
  * partials: any partitioning of the input and any merge tree must give
  * the same buffer (the fixed-point quantization makes the double part
  * an exact integer sum, so this is checkable with ===, not tolerance).
  */
class FeatureRollupSpec extends AnyFunSuite {
  private val agg = FeatureRollup()

  private def feat(id: Long, bytes: Long, mean: Double): MediaFeatures =
    MediaFeatures(id, "image", bytes, mean, 64)

  private def reduceAll(fs: Seq[MediaFeatures]): (Long, Long, Long) =
    fs.foldLeft(agg.zero)(agg.reduce)

  private val genFeat: Gen[MediaFeatures] = for {
    id <- Gen.chooseNum(0L, 1000L)
    bytes <- Gen.chooseNum(0L, 100000L)
    mean <- Gen.chooseNum(0, 255000).map(_ / 1000.0)
  } yield feat(id, bytes, mean)

  test("merge of any split equals the single-pass reduce") {
    val params = Gen.Parameters.default
    (1 to 50).foreach { i =>
      val fs = Gen.listOfN(40, genFeat)
        .apply(params, Seed(i.toLong)).getOrElse(Nil)
      val whole = reduceAll(fs)
      (0 to fs.length).by(7).foreach { cut =>
        val (a, b) = fs.splitAt(cut)
        assert(agg.merge(reduceAll(a), reduceAll(b)) === whole,
          s"split at $cut diverged (seed $i)")
      }
      // associativity across a 3-way tree
      val (x, rest) = fs.splitAt(13)
      val (y, z) = rest.splitAt(13)
      val l = agg.merge(agg.merge(reduceAll(x), reduceAll(y)), reduceAll(z))
      val r = agg.merge(reduceAll(x), agg.merge(reduceAll(y), reduceAll(z)))
      assert(l === r, s"3-way merge not associative (seed $i)")
    }
  }

  test("finish divides the quantized sum once, by the asset count") {
    val fs = Seq(feat(1, 10, 100.5), feat(2, 20, 50.25), feat(3, 30, 0.0))
    val (n, bytes, meanMean) = agg.finish(reduceAll(fs))
    assert(n === 3L && bytes === 60L)
    val expected = (math.floor(100.5 * 1e7) + math.floor(50.25 * 1e7) + 0L) / 1e7 / 3
    assert(meanMean === expected)
  }
}
