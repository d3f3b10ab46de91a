package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the derived ANN bucket-plane count ([[Similarity.annPlanes]])
  * at the exact corpus cardinalities of the test-data ladder, plus the
  * clamp edges. The DuckDB mirror (`annNpSql`:
  * `LEAST(12, GREATEST(4, LENGTH(PRINTF('%b', n // 256))))`) computes
  * bit-length the same way, so these values ARE the cross-engine
  * contract — a drift here breaks s21/w23 parity at every rung where
  * the derivation fires (sf1 and up). Gate scales (n ≤ 2000) must stay
  * at the 4-plane floor so their bucket ids remain bit-identical to
  * the fixed-plane era.
  */
class AnnPlanesSpec extends AnyFunSuite {

  test("ladder cardinalities derive the laddered plane counts") {
    assert(Similarity.annPlanes(500L) === 4)      // sf0.001 / sf0.01: floor
    assert(Similarity.annPlanes(2000L) === 4)     // sf0.1: floor (7 // 256 -> bl 3)
    assert(Similarity.annPlanes(20000L) === 7)    // sf1: bl(78) = 7
    assert(Similarity.annPlanes(200000L) === 10)  // sf10: bl(781) = 10
    assert(Similarity.annPlanes(2000000L) === 12) // sf100: bl(7812)=13, capped
  }

  test("clamp edges: floor at 4 planes, cap at 12") {
    assert(Similarity.annPlanes(0L) === 4)
    assert(Similarity.annPlanes(1L) === 4)
    assert(Similarity.annPlanes(Long.MaxValue / 4) === 12)
    // first n where the derivation leaves the floor: bl(n/256) = 5
    assert(Similarity.annPlanes(16 * 256L) === 5)
    assert(Similarity.annPlanes(16 * 256L - 1) === 4)
  }

  test("occupancy stays bounded: 8 cells x 2^np keeps n per (cell,bucket) under ~64 below the cap") {
    for (n <- Seq(5000L, 50000L, 500000L, 1000000L)) {
      val np = Similarity.annPlanes(n)
      val occ = n.toDouble / (8 << np)
      assert(occ < 64.0, s"n=$n np=$np occupancy $occ")
    }
  }
}
