package graft

import graft.ext.Skyline

/** 2-D skyline: dominance semantics, duplicate collapse, the
  * degenerate one-bucket path, and — the load-bearing property — that
  * the bucket prune is invisible next to a brute-force O(n²) oracle,
  * including on anticorrelated data where pruning keeps everything. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Set[(Double, Double)]): Set[(Double, Double)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y)
      }
    }

  private def run(pts: Seq[(Double, Double)],
                  buckets: Int): Set[(Double, Double)] =
    Skyline.skylineMax2D(pts.toDF("x", "y"), "x", "y", buckets)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet

  test("dominated points drop; same-x strictly-lower-y is dominated") {
    val pts = Seq((1.0, 10.0), (2.0, 9.0), (3.0, 8.0),
      (1.0, 5.0),  // dominated by (1, 10): same x, strictly lower y
      (0.5, 7.0))  // dominated by (1, 10) outright
    assert(run(pts, 4) == Set((1.0, 10.0), (2.0, 9.0), (3.0, 8.0)))
  }

  test("duplicate points collapse to one skyline point") {
    val pts = Seq((2.0, 9.0), (2.0, 9.0), (1.0, 10.0))
    assert(run(pts, 4) == Set((2.0, 9.0), (1.0, 10.0)))
  }

  test("all-equal x degrades to the single-bucket scan, still exact") {
    val pts = Seq((5.0, 1.0), (5.0, 3.0), (5.0, 2.0))
    assert(run(pts, 8) == Set((5.0, 3.0)))
  }

  test("prune is invisible vs the brute-force oracle (incl. " +
    "anticorrelated data that defeats pruning)") {
    // deterministic scatter + a perfectly anticorrelated diagonal
    // (every diagonal point is skyline — pruning must keep them all)
    val scatter = (0 until 200).map(i =>
      ((i * 7 % 13).toDouble, (i * 11 % 17).toDouble))
    val diagonal = (0 until 50).map(i =>
      (100.0 + i, 200.0 - i))
    for (pts <- Seq(scatter, diagonal, scatter ++ diagonal);
         b <- Seq(1, 4, 64)) {
      assert(run(pts, b) == brute(pts.toSet),
        s"mismatch at buckets=$b on ${pts.size} points")
    }
  }
}
