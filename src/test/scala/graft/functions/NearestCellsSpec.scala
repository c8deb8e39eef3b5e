package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** NearestCells drives both IVF stages (corpus→cell assignment and
  * query→cell probing) — its codegen and interpreted paths must equal an
  * independent plain-Scala argmax-r on arbitrary vectors, including the
  * (dot desc, id asc) tie order.
  */
class NearestCellsSpec extends SparkSuite {

  private val k = 17
  private val dim = 8
  private val rnd = new scala.util.Random(4242)

  private val ids: Array[Long] = Array.tabulate(k)(c => (c * 7 + 3).toLong)
  private val cents: Array[Double] = {
    val m = Array.fill(k * dim)(rnd.nextGaussian())
    // unit-normalize each row, as the callers do
    for (c <- 0 until k) {
      val nrm = math.sqrt((0 until dim).map(i => m(c * dim + i) * m(c * dim + i)).sum)
      for (i <- 0 until dim) m(c * dim + i) /= nrm
    }
    m
  }

  private def referenceTopR(v: Array[Float], r: Int): Seq[Long] =
    (0 until k).map { c =>
      val d = (0 until dim).map(i => cents(c * dim + i) * v(i).toDouble).sum
      (d, ids(c))
    }.sortBy { case (d, id) => (-d, id) }.take(r).map(_._2)

  test("codegen and interpreted top-r cells equal the plain-Scala reference") {
    import spark.implicits._
    val vecs = (0 until 300).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    for (r <- Seq(1, 2, 5, k, k + 3)) {
      val want = vecs.map { case (id, v) => id -> referenceTopR(v, math.min(r, k)) }.toMap
      def collect(codegen: Boolean): Map[Long, Seq[Long]] = {
        spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
        try df.select(col("id"),
            NearestCells.nearestCells(col("v"), cents, ids, k, dim, r).as("cells"))
          .collect().map(row => row.getLong(0) -> row.getSeq[Long](1)).toMap
        finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
      assert(collect(codegen = true) == want, s"codegen diverges at r=$r")
      assert(collect(codegen = false) == want, s"interpreted diverges at r=$r")
    }
  }

  test("exact ties rank by ascending cell id") {
    import spark.implicits._
    // Two identical centroids with different ids: the tie must resolve to
    // the smaller id first, on both paths.
    val dupCents = cents.slice(0, dim) ++ cents.slice(0, dim)
    val dupIds = Array(41L, 7L)
    val df = Seq((0L, Array.fill(dim)(0.5f))).toDF("id", "v")
    val got = df.select(
        NearestCells.nearestCells(col("v"), dupCents, dupIds, 2, dim, 2).as("cells"))
      .collect().head.getSeq[Long](0)
    assert(got == Seq(7L, 41L), s"tie order wrong: $got")
  }
}
