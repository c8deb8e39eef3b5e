package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** HyperplaneSigs carries every LSH bucket id in dd_embed_bucketed and
  * ann_lsh — both its interpreted eval and its codegen path must equal an
  * independent plain-Scala reference on arbitrary vectors.
  */
class HyperplaneSigsSpec extends SparkSuite {

  private val tables = 3
  private val bits = 5
  private val dim = 8

  private val planes: Array[Double] = {
    val rnd = new scala.util.Random(99)
    Array.fill(tables * bits * dim)(rnd.nextGaussian())
  }

  private def referenceSig(v: Array[Float]): Seq[Int] =
    (0 until tables).map { t =>
      (0 until bits).map { b =>
        val off = (t * bits + b) * dim
        val s = (0 until math.min(dim, v.length))
          .map(i => planes(off + i) * v(i).toDouble).sum
        if (s > 0) 1 << b else 0
      }.sum
    }

  test("codegen and interpreted signatures equal the plain-Scala reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "v")
    def collect(codegen: Boolean): Map[Long, Seq[Int]] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      try df.select(col("id"),
          HyperplaneSigs.sigs(col("v"), planes, tables, bits, dim).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    val want = vecs.map { case (id, v) => id -> referenceSig(v) }.toMap
    assert(collect(codegen = true) == want, "codegen path diverges from reference")
    assert(collect(codegen = false) == want, "interpreted path diverges from reference")
  }
}
