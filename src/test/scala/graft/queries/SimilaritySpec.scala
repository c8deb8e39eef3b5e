package graft.queries

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  private def resultMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  test("ann_topk returns exactly k ranked neighbors per query, no self-match") {
    val rows = Similarity.annTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q has ${rs.length} neighbors")
      assert(rs.forall(_.getLong(1) != q))
      val ranked = rs.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann_ivf recall@5 vs brute force is usable") {
    val exact = resultMap(Similarity.annTopK(spark, sf))
    val approx = resultMap(Similarity.annIvf(spark, sf))
    val recalls = exact.map { case (q, nn) =>
      approx.get(q).map(a => (a intersect nn).size.toDouble / nn.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@5 = $mean%.2f over ${recalls.size} queries")
    assert(mean >= 0.4, f"IVF recall too low: $mean%.2f")
  }
}
