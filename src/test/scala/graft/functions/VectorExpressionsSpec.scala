package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSuite {

  test("native dot/l2norm bit-match the higher-order-function formulation") {
    val e = graft.Tables.embeddings(spark, sf).limit(50)
    val hof = e.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x).as("d"),
      sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val native = e.select(col("vec_id"),
      vec.dot(col("embedding"), col("embedding")).as("d"),
      vec.l2norm(col("embedding")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(native == hof, "codegen expression must be bit-identical to HOF path")
  }

  test("SQL registration: vec_dot and vec_l2norm callable from SQL") {
    vec.register(spark)
    graft.Tables.embeddings(spark, sf).limit(5).createOrReplaceTempView("emb_v")
    val rows = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS d, vec_l2norm(embedding) AS n FROM emb_v")
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1) * r.getDouble(1)) < 1e-9)
    }
  }

  test("null and length-mismatch behavior") {
    vec.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D, 5.0D)) AS d, " +
        "vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS dn").collect().head
    assert(r.getDouble(0) == 11.0) // min-length semantics
    assert(r.isNullAt(1))
  }
}
