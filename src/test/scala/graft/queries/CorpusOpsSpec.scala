package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSuite {

  test("tfidf: exactly <=3 ranked terms per doc, scores non-increasing") {
    val byDoc = CorpusOps.tfidf(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (d, rows) =>
      assert(rows.length <= 3, s"doc $d has ${rows.length} terms")
      val ranked = rows.sortBy(_.getInt(2)).map(_.getDouble(4))
      assert(ranked.zip(ranked.tail).forall { case (a, b) => a >= b },
        s"doc $d scores not ordered: ${ranked.mkString(",")}")
    }
  }

  test("repetition ratio is in [0,1) and consistent with its counts") {
    val rows = CorpusOps.repetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(d <= n && d > 0)
      assert(math.abs(ratio - (1.0 - d.toDouble / n)) < 1e-3)
    }
  }

  test("decontamination flags the planted near-dups of eval docs") {
    val hits = CorpusOps.decontaminate(spark, sf).collect()
    assert(hits.nonEmpty, "eval subset should catch planted 8-gram overlaps")
    // Every flagged pair must be train-vs-eval by construction.
    hits.foreach { r =>
      assert(r.getLong(1) % 7 == 0 && r.getLong(0) % 7 != 0)
      assert(r.getLong(2) >= 1)
    }
  }

  test("fuzzy decontamination equals the exact bipartite Jaccard scan") {
    // Independent reference: plain-Scala 3-gram shingle sets + bipartite
    // Jaccard over all eval×train pairs — no MinHash, no banding, no
    // Spark joins. The funnel must find exactly this set (the dd_minhash
    // ≡ dd_ngram_jaccard equivalence, bipartite form).
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val sets = docs.map { case (id, text) =>
      // EXACTLY WordShingles' tokenization: Java split("\s+"), no
      // empty-token filter (leading whitespace keeps its empty token).
      val w = text.split("\\s+")
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (e, es) <- sets.toSeq if e % 7 == 0 && es.nonEmpty
      (t, ts) <- sets.toSeq if t % 7 != 0 && ts.nonEmpty
      c = (es & ts).size if c > 0
      j = c.toDouble / (es.size + ts.size - c) if j >= 0.5
    } yield (t, e) -> round6(j)).toMap
    val got = CorpusOps.decontaminateFuzzy(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(expected.nonEmpty, "test corpus should contain cross-split near-dups")
    assert(got == expected,
      s"fuzzy decon diverged; missing=${expected.keySet diff got.keySet} " +
        s"extra=${got.keySet diff expected.keySet}")
  }

  test("fuzzy sketch cut: forced-on regime is row-identical to cut-off") {
    // The sketch cut (round 14) prunes candidates on signature agreement
    // only when the raw candidate set clears SketchCutMinMass — never
    // on the test corpora. Force BOTH regimes on the same corpus: with
    // the threshold at 0 every candidate passes through the cut, and the
    // output must be row-identical to the cut-off plan (the cut may only
    // dismiss pairs exact verification would reject anyway; a true pair
    // failing its 4σ sketch bound on this tiny planted set would be a
    // construction bug, not bad luck).
    def rows(t: Long) = CorpusOps.decontaminateFuzzyCut(spark, sf, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val cutOff = rows(Long.MaxValue)
    val cutOn = rows(0L)
    assert(cutOff.nonEmpty, "planted cross-split near-dups expected")
    assert(cutOn == cutOff,
      s"sketch cut changed rows: missing=${cutOff diff cutOn} extra=${cutOn diff cutOff}")
  }

  test("perplexity: finite positive scores; rare-token docs score above common-token docs") {
    val rows = CorpusOps.perplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == graft.Tables.documents(spark, sf).count())
    rows.foreach { case (d, n, nll) =>
      assert(n > 0 && nll > 0 && !nll.isInfinite, s"doc $d: n=$n nll=$nll")
    }
    // Sanity: the spread is real (not a constant score).
    val scores = rows.map(_._3)
    assert(scores.max > scores.min)
  }

  test("packing: contiguous per-source spans, chunk ranges consistent") {
    val rows = CorpusOps.pack(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5)))
    assert(rows.nonEmpty)
    // Spans within a source tile exactly: next start = prev start + n.
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val sorted = docs.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, _, n, s, _, _), (_, _, _, s2, _, _)) =>
        assert(s2 == s + n, s"$src spans not contiguous")
      }
    }
    // Chunk ids follow from the span arithmetic.
    rows.foreach { case (_, d, n, s, cf, cl) =>
      assert(cf == (s / 2048).toInt && cl == ((s + n - 1) / 2048).toInt, s"doc $d chunks")
    }
  }

  test("hash split covers every doc exactly once with ~90/5/5 fractions") {
    val split = CorpusOps.split3Way(spark, sf)
    val total = graft.Tables.documents(spark, sf).count()
    assert(split.count() == total, "split must be a total assignment")
    val by = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.keySet == Set("train", "val", "test"))
    // md5 is uniform: expected 89.8/5.1/5.1% — allow wide slack at sf0.001.
    val trainFrac = by("train").toDouble / total
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // Determinism: assignment is a pure function of doc_id.
    val a = split.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val b = CorpusOps.split3Way(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(a == b)
  }

  test("source mix keeps deterministic per-source fractions") {
    val docs = graft.Tables.documents(spark, sf)
    val kept = CorpusOps.sourceMix(spark, sf)
    // Deterministic: two runs identical.
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = CorpusOps.sourceMix(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // 100%-weight sources keep everything; 20% sources keep a minority.
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (s, tot) =>
      val k = bySrc.getOrElse(s, 0L)
      val n = s.stripPrefix("src").toInt
      if (n % 3 == 0) assert(k == tot, s"$s should keep all, kept $k/$tot")
      else assert(k < tot, s"$s should subsample, kept $k/$tot")
    }
  }

  test("buckets: docs partition exactly, batch counts replay ceil division") {
    val rows = CorpusOps.buckets(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every doc lands in one bucket")
    rows.foreach { r =>
      val (bucket, docs, toks, batches) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bucket >= 0 && bucket <= 31)
      assert(batches == (toks + 16383) / 16384,
        s"bucket $bucket batch count is not ceil(tokens/budget)")
      // every doc in the bucket has >= bucket*16 tokens, so the bucket's
      // token total can't fall below that floor
      assert(toks >= docs * bucket * 16L, s"bucket $bucket tokens below floor")
    }
  }

  test("curriculum: per-source balanced quartiles ordered by score") {
    val rows = CorpusOps.curriculum(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, docs) =>
      val sizes = docs.groupBy(_._4).map { case (p, d) => p -> d.length }
      assert(sizes.keySet.subsetOf(Set(1, 2, 3, 4)), s"$src phases out of range")
      // ntile balance: sizes differ by at most 1
      assert(sizes.values.max - sizes.values.min <= 1, s"$src unbalanced: $sizes")
      // phase 1 holds the highest-quality docs (boundary ties aside, the
      // phase MEANS must be monotone non-increasing)
      val means = (1 to 4).flatMap(p => sizes.get(p).map(_ =>
        p -> docs.filter(_._4 == p).map(_._3).sum / sizes(p)))
      means.zip(means.tail).foreach { case ((_, a), (_, b)) =>
        assert(a >= b - 1e-9, s"$src phase means not ordered: $means")
      }
    }
  }

  test("weights: shares sum to 1 and weight equalizes the mix") {
    val rows = CorpusOps.weights(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-3, s"shares sum to ${shares.sum}")
    val n = rows.length
    rows.foreach { r =>
      // weight · share · n_sources ≈ 1: applying the weight makes every
      // source contribute the uniform target share
      val prod = r.getDouble(4) * r.getDouble(3) * n
      assert(math.abs(prod - 1.0) < 1e-3, s"${r.getString(0)}: $prod")
    }
  }
}
