package graft

import graft.operators.TextQueries

/** Text / dedup operator family (SURVEY.md §2.11 E1/E2/E4). The
  * hash-based operators (minhash / simhash) have no SQL oracle, so the
  * specs verify their defining properties instead.
  */
class TextQueriesSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String)] =
    Tables.load(spark, sf, "documents").select("doc_id", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))

  test("dedupExact accounting: distinct + redundant = total docs") {
    val r = TextQueries.dedupExact(spark, sf).collect().head
    val nDistinct = r.getAs[Long]("n_distinct_texts")
    val nDocs = r.getAs[Long]("n_docs")
    val nRedundant = r.getAs[Long]("n_redundant")
    assert(nDocs === docs.size)
    assert(nDistinct === docs.map(_._2).distinct.size)
    assert(nDistinct + nRedundant === nDocs)
  }

  test("tokenCount totals match a driver-side whitespace split") {
    val rows = TextQueries.tokenCount(spark, sf).collect()
    val expTotal = docs.map(_._2.trim.split("\\s+").length.toLong).sum
    assert(rows.map(_.getAs[Long]("total_tokens")).sum === expTotal)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.size)
  }

  test("tokenBpe: piece counts >= whitespace token counts, docs partitioned") {
    val ws = graft.operators.TextQueries.tokenCount(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("total_tokens")).toMap
    val bpe = graft.operators.TextQueries.tokenBpe(spark, sf).collect()
    assert(bpe.map(_.getAs[Long]("n_docs")).sum === docs.size)
    bpe.foreach { r =>
      val lang = r.getString(0)
      assert(r.getAs[Long]("total_pieces") >= ws(lang),
        s"$lang: sub-word pieces should not be fewer than whitespace tokens")
    }
  }

  test("textQuality: ttr in (0,1], n_distinct <= n_tokens") {
    val rows = TextQueries.textQuality(spark, sf).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val nTok = r.getAs[Int]("n_tokens")
      val nDis = r.getAs[Int]("n_distinct")
      val ttr = r.getAs[Double]("ttr")
      assert(nDis <= nTok && ttr > 0.0 && ttr <= 1.0)
      val sw = r.getAs[Double]("stopword_ratio")
      assert(sw >= 0.0 && sw <= 1.0)
    }
  }

  test("repetitionSignals matches a driver-side recompute") {
    val rows = TextQueries.repetitionSignals(spark, sf).collect()
    assert(rows.length === docs.size)
    val byId = docs.toMap
    rows.foreach { r =>
      val toks = byId(r.getLong(0)).trim.split("\\s+").toSeq
      val n = toks.length
      assert(r.getAs[Int]("n_tokens") === n)
      val expDup = 1.0 - toks.distinct.length.toDouble / n
      val expTop = toks.groupBy(identity).values.map(_.size).max.toDouble / n
      assert(math.abs(r.getAs[Double]("dup_word_frac") - expDup) < 6e-5)
      assert(math.abs(r.getAs[Double]("top_word_frac") - expTop) < 6e-5)
      if (n > 1) {
        val expDb = 1.0 -
          toks.sliding(2).map(_.mkString("\u001f")).toSeq.distinct.length.toDouble / (n - 1)
        assert(math.abs(r.getAs[Double]("dup_bigram_frac") - expDb) < 6e-5)
      }
    }
  }

  test("tfidf: sorted desc, scores match driver recompute, cut is correct") {
    val rows = TextQueries.tfidf(spark, sf).collect()
    val nDocs = docs.size.toDouble
    val td = docs.flatMap { case (id, t) => t.trim.split("\\s+").map(w => (w, id)) }
    val stats = td.groupBy(_._1).map { case (w, xs) =>
      w -> (xs.size.toLong, xs.map(_._2).distinct.size.toLong)
    }
    def score(w: String): Double = {
      val (f, df) = stats(w); f * math.log(nDocs / df)
    }
    assert(rows.length === math.min(20, stats.size))
    rows.foreach { r =>
      assert(r.getAs[Long]("tf") === stats(r.getString(0))._1)
      assert(r.getAs[Long]("df") === stats(r.getString(0))._2)
      assert(math.abs(r.getAs[Double]("tfidf") - score(r.getString(0))) < 5e-4)
    }
    val got = rows.map(_.getAs[Double]("tfidf"))
    assert(got.zip(got.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    // nothing excluded scores above the returned cut (rounding slack)
    val excluded = stats.keySet -- rows.map(_.getString(0)).toSet
    if (excluded.nonEmpty && rows.nonEmpty)
      assert(excluded.map(score).max <= got.last + 1e-3)
  }

  test("chunkDocs: windows tile every document with stride overlap") {
    val W = 64; val S = 48
    val byDoc = TextQueries.chunkDocs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      .groupBy(_._1)
    assert(byDoc.keySet === docs.map(_._1).toSet)
    val nTok = docs.toMap.view.mapValues(_.trim.split("\\s+").length).toMap
    byDoc.foreach { case (id, chunks) =>
      val n = nTok(id)
      val sorted = chunks.sortBy(_._2)
      assert(sorted.length === math.ceil(math.max(0, n - W) / S.toDouble).toInt + 1)
      assert(sorted.map(_._2).toSeq === sorted.indices.toSeq) // dense ids
      sorted.foreach { case (_, c, t) =>
        assert(t >= 1 && t <= W)
        assert(t === math.min(W, n - c * S), s"doc $id chunk $c")
      }
      // the last window's end lands exactly on the document end
      val (_, lc, lt) = sorted.last
      assert(lc * S + lt === n, s"doc $id: uncovered tail")
    }
  }

  test("sampleTopkPerStratum equals the md5-rank window formulation") {
    import org.apache.spark.sql.functions._
    val got = TextQueries.sampleTopkPerStratum(spark, sf, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // window recompute with the identical 52-bit md5-prefix priority
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("long"), col("doc_id"))
    val exp = Tables.load(spark, sf, "documents")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exp)
    // fixed k per stratum (every fixture stratum has >= 5 docs)
    got.groupBy(_._1).foreach { case (lang, xs) =>
      assert(xs.length === 5, s"stratum $lang: ${xs.length} rows")
    }
  }

  test("fingerprint is deterministic and in [0, 1000003)") {
    val a = TextQueries.fingerprint(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = TextQueries.fingerprint(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
    a.foreach { case (_, fp) => assert(fp >= 0L && fp < 1000003L) }
    // equal texts must collide
    val fpById = a.toMap
    docs.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      assert(grp.map(g => fpById(g._1)).distinct.size === 1)
    }
  }

  test("langId: every doc classified; en docs mostly predicted en") {
    val rows = TextQueries.langId(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    assert(rows.map(_._3).sum === docs.size)
    val en = rows.filter(_._1 == "en")
    if (en.nonEmpty) {
      val enTotal = en.map(_._3).sum.toDouble
      val enHit = en.filter(_._2 == "en").map(_._3).sum.toDouble
      assert(enHit / enTotal > 0.5, s"en accuracy ${enHit / enTotal}")
    }
  }

  test("ngramJaccard: symmetric-free (a<b), jaccard in [0.05, 1]") {
    val rows = TextQueries.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (a, b, j) =>
      assert(a < b)
      assert(j >= 0.05 && j <= 1.0)
    }
  }

  test("simJoinPrefix: equals brute-force exact pairs; prefix filter actually prunes (r8)") {
    // brute force over trigram-shingle STRING sets, all pairs
    def shingles(t: String): Set[String] =
      t.split("\\s+", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs.collect { case (id, t) if t.split("\\s+", -1).length >= 3 =>
      (id, shingles(t))
    }
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      i = (sa & sb).size; u = (sa | sb).size
      if i * 10 >= u * 9
    } yield (a, b)).toSet
    val rows = TextQueries.simJoinPrefix(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"prefix-filtered pairs != brute force: missing ${expected -- got}, extra ${got -- expected}")
    // zero false negatives is the guarantee; jaccard values exact
    val byId = sets.toMap
    rows.foreach { r =>
      val (sa, sb) = (byId(r.getLong(0)), byId(r.getLong(1)))
      val exp = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(r.getDouble(2) - exp) < 1e-6, s"jaccard(${r.getLong(0)},${r.getLong(1)})")
    }
    // and the filter must genuinely prune: candidates examined stay
    // far below the all-pairs count (this is the point of the prefix;
    // a word-domain variant degenerated to all-pairs on this
    // 31-token-vocabulary fixture — shingle vocab is ~27k)
    val allPairs = sets.size.toLong * (sets.size - 1) / 2
    val nCand = TextQueries.simJoinCandidates(spark, sf).count()
    assert(nCand * 5 < allPairs,
      s"prefix filter examined $nCand of $allPairs pairs — not pruning")
  }

  test("exactSimJoin at generalized thresholds equals brute force (r9 completeness)") {
    // the r9 generalization (minhashDedup's ground truth runs at 1/2)
    // must keep the pigeonhole zero-false-negative guarantee at EVERY
    // rational threshold, not just the 9/10 the r8 gate pinned
    def shingles(t: String): Set[String] =
      t.split("\\s+", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs.collect { case (id, t) if t.split("\\s+", -1).length >= 3 =>
      (id, shingles(t))
    }
    for ((num, den) <- Seq((1, 2), (7, 10), (3, 4))) {
      val expected = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        i = (sa & sb).size; u = (sa | sb).size
        if i * den >= u * num
      } yield (a, b)).toSet
      val got = TextQueries.exactSimJoin(spark, sf, num, den).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expected,
        s"t=$num/$den: missing ${expected -- got}, extra ${got -- expected}")
    }
  }

  test("simJoinIncremental: equals brute-force cross-parity pairs at J >= 1/2 (r10)") {
    // the incremental near-dup join must keep the two-sided prefix
    // pigeonhole (corpus-df total order, batch-unseen shingles order
    // first) zero-false-negative — proven against an exhaustive
    // corpus×batch brute force, values exact
    def shingles(t: String): Set[String] =
      t.split("\\s+", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs.collect { case (id, t) if t.split("\\s+", -1).length >= 3 =>
      (id, shingles(t))
    }
    val corpus = sets.filter(_._1 % 2 == 0)
    val batch = sets.filter(_._1 % 2 == 1)
    val expected = (for {
      (a, sa) <- corpus; (b, sb) <- batch
      i = (sa & sb).size; u = (sa | sb).size
      if i * 2 >= u
    } yield (a, b)).toSet
    val rows = TextQueries.simJoinIncremental(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"incremental pairs != brute force: missing ${expected -- got}, extra ${got -- expected}")
    val byId = sets.toMap
    rows.foreach { r =>
      val (sa, sb) = (byId(r.getLong(0)), byId(r.getLong(1)))
      val exp = (sa & sb).size.toDouble / (sa | sb).size
      assert(math.abs(r.getDouble(2) - exp) < 1e-6,
        s"jaccard(${r.getLong(0)},${r.getLong(1)})")
    }
  }

  test("containmentJoin: equals brute-force directed containment; asymmetric pairs found (r10)") {
    def shingles(t: String): Set[String] =
      t.split("\\s+", -1).toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val sets = docs.collect { case (id, t) if t.split("\\s+", -1).length >= 3 =>
      (id, shingles(t))
    }
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      i = (sa & sb).size
      if i * 10 >= sa.size * 9
    } yield (a, b)).toSet
    val rows = TextQueries.containmentJoin(spark, sf).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected,
      s"containment pairs != brute force: missing ${expected -- got}, extra ${got -- expected}")
    val byId = sets.toMap
    rows.foreach { r =>
      val (sa, sb) = (byId(r.getLong(0)), byId(r.getLong(1)))
      val exp = (sa & sb).size.toDouble / sa.size
      assert(math.abs(r.getDouble(2) - exp) < 1e-6,
        s"containment(${r.getLong(0)},${r.getLong(1)})")
    }
    // the point of DIRECTED containment: at least one qualifying pair
    // must not qualify in reverse (a true sub-document, not a mutual
    // near-equal) — otherwise the fixture only exercises the
    // symmetric case jaccard already covers
    val asym = got.exists { case (a, b) => !got.contains((b, a)) }
    assert(asym, "no asymmetric containment pair in the fixture result")
  }

  test("minhashDedup: probe pairs are true near-dups; gated output = exact pairs + recall_ok") {
    // the PROBE (the real LSH funnel): exact-verified pairs, measured
    // recall vs the exact J >= 1/2 ground truth above the claim floor
    val (probeDf, recall) = TextQueries.minhashDedupFound(spark, sf)
    assert(recall >= 0.8, s"probe recall $recall below floor")
    val rows = probeDf.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (a, b, j) =>
      assert(a < b && j >= 0.5 && j <= 1.0)
    }
    // identical texts must be caught as candidates with jaccard 1.0
    val byText = docs.groupBy(_._2).values.filter(_.size > 1)
    val pairSet = rows.map(r => (r._1, r._2)).toSet
    byText.foreach { grp =>
      val ids = grp.map(_._1).sorted
      ids.combinations(2).foreach { case Seq(a, b) =>
        if (docs.find(_._1 == a).get._2.trim.split("\\s+").length >= 3)
          assert(pairSet.contains((a, b)), s"identical docs ($a,$b) missed by LSH")
      }
    }
    // the GATED oracle form (r11): a SUPERSET of the probe's pairs
    // (exact ground truth), every row claiming recall_ok
    val gated = TextQueries.minhashDedup(spark, sf).collect()
    gated.foreach(r => assert(r.getAs[Boolean]("recall_ok")))
    gated.foreach(r => assert(r.getAs[Boolean]("precision_ok")))
    val gatedPairs = gated.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.subsetOf(gatedPairs),
      "LSH-found pairs must be a subset of the exact ground truth")
    gated.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("dupSubstrings matches a driver-side window-posting recompute") {
    val w = 8
    val corpus = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // same tokenizer as the engine: split("\\s+", -1) WITHOUT trimming
    // — limit -1 mirrors Spark's split (keeps trailing empty tokens;
    // Java's default limit 0 drops them — r12 advisor), and a
    // leading-whitespace doc yields the same leading empty token
    val wins = corpus.flatMap { case (id, text) =>
      val toks = text.split("\\s+", -1)
      if (toks.length < w) Seq.empty
      else toks.sliding(w).zipWithIndex.map { case (win, p) =>
        (win.mkString(" "), id, p.toLong)
      }.toSeq
    }
    val dup = wins.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val expected = wins.filter(t => dup.contains(t._1))
      .groupBy(_._2).flatMap { case (id, ps) =>
        val sorted = ps.map(_._3).distinct.sorted
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { p =>
          if (spans.nonEmpty && p - spans.last._2 <= w - 1)
            spans(spans.length - 1) = (spans.last._1, p)
          else spans += ((p, p))
        }
        spans.map { case (s, e) => (id, s, e + w - 1) }
      }.toSet
    val got = graft.operators.TextQueries.dupSubstrings(spark, sf, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected,
      s"missing ${expected -- got}, extra ${got -- expected}")
    assert(got.nonEmpty, "fixture should contain cross-doc repeated 8-token runs")
  }

  test("dupSubstringsClean: driver recompute of the cut + token conservation") {
    val w = 8
    val corpus = Tables.load(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val spans = graft.operators.TextQueries.dupSubstrings(spark, sf, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // keeper = globally-first occurrence of each distinct span TEXT
    val withText = spans.map { case (id, s, e) =>
      val toks = corpus(id).split("\\s+", -1)
      (id, s, e, toks.slice(s.toInt, e.toInt + 1).mkString(" "))
    }
    val removed = withText.groupBy(_._4).values.flatMap { occ =>
      occ.sortBy(t => (t._1, t._2)).drop(1)
    }.toSeq.groupBy(_._1)
    val affected = spans.map(_._1).distinct
    val expected = affected.map { id =>
      val toks = corpus(id).split("\\s+", -1)
      val cut = removed.getOrElse(id, Seq.empty)
        .flatMap(t => t._2 to t._3).toSet
      val keptToks = toks.zipWithIndex.collect {
        case (t, p) if !cut.contains(p.toLong) => t
      }
      (id, keptToks.mkString(" "), cut.size.toLong)
    }.toSet
    val got = graft.operators.TextQueries.dupSubstringsClean(spark, sf, w)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected,
      s"missing ${expected -- got}, extra ${got -- expected}")
    // conservation: tokens out = tokens in − removed span tokens, and
    // something was actually cut on this fixture
    got.foreach { case (id, clean, nRemoved) =>
      val nIn = corpus(id).split("\\s+", -1).length.toLong
      val nOut = if (clean.isEmpty) 0L else clean.split(" ", -1).length.toLong
      assert(nOut === nIn - nRemoved, s"doc $id: $nOut != $nIn - $nRemoved")
    }
    assert(got.exists(_._3 > 0), "fixture should have at least one cut span")
    // every span is still covered engine-side: the kept copy survives —
    // total removed strictly less than total span tokens
    val totalSpanToks = spans.map { case (_, s, e) => e - s + 1 }.sum
    val totalRemoved = got.toSeq.map(_._3).sum
    assert(totalRemoved < totalSpanToks)
  }

  test("hybridRank: RRF arithmetic, truncated legs, fusion of one- and two-leg docs") {
    val rows = graft.operators.TextQueries.hybridRank(spark, sf).collect()
    assert(rows.length === 15)
    rows.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val dense = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(lex.isDefined || dense.isDefined)
      (lex ++ dense).foreach(rk => assert(rk >= 1 && rk <= 100,
        s"rank $rk outside the truncated leg"))
      val expected = lex.map(rk => 1.0 / (60 + rk)).getOrElse(0.0) +
        dense.map(rk => 1.0 / (60 + rk)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - math.rint(expected * 1e6) / 1e6) < 1e-9,
        s"doc ${r.getLong(0)} rrf mismatch")
    }
    // fusion is the point: the cut should contain at least one doc
    // scored by BOTH legs (fixture ids overlap) — otherwise the query
    // degenerated to a single-leg ranking
    assert(rows.exists(r => !r.isNullAt(1) && !r.isNullAt(2)))
  }

  test("bpeEncode: greedy in-training-order merge application reproduces every segmentation") {
    import org.apache.spark.sql.functions._
    val merges = graft.operators.TextQueries.bpeTrain(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val enc = graft.operators.TextQueries.bpeEncode(spark, sf).collect()
    assert(enc.nonEmpty)
    // driver recompute: same literal-replace semantics (Java
    // String.replace == Spark replace == DuckDB replace)
    enc.foreach { r =>
      val word = r.getString(0)
      var seq = word.toCharArray.map(_.toString).mkString(" ")
      merges.foreach { case (l, r0) =>
        seq = (" " + seq + " ").replace(s" $l $r0 ", s" $l$r0 ").trim
      }
      assert(r.getString(3) === seq, s"word $word")
      assert(r.getInt(2) === seq.split(" ").length, s"word $word")
    }
    // the vocab is lossless: every >= 2-char token is encoded, with
    // its corpus frequency conserved
    val totalWf = enc.map(_.getLong(1)).sum
    val expected = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) >= 2).count()
    assert(totalWf === expected)
  }

  test("bpeTrainCore: the r14 driver-loop cutover and the distributed loop emit the identical merge sequence and final vocab") {
    // driverMax = -1 forces the distributed vocab-grain loop (the
    // 100 TB branch); Long.MaxValue forces the collected-dictionary
    // loop every fixture takes by default — byte-identical contract
    val (mDist, vDist) =
      graft.operators.TextQueries.bpeTrainCore(spark, sf, 20, driverMax = -1L)
    val (mDrv, vDrv) = graft.operators.TextQueries.bpeTrainCore(
      spark, sf, 20, driverMax = Long.MaxValue)
    assert(mDist === mDrv, "merge sequences diverge across branches")
    val vd = vDist.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val vv = vDrv.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(vd === vv, "final vocab states diverge across branches")
  }

  test("dupSubstringsIncremental: memoized index + spans equal the driver-recomputed batch-vs-corpus repeats") {
    // index memoized: per-ingest work cannot rebuild it
    val i1 = graft.operators.TextQueries.substrFpIndex(spark, sf)
    val i2 = graft.operators.TextQueries.substrFpIndex(spark, sf)
    assert(i1 eq i2, "fp index rebuilt on second call")
    val got = graft.operators.TextQueries.dupSubstringsIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // full driver recompute on the fixture
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    def wins(toks: Seq[String]): Seq[(Int, String)] =
      if (toks.length < 8) Seq.empty
      else (0 to toks.length - 8).map(p => (p, toks.slice(p, p + 8).mkString(" ")))
    val corpusWins = docs.filter(_._1 % 2 == 0).values
      .flatMap(wins(_).map(_._2)).toSet
    val expected = docs.filter(_._1 % 2 == 1).toSeq.sortBy(_._1).flatMap {
      case (id, toks) =>
        val hits = wins(toks).collect {
          case (p, w) if corpusWins(w) => p
        }.sorted
        // island merge at gap > 7
        if (hits.isEmpty) Seq.empty
        else {
          val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
          var s = hits.head; var e = hits.head
          hits.tail.foreach { p =>
            if (p - e > 7) { spans += ((s, e)); s = p }
            e = p
          }
          spans += ((s, e))
          spans.map { case (a, b) => (id, a.toLong, b.toLong + 7) }
        }
    }
    assert(got.toSeq === expected)
    assert(got.nonEmpty, "fixture should carry at least one cross-parity repeat")
  }

  test("ragContext: maximal greedy prefix of the fused ranking under the token budget") {
    import org.apache.spark.sql.functions._
    val budget = 400L
    val ranked = graft.operators.TextQueries.hybridRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
      .sortBy { case (id, rrf) => (-rrf, id) }
    val lens = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val expected = ranked.zipWithIndex.map { case ((id, _), i) =>
      cum += lens(id); (i + 1, id, lens(id), cum)
    }.takeWhile(_._4 <= budget)
    val got = graft.operators.TextQueries.ragContext(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty && got.length < ranked.length,
      "budget should cut strictly inside the retrieved list")
  }

  test("hybridRankAnn: ANN-served fusion reproduces the exact fusion, claim true") {
    val exact = graft.operators.TextQueries.hybridRank(spark, sf).collect()
    val ann = graft.operators.TextQueries.hybridRankAnn(spark, sf).collect()
    assert(ann.length === exact.length)
    // gated rows ARE the exact fusion (the graduation contract) …
    ann.zip(exact).foreach { case (a, e) =>
      assert(a.getLong(0) === e.getLong(0))
      assert(a.getDouble(3) === e.getDouble(3))
    }
    // … and the measured top-k agreement claim holds at fixture scale
    ann.foreach(r => assert(r.getAs[Boolean]("recall_ok")))
  }

  test("minhash_union aggregate: sig(union of docs) == union of sigs (exactness)") {
    import org.apache.spark.sql.functions._
    import graft.functions.F
    graft.functions.GraftFunctions.install(spark)
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("toks", split(col("text"), "\\s+"))
      .where(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(1, size(toks) - 2),
             i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))"""))
    // union of per-doc signatures per source
    val viaAgg = docs.withColumn("sig", F.minhashSig(col("sh"), 16))
      .groupBy(col("source")).agg(F.minhashUnion(col("sig"), 16).as("usig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // signature of the flattened shingle union per source
    val direct = docs.groupBy(col("source"))
      .agg(array_distinct(flatten(collect_list(col("sh")))).as("allsh"))
      .select(col("source"), F.minhashSig(col("allsh"), 16).as("usig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg.keySet === direct.keySet)
    viaAgg.foreach { case (src, sig) =>
      assert(sig === direct(src), s"source $src")
    }
  }

  test("sourceMinhash query: exact jaccard in [0,1], estimate within tolerance") {
    val rows = graft.operators.TextQueries.sourceMinhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Double]("exact_jaccard")
      assert(e >= 0.0 && e <= 1.0)
      assert(r.getAs[Boolean]("within_tol"),
        s"${r.getString(0)}/${r.getString(1)}: 128-perm estimate drifted > tol from $e")
    }
    // complete pair grid: every unordered source pair appears exactly once
    val nSrc = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct.length
    assert(rows.length == nSrc * (nSrc - 1) / 2)
  }

  test("simhash: duplicate texts share a bucket; group sizes > 1") {
    val rows = TextQueries.simhashGroups(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 1)
      // r9 precision claim: a collision group must be genuine near-dups
      assert(r.getAs[Boolean]("dup_ok"),
        s"group ${r.getAs[Long]("simhash")}: min pairwise jaccard " +
          s"${r.getAs[Double]("min_jaccard")} below 0.5")
    }
    val dupGroups = docs.groupBy(_._2).values.count(_.size > 1)
    assert(rows.map(_.getAs[Long]("n") - 1).sum >=
      docs.size - docs.map(_._2).distinct.size - dupGroups)
    // the GATED oracle form (r11): per-source grain, non-empty at
    // every SF, with the determinism + precision claims riding every
    // row (collide_ok active wherever the fixture has exact dups)
    val gated = TextQueries.simhash(spark, sf).collect()
    assert(gated.nonEmpty)
    assert(gated.map(_.getAs[Long]("n_docs")).sum === docs.size.toLong)
    gated.foreach { r =>
      assert(r.getAs[Boolean]("collide_ok"),
        s"source ${r.getAs[String]("source")}: an exact-dup text group " +
          "fingerprints to >1 simhash")
      assert(r.getAs[Boolean]("precision_ok"))
    }
  }

  test("ngramNovelty matches a driver-side recompute on trigram strings") {
    // Recompute on the trigram STRINGS (the query hashes them; 64-bit
    // collisions are vanishingly unlikely at fixture scale).
    val ds = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val grams = ds.map { case (id, src, text) =>
      val toks = text.trim.split("\\s+")
      val gs = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      (id, src, gs)
    }
    val firstDoc = scala.collection.mutable.Map.empty[String, Long]
    grams.foreach { case (id, _, gs) =>
      gs.foreach { g =>
        if (!firstDoc.contains(g) || firstDoc(g) > id) firstDoc(g) = id
      }
    }
    val perDoc = grams.filter(_._3.nonEmpty).map { case (id, src, gs) =>
      (src, gs.count(g => firstDoc(g) == id).toDouble / gs.size)
    }
    val exp = perDoc.groupBy(_._1).map { case (src, xs) =>
      val novs = xs.map(_._2)
      src -> ((xs.length.toLong, novs.sum / novs.length,
        novs.count(_ == 1.0).toLong, novs.count(_ < 0.25).toLong))
    }
    val got = TextQueries.ngramNovelty(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq === exp.keys.toSeq.sorted)
    got.foreach { r =>
      val (nDocs, avgNov, nAll, nDup) = exp(r.getString(0))
      assert(r.getAs[Long]("n_docs") === nDocs)
      // sum order differs between engines; tolerate a 4dp boundary flip
      assert(math.abs(r.getAs[Double]("avg_novelty") - avgNov) <= 1.0001e-4)
      assert(r.getAs[Long]("n_all_novel") === nAll)
      assert(r.getAs[Long]("n_dupey") === nDup)
    }
  }

  test("docPercentiles matches a driver-side exact-rank recompute") {
    val ds = Tables.load(spark, sf, "documents")
      .select("source", "n_chars", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // (source, q4) -> (n, min_chars, max_chars, avg_pr, avg_cd) with
    // ntile/percent_rank/cume_dist over the unique (n_chars, doc_id) order
    val exp = ds.groupBy(_._1).flatMap { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val n = sorted.length
      val base = n / 4
      val extra = n % 4
      sorted.zipWithIndex.map { case ((_, chars, _), i) =>
        val bucket =
          if (i < (base + 1) * extra) i / (base + 1) + 1
          else (i - (base + 1) * extra) / base + extra + 1
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        val cd = (i + 1).toDouble / n
        ((src, bucket), (chars, pr, cd))
      }.groupBy(_._1).map { case (k, xs) =>
        val vs = xs.map(_._2)
        k -> ((vs.length.toLong, vs.map(_._1).min, vs.map(_._1).max,
          vs.map(_._2).sum / vs.length, vs.map(_._3).sum / vs.length))
      }
    }
    val got = TextQueries.docPercentiles(spark, sf).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (n, minC, maxC, avgPr, avgCd) = exp((r.getString(0), r.getAs[Int]("q4")))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("min_chars") === minC)
      assert(r.getAs[Long]("max_chars") === maxC)
      assert(math.abs(r.getAs[Double]("avg_pr") - avgPr) <= 1.0001e-4)
      assert(math.abs(r.getAs[Double]("avg_cd") - avgCd) <= 1.0001e-4)
    }
  }

  test("incrementalDedup matches a driver-side corpus/batch classification") {
    val rows = Tables.load(spark, sf, "documents")
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def norm(t: String): String = t.toLowerCase.replaceAll("\\s+", " ").trim
    val corpus = rows.collect { case (id, _, t) if id % 2 == 0 => norm(t) }.toSet
    val batch = rows.filter(_._1 % 2 == 1)
    val keepId = batch.groupBy(t => norm(t._3))
      .map { case (k, v) => k -> v.map(_._1).min }
    val exp = batch.groupBy { case (id, src, t) =>
      val status =
        if (corpus(norm(t))) "dup_corpus"
        else if (id != keepId(norm(t))) "dup_batch"
        else "kept"
      (src, status)
    }.map { case (k, v) =>
      k -> ((v.size.toLong, v.map(_._1).min, v.map(_._1).max))
    }
    val got = TextQueries.incrementalDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("min_doc"), r.getAs[Long]("max_doc"))))
      .toMap
    assert(got === exp)
    // every batch doc classified exactly once
    assert(got.values.map(_._1).sum === batch.size)
  }

  test("arrayFuncs matches a driver-side recompute per document") {
    // UTF-8 byte order = code-point order (what Spark/DuckDB sort by);
    // JVM String < is UTF-16 code-unit order, which diverges above BMP
    val utf8Ord: Ordering[String] = new Ordering[String] {
      def compare(a: String, b: String): Int =
        java.util.Arrays.compareUnsigned(
          a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    }
    val exp = docs.map { case (id, text) =>
      val toks = text.split("\\s+", -1).toSeq
      val uniq = toks.distinct
      id -> ((toks.size, uniq.size,
        uniq.sorted(utf8Ord).take(3).mkString("|"),
        toks.map(_.length).max, toks.count(_.length > 6),
        toks.map(_.length).sum))
    }.toMap
    val got = TextQueries.arrayFuncs(spark, sf).collect()
    assert(got.length === docs.size)
    got.foreach { r =>
      val e = exp(r.getLong(0))
      val a = (r.getAs[Int]("n_toks"), r.getAs[Int]("n_unique"),
        r.getAs[String]("first3"), r.getAs[Int]("max_len"),
        r.getAs[Int]("n_long"), r.getAs[Int]("sum_len"))
      assert(a === e, s"doc ${r.getLong(0)}")
    }
  }

  test("invertedIndex matches a driver-side posting-list recompute") {
    val exp = docs
      .flatMap { case (id, text) => text.split("\\s+", -1).map(t => (t, id)) }
      .groupBy(_._1)
      .map { case (term, pairs) =>
        val ids = pairs.map(_._2)
        term -> ((ids.distinct.size.toLong, ids.size.toLong,
          ids.distinct.sorted.take(16).mkString(",")))
      }
      .filter(_._2._1 >= 10)
    val got = TextQueries.invertedIndex(spark, sf).collect()
    assert(got.length === exp.size, s"term count: got ${got.length}, exp ${exp.size}")
    assert(got.nonEmpty, "df>=10 cut left no terms — fixture drifted?")
    got.foreach { r =>
      val term = r.getString(0)
      val e = exp(term)
      assert(r.getAs[Long]("df") === e._1, s"df($term)")
      assert(r.getAs[Long]("tf") === e._2, s"tf($term)")
      assert(r.getAs[String]("postings") === e._3, s"postings($term)")
    }
  }
}
