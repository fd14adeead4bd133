package graft

import graft.operators.DupClusters

/** E2 clustering: large-star/small-star connected components — the
  * pair-list → drop-list step of the dedup pipeline. */
class DupClustersSpec extends SparkSpec {

  test("components: 10k-vertex path graph converges in O(log n) rounds") {
    import spark.implicits._
    // The adversarial case for neighbor-min propagation: a path graph,
    // where diameter = n-1 and plain propagation needs O(n) rounds.
    // Large-star/small-star must contract it in O(log n): assert
    // <= 2*log2(n) + 2 (the +2 covers the initial canonicalization
    // round and the final no-change detection round).
    val n = 10000
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val (labels, rounds) = DupClusters.componentsWithRounds(edges, "a", "b")
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length === n)
    got.foreach { case (id, comp) => assert(comp === 1L, s"vertex $id") }
    val bound = 2 * (math.log(n) / math.log(2)).ceil.toInt + 2
    assert(rounds <= bound, s"took $rounds rounds, log-bound is $bound")
  }

  test("components: chains, triangles, and separate clusters resolve to min labels") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L))
      .toDF("a", "b")
    val got = DupClusters.components(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got === expected)
  }

  test("components: long chain converges (diameter > 2 rounds)") {
    import spark.implicits._
    val n = 30
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val got = DupClusters.components(edges, "a", "b").collect()
    assert(got.length === n)
    got.foreach(r => assert(r.getLong(1) === 1L, s"vertex ${r.getLong(0)}"))
  }

  test("components: the r14 union-find cutover equals the star-contraction loop label-for-label") {
    import spark.implicits._
    // chain + triangle + isolated pair, shuffled edge orientations
    val edges = (Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (21L, 20L)) ++
      (30 until 60).map(i => (i.toLong, i.toLong + 1))).toDF("a", "b")
    val driver = DupClusters.components(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val distributed = DupClusters
      .components(edges, "a", "b", driverEdgeMax = -1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === distributed)
  }

  test("cosineClusters: members partition the cosine-pair vertices") {
    val pairs = graft.operators.VectorQueries.cosineDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = verts.groupBy(find).map { case (_, vs) =>
      (vs.min, vs.length.toLong, vs.max)
    }.toSet
    val got = graft.operators.DupClusters.cosineClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("nearDupClusters: members partition the pair vertices; keeper is the min") {
    val pairs = graft.operators.TextQueries.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = verts.groupBy(find).map { case (_, vs) =>
      (vs.min, vs.length.toLong, vs.max)
    }.toSet
    val got = DupClusters.nearDupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("clusterRadius: distances equal a driver-side BFS from each component min (r9)") {
    val pairs = graft.operators.TextQueries.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) ::= b; adj(b) ::= a }
    // components via union-find, then textbook queue BFS from each min
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = verts.groupBy(find).map { case (_, vs) =>
      val root = vs.min
      val dist = scala.collection.mutable.Map(root -> 0L)
      val q = scala.collection.mutable.Queue(root)
      while (q.nonEmpty) {
        val u = q.dequeue()
        adj(u).foreach { v =>
          if (!dist.contains(v)) { dist(v) = dist(u) + 1; q.enqueue(v) }
        }
      }
      val ds = vs.map(dist)
      (root, vs.length.toLong, ds.max,
        math.rint(ds.sum.toDouble / ds.length * 1e6) / 1e6)
    }.toSet
    val got = DupClusters.clusterRadius(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === expected,
      s"missing ${expected -- got}, extra ${got -- expected}")
    // r14 adaptive cutover: the distributed Pregel branch (forced by a
    // driverPairMax below any manifest) must emit exactly the same rows
    // as the driver-BFS branch the default took above
    val distributed = DupClusters.clusterRadius(spark, sf, driverPairMax = -1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(distributed === got,
      s"distributed/driver radius branches diverge: " +
        s"missing ${got -- distributed}, extra ${distributed -- got}")
  }

  test("manifest store contract: build-once parquet tables, corpus never re-enters consumer plans, version change invalidates") {
    // the r11 contract (replacing the r10 driver-TrieMap memo): the
    // pair/label manifests are write-once VERSIONED parquet tables —
    // a consumer's plan scans the manifest path, never the documents
    // corpus; repeat calls hit the stored table (no rebuild); a new
    // snapshot version is a new path and triggers exactly one rebuild.
    val base = java.nio.file.Files.createTempDirectory("graft-manifest-spec")
    base.toFile.deleteOnExit()
    def scansManifestOnly(df: org.apache.spark.sql.DataFrame): Unit = {
      val files = df.inputFiles
      assert(files.nonEmpty, "no input files — not a stored-table read")
      files.foreach { f =>
        assert(f.contains(base.toString), s"reads outside the manifest store: $f")
        assert(!f.contains("documents"), s"manifest consumer re-scans the corpus: $f")
      }
    }
    val b0 = DupClusters.manifestBuilds.get()
    val pairs1 = DupClusters.pairManifestAt(spark, base.toString, sf, "snapA")
      .collect().map(_.toString).sorted
    assert(DupClusters.manifestBuilds.get() === b0 + 1)
    // repeat call: same snapshot → served from the stored table
    val pairs2df = DupClusters.pairManifestAt(spark, base.toString, sf, "snapA")
    scansManifestOnly(pairs2df)
    assert(pairs2df.collect().map(_.toString).sorted === pairs1)
    assert(DupClusters.manifestBuilds.get() === b0 + 1)
    // labels build reads the stored pair manifest (one more build)
    val labels1 = DupClusters.nearDupLabelsAt(spark, base.toString, sf, "snapA")
      .collect().map(_.toString).sorted
    assert(DupClusters.manifestBuilds.get() === b0 + 2)
    val labels2df = DupClusters.nearDupLabelsAt(spark, base.toString, sf, "snapA")
    scansManifestOnly(labels2df)
    assert(labels2df.collect().map(_.toString).sorted === labels1)
    assert(DupClusters.manifestBuilds.get() === b0 + 2)
    // corpus snapshot change → new path → exactly one fresh build
    val pairsB = DupClusters.pairManifestAt(spark, base.toString, sf, "snapB")
      .collect().map(_.toString).sorted
    assert(pairsB === pairs1)
    assert(DupClusters.manifestBuilds.get() === b0 + 3)
    // the default store derives the snapshot from the corpus file
    // listing — stable for a read-only fixture, CHANGED by any data
    // file change (here: a copied corpus whose mtime moves)
    assert(DupClusters.corpusVersion(sf) === DupClusters.corpusVersion(sf))
    val corpusCopy = java.nio.file.Files.createTempDirectory("graft-ver-spec")
    corpusCopy.toFile.deleteOnExit()
    val copied = corpusCopy.resolve("documents.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "documents.parquet"), copied)
    val v1 = DupClusters.corpusVersion(corpusCopy.toString)
    java.nio.file.Files.setLastModifiedTime(copied,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(copied).toMillis + 60000))
    assert(DupClusters.corpusVersion(corpusCopy.toString) !== v1,
      "a corpus file change must produce a new snapshot id")
  }

  test("v2 manifest layout: canonicalReps is corpus-free with one hash exchange; rangeLayout files are disjoint and sorted") {
    import org.apache.spark.sql.functions._
    // consumer plan (r12, verdict item 6): n_chars rides the label
    // manifest, so canonicalization is a bounded manifest scan + ONE
    // comp exchange (the window; the following comp aggregation reuses
    // its partitioning) — the documents corpus never enters the plan
    val reps = DupClusters.canonicalReps(spark, sf)
    reps.collect() // force build + execution
    reps.inputFiles.foreach(f =>
      assert(!f.contains("documents"), s"corpus re-entered the plan: $f"))
    // AQE's toString prints the final AND the initial plan — count the
    // final section only
    val plan = reps.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashExchanges == 1,
      s"expected exactly one hash exchange (the comp window), got $hashExchanges:\n$plan")

    // the write layout itself: range-clustered files have DISJOINT
    // lead-key ranges (file-level pruning works) and are sorted within
    // (row-group min/max stats are tight). Inflated bytesPerRow forces
    // a multi-file layout at spec scale.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 20000).map(_ => (rnd.nextLong().abs % 1000, rnd.nextLong()))
      .toDF("comp", "id")
    val out = java.nio.file.Files.createTempDirectory("graft-rangelayout")
    out.toFile.deleteOnExit()
    DupClusters.rangeLayout(df, 1 << 15, "comp", "id")
      .write.mode("overwrite").parquet(out.toString)
    val ranges = spark.read.parquet(out.toString)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("comp")).as("lo"), max(col("comp")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "layout spec needs a multi-file manifest")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file comp ranges overlap: hi=$hi1 lo=$lo2")
      case _ =>
    }
  }
}
