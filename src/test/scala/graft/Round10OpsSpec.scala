package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{EventOps, GraphOps}

/** Round-10 surfaces: the hub-degree guard that now LEADS the wedge
  * joins (neighborSimilarity / triangleStats), and the DropAll
  * acknowledge contract (silent-vacuity opt-in must be spelled out).
  */
class Round10OpsSpec extends TestSparkSession {

  import spark.implicits._

  /** One market, hours 1..4; each hour the hub (id 50) is co-active
    * with a fresh pair (10+i, 90+i): per-bucket degree stays tiny but
    * the hub's cross-hour degree accumulates to 8 — the exact shape
    * `maxDeg` exists to cap. Every triangle's by-id middle vertex is
    * the hub. */
  private lazy val hubEvents: DataFrame = {
    val rows = for {
      h <- 1 to 4
      u <- Seq(50L, 10L + h, 90L + h)
    } yield ("m", new Timestamp(h * 3600L * 1000), u)
    rows.toDF("event_type", "ts", "user_id")
  }

  test("triangleStats maxDeg guard drops hub-centered triangles and " +
      "is identity when every degree is under the cap") {
    val guarded = GraphOps.triangleStats(hubEvents, maxDeg = 4)
      .select("node", "deg", "tri")
    // hub degree 8 > 4: all four triangles have the hub as middle
    // vertex, so tri = 0 everywhere while deg stays the FULL degree
    val g = guarded.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g.forall(_._3 == 0L), s"expected no guarded triangles: " +
      g.mkString(", "))
    assert(g.find(_._1 == 50L).map(_._2).contains(8L),
      "hub must keep its full degree")
    // under-cap graph: guard is identity with the unguarded default
    val dflt = GraphOps.triangleStats(hubEvents).select("node", "deg",
      "tri").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(dflt.find(_._1 == 50L).map(_._3).contains(4L),
      "hub closes 4 triangles when under the cap")
    assert(dflt.count(_._3 == 1L) == 8,
      "each pair member closes its hour's triangle")
  }

  test("neighborSimilarity hub guard: over-cap hub is unusable as a " +
      "wedge center but still counts in its partners' degrees") {
    val sim = GraphOps.neighborSimilarity(hubEvents, maxDeg = 4,
      minCommon = 1)
    val pairs = sim.select("a", "b", "common", "deg_a", "deg_b")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2),
        (r.getLong(3), r.getLong(4)))).toSeq
    // the only surviving wedge centers are the per-hour pair members
    // (deg 2 ≤ 4); each hour yields exactly the (10+h, 50) and
    // (50, 90+h) wedges through its two members plus (10+h, 90+h)
    // through the hub — the last is GONE under the guard
    assert(pairs.forall { case ((a, b), _, _) => a == 50L || b == 50L },
      s"hub-centered pairs must be guarded out: ${pairs.mkString(", ")}")
    assert(pairs.forall { case (_, _, (da, db)) =>
      Seq(da, db).contains(8L) },
      "hub partner degrees must stay the full cross-hour degree")
    // without the guard the hub mediates pair-to-pair wedges
    val unguarded = GraphOps.neighborSimilarity(hubEvents,
      minCommon = 1)
    assert(unguarded.filter(col("a") =!= 50L && col("b") =!= 50L)
      .count() > 0, "default cap admits the hub as a center here")
  }

  test("canonicalizeByQuality keeps canonicalize's clusters and picks " +
      "the max-q6 member as keeper") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = operators.Dedup.ngramJaccard(docs, 0.5)
      .localCheckpoint()
    val base = operators.Dedup.canonicalize(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byQ = operators.Dedup.canonicalizeByQuality(docs, pairs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(byQ.nonEmpty)
    // same membership and cluster ids as the min-label baseline
    assert(byQ.map(t => t._1 -> t._2).toMap === base)
    // keeper is the argmax (q6 desc, doc_id asc) of its cluster
    val byCluster = byQ.groupBy(_._2)
    byCluster.foreach { case (_, members) =>
      val expect = members.map(m => (m._3, m._1))
        .sortBy { case (q6, id) => (-q6, id) }.head._2
      assert(members.forall(_._4 == expect))
      assert(members.count(_._5) == 1 &&
        members.find(_._5).get._1 == expect)
    }
  }

  test("sourceScorecard arithmetic is internally consistent") {
    val docs = Tables.documents(spark, sfDir)
    val sc = operators.TextAnalysis.sourceScorecard(docs).collect()
    assert(sc.nonEmpty)
    val nDocs = sc.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === docs.count())
    sc.foreach { r =>
      val n = r.getAs[Long]("n_docs").toDouble
      assert(r.getAs[Long]("n_cross_dup_docs") <=
        r.getAs[Long]("n_dup_docs"),
        "a cross-source dup is a dup")
      assert(math.abs(r.getAs[Double]("dup_ratio") -
        r.getAs[Long]("n_dup_docs") / n) < 1e-12)
      assert(math.abs(r.getAs[Double]("reject_ratio") -
        r.getAs[Long]("n_rejected") / n) < 1e-12)
    }
  }

  test("flowImbalance emits consecutive-hour nonzero-sign rows with a " +
      "consistent hit flag") {
    val fi = EventOps.flowImbalance(Tables.events(spark, sfDir))
      .collect()
    assert(fi.nonEmpty)
    fi.foreach { r =>
      val ofi = r.getAs[Long]("ofi_1e6")
      val mv = r.getAs[Long]("move_cents")
      assert(ofi != 0L && mv != 0L)
      assert(r.getAs[Boolean]("hit") === ((ofi > 0) == (mv > 0)))
      assert(r.getAs[Long]("b_cents") + r.getAs[Long]("s_cents") > 0)
    }
    // ofi is the truncating integer of the signed imbalance
    fi.foreach { r =>
      val b = BigInt(r.getAs[Long]("b_cents"))
      val s = BigInt(r.getAs[Long]("s_cents"))
      assert(BigInt(r.getAs[Long]("ofi_1e6")) ===
        (b - s) * 1000000 / (b + s))
    }
  }

  test("truncationFidelity: wider prefixes track full-dim cosines at " +
      "least as faithfully, and the full-width prefix is exact") {
    val emb = Tables.embeddings(spark, sfDir)
    val fid = operators.Similarity
      .truncationFidelity(emb, ks = Seq(8, 32, 64))
      .collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Double]("pearson"), r.getAs[Long]("mae6"),
          r.getAs[Long]("n_pairs"))).toMap
    assert(fid.keySet === Set(8L, 32L, 64L))
    assert(fid.values.map(_._3).toSet.size == 1,
      "every k measures the same pair sample")
    // k = dims is the identity truncation: exact match
    assert(fid(64L)._1 === 1.0 && fid(64L)._2 === 0L)
    // monotone fidelity on this corpus: more dims, closer cosines
    assert(fid(32L)._2 <= fid(8L)._2,
      s"mae6 should shrink with width: ${fid.toSeq.sortBy(_._1)}")
  }

  test("DropAll without acknowledgeVacuous is refused by every " +
      "consumer; acknowledged instances run") {
    val ev = Tables.events(spark, sfDir)
    val e1 = intercept[IllegalArgumentException] {
      GraphOps.coactivityEdges(ev, 16, GraphOps.DropAll()).count()
    }
    assert(e1.getMessage.contains("acknowledgeVacuous"))
    val e2 = intercept[IllegalArgumentException] {
      EventOps.sandwichTrades(ev, policy = GraphOps.DropAll()).count()
    }
    assert(e2.getMessage.contains("capAccounting"))
    // acknowledged: runs and stays non-vacuous at this density
    assert(GraphOps.coactivityEdges(ev, 16,
      GraphOps.DropAll(acknowledgeVacuous = true)).count() > 0)
  }
}
