package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** SlowTest tag: scale-regime pins that run minutes, not seconds. */
object SlowTest extends org.scalatest.Tag("graft.SlowTest")

/** The >2M-node shuffle regime, exercised NATURALLY (SURVEY §5): every
  * other graph spec either fits under `DefaultBroadcastNodeLimit` or
  * forces `broadcastNodeLimit = 0`. Here a generated co-activity graph
  * exceeds the limit on its own — so `nodes.count()` itself steers the
  * per-round joins to shuffles — with realistic skew (a long tail of
  * 2-4-wallet market-hours plus rare 40-wallet hot hours, overlapping
  * so components chain). The pin is bit-equality against the broadcast
  * regime forced on the SAME graph: the crossover must be a pure
  * physical-plan decision, invisible in every output bit.
  */
class BigGraphSpec extends TestSparkSession {

  /** ~2.1M wallets across `hours` market-hours: hour h activates
    * wallets [2h, 2h + s(h)) with s(h) ∈ {2, 3, 4} and s = 40 on every
    * 1009th hour (skewed fan-out: 40·39 directed pairs vs 2·1). The
    * stride-2 overlap chains neighboring hours into long components. */
  private def bigGraphEvents(hours: Long): DataFrame =
    spark.range(hours)
      .select(col("id").as("h"),
        expr("case when id % 1009 = 0 then 40L else 2 + id % 3 end").as("s"))
      .select(col("h"), explode(expr("sequence(0, s - 1)")).as("i"))
      .select((col("h") * 100 + col("i")).as("event_id"),
        expr("timestamp_micros(h * 3600000000)").as("ts"),
        (col("h") * 2 + col("i")).as("user_id"),
        lit("m").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))

  test("pagerank + kCore: naturally >2M-node graph, shuffle regime " +
      "bit-identical to forced broadcast", SlowTest) {
    val ev = bigGraphEvents(1050000L).localCheckpoint()
    val n = GraphOps.coactivityEdges(ev, 64)
      .select("src").distinct().count()
    assert(n > GraphOps.DefaultBroadcastNodeLimit,
      s"graph must exceed the broadcast limit naturally, got $n nodes")

    def diff(a: DataFrame, b: DataFrame): Long =
      a.except(b).count() + b.except(a).count()

    // natural run: n > limit ⇒ the loop's own count() picks shuffles
    val prNat = GraphOps.coactivityPagerank(ev)
    val prBc =
      GraphOps.coactivityPagerank(ev, broadcastNodeLimit = Long.MaxValue)
    assert(diff(prNat, prBc) == 0, "pagerank regimes diverge")

    val kcNat = GraphOps.kCore(ev, k = 3)
    val kcBc =
      GraphOps.kCore(ev, k = 3, broadcastNodeLimit = Long.MaxValue)
    assert(diff(kcNat, kcBc) == 0, "k-core regimes diverge")
    // the skewed overlap must leave a non-trivial 3-core (hot hours +
    // chained stride-2 groups), not an empty or total survivor set
    val kc = kcNat.count()
    assert(kc > 0 && kc < n, s"3-core survivors $kc of $n")
  }
}
