package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY §2 B): the engine a subscriber uses to
  * analyze decoded event history. Classic scan/join/agg shapes expressed
  * declaratively so Catalyst handles pushdown, pruning, and join planning;
  * dimension joins are explicitly broadcast.
  *
  * All monetary aggregation is done in fixed-scale decimal (exact,
  * engine-reproducible) and only cast to double at the output boundary.
  */
object Relational {

  // All money columns carry exact 2-decimal data, so these casts are
  // lossless in both Spark and DuckDB. Widths are kept minimal so chained
  // products stay at scale <= 6: the scaled integer of any sum then stays
  // below 2^53 and the final decimal->double conversion is deterministic
  // across engines (see SURVEY §6).
  private def dec2(c: String) = col(c).cast("decimal(12,2)")
  private def rate2(c: String) = col(c).cast("decimal(4,2)")
  private def oneMinus(c: String) =
    (lit(1).cast("decimal(4,2)") - rate2(c)).cast("decimal(4,2)")
  private def onePlus(c: String) =
    (lit(1).cast("decimal(4,2)") + rate2(c)).cast("decimal(4,2)")

  /** B14 (TPC-H Q4 shape): order-priority check — orders in a date band
    * with at least one LATE lineitem (shipped > 60 days after the order
    * date). The correlated EXISTS becomes a left-semi join whose
    * condition spans both sides — no row duplication, and the semi-join
    * shuffles only order keys + two pruned lineitem columns.
    */
  def orderPriorityCheck(lineitem: DataFrame, orders: DataFrame,
      from: String = "1995-01-01", until: String = "1996-01-01"): DataFrame =
    orders
      .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** B13 (TPC-H Q18 shape): large-quantity orders — the HAVING-subquery
    * semi-join. The per-order quantity aggregate is computed once (one
    * shuffle on orderkey, map-side partials), filtered, and joined back;
    * at scale the filtered key set is tiny, so AQE turns the join back
    * into a broadcast. Exact decimal quantities end to end.
    */
  def bigQuantityOrders(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, minQty: Int = 300): DataFrame = {
    val big = lineitem
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))")
          .as("o_orderdate_us"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
  }

  /** B12: shipping priority (TPC-H Q3 shape): two fact joins with
    * date-band filters pushed to the scans, decimal revenue aggregation,
    * and a distributed top-10 (TakeOrdered, not a global sort). At scale
    * the segment-filtered customer side is still large, so the joins
    * shuffle on their keys and AQE picks broadcast only when the filtered
    * side fits.
    */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, segment: String = "BUILDING",
      asOf: String = "1995-03-15"): DataFrame = {
    val cutoff = lit(asOf).cast("timestamp")
    val l = lineitem.filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (dec2("l_extendedprice") * oneMinus("l_discount")).as("rev"))
    val o = orders.filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))")
          .as("o_orderdate_us"))
    val c = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate_us"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate_us"))
      .orderBy(col("revenue").desc, col("o_orderdate_us"), col("l_orderkey"))
      .limit(10)
  }

  /** B1: pricing summary (TPC-H Q1 shape): scan + filter + wide agg. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2("l_quantity")).cast("double").as("sum_qty"),
        sum(dec2("l_extendedprice")).cast("double").as("sum_base_price"),
        // corpus-scale sums reduce to CENTS (scale 2) before the double
        // cast: once a decimal's scaled integer passes 2^53 (~9e15 —
        // sum_charge at scale 6 crosses it near a $28B sum, measured at
        // sf1.0), DuckDB's int128→double→/10^scale DOUBLE-ROUNDS while
        // Spark's BigDecimal rounds once, and the engines split by one
        // ulp; at scale 2 both conversions are single correct roundings
        round(sum(dec2("l_extendedprice") * oneMinus("l_discount")), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(dec2("l_extendedprice") * oneMinus("l_discount") *
          onePlus("l_tax")), 2).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order").cast("double"))
      .withColumn("avg_price",
        col("sum_base_price") / col("count_order").cast("double"))

  /** B2: shuffle join + group: revenue by market segment and order month. */
  def revenueBySegment(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        year(col("o_orderdate")).cast("bigint").as("yr"),
        month(col("o_orderdate")).cast("bigint").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2("o_totalprice")).cast("double").as("revenue"))

  /** B3: five-way join: revenue by region/nation of the customer.
    * region/nation are broadcast (tiny dims); customer joins shuffle on the
    * key; AQE picks the physical join for orders⋈lineitem.
    */
  def regionVolume(
      lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
      nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        // cents before the double cast on every corpus-scale revenue
        // sum (the 2^53 scaled-decimal contract — see pricingSummary)
        round(sum(dec2("l_extendedprice") * oneMinus("l_discount")), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** B4: broadcast dimension join: volume by part brand. */
  def brandAgg(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_items"),
        sum(dec2("l_quantity")).cast("double").as("sum_qty"),
        sum(dec2("l_extendedprice")).cast("double").as("revenue"))

  /** B5: semi + anti join: per segment, customers that placed at least one
    * order vs customers with no big-ticket (>450k) order. Uses a left outer
    * combine so segments missing one side still appear (count 0).
    */
  def customersOrdersPresence(customer: DataFrame, orders: DataFrame): DataFrame = {
    val okeys = orders.select("o_custkey")
    val bigKeys = orders.filter(col("o_totalprice") > 450000).select("o_custkey")
    val withOrders = customer
      .join(okeys, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("with_orders"))
    val noBig = customer
      .join(bigKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    withOrders.join(noBig, Seq("c_mktsegment"), "left_outer")
      .select(col("c_mktsegment"), col("with_orders"),
        coalesce(col("n"), lit(0L)).as("no_big_orders"))
  }

  /** B16 (TPC-H Q13 shape): customer order-count distribution — how many
    * customers placed 0, 1, 2, … qualifying orders. Orders are reduced to
    * per-customer counts BEFORE the join (one shuffle over the pruned
    * fact, then a key-aligned join), so only (custkey, count) pairs meet
    * the customer table; customers with no orders surface through the
    * left join as count 0. The final distribution agg is over a
    * tiny-cardinality key.
    */
  def custOrderDistribution(customer: DataFrame, orders: DataFrame,
      excludePriority: String = "1-URGENT"): DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= excludePriority)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    customer.select("c_custkey")
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** B6: rollup over (segment, priority) with ALL labels. */
  def rollupSales(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.join(customer, col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2("o_totalprice")).cast("double").as("revenue"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("revenue"))

  /** B7: window ranking: top-N orders per customer by price. */
  def topOrdersPerCustomer(orders: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= n)
  }

  /** B9: set operations: high-balance customers INTERSECT active buyers,
    * then EXCEPT big-ticket buyers — distinct-based set semantics. */
  def setOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val rich = customer.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val active = orders.select(col("o_custkey").as("c_custkey"))
    val bigTicket = orders.filter(col("o_totalprice") > 400000)
      .select(col("o_custkey").as("c_custkey"))
    rich.intersect(active).except(bigTicket)
  }

  /** B10: string predicates: LIKE + regexp filtering with prefix rollup. */
  def partNameSearch(part: DataFrame): DataFrame =
    part
      .filter(col("p_name").like("%a%") &&
        col("p_type").rlike("^[A-Za-z]+"))
      .groupBy(substring(col("p_name"), 1, 1).as("first_char"))
      .agg(count(lit(1)).as("n_parts"),
        sum(dec2("p_retailprice")).cast("double").as("total_price"))

  /** B11: calendar breakdown: orders by ISO-ish day of week. */
  def ordersByDayOfWeek(orders: DataFrame): DataFrame =
    orders
      .groupBy((dayofweek(col("o_orderdate")) - 1).cast("bigint").as("dow"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2("o_totalprice")).cast("double").as("revenue"))

  /** B17 (TPC-H Q7 shape): volume shipping — revenue flowing between
    * (supplier nation, customer nation) pairs per ship year. The two
    * nation legs are the same tiny dim broadcast twice under different
    * aliases; supplier broadcasts as well; the only wide shuffles are the
    * two fact joins (lineitem⋈orders on orderkey, ⋈customer on custkey),
    * both on their natural keys so AQE can coalesce/skew-split them.
    */
  def volumeShipping(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame = {
    val n1 = nation.select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val n2 = nation.select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(sum(dec2("l_extendedprice") * oneMinus("l_discount"))
        .cast("double").as("revenue"))
  }

  /** B18 (TPC-H Q10 shape): returned-item reporting — customers ranked by
    * revenue lost to returns in one quarter. Orders are date-band pruned
    * at the scan, lineitem is flag-pruned, nation broadcasts; the top-20
    * is a TakeOrdered over the per-customer aggregate (revenue ties broken
    * by custkey so the limit is deterministic), never a global sort.
    */
  def returnedItems(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      from: String = "1996-01-01", until: String = "1996-04-01"): DataFrame =
    lineitem.filter(col("l_returnflag") === "R")
      .join(orders.filter(
          col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(dec2("l_extendedprice") * oneMinus("l_discount")).as("rev"))
      .orderBy(col("rev").desc, col("c_custkey"))
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("rev").cast("double").as("revenue"))

  /** B19 (TPC-H Q17 shape): small-quantity-order revenue — lineitems whose
    * quantity is below 20% of their part's average. The correlated AVG
    * subquery is computed once per part (one shuffle with map-side
    * partials) and joined back key-aligned; the avg comparison
    * `qty < 0.2 * avg(qty)` is evaluated as `5 * qty_cents * cnt <
    * sum_qty_cents` — pure integer math, so both engines agree bit-exactly
    * with no float-threshold edge cases.
    */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_partkey"), col("l_extendedprice"),
      (dec2("l_quantity") * 100).cast("bigint").as("qty_c"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("cnt"), sum("qty_c").as("sum_qty_c"))
      .localCheckpoint() // part-sized; joined back against the same scan
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("qty_c") * 5 * col("cnt") < col("sum_qty_c"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        sum(dec2("l_extendedprice")).cast("double").as("revenue"))
  }

  /** B20 (TPC-H Q22 shape): sales opportunity — lapsed customers (no
    * order since `lapsedSince`) with above-average positive balance,
    * grouped by nation. The scalar AVG subquery becomes a 1-row broadcast
    * cross join; the threshold `acctbal > avg(positive acctbal)` compares
    * `acctbal_cents * cnt > sum_cents` in exact integers. The NOT EXISTS
    * becomes an anti-join that ships only custkeys of the date-pruned
    * order slice.
    */
  def salesOpportunity(customer: DataFrame, orders: DataFrame,
      nation: DataFrame, lapsedSince: String = "2000-01-01"): DataFrame = {
    val bal = (dec2("c_acctbal") * 100).cast("bigint")
    val pos = customer.filter(col("c_acctbal") > 0)
      .agg(count(lit(1)).as("cnt"), sum(bal).as("sum_c"))
    customer.withColumn("bal_c", bal)
      .join(broadcast(pos))
      .filter(col("bal_c") * col("cnt") > col("sum_c"))
      .join(orders
          .filter(col("o_orderdate") >= lit(lapsedSince).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        sum(dec2("c_acctbal")).cast("double").as("totacctbal"))
  }

  /** B23 (TPC-H Q6 shape): forecast revenue change — one scan, every
    * predicate (date band, discount band in exact cents, quantity cap)
    * pushed to the parquet reader, one partial-agg reduce to a single
    * row. The discount band compares scaled integers so the boundary
    * rows are engine-exact.
    */
  def forecastRevenue(lineitem: DataFrame,
      from: String = "1996-01-01", until: String = "1997-01-01"): DataFrame = {
    val discC = (rate2("l_discount") * 100).cast("bigint")
    lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .filter(discC.between(5L, 7L))
      .agg(count(lit(1)).as("n_items"),
        // cents before the double cast — the whole corpus reduces to ONE
        // row here, the first shape to cross the 2^53 scaled-decimal
        // boundary as data grows (see pricingSummary)
        round(sum(dec2("l_extendedprice") * rate2("l_discount")), 2)
          .cast("double").as("revenue"))
  }

  /** B24 (TPC-H Q5 shape): local-supplier volume — revenue where the
    * supplier and the customer share a nation, per nation. The
    * nation-locality predicate rides the supplier join condition;
    * supplier + nation broadcast, the fact joins shuffle on their keys.
    */
  def localSupplierVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      from: String = "1996-01-01", until: String = "1998-01-01"): DataFrame =
    lineitem
      .join(orders.filter(
          col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(dec2("l_extendedprice") * oneMinus("l_discount")), 2)
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** B21 (TPC-H Q14 shape): promotion revenue share per ship month —
    * conditional aggregation over a broadcast dim join. Numerator and
    * denominator are exact decimal sums; the share is one double
    * division at the boundary.
    */
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("bigint").as("yr"),
        month(col("l_shipdate")).cast("bigint").as("mon"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
          dec2("l_extendedprice") * oneMinus("l_discount"))), 2)
          .cast("double").as("promo_rev"),
        round(sum(dec2("l_extendedprice") * oneMinus("l_discount")), 2)
          .cast("double").as("total_rev"))
      .withColumn("promo_share",
        coalesce(col("promo_rev"), lit(0.0)) / col("total_rev"))

  /** B22 (TPC-H Q19 shape): bracketed discounted revenue — an OR of
    * (brand, size-band, quantity-band) conjunctions spanning the join.
    * The whole disjunction stays inside one broadcast hash join
    * condition + filter (no union of three scans); quantity bands
    * compare in cents so the predicate is integer-exact.
    */
  def bracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val qtyC = (dec2("l_quantity") * 100).cast("bigint")
    val bracket =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
        qtyC.between(100L, 1500L)) ||
      (col("p_brand") === "Brand#11" && col("p_size").between(10, 30) &&
        qtyC.between(1000L, 2500L)) ||
      (col("p_brand") === "Brand#21" && col("p_size").between(20, 50) &&
        qtyC.between(2000L, 4000L))
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .agg(count(lit(1)).as("n_items"),
        round(sum(dec2("l_extendedprice") * oneMinus("l_discount")), 2)
          .cast("double").as("revenue"))
  }

  /** B8: VWAP per ship month: exact decimal numerator/denominator, single
    * double division at the boundary. */
  def vwapByMonth(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(year(col("l_shipdate")).cast("bigint").as("yr"),
        month(col("l_shipdate")).cast("bigint").as("mon"))
      .agg(
        round(sum(dec2("l_extendedprice") * dec2("l_quantity")), 2)
          .cast("double").as("pv"),
        sum(dec2("l_quantity")).cast("double").as("total_qty"))
      .select(col("yr"), col("mon"),
        (col("pv") / col("total_qty")).as("vwap"), col("total_qty"))

  /** B25 (TPC-H Q8 shape): national market share — one nation's share of
    * a part type's sales volume into one region, per year. Six-way join:
    * both nation legs, region, part and supplier all broadcast (tiny
    * dims); the only wide shuffles are lineitem⋈orders and ⋈customer on
    * their natural keys. Share = exact decimal num/den, one double
    * division at the boundary. */
  def marketShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, part: DataFrame,
      homeNation: String = "NATION_3", regionName: String = "AMERICA",
      partType: String = "ECONOMY",
      from: String = "1996-01-01", until: String = "1998-01-01")
      : DataFrame = {
    val nCust = nation.select(col("n_nationkey").as("c_nk"),
      col("n_regionkey").as("c_rk"))
    val nSupp = nation.select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    lineitem
      .join(broadcast(part.filter(col("p_type") === partType)),
        col("l_partkey") === col("p_partkey"))
      .join(orders.filter(
          col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("c_rk") === col("r_regionkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === homeNation,
          dec2("l_extendedprice") * oneMinus("l_discount"))
          .otherwise(lit(0).cast("decimal(12,2)"))).as("home_vol"),
        sum(dec2("l_extendedprice") * oneMinus("l_discount"))
          .as("total_vol"))
      .select(col("o_year"),
        (round(col("home_vol"), 2).cast("double") /
          round(col("total_vol"), 2).cast("double"))
          .as("mkt_share"),
        round(col("total_vol"), 2).cast("double").as("total_volume"))
  }

  /** B26 (TPC-H Q15 shape): top supplier(s) by quarterly revenue — the
    * revenue "view" is one keyed aggregate, its max is a 1-row broadcast
    * joined back, so ties surface exactly like the SQL view formulation
    * and nothing global-sorts. */
  def topSupplier(lineitem: DataFrame, supplier: DataFrame,
      from: String = "1996-01-01", until: String = "1996-04-01")
      : DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec2("l_extendedprice") * oneMinus("l_discount"))
        .as("total_rev"))
      // supplier-sized; feeds the max scalar AND the winner join — the
      // lineitem scan + revenue shuffle would otherwise run twice
      // (measured: AQE does not stage-cache the pruned branches)
      .localCheckpoint()
    val top = revenue.agg(max("total_rev").as("max_rev"))
    revenue.join(broadcast(top), col("total_rev") === col("max_rev"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
  }

  /** B27 (TPC-H Q12 shape, adapted): late-shipment priority audit. The
    * testdata carries no shipmode/commitdate, so "late" is shipped 60+
    * days after the order date and the classifier is the return flag —
    * same join + band filter + conditional-count shape as Q12 (high- vs
    * low-priority orders among late lines). */
  def latePriority(lineitem: DataFrame, orders: DataFrame,
      from: String = "1996-01-01", until: String = "1997-01-01")
      : DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp") &&
        col("l_shipdate") >= expr("o_orderdate + interval 60 days"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("high_line_count"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("low_line_count"))

  /** B28 (TPC-H Q21 shape, adapted): suppliers who held up multi-supplier
    * orders. Q21's semi/anti-exists pair ("another supplier's line
    * exists; no other supplier shipped later") is computed as one
    * per-order aggregate — distinct suppliers, latest ship date, number
    * of distinct suppliers at the latest date — then a key-aligned
    * join-back tags each line, so the whole correlated-subquery sandwich
    * is two hash aggregates and one join, no per-row probing. */
  def waitingSuppliers(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, k: Int = 20): DataFrame = {
    val li = lineitem
      .join(orders.filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val perOrder = li.groupBy("l_orderkey").agg(
      countDistinct("l_suppkey").as("n_supp"),
      max("l_shipdate").as("max_ship"))
    val lateAtMax = li.join(perOrder, "l_orderkey")
      .filter(col("l_shipdate") === col("max_ship"))
      .groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_max_shippers"),
        first(col("n_supp")).as("n_supp"),
        max("l_suppkey").as("late_supp"))
      // multi-supplier order, exactly ONE supplier at the latest ship:
      // everyone else was waiting on them (Q21's exists + not-exists)
      .filter(col("n_supp") > 1 && col("n_max_shippers") === 1)
    val counts = lateAtMax.groupBy(col("late_supp").as("s_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier), "s_suppkey")
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
    counts.select(col("s_suppkey"), col("s_name"), col("numwait"))
  }

  /** B29 (TPC-H Q2 shape, adapted): minimum-cost supplier per part. The
    * testdata has no partsupp table, so the part↔supplier relationship and
    * its cost are derived from trade history: the "supply cost" of a
    * (part, supplier) pair is the cheapest line price ever observed
    * (exact decimal — no division, so the min is engine-reproducible).
    * Q2's correlated `cost = (SELECT min(cost) ...)` becomes one keyed
    * aggregate + a key-aligned join-back; region/nation/supplier/part are
    * all broadcast dimensions, so lineitem shuffles once on the pair key
    * and everything else is map-side. */
  def minCostSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame, region: DataFrame,
      regionName: String = "EUROPE", partType: String = "LARGE",
      maxSize: Int = 10): DataFrame = {
    val regSupp = supplier
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
    val cost = lineitem
      .join(broadcast(regSupp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(part.filter(col("p_type") === partType &&
          col("p_size") <= maxSize)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("n_name"))
      .agg(min(dec2("l_extendedprice")).as("supply_cost"))
      .localCheckpoint() // (part, supplier)-sized; feeds min AND the join
    val minPerPart = cost.groupBy(col("p_partkey").as("mc_partkey"))
      .agg(min(col("supply_cost")).as("min_cost"))
    cost
      .join(minPerPart, col("p_partkey") === col("mc_partkey") &&
        col("supply_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        col("min_cost").cast("double").as("min_cost"))
  }

  /** B30 (TPC-H Q9 shape, adapted): product-type profit by nation and
    * year. No partsupp.ps_supplycost exists, so cost is proxied at 10% of
    * the part's retail price per unit — the aggregate keeps revenue and
    * cost as separate exact decimal sums and only combines them in double
    * at the output boundary. Plan shape is Q9's: the big fact joins the
    * part filter first (broadcast, prunes most lines), then orders for
    * the year, then the supplier→nation broadcast chain, one hash
    * aggregate at the end. */
  def productTypeProfit(lineitem: DataFrame, orders: DataFrame,
      part: DataFrame, supplier: DataFrame, nation: DataFrame,
      namePrefix: String = "red "): DataFrame =
    lineitem
      .join(broadcast(part.filter(col("p_name").startsWith(namePrefix))),
        col("l_partkey") === col("p_partkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(
        sum(dec2("l_extendedprice") * oneMinus("l_discount"))
          .as("revenue"),
        sum(dec2("p_retailprice") * col("l_quantity").cast("decimal(12,2)"))
          .as("retail_vol"))
      .select(col("nation"), col("o_year"),
        (col("revenue").cast("double") -
          col("retail_vol").cast("double") / 10.0).as("profit"))

  /** B31 (TPC-H Q11 shape, adapted): important parts — the inventory
    * value of each part supplied from one nation, kept when it exceeds a
    * fixed fraction of the nation's total. The global total is a 1-row
    * aggregate broadcast back (Q11's scalar subquery); the threshold
    * compare happens in scaled-integer cents (`value*1000 > total`), so
    * the boundary is exact in both engines. */
  def importantParts(lineitem: DataFrame, supplier: DataFrame,
      nation: DataFrame, nationName: String = "NATION_3",
      permille: Int = 1): DataFrame = {
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val perPart = lineitem
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg((sum(dec2("l_extendedprice")) * 100).cast("bigint")
        .as("value_cents"))
      .localCheckpoint() // part-sized; feeds the total scalar AND the join
    val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
    perPart.join(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents") * permille)
      .select(col("p_partkey"),
        (col("value_cents").cast("double") / 100.0).as("value"))
  }

  /** B32 (TPC-H Q16 shape, adapted): how many suppliers can supply each
    * (brand, type, size) bucket. The part↔supplier relationship is the
    * distinct pair set observed in lineitem; Q16's "customer complaints"
    * exclusion becomes an anti-join against suppliers in deficit
    * (s_acctbal < 0). The distinct-pair reduction happens BEFORE the part
    * join, so the count-distinct aggregate sees pairs, not raw lines. */
  def supplierPartCount(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame,
      sizes: Seq[Int] = Seq(1, 3, 9, 14, 19, 23, 36, 45),
      excludeBrand: String = "Brand#1"): DataFrame = {
    val pairs = lineitem.select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(supplier.filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
    pairs
      .join(broadcast(part.filter(col("p_brand") =!= excludeBrand &&
          !col("p_type").startsWith("SMALL") &&
          col("p_size").isin(sizes: _*))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** B33 (TPC-H Q20 shape, adapted): dominant suppliers of a part family
    * in a year — suppliers who shipped MORE than half of a part's total
    * shipped quantity (the availqty>half-of-sold test re-expressed over
    * trade history). Two keyed aggregates (pair and part totals) with an
    * exact integer `2*pair > total` predicate, then one broadcast hash
    * semi-join onto the nation-scoped supplier list — no correlated
    * probing. Quantities are integer-valued, so the sums are exact. */
  def dominantSuppliers(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, nation: DataFrame,
      namePrefix: String = "small ", nationName: String = "NATION_1",
      from: String = "1996-01-01", until: String = "1997-01-01")
      : DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .join(broadcast(part.filter(col("p_name").startsWith(namePrefix))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val pairQty = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).cast("bigint").as("pair_qty"))
      .localCheckpoint() // pair-sized; feeds the part rollup AND the join
    // part totals are the sums of the per-pair sums — derived from the
    // materialized pair table instead of a second pass over lineitem
    val partQty = pairQty.groupBy(col("l_partkey").as("pq_partkey"))
      .agg(sum(col("pair_qty")).as("total_qty"))
    val natSupp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    pairQty
      .join(partQty, col("l_partkey") === col("pq_partkey"))
      .filter(col("pair_qty") * 2 > col("total_qty"))
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_parts_dominated"))
  }
}
