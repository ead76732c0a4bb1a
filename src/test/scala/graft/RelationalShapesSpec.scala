package graft

import org.apache.spark.sql.functions._

/** Independent recounts for the TPC-H idiom queries added in round 7
  * (Q12/Q14/Q17/Q18/Q19/Q21 shapes). Each test recomputes the answer
  * a second way on the driver from the raw sf0.001 tables, so the
  * DuckDB hash gate is backed by a meaning check.
  */
class RelationalShapesSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, Sf0001)

  private def li = graft.sources.Tables.lineitem(spark, Sf0001)
  private def part = graft.sources.Tables.part(spark, Sf0001)
  private def orders = graft.sources.Tables.orders(spark, Sf0001)

  test("stock replay: reflection-identity windows equal the recursive fold") {
    // r15 optimization: p_t = max(0, p_{t-1} + x_t) is replaced by the
    // Lindley closed form p_t = S_t - min(0, M_t) (exact BIGINTs, so
    // bit-identical). Pin row-for-row INCLUDING order, at both SFs,
    // against the WITH RECURSIVE form — the recursion class itself
    // stays exercised right here.
    for (sf <- Seq(Sf0001, Sf001)) {
      val rec = graft.operators.Relational.stockReplayPlan(spark, sf,
        recursiveSim = true).collect().toSeq
      val win = graft.operators.Relational.stockReplayPlan(spark, sf,
        recursiveSim = false).collect().toSeq
      assert(win == rec, s"sf=$sf")
    }
  }

  test("q_promo_share: share recomputed from a driver-side BigDecimal walk") {
    val row = q("q_promo_share").collect().head
    val joined = li
      .filter($"l_shipdate" >= lit("1996-09-01").cast("timestamp")
        && $"l_shipdate" < lit("1996-10-01").cast("timestamp"))
      .join(part, $"l_partkey" === $"p_partkey")
      .select($"p_type", $"l_extendedprice", $"l_discount")
      .collect()
    def rev(r: org.apache.spark.sql.Row): BigDecimal =
      BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        (BigDecimal(1) - BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val total = joined.map(rev).sum
    val promo = joined.filter(_.getString(0) == "PROMO").map(rev).sum
    assert(row.getAs[Long]("n_lines") == joined.length)
    assert(math.abs(row.getAs[Double]("promo_rev") - promo.toDouble) < 1e-6)
    assert(math.abs(row.getAs[Double]("total_rev") - total.toDouble) < 1e-6)
    val share = row.getAs[Double]("promo_share")
    assert(share > 0.0 && share < 100.0)
    assert(math.abs(share - 100.0 * promo.toDouble / total.toDouble) < 1e-9)
  }

  test("q_small_qty_revenue: brute-force per-part small-line sweep agrees") {
    val row = q("q_small_qty_revenue").collect().head
    val lines = li.join(part.filter($"p_brand" === "Brand#23"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .collect()
      .groupBy(_.getLong(0))
    var nSmall = 0L
    var price = BigDecimal(0)
    lines.values.foreach { rs =>
      val sumQty = rs.map(r => BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      rs.foreach { r =>
        // qty·5·n < sum ⇔ qty < 0.2·avg — the query's division-free form
        if (BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 5 * rs.length < sumQty) {
          nSmall += 1
          price += BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        }
      }
    }
    assert(row.getAs[Long]("n_small") == nSmall)
    assert(math.abs(row.getAs[Double]("avg_yearly") - price.toDouble / 7.0) < 1e-6)
  }

  test("q_big_orders: every order clears the threshold, recount matches, order total") {
    val rows = q("q_big_orders").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > 250.0))
    // recount the surviving order set independently
    val expect = li.groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("q")).filter($"q" > 250.0)
      .select($"l_orderkey").collect().map(_.getLong(0)).toSet
    val got = rows.map(_.getAs[Long]("o_orderkey")).toSet
    assert(got.subsetOf(expect))
    if (expect.size <= 100) assert(got == expect)
    // sorted by o_totalprice desc with orderkey tiebreak
    val prices = rows.map(r => (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    assert(prices.sameElements(prices.sorted))
  }

  test("q_or_predicates: disjunct recount on the driver agrees") {
    val row = q("q_or_predicates").collect().head
    val joined = li.join(part, $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"p_size", $"l_quantity").collect()
    val n = joined.count { r =>
      val (b, sz, qt) = (r.getString(0), r.getInt(1), r.getDouble(2))
      (b == "Brand#15" && sz >= 1 && sz <= 5 && qt >= 1.0 && qt <= 11.0) ||
      (b == "Brand#23" && sz >= 1 && sz <= 10 && qt >= 10.0 && qt <= 20.0) ||
      (b == "Brand#19" && sz >= 1 && sz <= 15 && qt >= 20.0 && qt <= 30.0)
    }
    assert(row.getAs[Long]("n_lines") == n)
    assert(row.getAs[Double]("revenue") > 0.0)
  }

  test("q_priority_mix: tallies partition the joined line set") {
    val rows = q("q_priority_mix").collect()
    val total = li
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(orders, $"l_orderkey" === $"o_orderkey")
    assert(rows.map(r => r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count")).sum
      == total.count())
    val high = total.filter($"o_orderpriority".isin("1-URGENT", "2-HIGH")).count()
    assert(rows.map(_.getAs[Long]("high_line_count")).sum == high)
  }

  test("q_waiting_suppliers: the only-returned-supplier set recounted from raw rows") {
    val rows = q("q_waiting_suppliers").collect()
    assert(rows.nonEmpty)
    // driver-side recount at sf0.001
    val finished = orders.filter($"o_orderstatus" === "F")
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val lines = li.select($"l_orderkey", $"l_suppkey", $"l_returnflag").collect()
      .groupBy(_.getLong(0))
    val supName = graft.sources.Tables.supplier(spark, Sf0001)
      .select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val waits = scala.collection.mutable.Map.empty[String, Long]
    lines.foreach { case (ok, rs) if finished(ok) =>
      rs.filter(_.getString(2) == "R").foreach { r =>
        val sk = r.getLong(1)
        val others = rs.filter(_.getLong(1) != sk)
        if (others.nonEmpty && !others.exists(_.getString(2) == "R")) {
          val n = supName(sk)
          waits(n) = waits.getOrElse(n, 0L) + 1
        }
      }
    case _ => ()
    }
    val expect = waits.toSeq.sortBy { case (n, w) => (-w, n) }.take(20)
    assert(rows.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait"))).toSeq == expect)
  }

  test("q_profit_by_nation: one cell recounted from a BigDecimal walk of the raw join") {
    val rows = q("q_profit_by_nation").collect()
    assert(rows.nonEmpty)
    // recount the first (nation, year) cell independently
    val head = rows.head
    val (nat, yr) = (head.getAs[String]("nation"), head.getAs[Long]("o_year"))
    val partsKept = part.filter($"p_name".like("%e%"))
      .select($"p_partkey", $"p_retailprice").collect()
      .map(r => r.getLong(0) -> BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)).toMap
    val supNation = graft.sources.Tables.supplier(spark, Sf0001)
      .join(graft.sources.Tables.nation(spark, Sf0001), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orderYear = orders.select($"o_orderkey", year($"o_orderdate").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var n = 0L; var profit = BigDecimal(0)
    li.select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
        $"l_extendedprice", $"l_discount").collect().foreach { r =>
      partsKept.get(r.getLong(1)).foreach { retail =>
        if (supNation(r.getLong(2)) == nat && orderYear(r.getLong(0)) == yr) {
          n += 1
          def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          profit += d2(r.getDouble(4)) * (BigDecimal("1.00") - d2(r.getDouble(5))) -
            retail * d2(r.getDouble(3)) * BigDecimal("0.80")
        }
      }
    }
    assert(head.getAs[Long]("n_lines") == n)
    assert(head.getAs[Double]("profit") == profit.toDouble)
  }

  test("q_returned_customers: top-20 order and one revenue cell recounted") {
    val rows = q("q_returned_customers").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
    val head = rows.head
    val ck = head.getAs[Long]("c_custkey")
    val orderSet = orders.filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1997-04-01").cast("timestamp")
        && $"o_custkey" === ck)
      .select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val lines = li.filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount").collect()
      .filter(r => orderSet(r.getLong(0)))
    def d2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rev = lines.map(r => d2(r.getDouble(1)) * (BigDecimal("1.00") - d2(r.getDouble(2)))).sum
    assert(head.getAs[Long]("n_lines") == lines.length.toLong)
    assert(head.getAs[Double]("revenue") == rev.toDouble)
  }

  test("q_supplier_part_counts: distinct-supplier counts recounted with the NOT-IN exclusion") {
    val rows = q("q_supplier_part_counts").collect()
    assert(rows.nonEmpty)
    val excluded = graft.sources.Tables.supplier(spark, Sf0001)
      .filter($"s_acctbal" < 0).select($"s_suppkey").collect().map(_.getLong(0)).toSet
    val attrs = part.select($"p_partkey", $"p_brand", $"p_type", $"p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getInt(3)))).toMap
    val sizes = Set(1, 4, 9, 16, 25, 36, 49)
    val expect = li.select($"l_partkey", $"l_suppkey").distinct().collect()
      .flatMap { r =>
        val (b, t, z) = attrs(r.getLong(0))
        if (b != "Brand#1" && t != "PROMO" && sizes(z) && !excluded(r.getLong(1)))
          Some(((b, t, z), r.getLong(1)))
        else None
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length.toLong).toMap
    val got = rows.map(r => ((r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
      r.getAs[Int]("p_size")), r.getAs[Long]("supplier_cnt"))).toMap
    assert(got == expect)
    // top-k order honored
    val cnts = rows.map(_.getAs[Long]("supplier_cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("q_dominant_suppliers: the dominance set recounted from exact decimal sums") {
    val rows = q("q_dominant_suppliers").collect()
    assert(rows.nonEmpty)
    val window = li.filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
      .select($"l_suppkey", $"l_partkey", $"l_quantity").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val perSp = window.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val perP = window.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nSupPerP = window.map(t => (t._2, t._1)).distinct.groupBy(_._1)
      .view.mapValues(_.length).toMap
    val contested = perSp.keys.filter(k => nSupPerP(k._2) >= 2).toSeq
    val dominant = contested.groupBy(_._1).collect {
      case (sk, pks) if pks.count { case (s2, pk) =>
        perSp((s2, pk)) * 2 > perP(pk) } * 10 >= pks.length => sk
    }.toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == dominant)
    // name order + selectivity sanity: at sf0.001 not every supplier dominates
    val names = rows.map(_.getAs[String]("s_name"))
    assert(names.sorted.toSeq == names.toSeq)
    val nSup = graft.sources.Tables.supplier(spark, Sf0001).count()
    assert(rows.length < nSup)
  }
}
