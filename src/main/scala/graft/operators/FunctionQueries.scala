package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.t

/** Scalar-function and SQL-surface coverage the reference lacks entirely
  * (SURVEY.md §2.1: its only scalar functions are pow/sqrt/add/divide —
  * `Point.java:47-76`): string/date function suites, the window-function
  * family beyond row_number, correlated subqueries (Catalyst
  * decorrelation), null-safe join equality, and CSV/JSON source+sink
  * round-trips. Everything is a built-in codegen'd function — no UDFs —
  * and every query is DuckDB-oracle-checked, which pins the exact
  * cross-engine semantics (1-based substring, ISO weeks, ntile split
  * rules, null-safe `<=>` vs `IS NOT DISTINCT FROM`, …).
  */
object FunctionQueries {

  /** String-function suite over `part`: case mapping, 1-based substring
    * and search, padding, reverse, replace, translate, split_part, and
    * Levenshtein edit distance. One narrow projection — scan speed at
    * any scale; the value is the pinned cross-engine semantics. */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        length(col("p_name")).as("name_len"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 3, 5).as("name_sub"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        reverse(col("p_type")).as("type_rev"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        translate(col("p_name"), "aeiou", "01234").as("name_tr"),
        split_part(col("p_type"), lit(" "), lit(2)).as("type_word2"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev"))

  /** Date/time-function suite over `orders`: calendar fields, ISO week,
    * day-of-week (pinned to Spark's 1=Sunday convention), last_day,
    * add_months (end-of-month clamping), and day difference against a
    * fixed anchor. Derived dates are emitted as formatted strings so
    * both engines compare text, not engine-specific date encodings. */
  def qDates(spark: SparkSession, dir: String): DataFrame = {
    val d = to_date(col("o_orderdate"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        date_format(d, "yyyy-MM-dd").as("order_date"),
        year(d).cast("long").as("yr"),
        quarter(d).cast("long").as("qtr"),
        month(d).cast("long").as("mo"),
        dayofmonth(d).cast("long").as("dom"),
        dayofyear(d).cast("long").as("doy"),
        dayofweek(d).cast("long").as("dow"),
        weekofyear(d).cast("long").as("iso_week"),
        date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(d, 3), "yyyy-MM-dd").as("plus3m"),
        datediff(to_date(lit("2024-06-30")), d).cast("long")
          .as("days_to_h1_end"))
  }

  /** Window-function family beyond row_number (which q_window_top_orders
    * covers): lag/lead, rank/dense_rank, ntile, percent_rank, cume_dist
    * and first_value, all over one per-customer window — ONE shuffle on
    * the partition key, each partition sorts only its own rows. The
    * ordering (date, orderkey) is total, so every function is
    * deterministic and the DuckDB oracle pins the split/tie semantics. */
  def qWindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .where(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first_value(col("o_orderkey")).over(w).as("first_order"))
  }

  /** IGNORE NULLS window family — forward-fill ("last observation
    * carried forward") and its mirrors, the time-series idiom SQL
    * ports hit immediately after plain lag/lead: the nullable measure
    * (value only on click events) is filled per user from the most
    * recent non-null via `last(ignoreNulls)` over a trailing frame,
    * first non-null via `first(ignoreNulls)` over the leading frame,
    * and `lead(ignoreNulls)` finds the next observed value. One
    * window partition key = ONE exchange; ordering ties broken by
    * event_id. */
  def qWindowNulls(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wPast = wAll.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val wFuture = wAll.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    t(spark, dir, "events")
      .where(col("user_id") % 25 === 0)
      .withColumn("click_value",
        when(col("event_type") === "click", round(col("value"), 6)))
      .select(col("user_id"), col("event_id"), col("click_value"),
        last(col("click_value"), ignoreNulls = true).over(wPast)
          .as("filled_ffill"),
        first(col("click_value"), ignoreNulls = true).over(wFuture)
          .as("filled_bfill"),
        lead(col("click_value"), 1, null, ignoreNulls = true).over(wAll)
          .as("next_click_value"))
  }

  val HistBins = 20

  /** Equi-width HISTOGRAM with in-plan bounds — the profiling
    * primitive: bin edges derive from a broadcast 1-row (min, max)
    * aggregate (no driver collect), bin assignment is one narrow
    * projection, and the histogram is one hash aggregation. Totals
    * accumulate in integer cents so the per-bin sum is
    * order-independent. Two passes over the column at any scale —
    * the same shape `approx_quantile` avoids only by sketching
    * ([[RelationalQueries]]' bound family). */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").select(col("o_totalprice").as("x"))
    val bounds = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    o.crossJoin(broadcast(bounds))
      .withColumn("bin",
        least(lit(HistBins - 1),
          floor((col("x") - col("lo")) * HistBins
            / (col("hi") - col("lo") + lit(1e-9)))).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col("x")), 2).as("x_min"),
        round(max(col("x")), 2).as("x_max"),
        sum(round(col("x") * 100).cast("long")).as("sum_cents"))
  }

  /** Register per-call uniquely-named temp views, build the query,
    * drop the views. `spark.sql` analyzes eagerly, so the returned
    * DataFrame's plan holds the RESOLVED relations and survives the
    * drop — no fixed-name session-catalog mutation, no race between
    * two dirs queried concurrently in one session. */
  private def withViews(spark: SparkSession,
                        dfs: (String, org.apache.spark.sql.DataFrame)*)
                       (body: Map[String, String] => DataFrame): DataFrame = {
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val names = dfs.map { case (alias, df) =>
      val n = s"graft_${alias}_$tag"
      df.createOrReplaceTempView(n)
      alias -> n
    }.toMap
    try body(names)
    finally { names.values.foreach(spark.catalog.dropTempView); () }
  }

  /** Correlated scalar subqueries through the SQL surface: per-customer
    * order count and the customer's nation-average balance, written as
    * correlated subqueries and DECORRELATED by Catalyst into aggregate+
    * join plans (no per-row re-execution — the rewrite is what makes
    * correlated SQL viable at scale). Text is identical to the DuckDB
    * oracle modulo view names. */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, "cust" -> t(spark, dir, "customer"),
      "ord" -> t(spark, dir, "orders")) { v =>
      spark.sql(
        s"""SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
           |  (SELECT count(*) FROM ${v("ord")} o
           |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
           |  round((SELECT avg(c2.c_acctbal) FROM ${v("cust")} c2
           |         WHERE c2.c_nationkey = c.c_nationkey), 6) AS nation_avg
           |FROM ${v("cust")} c""".stripMargin)
    }

  /** Null-safe join equality (`<=>` / IS NOT DISTINCT FROM): the join
    * flavor where NULL keys MATCH each other instead of vanishing —
    * needed whenever a nullable dimension key is a legitimate "unknown"
    * bucket. Null keys are manufactured via nullif so the null-match
    * path is actually exercised; a plain equi-join would silently drop
    * those rows (OperatorsSpec asserts the difference).
    *
    * Written in the NATURAL form — join the raw sides, then aggregate
    * — whose declarative plan materializes the Θ(|cust|·|supp|) pair
    * fan-out (600M rows at sf1 for a 5-row answer, quadratic in the
    * scale factor). The engine's [[graft.plans.PushAggThroughJoin]]
    * eager-aggregation rule collapses it to per-side aggregates
    * joined 1:1 per key — count(*) = cntL·cntR, distinct counts
    * per side — so the fan-out never exists at ANY scale while the
    * user keeps the textbook query. PlansSpec pins the rewrite
    * (aggregates BELOW the join in the optimized plan) and its value
    * equality against the unoptimized plan. */
  def qNullSafeJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"), nullif(col("c_nationkey") % 5, lit(2)).as("k"))
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"),
          nullif(col("s_nationkey") % 5, lit(2)).as("sk")),
        col("k") <=> col("sk"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c_custkey")).as("n_cust"),
        countDistinct(col("s_suppkey")).as("n_supp"))
      .select(col("k"), col("n_pairs"), col("n_cust"), col("n_supp"))

  /** LATERAL correlated-aggregate subquery (per-customer stats over its
    * own big orders): the SQL-surface form of a dependent join.
    * Catalyst DECORRELATES the equi-correlated aggregate into ONE
    * grouped aggregate + one join — no per-row re-execution — and
    * handles the classic COUNT-bug correctly: a customer with NO
    * qualifying orders still emits (n_big=0, max_big=NULL) because the
    * lateral aggregate always yields a row. Two shapes were REJECTED
    * after .explain audits, both of which Spark currently plans with
    * scale hazards: LATERAL … ORDER BY/LIMIT (global range sort — use
    * q_window_top_orders / native TopKPerKey for top-n-per-key) and a
    * theta correlation on c_acctbal (domain join + BroadcastNestedLoop
    * against the full orders table). Equi-correlation is the shape
    * this engine endorses for LATERAL at 100 TB. */
  def qLateral(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, "cust" -> t(spark, dir, "customer"),
      "ord" -> t(spark, dir, "orders")) { v =>
      spark.sql(
        s"""SELECT c.c_custkey, l.n_big, l.max_big
           |FROM ${v("cust")} c,
           |LATERAL (SELECT count(*) AS n_big,
           |                round(max(o_totalprice), 2) AS max_big
           |         FROM ${v("ord")} o WHERE o.o_custkey = c.c_custkey
           |           AND o.o_totalprice > 300000) l""".stripMargin)
    }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): ancestor-chain walk over
    * an implicit hierarchy (parent(c) = c ÷ 2 — a binary-heap tree over
    * custkeys), one level per recursion step. The same
    * driver-loop-over-distributed-steps shape as the k-means kernel,
    * but expressed declaratively; depth is log₂(maxkey) so the loop is
    * bounded. Each engine runs its own fixpoint executor. */
  def qRecursive(spark: SparkSession, dir: String): DataFrame =
    withViews(spark, "cust" -> t(spark, dir, "customer")) { v =>
      spark.sql(
        s"""WITH RECURSIVE anc AS (
           |  SELECT c_custkey AS start, c_custkey AS node, 0 AS depth
           |  FROM ${v("cust")} WHERE c_custkey % 100 = 0
           |  UNION ALL
           |  SELECT start, node DIV 2, depth + 1 FROM anc WHERE node > 1
           |)
           |SELECT start, max(depth) AS chain_len, count(*) AS n_nodes
           |FROM anc GROUP BY start""".stripMargin)
    }

  /** UNPIVOT (melt) — the inverse of q_pivot: per-priority status
    * totals computed wide, then melted back to (priority, status,
    * total) rows with Dataset.unpivot. Wide→long is a narrow per-row
    * explode (no shuffle beyond the feeding aggregate); the oracle
    * states the same result as a direct GROUP BY, so the
    * pivot→unpivot pair is proven lossless. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .select(col("o_orderpriority"),
        coalesce(col("F").cast("double"), lit(0.0)).as("F"),
        coalesce(col("O").cast("double"), lit(0.0)).as("O"),
        coalesce(col("P").cast("double"), lit(0.0)).as("P"))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "o_orderstatus", "total")
      .select(col("o_orderpriority"), col("o_orderstatus"),
        round(col("total"), 2).as("total"))
  }

  /** Array / higher-order-function suite over a per-order token-like
    * array (the lineitem quantities of each order): construction via
    * collect_list with a deterministic in-array order, then transform /
    * filter / exists / aggregate (fold) / zip_with / slice / sort /
    * distinct — the lambda-function family every array-bearing schema
    * leans on, all inside codegen. Oracle mirrors with DuckDB list
    * lambdas (1-based indexing on BOTH engines, SURVEY §7.4). */
  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val arr = t(spark, dir, "lineitem")
      .where(col("l_orderkey") % 50 === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(
        struct(col("l_linenumber"), col("l_quantity")))).as("ls"))
      .select(col("l_orderkey"),
        transform(col("ls"), s => s.getField("l_quantity")).as("qs"))
    arr.select(col("l_orderkey"),
      size(col("qs")).cast("long").as("n_items"),
      round(aggregate(col("qs"), lit(0.0d), (acc, x) => acc + x), 2)
        .as("total_qty"),
      size(filter(col("qs"), _ > 25.0)).cast("long").as("n_big"),
      exists(col("qs"), _ > 45.0).as("any_huge"),
      round(element_at(array_sort(col("qs")), 1), 2).as("min_qty"),
      round(element_at(array_sort(col("qs")), -1), 2).as("max_qty"),
      size(array_distinct(col("qs"))).cast("long").as("n_distinct"),
      round(aggregate(slice(col("qs"), 1, 3), lit(0.0d),
        (acc, x) => acc + x), 2).as("head3_sum"))
  }

  /** Per-PROCESS nonce in the sink path: deterministic within one JVM
    * (bench's repeat runs overwrite their own directory) but two
    * concurrent processes on the same data dir never share a sink —
    * one's overwrite-delete would race the other's read-back scan.
    * floorMod, not abs: abs(Int.MinValue) is still negative. */
  private lazy val processNonce: String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Sink path under the shared artifacts root
    * ([[graft.sources.Artifacts.root]]): configurable to a shared
    * filesystem on a real cluster, where executors write their sink
    * files and the driver's read-back glob must see them — a
    * machine-local tmpdir would only work in local mode. */
  private def roundTripDir(spark: SparkSession, kind: String,
                           dir: String): String =
    s"${graft.sources.Artifacts.root(spark)}/graft_${kind}_" +
      s"${java.lang.Math.floorMod(dir.hashCode, 1 << 30)}_$processNonce"

  /** CSV sink + source round-trip: a per-priority aggregate is written
    * as headered CSV and read back with an EXPLICIT schema (no
    * inference pass — at scale schema inference is a full extra scan),
    * then re-projected. The oracle computes the same aggregate straight
    * from parquet, so the round-trip must be lossless: header mapping,
    * quoting, and double formatting are all on trial. The write stays
    * at the plan's natural parallelism (one file per task — a
    * coalesce(1) "single file" write would serialize the sink at
    * scale); the read-back globs the directory. Doubles survive
    * because Spark writes shortest-round-trip decimal text. */
  def qCsvSource(spark: SparkSession, dir: String): DataFrame = {
    val out = roundTripDir(spark, "csv", dir)
    t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total"))
      .write.mode("overwrite").option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("o_orderpriority", StringType),
      StructField("n_orders", LongType),
      StructField("total", DoubleType)))
    spark.read.option("header", "true").schema(schema).csv(out)
      .select(col("o_orderpriority"), col("n_orders"),
        round(col("total"), 2).as("total"))
  }

  /** ORC sink + source round-trip — the third columnar-format leg next
    * to the parquet scans everything else uses: per-nation supplier
    * stats written as ORC, read back, re-projected. Same lossless-
    * round-trip witness structure as [[qCsvSource]]; ORC's own schema
    * rides the files, so no explicit read schema is needed. */
  def qOrcSource(spark: SparkSession, dir: String): DataFrame = {
    val out = roundTripDir(spark, "orc", dir)
    t(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_bal"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .select(col("s_nationkey"), col("n_suppliers"),
        round(col("total_bal"), 2).as("total_bal"))
  }

  /** JSON sink + source round-trip, same witness structure as
    * [[qCsvSource]] on a different aggregate (per-lang/source document
    * stats): JSON-lines writing, explicit-schema reading, field-order
    * independence. */
  def qJsonSource(spark: SparkSession, dir: String): DataFrame = {
    val out = roundTripDir(spark, "json", dir)
    t(spark, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .write.mode("overwrite").json(out)
    val schema = StructType(Seq(
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_docs", LongType),
      StructField("total_chars", LongType)))
    spark.read.schema(schema).json(out)
      .select(col("lang"), col("source"), col("n_docs"), col("total_chars"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_window_nulls" -> qWindowNulls,
    "q_histogram" -> qHistogram,
    "q_string_funcs" -> qStringFuncs,
    "q_dates" -> qDates,
    "q_window_funcs" -> qWindowFuncs,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_lateral" -> qLateral,
    "q_recursive" -> qRecursive,
    "q_null_safe_join" -> qNullSafeJoin,
    "q_unpivot" -> qUnpivot,
    "q_array_funcs" -> qArrayFuncs,
    "q_csv_source" -> qCsvSource,
    "q_json_source" -> qJsonSource,
    "q_orc_source" -> qOrcSource)

  val oracles: Map[String, String] = Map(
    "q_window_nulls" ->
      """SELECT user_id, event_id, click_value,
        |  last_value(click_value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_ffill,
        |  first_value(click_value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS filled_bfill,
        |  -- lead(IGNORE NULLS) == first non-null strictly after the
        |  -- current row
        |  first_value(click_value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |    AS next_click_value
        |FROM (SELECT user_id, event_id, ts,
        |             CASE WHEN event_type = 'click'
        |                  THEN round(value, 6) END AS click_value
        |      FROM events WHERE user_id % 25 = 0)""".stripMargin,
    "q_histogram" ->
      s"""WITH o AS (SELECT o_totalprice AS x FROM orders),
         |b AS (SELECT min(x) AS lo, max(x) AS hi FROM o)
         |SELECT CAST(least(${HistBins - 1},
         |         floor((x - lo) * $HistBins / (hi - lo + 1e-9)))
         |         AS INT) AS bin,
         |       count(*) AS n,
         |       round(min(x), 2) AS x_min, round(max(x), 2) AS x_max,
         |       CAST(sum(CAST(round(x * 100) AS BIGINT)) AS BIGINT)
         |         AS sum_cents
         |FROM o, b GROUP BY 1""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  length(p_name) AS name_len,
        |  upper(p_brand) AS brand_up,
        |  lower(p_type) AS type_lo,
        |  substr(p_name, 3, 5) AS name_sub,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  reverse(p_type) AS type_rev,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  translate(p_name, 'aeiou', '01234') AS name_tr,
        |  split_part(p_type, ' ', 2) AS type_word2,
        |  CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev
        |FROM part""".stripMargin,
    "q_dates" ->
      """SELECT o_orderkey,
        |  strftime(d, '%Y-%m-%d') AS order_date,
        |  CAST(year(d) AS BIGINT) AS yr,
        |  CAST(quarter(d) AS BIGINT) AS qtr,
        |  CAST(month(d) AS BIGINT) AS mo,
        |  CAST(day(d) AS BIGINT) AS dom,
        |  CAST(dayofyear(d) AS BIGINT) AS doy,
        |  CAST(dayofweek(d) + 1 AS BIGINT) AS dow,
        |  CAST(weekofyear(d) AS BIGINT) AS iso_week,
        |  strftime(last_day(d), '%Y-%m-%d') AS month_end,
        |  strftime(CAST(d + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS plus3m,
        |  CAST(date_diff('day', d, DATE '2024-06-30') AS BIGINT)
        |    AS days_to_h1_end
        |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |      FROM orders)""".stripMargin,
    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        |  round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume,
        |  first_value(o_orderkey) OVER w AS first_order
        |FROM orders
        |WHERE o_custkey % 10 = 0
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders,
        |  round((SELECT avg(c2.c_acctbal) FROM customer c2
        |         WHERE c2.c_nationkey = c.c_nationkey), 6) AS nation_avg
        |FROM customer c""".stripMargin,
    "q_lateral" ->
      """SELECT c.c_custkey, l.n_big, l.max_big
        |FROM customer c,
        |LATERAL (SELECT count(*) AS n_big,
        |                round(max(o_totalprice), 2) AS max_big
        |         FROM orders o WHERE o.o_custkey = c.c_custkey
        |           AND o.o_totalprice > 300000) l""".stripMargin,
    "q_recursive" ->
      """WITH RECURSIVE anc AS (
        |  SELECT c_custkey AS start, c_custkey AS node, 0 AS depth
        |  FROM customer WHERE c_custkey % 100 = 0
        |  UNION ALL
        |  SELECT start, node // 2, depth + 1 FROM anc WHERE node > 1
        |)
        |SELECT start, CAST(max(depth) AS INT) AS chain_len,
        |       count(*) AS n_nodes
        |FROM anc GROUP BY start""".stripMargin,
    "q_null_safe_join" ->
      """SELECT k, count(*) AS n_pairs,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(DISTINCT s_suppkey) AS n_supp
        |FROM (SELECT c_custkey, nullif(c_nationkey % 5, 2) AS k
        |      FROM customer) c
        |JOIN (SELECT s_suppkey, nullif(s_nationkey % 5, 2) AS sk
        |      FROM supplier) s
        |  ON k IS NOT DISTINCT FROM sk
        |GROUP BY k""".stripMargin,
    "q_csv_source" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_unpivot" ->
      """WITH agg AS (
        |  SELECT o_orderpriority, o_orderstatus,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS t
        |  FROM orders GROUP BY 1, 2
        |), grid AS (
        |  SELECT p.o_orderpriority, s.o_orderstatus
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders) p,
        |       (VALUES ('F'), ('O'), ('P')) s(o_orderstatus)
        |)
        |SELECT g.o_orderpriority, g.o_orderstatus,
        |       round(coalesce(a.t, 0.0), 2) AS total
        |FROM grid g
        |LEFT JOIN agg a USING (o_orderpriority, o_orderstatus)""".stripMargin,
    "q_array_funcs" ->
      """WITH arr AS (
        |  SELECT l_orderkey,
        |         list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs
        |  FROM lineitem WHERE l_orderkey % 50 = 0 GROUP BY l_orderkey
        |)
        |SELECT l_orderkey,
        |  CAST(len(qs) AS BIGINT) AS n_items,
        |  round(list_sum(qs), 2) AS total_qty,
        |  CAST(len(list_filter(qs, x -> x > 25.0)) AS BIGINT) AS n_big,
        |  len(list_filter(qs, x -> x > 45.0)) > 0 AS any_huge,
        |  round(list_sort(qs)[1], 2) AS min_qty,
        |  round(list_sort(qs)[-1], 2) AS max_qty,
        |  CAST(len(list_distinct(qs)) AS BIGINT) AS n_distinct,
        |  round(list_sum(qs[1:3]), 2) AS head3_sum
        |FROM arr""".stripMargin,
    "q_orc_source" ->
      """SELECT s_nationkey, count(*) AS n_suppliers,
        |  round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS total_bal
        |FROM supplier GROUP BY s_nationkey""".stripMargin,
    "q_json_source" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang, source""".stripMargin)
}
