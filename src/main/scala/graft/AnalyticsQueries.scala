package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScaleSafe.broadcastIfSmall

/** Section B of SURVEY.md §2 — headline analytics queries (bench set).
  *
  * Conventions shared with the DuckDB oracles:
  *  - Money math goes through decimal(12,2) so sums are exact and
  *    order-independent (a double sum would differ across engines /
  *    partitionings in the last ulp); the final aggregate is cast to
  *    double so output schemas are precision-free.
  *  - Every result has a total deterministic ORDER BY.
  */
object AnalyticsQueries {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** q22's "idle" cutoff: no orders on/after this date. Non-private so
    * the planted-row spec exercises the exact boundary the query uses.
    */
  val Idle1998Cutoff = "1998-01-01"
  private val one                    = lit(1).cast("decimal(12,2)")

  private def ts(s: String) = lit(s).cast("timestamp")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q1_agg",
      (spark, dir) => {
        import spark.implicits._
        Tables(spark, dir).lineitem
          .filter($"l_shipdate" <= ts("1998-09-02"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum(dec($"l_quantity")).cast("double").as("sum_qty"),
            sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
            sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("sum_disc_price"),
            sum(dec($"l_extendedprice") * (one - dec($"l_discount")) * (one + dec($"l_tax")))
              .cast("double").as("sum_charge"),
            (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(dec($"l_extendedprice")).cast("double") / count(lit(1))).as("avg_price"),
            count(lit(1)).as("count_order")
          )
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
               CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q6_filter",
      (spark, dir) => {
        import spark.implicits._
        // Selective filter + agg: everything must reach the parquet scan as
        // PushedFilters (asserted in AnalyticsSpec).
        Tables(spark, dir).lineitem
          .filter(
            $"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1997-01-01") &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24
          )
          .agg(sum(dec($"l_extendedprice") * dec($"l_discount")).cast("double").as("revenue"))
      },
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q3_join",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        // customer is ~1.5% of lineitem rows but still SF-proportional:
        // hint only when measured small (at 100 TB the gate refuses and
        // AQE shuffles it); orders⨝lineitem shuffles on orderkey (the
        // natural key at 100 TB too).
        t.lineitem
          .filter($"l_shipdate" > ts("1998-03-15"))
          .join(
            t.orders.filter($"o_orderdate" < ts("1998-03-15")),
            $"l_orderkey" === $"o_orderkey"
          )
          .join(broadcastIfSmall(t.customer.filter($"c_mktsegment" === "BUILDING")), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q5_multijoin",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        // 6-table join. region/nation are bounded (plain hint); the
        // supplier-derived side and customer are SF-proportional, so
        // their hints are size-gated — at bench scale both broadcast
        // (the only shuffle join is lineitem⨝orders on orderkey), at
        // 100 TB the gate refuses and AQE shuffles/skew-handles them.
        val dims = broadcastIfSmall(
          t.supplier
            .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
            .join(broadcast(t.region.filter($"r_name" === "ASIA")), $"n_regionkey" === $"r_regionkey")
            .select($"s_suppkey", $"s_nationkey", $"n_name")
        )
        t.lineitem
          .join(t.orders.filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1997-01-01")),
            $"l_orderkey" === $"o_orderkey")
          .join(dims, $"l_suppkey" === $"s_suppkey")
          .join(broadcastIfSmall(t.customer), $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
          .groupBy($"n_name")
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q_semijoin",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        // orders having at least one late-shipped lineitem (Q4 shape):
        // left-semi join — probes each order once, no fan-out
        t.orders
          .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1998-01-01"))
          .join(t.lineitem.filter($"l_shipdate" > ts("1997-06-01")),
            $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_antijoin",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        // customers with no orders in a window: left-anti join
        t.customer
          .join(t.orders.filter($"o_orderdate" >= ts("1999-01-01")),
            $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        ORDER BY c_custkey
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_corr_subquery",
      (spark, dir) => {
        import spark.implicits._
        // small-quantity outliers per part (Q17 shape): the correlated
        // subquery decorrelates into one aggregate + an equi-join on
        // partkey — computed once per part, not once per row
        val li  = Tables(spark, dir).lineitem
        val avg = li.groupBy($"l_partkey".as("p_key"))
          .agg((sum(dec($"l_quantity")).cast("double") / count(lit(1)) * 0.5).as("half_avg_qty"))
        li.join(avg, $"l_partkey" === $"p_key")
          .filter($"l_quantity" < $"half_avg_qty")
          .agg(
            count(lit(1)).as("n_small"),
            sum(dec($"l_extendedprice")).cast("double").as("small_revenue"))
      },
      Some("""
        WITH a AS (
          SELECT l_partkey AS p_key,
                 CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) * 0.5 AS half_avg_qty
          FROM lineitem GROUP BY 1
        )
        SELECT count(*) AS n_small,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_revenue
        FROM lineitem JOIN a ON l_partkey = p_key
        WHERE l_quantity < half_avg_qty
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_pivot",
      (spark, dir) => {
        import spark.implicits._
        // daily counts pivoted by event type; explicit value list keeps
        // the pivot a single pass (no distinct-values pre-query)
        Tables(spark, dir).events
          .groupBy(date_trunc("day", $"ts").as("day"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .count()
          .na.fill(0L)
          .orderBy($"day")
      },
      Some("""
        SELECT date_trunc('day', ts) AS day,
               count(*) FILTER (event_type = 'click') AS click,
               count(*) FILTER (event_type = 'error') AS error,
               count(*) FILTER (event_type = 'purchase') AS purchase,
               count(*) FILTER (event_type = 'signup') AS signup,
               count(*) FILTER (event_type = 'view') AS view
        FROM events GROUP BY 1 ORDER BY day
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_rollup",
      (spark, dir) => {
        import spark.implicits._
        // hierarchical totals (type, day) -> (type) -> grand total
        Tables(spark, dir).events
          .rollup($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
          .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("sum_value"))
          .orderBy($"event_type".asc_nulls_first, $"day".asc_nulls_first)
      },
      Some("""
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY ROLLUP (event_type, day)
        ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_setops",
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val buyers  = t.orders.select($"o_custkey".as("c_custkey"))
        val all     = t.customer.select($"c_custkey")
        val active  = all.intersect(buyers)
        val dormant = all.except(t.orders.filter($"o_orderdate" >= ts("1999-01-01"))
          .select($"o_custkey".as("c_custkey")))
        active.agg(count(lit(1)).as("n")).select(lit("intersect").as("op"), $"n")
          .unionAll(dormant.agg(count(lit(1)).as("n")).select(lit("except").as("op"), $"n"))
          .orderBy($"op")
      },
      Some("""
        SELECT 'intersect' AS op, count(*) AS n FROM (
          SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
        UNION ALL
        SELECT 'except', count(*) FROM (
          SELECT c_custkey FROM customer EXCEPT
          SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        ORDER BY op
      """.trim)
    ),
    QueryDef(
      "q_cube",
      (spark, dir) => {
        import spark.implicits._
        Tables(spark, dir).events
          .cube($"event_type", date_format($"ts", "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"))
          .orderBy($"event_type".asc_nulls_first, $"month".asc_nulls_first)
      },
      Some("""
        SELECT event_type, strftime(ts, '%Y-%m') AS month, count(*) AS n
        FROM events GROUP BY CUBE (event_type, month)
        ORDER BY event_type ASC NULLS FIRST, month ASC NULLS FIRST
      """.trim)
    ),
    QueryDef(
      "q_topk_window",
      (spark, dir) => {
        import spark.implicits._
        // Top-3 orders by price per customer. Window shuffles once on
        // o_custkey; at scale this is the standard top-k-per-group plan
        // (rank + filter pushes the limit into the sort via AQE).
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables(spark, dir).orders
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
          .orderBy($"o_custkey", $"rk")
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        FROM orders
        QUALIFY rk <= 3
        ORDER BY o_custkey, rk
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q_events_window",
      (spark, dir) => {
        import spark.implicits._
        // Tumbling 1-hour event-time window (batch shape of the streaming
        // windowed agg in streaming/StreamPipeline).
        Tables(spark, dir).events
          .groupBy(date_trunc("hour", $"ts").as("bucket"), $"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(dec($"value")).cast("double").as("sum_value")
          )
          .orderBy($"bucket", $"event_type")
      },
      Some("""
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY bucket, event_type
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q_retention",
      (spark, dir) => {
        import spark.implicits._
        // weekly cohort retention in ONE user-keyed shuffle: per-user
        // distinct active weeks via a map-side-combined collect_set
        // (bounded by the calendar, not by event count), cohort = the
        // set's minimum — no self-join of events against a cohort
        // table, no window. The second (tiny) shuffle is the final
        // (cohort, offset) rollup.
        Tables(spark, dir).events
          // DuckDB's date_trunc('week') yields DATE; match the type
          .select($"user_id", date_trunc("week", $"ts").cast("date").as("week"))
          .groupBy($"user_id")
          .agg(sort_array(collect_set($"week")).as("weeks"))
          .select($"user_id", element_at($"weeks", 1).as("cohort_week"),
            explode($"weeks").as("week"))
          .groupBy($"cohort_week",
            (datediff($"week", $"cohort_week") / 7).cast("int").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy($"cohort_week", $"week_offset")
      },
      Some("""
        WITH wk AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        c AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id)
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, wk.week) / 7 AS INT) AS week_offset,
               CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
        FROM wk JOIN c ON wk.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_funnel",
      (spark, dir) =>
        // ordered signup→view→click→purchase funnel in ONE user-keyed
        // shuffle (greedy fold ≡ the oracle's min-after-previous chain,
        // which re-joins the stream once per step); see operators.Funnel
        operators.Funnel.stepCounts(Tables(spark, dir).events,
          "user_id", "event_type", "ts",
          Seq("signup", "view", "click", "purchase")).orderBy("step"),
      Some("""
        WITH f AS (SELECT user_id, ts, event_type FROM events
                   WHERE event_type IN ('signup','view','click','purchase')),
        s1 AS (SELECT user_id, min(ts) AS t FROM f WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s1 ON f.user_id = s1.user_id
               WHERE f.event_type = 'view' AND f.ts > s1.t GROUP BY 1),
        s3 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s2 ON f.user_id = s2.user_id
               WHERE f.event_type = 'click' AND f.ts > s2.t GROUP BY 1),
        s4 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s3 ON f.user_id = s3.user_id
               WHERE f.event_type = 'purchase' AND f.ts > s3.t GROUP BY 1)
        SELECT * FROM (
          SELECT 1 AS step, 'signup' AS step_name, CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
          UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
          UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
          UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4)
        ) ORDER BY step
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_funnel_timing",
      (spark, dir) => {
        import spark.implicits._
        // conversion latency per funnel transition: the stepTimes fold
        // already carries each user's matched timestamps, so the stats
        // need no re-join of the stream; sums of µs are exact longs,
        // avg is the single division
        val steps   = Seq("signup", "view", "click", "purchase")
        val stepArr = array(steps.map(lit): _*)
        operators.Funnel.stepTimes(Tables(spark, dir).events,
            "user_id", "event_type", "ts", steps)
          .filter(size($"step_ts") >= 2)
          .select(explode(transform(sequence(lit(2), size($"step_ts")), s => struct(
            s.as("step"),
            (unix_micros(element_at($"step_ts", s)) -
              unix_micros(element_at($"step_ts", s - 1))).as("d")))).as("x"))
          .select($"x.step".as("step"), $"x.d".as("d"))
          .groupBy($"step")
          .agg(count(lit(1)).as("n_users"), min($"d").as("min_us"), max($"d").as("max_us"),
            (sum($"d").cast("double") / count(lit(1))).as("avg_us"))
          .select($"step".cast("int").as("step"), element_at(stepArr, $"step").as("step_name"),
            $"n_users", $"min_us", $"max_us", $"avg_us")
          .orderBy("step")
      },
      Some("""
        WITH f AS (SELECT user_id, ts, event_type FROM events
                   WHERE event_type IN ('signup','view','click','purchase')),
        s1 AS (SELECT user_id, min(ts) AS t FROM f WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s1 ON f.user_id = s1.user_id
               WHERE f.event_type = 'view' AND f.ts > s1.t GROUP BY 1),
        s3 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s2 ON f.user_id = s2.user_id
               WHERE f.event_type = 'click' AND f.ts > s2.t GROUP BY 1),
        s4 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s3 ON f.user_id = s3.user_id
               WHERE f.event_type = 'purchase' AND f.ts > s3.t GROUP BY 1),
        d AS (
          SELECT 2 AS step, 'view' AS step_name, date_diff('microsecond', s1.t, s2.t) AS d
          FROM s2 JOIN s1 ON s2.user_id = s1.user_id
          UNION ALL
          SELECT 3, 'click', date_diff('microsecond', s2.t, s3.t)
          FROM s3 JOIN s2 ON s3.user_id = s2.user_id
          UNION ALL
          SELECT 4, 'purchase', date_diff('microsecond', s3.t, s4.t)
          FROM s4 JOIN s3 ON s4.user_id = s3.user_id
        )
        SELECT step, step_name, CAST(count(*) AS BIGINT) AS n_users,
               CAST(min(d) AS BIGINT) AS min_us, CAST(max(d) AS BIGINT) AS max_us,
               CAST(sum(d) AS DOUBLE) / count(*) AS avg_us
        FROM d GROUP BY 1, 2 ORDER BY step
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_anomaly",
      (spark, dir) =>
        // integer-exact z-score outliers (k = 9/5) over the gap-filled
        // weekly series: kDen²·(n·x−s)² > kNum²·(n·q−s²) keeps every
        // term a long — the flagged SET cannot drift in the last ulp
        operators.TimeSeries.anomalies(Tables(spark, dir).events,
            "user_id", "ts", kNum = 9L, kDen = 5L, stepDays = 7)
          .orderBy("user_id", "bucket"),
      Some("""
        WITH wk AS (
          SELECT user_id, date_trunc('week', ts) AS bucket, CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM wk GROUP BY 1
        ), cal AS (
          SELECT s.user_id, CAST(unnest(generate_series(s.b0, s.b1, INTERVAL 7 DAY)) AS DATE) AS bucket
          FROM spans s
        ), filled AS (
          SELECT cal.user_id, cal.bucket, COALESCE(wk.n_events, 0) AS n_events
          FROM cal LEFT JOIN wk ON cal.user_id = wk.user_id AND cal.bucket = wk.bucket
        ), stats AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(n_events) AS BIGINT) AS s,
                 CAST(sum(n_events*n_events) AS BIGINT) AS q
          FROM filled GROUP BY 1
        )
        SELECT f.user_id, f.bucket, f.n_events,
               CAST(n*f.n_events - s AS BIGINT) AS dev_num,
               CAST(n*q - s*s AS BIGINT) AS var_num,
               n AS n_buckets
        FROM filled f JOIN stats st ON f.user_id = st.user_id
        WHERE n >= 4 AND 25*(n*f.n_events - s)*(n*f.n_events - s) > 81*(n*q - s*s)
        ORDER BY f.user_id, f.bucket
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_funnel_cohort",
      (spark, dir) => {
        import spark.implicits._
        // funnel broken down by signup cohort: the cohort key is
        // element 1 of the SAME stepTimes fold — no extra pass over the
        // stream, the breakdown is a relabeling of the fold's output
        val steps   = Seq("signup", "view", "click", "purchase")
        val stepArr = array(steps.map(lit): _*)
        operators.Funnel.stepTimes(Tables(spark, dir).events,
            "user_id", "event_type", "ts", steps)
          .filter(size($"step_ts") >= 1)
          .select(date_trunc("week", element_at($"step_ts", 1)).cast("date").as("cohort_week"),
            explode(sequence(lit(1), size($"step_ts"))).as("step"))
          .groupBy($"cohort_week", $"step")
          .agg(count(lit(1)).as("n_users"))
          .select($"cohort_week", $"step".cast("int").as("step"),
            element_at(stepArr, $"step").as("step_name"), $"n_users")
          .orderBy("cohort_week", "step")
      },
      Some("""
        WITH f AS (SELECT user_id, ts, event_type FROM events
                   WHERE event_type IN ('signup','view','click','purchase')),
        s1 AS (SELECT user_id, min(ts) AS t FROM f WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s1 ON f.user_id = s1.user_id
               WHERE f.event_type = 'view' AND f.ts > s1.t GROUP BY 1),
        s3 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s2 ON f.user_id = s2.user_id
               WHERE f.event_type = 'click' AND f.ts > s2.t GROUP BY 1),
        s4 AS (SELECT f.user_id, min(f.ts) AS t FROM f JOIN s3 ON f.user_id = s3.user_id
               WHERE f.event_type = 'purchase' AND f.ts > s3.t GROUP BY 1),
        u AS (
          SELECT user_id, 1 AS step, 'signup' AS step_name FROM s1
          UNION ALL SELECT user_id, 2, 'view' FROM s2
          UNION ALL SELECT user_id, 3, 'click' FROM s3
          UNION ALL SELECT user_id, 4, 'purchase' FROM s4
        )
        SELECT CAST(date_trunc('week', s1.t) AS DATE) AS cohort_week, u.step, u.step_name,
               CAST(count(*) AS BIGINT) AS n_users
        FROM u JOIN s1 ON u.user_id = s1.user_id
        GROUP BY 1, 2, 3 ORDER BY cohort_week, step
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_rolling_active",
      (spark, dir) => {
        import spark.implicits._
        // WAU + 4-week rolling distinct actives: sliding DISTINCT
        // counts cannot be windowed, and the naive form is a range
        // self-join of the activity table; the scalable form explodes
        // each (user, week) into the ≤4 window-ends it covers — fanout
        // bounded by the window, applied AFTER the distinct, never to
        // raw events
        val wk = Tables(spark, dir).events
          .select($"user_id", date_trunc("week", $"ts").cast("date").as("week"))
          .distinct()
        val wau = wk.groupBy($"week").agg(count(lit(1)).as("wau"))
        val mau = wk
          .select($"user_id", explode(expr(
            "sequence(week, week + interval '21' day, interval '7' day)")).as("week"))
          .groupBy($"week").agg(count_distinct($"user_id").as("active_4wk"))
        wau.join(mau, Seq("week")).orderBy("week")
      },
      Some("""
        WITH wk AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        cal AS (SELECT DISTINCT week FROM wk)
        SELECT c.week,
               (SELECT CAST(count(DISTINCT w.user_id) AS BIGINT) FROM wk w WHERE w.week = c.week) AS wau,
               (SELECT CAST(count(DISTINCT w.user_id) AS BIGINT) FROM wk w
                WHERE w.week BETWEEN c.week - INTERVAL 21 DAY AND c.week) AS active_4wk
        FROM cal c ORDER BY c.week
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_rolling",
      (spark, dir) =>
        // 4-week trailing trend + week-over-week delta per user over the
        // gap-filled series — the zeros are load-bearing (a ROWS frame
        // over sparse weeks would span gaps and inflate the trend);
        // exact long sums, the mean is the one division
        operators.TimeSeries.rollingStats(
            Tables(spark, dir).events.filter(col("event_type") === "error"),
            "user_id", "ts", k = 4, stepDays = 7)
          .orderBy("user_id", "bucket"),
      Some("""
        WITH wk AS (
          SELECT user_id, date_trunc('week', ts) AS bucket, CAST(count(*) AS BIGINT) AS n_events
          FROM events WHERE event_type = 'error' GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM wk GROUP BY 1
        ), cal AS (
          SELECT s.user_id, CAST(unnest(generate_series(s.b0, s.b1, INTERVAL 7 DAY)) AS DATE) AS bucket
          FROM spans s
        ), filled AS (
          SELECT cal.user_id, cal.bucket, COALESCE(wk.n_events, 0) AS n_events
          FROM cal LEFT JOIN wk ON cal.user_id = wk.user_id AND cal.bucket = wk.bucket
        )
        SELECT user_id, bucket, n_events,
               n_events - lag(n_events) OVER w AS delta,
               CAST(sum(n_events) OVER f AS BIGINT) AS roll_sum,
               CAST(count(*) OVER f AS BIGINT) AS roll_buckets,
               CAST(sum(n_events) OVER f AS DOUBLE) / count(*) OVER f AS roll_mean
        FROM filled
        WINDOW w AS (PARTITION BY user_id ORDER BY bucket),
               f AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, bucket
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_gapfill",
      (spark, dir) =>
        // calendar resampling: weekly per-user error counts with the
        // silent weeks materialized as zeros (absence-of-row ≠ zero for
        // any trend model); event volume is scanned once — the fill
        // works on calendar-sized frames (operators.TimeSeries.gapFill)
        operators.TimeSeries.gapFill(
            Tables(spark, dir).events.filter(col("event_type") === "error"),
            "user_id", "ts", stepDays = 7)
          .orderBy("user_id", "bucket"),
      Some("""
        WITH wk AS (
          SELECT user_id, date_trunc('week', ts) AS bucket, CAST(count(*) AS BIGINT) AS n_events
          FROM events WHERE event_type = 'error' GROUP BY 1, 2
        ), spans AS (
          SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM wk GROUP BY 1
        ), cal AS (
          SELECT s.user_id, CAST(unnest(generate_series(s.b0, s.b1, INTERVAL 7 DAY)) AS DATE) AS bucket
          FROM spans s
        )
        SELECT cal.user_id, cal.bucket, COALESCE(wk.n_events, 0) AS n_events
        FROM cal LEFT JOIN wk ON cal.user_id = wk.user_id AND cal.bucket = wk.bucket
        ORDER BY cal.user_id, cal.bucket
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_sessionize",
      (spark, dir) => {
        import spark.implicits._
        // gap-based sessionization (30-min inactivity): two windows over
        // the same (user_id, ts) partitioning — one shuffle total.
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(spark, dir).events
          .withColumn("__prev_us", lag(unix_micros($"ts"), 1).over(w))
          .withColumn("__is_new",
            when($"__prev_us".isNull || unix_micros($"ts") - $"__prev_us" > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_seq", sum($"__is_new").over(run))
          .groupBy($"user_id", $"session_seq")
          .agg(min($"ts").as("session_start"), max($"ts").as("session_end"), count(lit(1)).as("n_events"))
          .orderBy($"user_id", $"session_seq")
      },
      Some("""
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM x
        )
        SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
        FROM s GROUP BY 1, 2 ORDER BY user_id, session_seq
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_dow_seasonality",
      (spark, dir) => {
        import spark.implicits._
        // weekly seasonality profile: events per (day-of-week, hour)
        // cell with value stats — one hash aggregation over derived
        // calendar keys (the partition-pruning dimensions a 100 TB
        // event store would bucket by). Spark dayofweek is 1=Sunday;
        // normalized to 0=Sunday to match DuckDB's dow extract
        Tables(spark, dir).events
          .groupBy((dayofweek($"ts") - lit(1)).as("dow"), hour($"ts").as("hh"))
          .agg(count(lit(1)).as("n"),
            sum($"value".cast("decimal(12,2)")).cast("double").as("sum_value"))
          .orderBy("dow", "hh")
      },
      Some("""
        SELECT CAST(extract(dow FROM ts) AS INT) AS dow,
               CAST(extract(hour FROM ts) AS INT) AS hh,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY dow, hh
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_session_window",
      (spark, dir) => {
        import spark.implicits._
        // the NATIVE session-window operator (vs q_sessionize's manual
        // lag/cumsum): one aggregation, merge handled by the engine.
        // Boundary semantics differ from the manual form: a gap of
        // EXACTLY 30 min starts a new session here (window end is
        // exclusive), and session_end = last event + gap by definition
        Tables(spark, dir).events
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select($"user_id", $"w.start".as("session_start"), $"w.end".as("session_end"), $"n_events")
          .orderBy($"user_id", $"session_start")
      },
      Some("""
        WITH x AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS seq
          FROM x
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM s GROUP BY user_id, seq ORDER BY user_id, session_start
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_concurrency",
      (spark, dir) => {
        import spark.implicits._
        // peak simultaneously-active sessions per day: the sessionize
        // plan feeds the distributed sweep-line (±1 boundary points,
        // two-phase global running sum — see TimeSeries.peakConcurrency)
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sessions = Tables(spark, dir).events
          .withColumn("__prev_us", lag(unix_micros($"ts"), 1).over(w))
          .withColumn("__is_new",
            when($"__prev_us".isNull || unix_micros($"ts") - $"__prev_us" > 1800000000L, 1L).otherwise(0L))
          .withColumn("session_seq", sum($"__is_new").over(run))
          .groupBy($"user_id", $"session_seq")
          .agg(min($"ts").as("session_start"), max($"ts").as("session_end"))
        graft.operators.TimeSeries.peakConcurrency(sessions, "session_start", "session_end")
          .orderBy("day")
      },
      Some("""
        WITH x AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
          FROM x
        ), sess AS (
          SELECT user_id, session_seq, min(ts) AS st, max(ts) AS en FROM s GROUP BY 1, 2
        ), pts AS (
          SELECT st AS ts, 1 AS d FROM sess UNION ALL SELECT en AS ts, -1 AS d FROM sess
        ), run AS (
          SELECT ts, d, sum(d) OVER (ORDER BY ts, d DESC) AS live FROM pts
        )
        SELECT date_trunc('day', ts) AS day, CAST(max(live) AS BIGINT) AS peak_concurrency
        FROM run GROUP BY 1 ORDER BY day
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_time_weighted",
      (spark, dir) => {
        import spark.implicits._
        // time-weighted average (TWAP shape): each event's value holds
        // until the user's next event, so the mean weights by exact
        // microsecond durations, not by event count — burst-heavy users
        // stop dominating their own averages. One (user) shuffle: the
        // lead() window and the aggregation share the partitioning.
        // All-integer cents × micros keeps the weighted sum exact, and
        // the final int64→double conversions + one IEEE division are
        // bit-deterministic across engines (decimal→double is NOT: the
        // engines' conversions round differently past 2^53). Bound:
        // cents×µs sums overflow int64 around 1e5 busy-user segments —
        // widen to decimal(38,0) sums (still exact) past that corpus.
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables(spark, dir).events
          .withColumn("__v_cents", round($"value" * 100).cast("long"))
          .withColumn("__dur_us", lead(unix_micros($"ts"), 1).over(w) - unix_micros($"ts"))
          .filter($"__dur_us".isNotNull)
          .groupBy($"user_id")
          .agg(
            sum($"__dur_us").as("active_us"),
            (sum($"__v_cents" * $"__dur_us").cast("double") /
              sum($"__dur_us").cast("double") / 100.0).as("twa_value"),
            count(lit(1)).as("n_segments"))
          .orderBy("user_id")
      },
      Some("""
        WITH seg AS (
          SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v_cents,
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
          FROM events
        )
        SELECT user_id,
               CAST(sum(dur_us) AS BIGINT) AS active_us,
               CAST(CAST(sum(v_cents * dur_us) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(sum(dur_us) AS BIGINT) AS DOUBLE) / 100 AS twa_value,
               count(*) AS n_segments
        FROM seg WHERE dur_us IS NOT NULL
        GROUP BY user_id ORDER BY user_id
      """.trim),
      bench = true
    ),
    QueryDef(
      "q13_custdist",
      // TPC-H Q13 shape: order-count distribution over customers — the
      // LEFT OUTER join + double aggregation pattern (customers with no
      // orders land in the c_count=0 bucket, not dropped)
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        t.customer.join(t.orders, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey").agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count").agg(count(lit(1)).as("custdist"))
          .orderBy($"custdist".desc, $"c_count".desc)
      },
      Some("""
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey) c
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
      """.trim),
      bench = true
    ),
    QueryDef(
      "q18_large_orders",
      // TPC-H Q18 shape: large-volume orders — HAVING on a fact
      // aggregation, then enrichment joins; the having-filter runs
      // BEFORE the joins so only qualifying orders join
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val big = t.lineitem.groupBy($"l_orderkey")
          .agg(sum(dec($"l_quantity")).as("total_qty"))
          .filter($"total_qty" > 300)
        big.join(t.orders, $"l_orderkey" === $"o_orderkey")
          .join(t.customer, $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
            $"o_totalprice", $"total_qty".cast("double").as("total_qty"))
          .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      },
      Some("""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               o_totalprice,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM (SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
              FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300) b
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      """.trim),
      bench = true
    ),
    QueryDef(
      "q16_supplier_variety",
      // TPC-H Q16 shape (partsupp via lineitem): distinct suppliers per
      // part type/brand — countDistinct after a fact-dim join, with the
      // dim broadcast
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        t.lineitem.select($"l_partkey", $"l_suppkey").distinct()
          .join(broadcastIfSmall(t.part), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand", $"p_type")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type")
      },
      Some("""
        SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_type
        ORDER BY supplier_cnt DESC, p_brand, p_type
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_asof_join",
      (spark, dir) => {
        import spark.implicits._
        // latest event state per user as of two probe instants; events
        // pre-deduped per (user, ts) so tie behavior is engine-agnostic
        val ev = graft.operators.Upsert.latestByKey(
          Tables(spark, dir).events, Seq("user_id", "ts"), Seq("event_id"))
        val probes = ev.select($"user_id").distinct()
          .withColumn("pts", explode(array(ts("2024-01-10"), ts("2024-01-20"))))
        graft.operators.AsOfJoin.backward(
            probes, ev, partitionCols = Seq("user_id"),
            leftTimeCol = "pts", rightTimeCol = "ts",
            payloadCols = Seq("event_id", "ts"))
          .withColumnRenamed("last_event_id", "last_event_id")
          .orderBy("user_id", "pts")
      },
      Some("""
        WITH ev AS (SELECT * FROM events QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
             users AS (SELECT DISTINCT user_id FROM events),
             probes AS (SELECT user_id, unnest([TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-20']) AS pts FROM users)
        SELECT p.user_id, p.pts, e.event_id AS last_event_id, e.ts AS last_ts
        FROM probes p ASOF LEFT JOIN ev e ON p.user_id = e.user_id AND e.ts <= p.pts
        ORDER BY p.user_id, p.pts
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_asof_forward",
      (spark, dir) => {
        import spark.implicits._
        // earliest event state per user AT OR AFTER two probe instants —
        // the forward direction of q_asof_join (same dedup, same probes)
        val ev = graft.operators.Upsert.latestByKey(
          Tables(spark, dir).events, Seq("user_id", "ts"), Seq("event_id"))
        val probes = ev.select($"user_id").distinct()
          .withColumn("pts", explode(array(ts("2024-01-10"), ts("2024-01-20"))))
        graft.operators.AsOfJoin.forward(
            probes, ev, partitionCols = Seq("user_id"),
            leftTimeCol = "pts", rightTimeCol = "ts",
            payloadCols = Seq("event_id", "ts"))
          .orderBy("user_id", "pts")
      },
      Some("""
        WITH ev AS (SELECT * FROM events QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
             users AS (SELECT DISTINCT user_id FROM events),
             probes AS (SELECT user_id, unnest([TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-20']) AS pts FROM users)
        SELECT p.user_id, p.pts, e.event_id AS next_event_id, e.ts AS next_ts
        FROM probes p LEFT JOIN ev e ON p.user_id = e.user_id AND e.ts >= p.pts
        QUALIFY row_number() OVER (PARTITION BY p.user_id, p.pts ORDER BY e.ts ASC) = 1
        ORDER BY p.user_id, p.pts
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_asof_nearest",
      (spark, dir) => {
        import spark.implicits._
        // closest event in EITHER direction per probe (pandas
        // direction="nearest"); equidistant ties resolve backward.
        // ONE shuffle: both direction carries are sorted window passes
        // over the same exchange, not a self-join of two as-of results
        val ev = graft.operators.Upsert.latestByKey(
          Tables(spark, dir).events, Seq("user_id", "ts"), Seq("event_id"))
        val probes = ev.select($"user_id").distinct()
          .withColumn("pts", explode(array(ts("2024-01-10"), ts("2024-01-20"))))
        graft.operators.AsOfJoin.nearest(
            probes, ev, partitionCols = Seq("user_id"),
            leftTimeCol = "pts", rightTimeCol = "ts",
            payloadCols = Seq("event_id", "ts"))
          .orderBy("user_id", "pts")
      },
      Some("""
        WITH ev AS (SELECT * FROM events QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
             users AS (SELECT DISTINCT user_id FROM events),
             probes AS (SELECT user_id, unnest([TIMESTAMP '2024-01-10', TIMESTAMP '2024-01-20']) AS pts FROM users),
             back AS (
               SELECT p.user_id, p.pts, e.event_id AS b_id, e.ts AS b_ts
               FROM probes p ASOF LEFT JOIN ev e ON p.user_id = e.user_id AND e.ts <= p.pts
             ),
             fwd AS (
               SELECT p.user_id, p.pts, e.event_id AS f_id, e.ts AS f_ts
               FROM probes p LEFT JOIN ev e ON p.user_id = e.user_id AND e.ts >= p.pts
               QUALIFY row_number() OVER (PARTITION BY p.user_id, p.pts ORDER BY e.ts ASC) = 1
             )
        SELECT b.user_id, b.pts,
               CASE WHEN b_ts IS NULL THEN f_id WHEN f_ts IS NULL THEN b_id
                    WHEN (b.pts - b_ts) <= (f_ts - b.pts) THEN b_id ELSE f_id END AS near_event_id,
               CASE WHEN b_ts IS NULL THEN f_ts WHEN f_ts IS NULL THEN b_ts
                    WHEN (b.pts - b_ts) <= (f_ts - b.pts) THEN b_ts ELSE f_ts END AS near_ts
        FROM back b JOIN fwd f ON b.user_id = f.user_id AND b.pts = f.pts
        ORDER BY b.user_id, b.pts
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_salted_agg",
      (spark, dir) => {
        import spark.implicits._
        // skewed-key aggregation via two-phase salting; decimal sums make
        // the result identical to the plain groupBy the oracle runs
        graft.operators.Skew.saltedSumCount(
            Tables(spark, dir).events, "event_type", dec($"value"), saltBuckets = 32)
          .select($"event_type", $"total".cast("double").as("total"), $"n")
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total, count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_salted_auto",
      (spark, dir) => {
        import spark.implicits._
        // the salt DECISION automated by a frequent-items sketch
        // pre-pass (fixed O(maxTracked) state, no per-key exchange):
        // only sketch-flagged hot keys fan out over salt buckets, cold
        // keys keep one partial group. Exact either way — the sketch
        // moves work, never the answer, so the plain-GROUP BY oracle
        // holds bit-for-bit
        graft.operators.Skew.autoSaltedSumCount(
            Tables(spark, dir).events, "event_type", dec($"value"),
            threshold = 0.05, saltBuckets = 32)
          .select($"event_type", $"total".cast("double").as("total"), $"n")
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total, count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
      """.trim),
      bench = true
    ),
    QueryDef(
      "bloom_join_prune",
      // pre-shuffle join pruning: a bloom over the selective dimension
      // slice filters the fact side BEFORE its exchange (scan-local
      // codegen'd predicate); false positives die in the join, so the
      // result is exactly the plain inner join the oracle runs
      (spark, dir) => {
        import spark.implicits._
        val dim = Tables(spark, dir).customer
          .filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey", $"c_mktsegment")
        graft.operators.JoinPrune.bloomPrunedJoin(
            Tables(spark, dir).orders, dim, "o_custkey", "c_custkey",
            expectedKeys = 100000L, fpp = 0.01)
          .select($"o_orderkey", $"o_custkey", $"c_mktsegment", dec($"o_totalprice").cast("double").as("o_totalprice"))
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_custkey, c_mktsegment,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        ORDER BY o_orderkey
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_quantiles",
      (spark, dir) => {
        import spark.implicits._
        // exact percentiles for the oracle gate; at 100 TB the same query
        // ships as approx_percentile (t-digest) — one pass, mergeable
        Tables(spark, dir).events
          .groupBy($"event_type")
          .agg(
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.9)").as("p90"),
            expr("percentile(value, 0.99)").as("p99"))
          .orderBy($"event_type")
      },
      Some("""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type ORDER BY event_type
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_events_running",
      (spark, dir) => {
        import spark.implicits._
        // Running per-user cumulative sum in event-time order. Decimal keeps
        // the prefix sums exact so engines agree bit-for-bit.
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(spark, dir).events
          .withColumn("running_value", sum(dec($"value")).over(w).cast("double"))
          .select($"user_id", $"event_id", $"ts", $"running_value")
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, ts,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        FROM events
        ORDER BY user_id, ts, event_id
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q7_volume",
      (spark, dir) => {
        import spark.implicits._
        // nation-pair trade volume (Q7 shape): the fact table joins TWO
        // different dimension roles (customer's nation via orders,
        // supplier's nation directly). The derived sides are
        // customer/supplier-proportional, so their hints are size-gated:
        // at bench scale everything broadcasts and the only shuffle is
        // the aggregation's; at 100 TB AQE shuffles the customer side.
        val t = Tables(spark, dir)
        val custNation = t.customer
          .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"n_name".as("cust_nation"))
        val suppNation = t.supplier
          .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("supp_nation"))
        t.lineitem
          .join(t.orders, $"l_orderkey" === $"o_orderkey")
          .join(broadcastIfSmall(custNation), $"o_custkey" === $"c_custkey")
          .join(broadcastIfSmall(suppNation), $"l_suppkey" === $"s_suppkey")
          .filter($"supp_nation" =!= $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").as("l_year"))
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("volume"))
          .orderBy($"supp_nation", $"cust_nation", $"l_year")
      },
      Some("""
        SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n2.n_name <> n1.n_name
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q8_market_share",
      (spark, dir) => {
        import spark.implicits._
        // market share (Q8 shape): one supplier nation's revenue share of
        // a region's PROMO-part orders per year — conditional aggregation
        // over a 7-table join; SF-proportional sides size-gated
        val t = Tables(spark, dir)
        val amerCust = t.customer
          .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(t.region.filter($"r_name" === "AMERICA")), $"n_regionkey" === $"r_regionkey")
          .select($"c_custkey")
        val suppNation = t.supplier
          .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("supp_nation"))
        val promoParts = t.part.filter($"p_type" === "PROMO").select($"p_partkey")
        t.lineitem
          .join(t.orders, $"l_orderkey" === $"o_orderkey")
          .join(broadcastIfSmall(amerCust), $"o_custkey" === $"c_custkey", "left_semi")
          .join(broadcastIfSmall(promoParts), $"l_partkey" === $"p_partkey", "left_semi")
          .join(broadcastIfSmall(suppNation), $"l_suppkey" === $"s_suppkey")
          .withColumn("volume", dec($"l_extendedprice") * (one - dec($"l_discount")))
          .groupBy(year($"o_orderdate").as("o_year"))
          .agg((sum(when($"supp_nation" === "NATION_0", $"volume").otherwise(lit(0).cast("decimal(12,2)"))).cast("double")
            / sum($"volume").cast("double")).as("mkt_share"))
          .orderBy($"o_year")
      },
      Some("""
        WITH base AS (
          SELECT year(o_orderdate) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            WHERE r_name = 'AMERICA')
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        )
        SELECT CAST(o_year AS INT) AS o_year,
               CAST(sum(CASE WHEN supp_nation = 'NATION_0' THEN volume ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                    / CAST(sum(volume) AS DOUBLE) AS mkt_share
        FROM base GROUP BY 1 ORDER BY o_year
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q_grouping_sets",
      (spark, dir) => {
        import spark.implicits._
        // arbitrary grouping-set combinations in ONE pass (the Expand
        // operator emits one copy per set — no per-set re-scan), distinct
        // from the hierarchical rollup/cube entries
        Tables(spark, dir).orders
          .groupingSets(
            Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
            $"o_orderstatus", $"o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec($"o_totalprice")).cast("double").as("total_price")
          )
          .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
      },
      Some("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q_lead_lag",
      (spark, dir) => {
        import spark.implicits._
        // Neighbor-row analytics (lag/lead + delta) per user in event-time
        // order: one window sort per partition key, no self-join.
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        Tables(spark, dir).events
          .select(
            $"user_id", $"ts", $"event_id", $"value",
            lag($"value", 1).over(w).as("prev_value"),
            lead($"value", 1).over(w).as("next_value"))
          .withColumn("delta", $"value" - $"prev_value")
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        SELECT user_id, ts, event_id, value,
               lag(value) OVER w AS prev_value,
               lead(value) OVER w AS next_value,
               value - lag(value) OVER w AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, ts, event_id
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q4_order_priority",
      // TPC-H Q4 shape: correlated EXISTS — orders in a quarter that had
      // at least one line shipped after the order date (the reduced
      // schema has no commit/receipt dates, so "late line" stands in for
      // "commit < receipt"). The EXISTS compiles to a left-semi join with
      // a non-equi residual; only the join key + both dates are scanned.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        t.orders
          .filter($"o_orderdate" >= ts("1996-07-01") && $"o_orderdate" < ts("1996-10-01"))
          .join(t.lineitem, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy($"o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q9_nation_revenue",
      // TPC-H Q9 shape (no partsupp/supplycost in the reduced schema, so
      // profit reduces to discounted revenue): per supplier-nation,
      // per-year revenue on parts matching a name token. part and the
      // supplier→nation dim broadcast; the fact scan prunes on the
      // semi-joined partkeys.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val greenParts = t.part.filter($"p_name".contains("red")).select($"p_partkey")
        val suppNation = t.supplier
          .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"n_name".as("nation"))
        t.lineitem
          .join(broadcastIfSmall(greenParts), $"l_partkey" === $"p_partkey", "left_semi")
          .join(t.orders, $"l_orderkey" === $"o_orderkey")
          .join(broadcastIfSmall(suppNation), $"l_suppkey" === $"s_suppkey")
          .groupBy($"nation", year($"o_orderdate").as("o_year"))
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("sum_profit"))
          .orderBy($"nation", $"o_year".desc)
      },
      Some("""
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q10_returns",
      // TPC-H Q10 shape: returned-item reporting — top 20 customers by
      // lost revenue in a quarter. orders⨝lineitem shuffles on orderkey;
      // customer enrichment joins AFTER the aggregation (1 row/customer),
      // nation broadcast.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val lost = t.lineitem.filter($"l_returnflag" === "R")
          .join(
            t.orders.filter($"o_orderdate" >= ts("1996-10-01") && $"o_orderdate" < ts("1997-01-01")),
            $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_custkey")
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("revenue"))
        lost.join(t.customer, $"o_custkey" === $"c_custkey")
          .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
          .select($"c_custkey", $"c_name", $"revenue", $"c_acctbal", $"n_name")
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
               c_acctbal, n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q12_priority_class",
      // TPC-H Q12 shape (no shipmode column — l_linestatus stands in as
      // the grouping): high- vs low-priority order counts per line
      // status for a ship-year. Conditional aggregation: one fact⨝orders
      // shuffle join, the CASE runs map-side.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val high = $"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH"
        t.lineitem
          .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
          .join(t.orders, $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_linestatus")
          .agg(
            sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
          .orderBy($"l_linestatus")
      },
      Some("""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q14_promo_share",
      // TPC-H Q14 shape: promo revenue share for one ship-month —
      // conditional aggregation over a fact⨝dim join with the dim
      // broadcast. Division happens once, after exact decimal sums.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        t.lineitem
          .filter($"l_shipdate" >= ts("1997-03-01") && $"l_shipdate" < ts("1997-04-01"))
          .join(broadcastIfSmall(t.part), $"l_partkey" === $"p_partkey")
          .withColumn("amount", dec($"l_extendedprice") * (one - dec($"l_discount")))
          .agg(
            (lit(100.0) * sum(when($"p_type" === "PROMO", $"amount").otherwise(lit(0).cast("decimal(12,2)"))).cast("double")
              / sum($"amount").cast("double")).as("promo_revenue"))
      },
      Some("""
        SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q15_top_supplier",
      // TPC-H Q15 shape: the revenue "view" is a per-supplier aggregate;
      // the max-revenue scalar comes from a broadcast cross join against
      // the 1-row aggregate of that same small table (no collect, no
      // global window sort). rev is persisted because it is referenced
      // twice — without the cache the lineitem scan+agg would run twice;
      // the cached relation is one row per suppkey. Equality compares
      // EXACT decimal sums — a double total could disagree between
      // engines in the last ulp.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val rev = t.lineitem
          .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1996-04-01"))
          .groupBy($"l_suppkey")
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).as("total_revenue"))
          .persist()
        rev.crossJoin(broadcast(rev.agg(max($"total_revenue").as("max_revenue"))))
          .filter($"total_revenue" === $"max_revenue")
          .join(t.supplier, $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", $"total_revenue".cast("double").as("total_revenue"))
          .orderBy($"s_suppkey")
      },
      Some("""
        WITH revenue AS (
          SELECT l_suppkey,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q17_small_qty",
      // TPC-H Q17 shape: small-quantity-order revenue — the correlated
      // "0.2 * avg(l_quantity) per part" subquery becomes a per-part
      // aggregate joined back to the fact. The comparison is kept in
      // integers (5 * qty * n < sum_qty ⇔ qty < 0.2 * avg) so no engine
      // disagrees on boundary rows. Brand filter semi-joins the fact
      // before any aggregation.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val brandParts = t.part.filter($"p_brand" === "Brand#3").select($"p_partkey")
        val branded = t.lineitem
          .join(broadcastIfSmall(brandParts), $"l_partkey" === $"p_partkey", "left_semi")
        val perPart = branded.groupBy($"l_partkey")
          .agg(sum(dec($"l_quantity")).as("sum_qty"), count(lit(1)).as("n_lines"))
        branded
          .join(perPart.withColumnRenamed("l_partkey", "pk"), $"l_partkey" === $"pk")
          .filter(dec($"l_quantity") * 5 * $"n_lines" < $"sum_qty")
          .agg((sum(dec($"l_extendedprice")).cast("double") / 7.0).as("avg_yearly"))
      },
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l
        JOIN (SELECT l_partkey AS pk,
                     sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
                     count(*) AS n_lines
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
              GROUP BY 1) a ON l.l_partkey = a.pk
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
          AND CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * n_lines < sum_qty
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q19_disjunctive",
      // TPC-H Q19 shape: OR-of-ANDs across fact and dim columns (brand ×
      // size × quantity bands; the reduced schema has no container /
      // shipmode legs). The dim broadcasts; the disjunction evaluates
      // inside the join's generated code — no union-of-three-scans.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        t.lineitem
          .join(broadcastIfSmall(t.part), $"l_partkey" === $"p_partkey")
          .filter(
            ($"p_brand" === "Brand#1" && $"p_size".between(1, 5) && $"l_quantity".between(1, 11)) ||
              ($"p_brand" === "Brand#2" && $"p_size".between(1, 10) && $"l_quantity".between(10, 20)) ||
              ($"p_brand" === "Brand#3" && $"p_size".between(1, 15) && $"l_quantity".between(20, 30)))
          .agg(sum(dec($"l_extendedprice") * (one - dec($"l_discount"))).cast("double").as("revenue"))
      },
      Some("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q22_idle_customers",
      // TPC-H Q22 shape: customers with above-average positive balance
      // and no RECENT orders — scalar aggregate broadcast + anti-join
      // against the date-filtered order slice. The above-average test
      // multiplies through by the count (bal * n > total ⇔ bal > avg)
      // so both engines compare exact decimals, not a divided double.
      // (No phone column; the nation key stands in for the country-code
      // grouping. "Idle" is date-bounded — no orders on/after
      // 1998-01-01 — because the generator gives EVERY customer at
      // least one lifetime order, which made the unbounded anti-join
      // structurally empty and its oracle evidence vacuous: 0 == 0 at
      // every SF. The date-bounded form yields rows at sf0.01 and is
      // the shape real Q22 intends — dormant accounts, not never-
      // customers. Idle1998Cutoff is shared with the planted-row spec.)
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val avgPos = t.customer.filter($"c_acctbal" > 0.0)
          .agg(sum(dec($"c_acctbal")).as("total_bal"), count(lit(1)).as("n_pos"))
        t.customer
          .crossJoin(broadcast(avgPos))
          .filter(dec($"c_acctbal") * $"n_pos" > $"total_bal")
          .join(t.orders.filter(to_date($"o_orderdate") >= lit(Idle1998Cutoff)),
            $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("numcust"), sum(dec($"c_acctbal")).cast("double").as("totacctbal"))
          .orderBy($"c_nationkey")
      },
      Some(s"""
        SELECT c_nationkey, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
              > (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND CAST(o_orderdate AS DATE) >= DATE '$Idle1998Cutoff')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q2_min_cost_supplier",
      // TPC-H Q2 shape: minimum-cost supplier per part. The schema has no
      // partsupp, so the part-supplier relation derives from lineitem
      // (like q16) with supply_cost = min line price per (part, supplier).
      // The correlated min subquery is a per-part window min over the
      // ALREADY region-filtered rows — no second scan, no self-join; every
      // dim broadcasts. Cost equality compares exact decimals.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val ps = t.lineitem.groupBy($"l_partkey", $"l_suppkey")
          .agg(min(dec($"l_extendedprice")).as("supply_cost"))
        val qualified = ps
          .join(broadcastIfSmall(t.part.filter($"p_size" <= 15 && $"p_type" === "LARGE")),
            $"l_partkey" === $"p_partkey")
          .join(broadcastIfSmall(t.supplier), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(t.nation), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(t.region.filter($"r_name" === "EUROPE")), $"n_regionkey" === $"r_regionkey")
        qualified
          .withColumn("min_cost", min($"supply_cost").over(Window.partitionBy($"p_partkey")))
          .filter($"supply_cost" === $"min_cost")
          .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand",
            $"supply_cost".cast("double").as("supply_cost"))
          .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey, min(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_cost
          FROM lineitem GROUP BY 1, 2
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
               CAST(supply_cost AS DOUBLE) AS supply_cost
        FROM ps
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size <= 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
        QUALIFY supply_cost = min(supply_cost) OVER (PARTITION BY p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q11_important_parts",
      // TPC-H Q11 shape: parts holding an outsized share of one nation's
      // inventory value — group-HAVING against a scalar subquery of the
      // SAME aggregate. perPart is persisted: it is referenced twice
      // (once directly, once inside the broadcast 1-row re-aggregate),
      // and without the cache the fact semi-join + aggregation — the
      // heaviest scan in the query — would run twice. The cached relation
      // is the small post-agg table (one row per partkey), not the fact.
      // The share test multiplies through (value * 1000 > total ⇔
      // value > 0.001 * total) so both engines compare exact decimals,
      // never a divided double.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val natSupp = t.supplier
          .join(broadcast(t.nation.filter($"n_name" === "NATION_7")), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey")
        val perPart = t.lineitem
          .join(broadcastIfSmall(natSupp), $"l_suppkey" === $"s_suppkey", "left_semi")
          .groupBy($"l_partkey")
          .agg(sum(dec($"l_extendedprice")).as("part_value"))
          .persist()
        perPart
          .crossJoin(broadcast(perPart.agg(sum($"part_value").as("total_value"))))
          .filter($"part_value" * 1000 > $"total_value")
          .select($"l_partkey".as("partkey"), $"part_value".cast("double").as("part_value"))
          .orderBy($"part_value".desc, $"partkey")
      },
      Some("""
        WITH g AS (
          SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS part_value
          FROM lineitem
          WHERE l_suppkey IN (
            SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_7')
          GROUP BY 1
        )
        SELECT l_partkey AS partkey, CAST(part_value AS DOUBLE) AS part_value
        FROM g WHERE part_value * 1000 > (SELECT sum(part_value) FROM g)
        ORDER BY part_value DESC, partkey
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q20_excess_suppliers",
      // TPC-H Q20 shape: suppliers holding excess stock of targeted
      // parts — nested IN subqueries with a correlated aggregate
      // threshold. perYear shuffles on l_partkey; perSupp aggregates on
      // the composite (l_partkey, l_suppkey) key, so the threshold join
      // on l_partkey alone re-exchanges perSupp — cheap, because it
      // moves post-aggregation rows (one per part×supplier), not the
      // fact. The part-name filter semi-joins via broadcast BEFORE
      // either aggregation; the final supplier IN is a semi join. The
      // threshold multiplies through (2 * supp_qty > year_qty ⇔
      // supp_qty > 0.5 * year_qty): exact decimals only.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val targetParts = t.part.filter($"p_name".startsWith("large")).select($"p_partkey")
        val perSupp = t.lineitem
          .join(broadcastIfSmall(targetParts), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(sum(dec($"l_quantity")).as("supp_qty"))
        val perYear = t.lineitem
          .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
          .join(broadcastIfSmall(targetParts), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_partkey")
          .agg(sum(dec($"l_quantity")).as("year_qty"))
        val excess = perSupp.join(perYear, Seq("l_partkey"))
          .filter($"supp_qty" * 2 > $"year_qty")
          .select($"l_suppkey")
        t.supplier
          .join(broadcast(t.nation.filter($"n_name" === "NATION_3")), $"s_nationkey" === $"n_nationkey")
          .join(excess, $"s_suppkey" === $"l_suppkey", "left_semi")
          .select($"s_name", $"s_acctbal")
          .orderBy($"s_name")
      },
      Some("""
        WITH ps AS (
          SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS supp_qty
          FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          GROUP BY 1, 2
        ), yr AS (
          SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS year_qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
          GROUP BY 1
        )
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3' AND s_suppkey IN (
          SELECT l_suppkey FROM ps JOIN yr USING (l_partkey)
          WHERE supp_qty * 2 > year_qty)
        ORDER BY s_name
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q21_waiting_suppliers",
      // TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
      // multi-supplier order — the exists/not-exists pair becomes a
      // left-semi + left-anti self-join on the order key with the
      // supplier inequality (and lateness bound) in the join condition.
      // The schema has no commit/receipt dates, so "late" is shipping
      // more than 90 days after the order date. The nation's suppliers
      // broadcast-join FIRST so the expensive self-joins see only their
      // lines; l2/l3 carry 2-3 columns each.
      (spark, dir) => {
        import spark.implicits._
        val t = Tables(spark, dir)
        val natSupp = t.supplier
          .join(broadcast(t.nation.filter($"n_name" === "NATION_1")), $"s_nationkey" === $"n_nationkey")
          .select($"s_suppkey", $"s_name")
        val late = t.lineitem
          .join(broadcastIfSmall(natSupp), $"l_suppkey" === $"s_suppkey")
          .join(t.orders.filter($"o_orderstatus" === "F"), $"l_orderkey" === $"o_orderkey")
          .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"))
        val l2 = t.lineitem.select($"l_orderkey".as("l2_orderkey"), $"l_suppkey".as("l2_suppkey"))
        val l3 = t.lineitem.select(
          $"l_orderkey".as("l3_orderkey"), $"l_suppkey".as("l3_suppkey"), $"l_shipdate".as("l3_shipdate"))
        late
          .join(l2, $"l_orderkey" === $"l2_orderkey" && $"l_suppkey" =!= $"l2_suppkey", "left_semi")
          .join(l3,
            $"l_orderkey" === $"l3_orderkey" && $"l_suppkey" =!= $"l3_suppkey" &&
              $"l3_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
            "left_anti")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy($"numwait".desc, $"s_name")
      },
      Some("""
        SELECT s_name, count(*) AS numwait
        FROM lineitem l1
        JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
      """.stripMargin.trim),
      bench = true
    ),
    QueryDef(
      "q_range_join",
      // point-in-interval join with NO equi key: shipments falling in each
      // probe order's 7-day window. Bucket quantization turns the
      // nested-loop shape into a hash join (operators.RangeJoin) — the
      // oracle's BETWEEN join is the semantics, not the plan
      (spark, dir) => {
        val t = Tables(spark, dir)
        val ivs = t.orders
          .filter(pmod(col("o_orderkey"), lit(701)) === 0)
          .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
            (col("o_orderdate") + expr("INTERVAL 6 DAYS")).as("w_end"))
        val pts = t.lineitem.select("l_shipdate", "l_quantity")
        operators.RangeJoin
          .pointInIntervalTs(pts, "l_shipdate", ivs, "w_start", "w_end",
            bucketWidthSec = 7L * 24 * 3600)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_pts"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o.o_orderkey, count(*) AS n_pts,
               CAST(sum(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM orders o JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 6 DAY
        WHERE o.o_orderkey % 701 = 0
        GROUP BY o.o_orderkey ORDER BY o.o_orderkey
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_range_frame",
      (spark, dir) => {
        import spark.implicits._
        // event-TIME frame (RANGE, not ROWS): each event aggregates its
        // user's trailing 10 minutes by timestamp, so frame membership is
        // data-dependent and tie rows (equal ts) are peers on both
        // engines. Bounds are exact integer µs; decimal keeps sums exact.
        val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
          .rangeBetween(-600L * 1000000L, 0L)
        Tables(spark, dir).events
          .withColumn("trail_10m", sum(dec($"value")).over(w).cast("double"))
          .select($"user_id", $"event_id", $"ts", $"trail_10m")
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        SELECT user_id, event_id, ts,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 600 SECOND PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail_10m
        FROM events
        ORDER BY user_id, ts, event_id
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_histogram",
      (spark, dir) => {
        import spark.implicits._
        // fixed-width histogram: pure map + one aggregation — bin ids
        // from one IEEE double division are engine-exact, and literal
        // bounds mean no data-dependent scalar join anywhere
        Tables(spark, dir).events
          .groupBy(floor($"value" / 25.0).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("sum_value"))
          .orderBy("bin")
      },
      Some("""
        SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY bin ORDER BY bin
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_ntile",
      (spark, dir) => {
        import spark.implicits._
        // ntile is order-sensitive within ties — the unique o_orderkey
        // tiebreak makes bucket assignment engine-deterministic
        val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
        Tables(spark, dir).orders
          .withColumn("quartile", ntile(4).over(w))
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice", $"quartile")
          .orderBy($"o_orderkey")
      },
      Some("""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
        FROM orders ORDER BY o_orderkey
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_percent_rank",
      (spark, dir) => {
        import spark.implicits._
        // relative-position windows: percent_rank ((rank−1)/(n−1)) and
        // cume_dist (rank_with_ties/n) are small exact rationals — one
        // IEEE division each, identical across engines; first_value pins
        // the frame semantics. Unique (acctbal, custkey) tiebreak makes
        // every value engine-deterministic; key-partitioned, never global
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
        Tables(spark, dir).customer
          .select($"c_custkey", $"c_nationkey", $"c_acctbal",
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            first_value($"c_custkey").over(w).as("poorest"))
          .orderBy($"c_custkey")
      },
      Some("""
        SELECT c_custkey, c_nationkey, c_acctbal,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               first_value(c_custkey) OVER w AS poorest
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        ORDER BY c_custkey
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_ts_similarity",
      // distributed subsequence similarity search (EDBT'19/REPOSE shape):
      // one window pass extracts length-8 subsequences per user, distance
      // to the literal pattern is an integer-cents HOF fold (exact, no
      // accumulation-order drift), top-k is a bounded TakeOrdered
      (spark, dir) =>
        graft.operators.TimeSeries.similarTopK(
          Tables(spark, dir).events,
          seriesCols = Seq("user_id"), orderCols = Seq("ts", "event_id"),
          valueCol = "value",
          pattern = Seq(50.0, 100.0, 150.0, 200.0, 250.0, 300.0, 350.0, 400.0),
          k = 10),
      Some("""
        WITH s AS (
          SELECT user_id, ts, event_id,
                 list(CAST(round(value * 100) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS w
          FROM events
        )
        SELECT user_id, ts, event_id,
               CAST(list_sum(list_transform(range(1, 9),
                 i -> (w[i] - [5000,10000,15000,20000,25000,30000,35000,40000][i])
                    * (w[i] - [5000,10000,15000,20000,25000,30000,35000,40000][i]))) AS BIGINT) AS dist_cents2
        FROM s WHERE len(w) = 8
        ORDER BY dist_cents2, user_id, ts, event_id LIMIT 10
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_events_hopping",
      // hopping (sliding) event-time window: 1h length / 15min slide —
      // every event lands in exactly window/slide = 4 windows. Spark's
      // window() explodes to the 4 assignments before one hash agg; the
      // oracle replicates each event across its 4 slide-aligned starts
      (spark, dir) => {
        import spark.implicits._
        Tables(spark, dir).events
          .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("sum_value"))
          .select($"window.start".as("wstart"), $"event_type", $"n", $"sum_value")
          .orderBy($"wstart", $"event_type")
      },
      Some("""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - (i * INTERVAL '15 minutes') AS wstart,
               event_type, count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        FROM events, unnest(range(0, 4)) AS t(i)
        GROUP BY 1, 2 ORDER BY wstart, event_type
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_sliding_frame",
      // rows-frame moving aggregate: 4-event moving average per user in
      // event-time order (decimal sum / count so the value is exact
      // under any frame evaluation strategy)
      (spark, dir) => {
        import spark.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id").rowsBetween(-3, 0)
        Tables(spark, dir).events
          .select($"user_id", $"ts", $"event_id",
            (sum(dec($"value")).over(w).cast("double") / count(lit(1)).over(w)).as("mov_avg"))
          .orderBy($"user_id", $"ts", $"event_id")
      },
      Some("""
        SELECT user_id, ts, event_id,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) / count(*) OVER w AS mov_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts, event_id
      """.trim),
      bench = true
    ),
    QueryDef(
      "q_event_transitions",
      // first-order Markov transition matrix of the event stream: one
      // user-keyed window pass pairs each event with its successor
      // (lead), then a |types|²-sized hash aggregate counts edges. At
      // 100 TB this is ONE shuffle on user_id (the window) — the final
      // aggregate is vocabulary-bounded and map-side combines to
      // almost nothing
      (spark, dir) =>
        operators.Funnel.transitionMatrix(Tables(spark, dir).events,
            "user_id", "event_type", "ts", "event_id")
          .orderBy("from_type", "to_type"),
      Some("""
        WITH t AS (
          SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          FROM events
        )
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        FROM t WHERE to_type IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
      """.trim),
      bench = true
    ),
    QueryDef(
      "graph_pagerank",
      // weighted PageRank over the event-type transition graph: the
      // corpus pass is Funnel.transitionMatrix's ONE user-keyed window
      // (|types|²-bounded edges); the power iteration then runs in
      // exact integer fixed-point (S=1e9, truncating divides) on the
      // driver over the bounded edge table — engine-exact, mirrored by
      // an unrolled-CTE oracle evaluating the identical expression
      (spark, dir) =>
        operators.Graph.pageRank(
          operators.Funnel.transitionMatrix(Tables(spark, dir).events,
            "user_id", "event_type", "ts", "event_id"),
          "from_type", "to_type", "n_transitions", iterations = 6)
          .orderBy("node"),
      Some(operators.Graph.pageRankOracleSql(
        """edges AS (
          |  SELECT from_type AS src, to_type AS dst, CAST(count(*) AS BIGINT) AS w FROM (
          |    SELECT event_type AS from_type,
          |           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
          |    FROM events
          |  ) WHERE to_type IS NOT NULL GROUP BY 1, 2
          |)""".stripMargin, iterations = 6)),
      bench = true
    ),
    QueryDef(
      "q_attribution",
      // last-touch revenue attribution: each purchase credits the
      // user's most recent PRECEDING non-purchase event type (or
      // 'direct' if none). One user-keyed window carries the last touch
      // forward (rows-frame last_value ignoreNulls — no per-purchase
      // re-join of the stream); revenue sums in exact cents so the
      // aggregate is order-independent
      (spark, dir) =>
        operators.Funnel.lastTouchAttribution(Tables(spark, dir).events,
            "user_id", "event_type", "ts", "event_id", "value", convType = "purchase")
          .orderBy("channel"),
      Some("""
        WITH a AS (
          SELECT user_id, ts, event_id, event_type, value,
                 last_value(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
          FROM events
        )
        SELECT coalesce(touch, 'direct') AS channel,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM a WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1
      """.trim),
      bench = true
    )
  )
}
