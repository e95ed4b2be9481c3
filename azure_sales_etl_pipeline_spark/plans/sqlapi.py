"""The ``spark.sql()`` entry path as a first-class API surface.

Everything else in the engine declares plans through the DataFrame API;
these queries prove the SQL front door works identically — same
catalog tables (registered as temp views), same Catalyst plan
underneath, same exactness conventions (DECIMAL money summed then
emitted as BIGINT cents, per [[top_parts_per_supplier]]'s one-cent
lesson). A user who lives in SQL can point ``spark.sql`` at the engine
catalog and get the same answers the DataFrame API gives.

The queries are classic TPC-H-family shapes chosen so every classic
SUBQUERY POSITION gets a plan-audited representative: the pure
scan+hash-agg pricing summary (Q1) and single-filtered-SUM what-if
(Q6), scan→join→agg→top-N (Q3/Q5), correlated EXISTS → left-semi (Q4), double EXISTS/NOT
EXISTS → semi + anti (Q21), agg-filtered IN → semi (Q18), NOT IN →
anti (Q16), correlated scalar aggregate → grain agg joined back
(Q2/Q17), CTE + scalar max (Q15), share-of-total HAVING scalar (Q11),
the zero-preserving outer-join histogram (Q13), OR-of-ANDs split
pushdown (Q19), scalar-cohort + NOT EXISTS (Q22), the symmetric
nation-pair join (Q7), CASE-share numerator folding (Q8/Q14),
cross-table arithmetic profit (Q9), returned-revenue top-N (Q10),
and cross-join-column lateness residual + conditional counts (Q12) —
with Q7–Q22 adapted to the testdata's columns where TPC-H attributes
(shipmode, partsupp, phone) don't exist. Physical
properties that matter at 100 TB are pinned in
tests/test_plans_explain.py: date-filter pushdown into the fact scan,
broadcast of small dimension chains, TakeOrderedAndProject for top-N
(no global sort), and decorrelation to key joins (never a per-row
subquery loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table


def _register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Expose catalog tables to SQL as session temp views (idempotent).

    Temp views are metadata-only: the SQL planner sees the same parquet
    relation the DataFrame API gets from ``load_table``, so pushdown /
    pruning / AQE behave identically through either front door.
    """
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-shaped: THE canonical TPC-H pricing summary report — grouped
    sums/averages over the shipped slice of the fact, the pure
    scan+hash-agg shape every warehouse benchmarks first (and the one
    Q-shape this module lacked; r12 closes the Q1-Q22 canon). Money in
    exact DECIMAL cents; averages as truncating integer divisions of
    the exact sums (centi-units for quantity, cents for price, basis
    points for discount) so every column is engine-exact."""
    _register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag AS return_flag,
               l_linestatus AS line_status,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 0)
                    AS BIGINT) AS sum_qty,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                    * 100 AS BIGINT) AS sum_base_price_cents,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
                   AS sum_disc_price_cents,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                       * (1 + l_tax)
                                   AS DECIMAL(18,6))), 2) * 100 AS BIGINT)
                   AS sum_charge_cents,
               CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 0) * 100
                    AS BIGINT) div count(*) AS avg_qty_centi,
               CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                     * 100 AS BIGINT) div count(*) AS avg_price_cents,
               CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 4)
                     * 10000 AS BIGINT) div count(*) AS avg_disc_bp,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


_PRICING_SUMMARY_SQL = """
    SELECT l_returnflag AS return_flag,
           l_linestatus AS line_status,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 0)
                AS BIGINT) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                * 100 AS BIGINT) AS sum_base_price_cents,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS sum_disc_price_cents,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   * (1 + l_tax)
                               AS DECIMAL(18,6))), 2) * 100 AS BIGINT)
               AS sum_charge_cents,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 0) * 100
                AS BIGINT) // count(*) AS avg_qty_centi,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                 * 100 AS BIGINT) // count(*) AS avg_price_cents,
           CAST(round(sum(CAST(l_discount AS DECIMAL(18,4))), 4)
                 * 10000 AS BIGINT) // count(*) AS avg_disc_bp,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""


def sql_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped: the forecast-revenue-change what-if — one filtered
    SUM over the fact (a year of shipments, a discount band, a
    quantity cap), the minimal predicate-pushdown + single-agg shape.
    Exact DECIMAL cents."""
    _register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                                   AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
                   AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= DATE '1994-01-01'
          AND l_shipdate <  DATE '1995-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


_FORECAST_REVENUE_SQL = """
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate <  TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: revenue of unshipped BUILDING-segment orders, top 10
    by revenue. Pure ``spark.sql`` text over engine temp views."""
    _register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT l.l_orderkey AS order_key,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
                   AS revenue_cents,
               date_format(o.o_orderdate, 'yyyy-MM-dd') AS order_date,
               o.o_orderpriority AS order_priority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '1995-03-15'
          AND l.l_shipdate  > DATE '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue_cents DESC, order_key ASC
        LIMIT 10
        """
    )


_SHIPPING_SQL = """
    SELECT l.l_orderkey AS order_key,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS revenue_cents,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           o.o_orderpriority AS order_priority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_cents DESC, order_key ASC
    LIMIT 10
"""


def sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped: revenue by customer nation where the supplying
    nation matches (local supply chains), via the full 6-table join in
    SQL text. The dimension chain (region→nation→customer/supplier)
    broadcasts; the only wide exchange is the final nation-grain agg."""
    _register_views(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
                   AS revenue_cents,
               count(DISTINCT o.o_orderkey) AS n_orders
        FROM region r
        JOIN nation n    ON n.n_regionkey = r.r_regionkey
        JOIN customer c  ON c.c_nationkey = n.n_nationkey
        JOIN orders o    ON o.o_custkey   = c.c_custkey
        JOIN lineitem l  ON l.l_orderkey  = o.o_orderkey
        JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
                        AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
        """
    )


_NATION_SQL = """
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS revenue_cents,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM region r
    JOIN nation n    ON n.n_regionkey = r.r_regionkey
    JOIN customer c  ON c.c_nationkey = n.n_nationkey
    JOIN orders o    ON o.o_custkey   = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey  = o.o_orderkey
    JOIN supplier s  ON s.s_suppkey   = l.l_suppkey
                    AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
"""


def sql_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped: per-priority count of one quarter's orders having at
    least one LATE lineitem (shipped >100 days after order date — the
    testdata carries no commit/receipt dates, so lateness is
    re-expressed against l_shipdate). The correlated EXISTS is the
    point: through the SQL front door it must plan as a LEFT SEMI join
    on l_orderkey — no fact-side duplication before the agg, no
    subquery-per-row."""
    _register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority AS order_priority,
               count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1995-04-01'
          AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


_PRIORITY_COUNT_SQL = """
    SELECT o.o_orderpriority AS order_priority,
           count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-04-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY
      )
    GROUP BY o.o_orderpriority
"""


def sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-shaped: the supplier(s) with maximum shipped revenue in one
    quarter. Exercises the CTE + scalar-subquery path through the SQL
    front door: the revenue CTE aggregates once at supplier grain, the
    max() scalar subquery over it broadcasts as a single-row filter,
    and the supplier dimension broadcasts into the final join — no
    global sort, no second scan of lineitem."""
    _register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(_TOP_SUPPLIER_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_TOP_SUPPLIER_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
                   AS total_revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1995-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS supp_key,
           s.s_name AS supplier_name,
           r.total_revenue_cents
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_cents = (SELECT max(total_revenue_cents) FROM revenue)
"""


def sql_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: the distribution of customers by how many orders
    they placed — INCLUDING the zero-order customers, which is the
    point: the outer join must preserve unmatched build-side rows
    through the per-customer count (``count(o.o_orderkey)`` counts
    matches, not rows, so the null row counts 0), then a second tiny
    aggregation folds customers into an order-count histogram. The
    plan property that matters: customer⟕orders shuffles once on
    custkey, and the histogram re-agg runs on |distinct counts| rows —
    nothing re-scans the fact."""
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_CUSTDIST_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_CUSTDIST_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
"""


def sql_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped: the top orders by total quantity above a HAVING
    threshold, with their customers. Exercises the agg-filtered IN
    subquery through the SQL front door — Catalyst plans the
    ``IN (SELECT … HAVING …)`` as a left-semi join against the tiny
    qualifying-keys set, so the customer/orders join only ever sees
    qualifying orders. Quantities are integral-valued doubles in the
    testdata; the per-row BIGINT cast keeps every sum exact (doubles
    would make the HAVING boundary order-dependent)."""
    _register_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_LARGE_VOLUME_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_LARGE_VOLUME_SQL = """
    SELECT c.c_name AS customer_name,
           c.c_custkey AS cust_key,
           o.o_orderkey AS order_key,
           CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 300
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey
    ORDER BY total_qty DESC, order_key ASC
    LIMIT 20
"""


def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-shaped: suppliers who were the SOLE late supplier on a
    multi-supplier order (lateness re-expressed as shipped >100 days
    after order date — the testdata has no commit/receipt dates, same
    adaptation as ``sql_order_priority_count``). The double correlated
    subquery is the plan shape under test: EXISTS (another supplier on
    the order) plans as a left-semi join, NOT EXISTS (another LATE
    supplier) as a left-anti join — two key-joins against lineitem,
    never a per-row subquery loop. Top 10 by wait count."""
    _register_views(spark, sf_dir, "supplier", "orders", "lineitem")
    return spark.sql(_WAITING_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_WAITING_SQL = """
    SELECT s.s_name AS supplier_name,
           count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 100 DAY
      AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o3.o_orderdate + INTERVAL 100 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, supplier_name ASC
    LIMIT 10
"""


def sql_cheapest_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q17-shaped: the supplier(s) holding each nation's MINIMUM
    account balance, via a CORRELATED SCALAR AGGREGATE subquery — the
    remaining classic decorrelation class after EXISTS (Q4) and IN
    (Q18): Catalyst must rewrite the per-row ``(SELECT min(..) WHERE
    s2.nation = s.nation)`` into one nation-grain aggregate joined back
    on the correlation key — one pass over supplier, never a subquery
    per row. Ties all surface (= comparison, not rank)."""
    _register_views(spark, sf_dir, "supplier", "nation")
    return spark.sql(_CHEAPEST_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_CHEAPEST_SQL = """
    SELECT n.n_name AS nation,
           s.s_suppkey AS supp_key,
           s.s_name AS supplier_name,
           CAST(round(CAST(s.s_acctbal AS DECIMAL(18,4)), 2) * 100 AS BIGINT)
               AS acctbal_cents
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_acctbal = (
        SELECT min(s2.s_acctbal) FROM supplier s2
        WHERE s2.s_nationkey = s.s_nationkey
    )
"""


def sql_part_type_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: distinct suppliers per part type, EXCLUDING a
    denylist of suppliers via ``NOT IN (subquery)`` — the anti-join
    decorrelation class (here the denylist is suppliers with negative
    account balance, standing in for Q16's complaint filter). The
    NOT IN must plan as a null-aware anti join against the (small)
    denylist, and the distinct count aggregates at part-type grain
    after the through-lineitem join."""
    _register_views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_PART_SUPPLIERS_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_PART_SUPPLIERS_SQL = """
    SELECT p.p_type AS part_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_type
"""


def sql_nation_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: nations holding more than 5% of total supplier
    account balance — a grouped aggregate FILTERED AGAINST A SCALAR
    SUBQUERY over the same aggregation (the share-of-total HAVING
    class; the last classic subquery position after WHERE-EXISTS,
    WHERE-IN, and correlated scalar). The per-nation aggregate computes
    ONCE in a CTE consumed by both the rows and the total — Catalyst
    plans the scalar as a one-row subquery broadcast into the filter,
    not a second scan of supplier. The share test is pure bigint
    (``20 * nation_cents > total_cents``): no decimal division, no
    float threshold to diverge at the boundary."""
    _register_views(spark, sf_dir, "supplier", "nation")
    return spark.sql(_BALANCE_SHARE_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_BALANCE_SHARE_SQL = """
    WITH per_nation AS (
        SELECT s_nationkey,
               CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,4))), 2) * 100
                    AS BIGINT) AS bal_cents
        FROM supplier
        GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation,
           p.bal_cents
    FROM per_nation p
    JOIN nation n ON n.n_nationkey = p.s_nationkey
    WHERE 20 * p.bal_cents > (SELECT sum(bal_cents) FROM per_nation)
"""


def sql_widget_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped: suppliers in a given nation who shipped a
    substantial volume of widget parts — a NESTED IN chain (suppliers
    IN keys-from-lineitem, whose parts are IN a name-filtered part
    list, with a per-(supplier, part) HAVING volume floor). Both IN
    levels must decorrelate to semi joins: the part-name filter reaches
    the part scan, qualifies lineitem rows by semi join, the volume
    HAVING reduces at (supplier, part) grain, and only then does the
    supplier dimension join — never a subquery loop, never the raw
    fact against supplier."""
    _register_views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_WIDGET_SHIPPERS_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_WIDGET_SHIPPERS_SQL = """
    SELECT s.s_suppkey AS supp_key, s.s_name AS supplier_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_0'
      AND s.s_suppkey IN (
            SELECT l.l_suppkey FROM lineitem l
            WHERE l.l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
            )
            GROUP BY l.l_suppkey, l.l_partkey
            HAVING sum(CAST(floor(l.l_quantity) AS BIGINT)) > 50
      )
"""



def sql_discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped: revenue from three brand-specific quantity/size
    bands, written as one OR-of-ANDs predicate across the join
    (TPC-H Q19's shape: each disjunct constrains BOTH part attributes
    and lineitem attributes; containers/shipmodes don't exist in the
    testdata, so the bands use brand + size + quantity + returnflag).
    The plan property under test: Catalyst must split the disjunction —
    part-only conjuncts (brand list, size floor) push into the part
    scan, lineitem-only conjuncts (returnflag, quantity ceiling) into
    the lineitem scan — leaving ONE hash join with the residual OR, not
    a union of three scans and never a filter above the join alone.
    Revenue in exact integer cents per the engine's DECIMAL convention."""
    _register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_BRAND_REVENUE_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_BRAND_REVENUE_SQL = """
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS revenue_cents,
           count(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (
            p.p_brand = 'Brand#1'
        AND p.p_size BETWEEN 1 AND 15
        AND l.l_quantity BETWEEN 1 AND 20
        AND l.l_returnflag = 'N'
    ) OR (
            p.p_brand = 'Brand#2'
        AND p.p_size BETWEEN 1 AND 25
        AND l.l_quantity BETWEEN 10 AND 30
        AND l.l_returnflag = 'N'
    ) OR (
            p.p_brand = 'Brand#3'
        AND p.p_size BETWEEN 1 AND 35
        AND l.l_quantity BETWEEN 20 AND 40
        AND l.l_returnflag = 'N'
    )
"""


def sql_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-shaped: per-nation count and total balance of RICH, QUIET
    customers — balance above the average positive balance of their
    cohort (scalar aggregate subquery) and no urgent-priority order
    ever placed (NOT EXISTS anti-join; the testdata has no phone
    column, so the cohort is a nation-key list and "quiet" means no
    1-URGENT order — every customer here has orders). The two plan
    properties under test: the scalar cohort aggregate computes ONCE
    and broadcasts into the filter, and the NOT EXISTS decorrelates to
    a LEFT ANTI join on c_custkey against the pre-filtered orders side.
    The above-average comparison is integer cross-multiplied
    (cents x count > total_cents) so no division boundary can flip
    between engines."""
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_SALES_OPPORTUNITY_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_SALES_OPPORTUNITY_SQL = """
    WITH cohort AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(CAST(c_acctbal AS DECIMAL(18,4)), 2) * 100 AS BIGINT)
                   AS bal_cents
        FROM customer
        WHERE c_nationkey IN (5, 10, 15, 20)
    ),
    pos AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pos,
               CAST(sum(bal_cents) AS BIGINT) AS total_cents
        FROM cohort WHERE bal_cents > 0
    )
    SELECT c.c_nationkey AS nation_key,
           count(*) AS numcust,
           CAST(sum(c.bal_cents) AS BIGINT) AS totacctbal_cents
    FROM cohort c
    WHERE c.bal_cents * (SELECT n_pos FROM pos) > (SELECT total_cents FROM pos)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_nationkey
"""



def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-shaped: bilateral trade — revenue shipped between two named
    nations in either direction, by (supplier nation, customer nation,
    ship year). The plan property: the symmetric nation-pair OR
    restricts BOTH nation dimension copies before the fact join, so
    each copy broadcasts as a 2-row build side and the lineitem scan
    carries only the two-year shipdate pushdown; the wide exchange is
    the final 3-column-grain aggregate, never an n×n nation product."""
    _register_views(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    return spark.sql(_VOLUME_SHIPPING_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB
# (CAST(year() AS INT) pins int32 on both engines).
_VOLUME_SHIPPING_SQL = """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS revenue_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE (   (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
           OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
"""


def sql_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped: market share of one supplying nation within a
    region's PROMO-part order volume, per order year. TPC-H Q8 emits
    the share as a division; divisions round differently across
    engines, so per the engine's exactness convention the numerator
    (target-nation volume) and denominator (all-nation volume) are
    emitted as exact integer cents — the share is their ratio. The
    CASE-guarded numerator folds into the same aggregate as the
    denominator: one scan, one agg, no self-join. Dimension chain
    (region→nation→customer, part, supplier-nation) broadcasts."""
    _register_views(
        spark, sf_dir,
        "part", "supplier", "lineitem", "orders", "customer", "nation", "region",
    )
    return spark.sql(_MARKET_SHARE_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_MARKET_SHARE_SQL = """
    SELECT CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(round(sum(CASE WHEN sn.n_name = 'NATION_2'
                               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                         AS DECIMAL(18,4))
                               ELSE CAST(0 AS DECIMAL(18,4)) END),
                      2) * 100 AS BIGINT) AS nation_volume_cents,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS total_volume_cents
    FROM part p
    JOIN lineitem l ON l.l_partkey  = p.p_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey  = cn.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'PROMO'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY CAST(year(o.o_orderdate) AS INT)
"""


def sql_product_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped: profit by supplier nation and order year over a
    part-name LIKE family. TPC-H Q9's profit subtracts
    ps_supplycost×quantity; the testdata has no partsupp table, so the
    cost leg is re-expressed as half the part's retail price per unit
    (p_retailprice × 0.5 × l_quantity; multiplication by the DECIMAL
    literal 0.5, never division — DuckDB degrades DECIMAL division to
    DOUBLE while Spark keeps DECIMAL, the engine-divergence class the
    PSI work documented) — same shape: a per-line arithmetic
    combining columns from three tables, aggregated at
    (nation, year) grain. The LIKE '%widget%' predicate must push into
    the part scan (substring filters are scan-level, not join-level),
    part broadcasts, and profit is assembled in DECIMAL then emitted
    as exact integer cents."""
    _register_views(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation"
    )
    return spark.sql(_PRODUCT_MARGIN_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_PRODUCT_MARGIN_SQL = """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS order_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))
                        - CAST(p.p_retailprice AS DECIMAL(18,4)) * 0.5
                          * CAST(l.l_quantity AS DECIMAL(18,4))),
                      2) * 100 AS BIGINT) AS profit_cents
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
"""


def sql_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: the 20 customers who returned the most revenue in
    one quarter, with their nation. Top-N over a 4-table join: the
    returnflag + quarter predicates push into the lineitem/orders
    scans, customer and nation broadcast, and the LIMIT plans as
    TakeOrderedAndProject — per-partition top-20 heaps, only 20 rows
    per partition reach the driver-side merge, never a global sort."""
    _register_views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_RETURNED_ITEM_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_RETURNED_ITEM_SQL = """
    SELECT c.c_custkey AS cust_key,
           c.c_name AS cust_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS revenue_cents,
           CAST(round(CAST(c.c_acctbal AS DECIMAL(18,4)), 2) * 100 AS BIGINT)
               AS acctbal_cents,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
      AND o.o_orderdate <  TIMESTAMP '1995-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue_cents DESC, cust_key ASC
    LIMIT 20
"""


def sql_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped: per lineitem status, how many slow shipments (>90
    days after order) carried critical vs ordinary priority orders.
    TPC-H Q12 groups by l_shipmode, which the testdata lacks;
    l_linestatus is the stand-in group key — the shape is identical:
    one lineitem↔orders join with a lateness predicate comparing
    columns ACROSS the join (so it can only be a join residual, not a
    scan pushdown) and two CASE-conditional counts folded into a
    single aggregate. One join, one agg, no per-branch re-scan."""
    _register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_PRIORITY_SHIPPING_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_PRIORITY_SHIPPING_SQL = """
    SELECT l.l_linestatus AS line_status,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1996-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
"""


def sql_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-shaped: what fraction of one month's shipped revenue came
    from PROMO-type parts. Q14 emits 100×promo/total as a float;
    divisions round differently across engines, so the engine emits
    the exact integer-cents numerator and denominator (the percentage
    is their ratio). CASE-guarded numerator folds into the same
    single aggregate as the denominator — one part-broadcast join over
    one month-pruned lineitem scan, one 1-row agg."""
    _register_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_PROMO_REVENUE_SQL)


# Engine-neutral text: runs verbatim on Spark and DuckDB.
_PROMO_REVENUE_SQL = """
    SELECT CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                         AS DECIMAL(18,4))
                               ELSE CAST(0 AS DECIMAL(18,4)) END),
                      2) * 100 AS BIGINT) AS promo_revenue_cents,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) * 100 AS BIGINT)
               AS total_revenue_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
"""


QUERIES = {
    "sql_pricing_summary": sql_pricing_summary,
    "sql_forecast_revenue_change": sql_forecast_revenue_change,
    "sql_shipping_priority": sql_shipping_priority,
    "sql_widget_shippers": sql_widget_shippers,
    "sql_nation_balance_share": sql_nation_balance_share,
    "sql_cheapest_supplier_per_nation": sql_cheapest_supplier_per_nation,
    "sql_part_type_supplier_counts": sql_part_type_supplier_counts,
    "sql_nation_revenue": sql_nation_revenue,
    "sql_order_priority_count": sql_order_priority_count,
    "sql_top_supplier": sql_top_supplier,
    "sql_customer_distribution": sql_customer_distribution,
    "sql_large_volume_customers": sql_large_volume_customers,
    "sql_waiting_suppliers": sql_waiting_suppliers,
    "sql_discounted_brand_revenue": sql_discounted_brand_revenue,
    "sql_global_sales_opportunity": sql_global_sales_opportunity,
    "sql_volume_shipping": sql_volume_shipping,
    "sql_market_share": sql_market_share,
    "sql_product_margin": sql_product_margin,
    "sql_returned_item_reporting": sql_returned_item_reporting,
    "sql_priority_shipping": sql_priority_shipping,
    "sql_promo_revenue": sql_promo_revenue,
}

ORACLES = {
    "sql_pricing_summary": _PRICING_SUMMARY_SQL,
    "sql_forecast_revenue_change": _FORECAST_REVENUE_SQL,
    "sql_shipping_priority": _SHIPPING_SQL,
    "sql_widget_shippers": _WIDGET_SHIPPERS_SQL,
    "sql_nation_balance_share": _BALANCE_SHARE_SQL,
    "sql_cheapest_supplier_per_nation": _CHEAPEST_SQL,
    "sql_part_type_supplier_counts": _PART_SUPPLIERS_SQL,
    "sql_nation_revenue": _NATION_SQL,
    "sql_order_priority_count": _PRIORITY_COUNT_SQL,
    "sql_top_supplier": _TOP_SUPPLIER_SQL,
    "sql_customer_distribution": _CUSTDIST_SQL,
    "sql_large_volume_customers": _LARGE_VOLUME_SQL,
    "sql_waiting_suppliers": _WAITING_SQL,
    "sql_discounted_brand_revenue": _BRAND_REVENUE_SQL,
    "sql_global_sales_opportunity": _SALES_OPPORTUNITY_SQL,
    "sql_volume_shipping": _VOLUME_SHIPPING_SQL,
    "sql_market_share": _MARKET_SHARE_SQL,
    "sql_product_margin": _PRODUCT_MARGIN_SQL,
    "sql_returned_item_reporting": _RETURNED_ITEM_SQL,
    "sql_priority_shipping": _PRIORITY_SHIPPING_SQL,
    "sql_promo_revenue": _PROMO_REVENUE_SQL,
}
