"""Relational operator coverage: projections, filters, predicates,
casts, distinct, coalesce — the SURVEY.md §2.2/§2.6 inventory rows that
the gold marts don't already exercise.

Each query is the smallest idiomatic-Spark expression of one reference
operator, on the driver testdata, with a DuckDB oracle. Reference
citations are to /root/reference/databricks_notebooks/.

Scale notes: every query here is scan → narrow transform (no shuffle)
or a single keyed aggregation; filters and projections are expressed
declaratively so Catalyst pushes them into the parquet scan
(PushedFilters / ReadSchema — verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

# ---------------------------------------------------------------------------
# P3 — star-qualified projection after an aliased join
# (reference 2_Bronze_to_Silver.py:122 ``staged_df.select("s.*")``)
# ---------------------------------------------------------------------------


def star_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the source side of an aliased 2-way join — the SCD2
    "take incoming rows" step. Orders ⋈ customer, keep ``o.*``."""
    orders = load_table(spark, sf_dir, "orders").alias("o")
    customer = load_table(spark, sf_dir, "customer").alias("c")
    joined = orders.join(customer, F.col("o.o_custkey") == F.col("c.c_custkey"), "inner")
    return joined.select("o.*")


_STAR_SQL = """
    SELECT o.* FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# P4 + P10 — column drop and cast
# (reference 2_Bronze_to_Silver.py:78 drop("hash"); :80 lit(None).cast)
# ---------------------------------------------------------------------------


def drop_and_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop a column; cast key int→bigint and round money to 2 places
    (the reference's DECIMAL(18,2) money semantics, SURVEY §1.2).

    Money stays ``double`` here (round(x,2)) rather than decimal(18,2):
    Spark and DuckDB produce string-identical decimal VALUES but the
    driver's hash layer normalizes the two engines' decimals differently
    (r2 finding: rows/schema matched, hash didn't). The P10 cast-operator
    demo is preserved by the int→bigint cast; decimal round-tripping is
    covered in pytest (tests/test_relational.py).
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.drop("p_type")
        .withColumn("p_retailprice", F.round(F.col("p_retailprice"), 2))
        .withColumn("p_partkey", F.col("p_partkey").cast("bigint"))
    )


_DROP_CAST_SQL = """
    SELECT p_partkey::BIGINT AS p_partkey, p_name, p_brand,
           p_size, round(p_retailprice, 2) AS p_retailprice
    FROM part
"""


# ---------------------------------------------------------------------------
# P5 — SQL-string filter (reference ``where("is_current = true")``,
# 2_Bronze_to_Silver.py:84; 3_Silver_to_Gold.py:12-16) + IN-list form (:99)
# ---------------------------------------------------------------------------


def filter_sql_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``df.where("<sql>")`` with equality + IN list, pushed to the scan."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.where("o_orderstatus IN ('F', 'P') AND o_orderpriority = '1-URGENT'")


_FILTER_SQL_SQL = """
    SELECT * FROM orders
    WHERE o_orderstatus IN ('F', 'P') AND o_orderpriority = '1-URGENT'
"""


# ---------------------------------------------------------------------------
# P6 + P8 — Column-expression filter with comparison predicates
# (reference watermark cut col(c) > lit(ts), 2_Bronze_to_Silver.py:55-56)
# ---------------------------------------------------------------------------


def filter_column_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark-style cut: timestamp lower bound AND value threshold,
    Column-expression form."""
    events = load_table(spark, sf_dir, "events")
    return events.where(
        (F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        & (F.col("value") >= 100.0)
    )


_FILTER_COL_SQL = """
    SELECT * FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00' AND value >= 100.0
"""


# ---------------------------------------------------------------------------
# P7 — null tests classifying join sides
# (reference 2_Bronze_to_Silver.py:95-96 — the SCD2 INSERT/UPDATE classifier)
# ---------------------------------------------------------------------------


def null_test_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer customer-vs-orders ownership classification: customers
    with no orders / orders side only, via isNull on each side — exactly
    the reference's join-side null tests (P7 + J1 shape)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey").alias("c")
    owners = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().alias("o")
    )
    joined = customer.join(owners, F.col("c.c_custkey") == F.col("o.o_custkey"), "full_outer")
    return joined.select(
        F.coalesce(F.col("c.c_custkey"), F.col("o.o_custkey")).alias("custkey"),
        F.when(F.col("o.o_custkey").isNull(), "NO_ORDERS")
        .when(F.col("c.c_custkey").isNull(), "ORPHAN_ORDER")
        .otherwise("ACTIVE")
        .alias("action"),
    )


_NULL_TEST_SQL = """
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           CASE WHEN o.o_custkey IS NULL THEN 'NO_ORDERS'
                WHEN c.c_custkey IS NULL THEN 'ORPHAN_ORDER'
                ELSE 'ACTIVE' END AS action
    FROM customer c
    FULL OUTER JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON c.c_custkey = o.o_custkey
"""


# ---------------------------------------------------------------------------
# P11 — distinct (reference 2_Bronze_to_Silver.py:123 expire-key de-dup)
# ---------------------------------------------------------------------------


def distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-duplicated (custkey, status) pairs — the expire-key set shape.
    One hash-aggregate shuffle on the pair; partial agg map-side."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_custkey", "o_orderstatus").distinct()


_DISTINCT_SQL = "SELECT DISTINCT o_custkey, o_orderstatus FROM orders"


# ---------------------------------------------------------------------------
# A5 + F11 — global ungrouped max with coalesce default (the watermark read)
# (reference 2_Bronze_to_Silver.py:67 + :44 default '1900-01-01')
# ---------------------------------------------------------------------------


def global_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-watermark computation: global max(ts) with the reference's
    1900-01-01 default when the table is empty (coalesce). Single-row
    result; partial max computed map-side, no wide shuffle."""
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.coalesce(F.max("ts"), F.lit("1900-01-01 00:00:00").cast("timestamp")).alias(
            "watermark"
        ),
        F.count(F.lit(1)).alias("row_count"),
    )


_WATERMARK_SQL = """
    SELECT coalesce(max(ts), TIMESTAMP '1900-01-01 00:00:00') AS watermark,
           count(*) AS row_count
    FROM events
"""


# ---------------------------------------------------------------------------
# F3 + F4 — hash-diff expression (the SCD2 change-detection hash)
# (reference 2_Bronze_to_Silver.py:72,84)
# ---------------------------------------------------------------------------


def hash_diff_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-content sha256 over concat_ws('||') — including the reference's
    null-skip quirk (F4). Computed on nation (small, stable) so the oracle
    is cheap; the expression is identical at any scale (pure map, no
    shuffle, whole-stage codegen)."""
    nation = load_table(spark, sf_dir, "nation")
    from ..functions import hash_diff

    return nation.select(
        "n_nationkey",
        hash_diff(["n_name", "n_regionkey"]).alias("row_hash"),
    )


_HASH_SQL = """
    SELECT n_nationkey,
           sha256(concat_ws('||', n_name::VARCHAR, n_regionkey::VARCHAR)) AS row_hash
    FROM nation
"""


# ---------------------------------------------------------------------------
# J1 + T5 — full-outer SCD2 change classification on real tables
# (reference 2_Bronze_to_Silver.py:87-99 — the algorithmic core, batch form)
# ---------------------------------------------------------------------------


def scd2_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's INSERT/UPDATE/NO CHANGE classifier, expressed on
    testdata: 'target' = customers with even key (simulated current
    dimension), 'source' = customers with key % 3 != 0 and a tweaked
    mktsegment for key % 5 == 0 (simulated incoming batch). Full-outer on
    the business key, sha2 hash compare, 3-branch CASE — structurally
    identical to 2_Bronze_to_Silver.py:87-99.

    Scale: full-outer equi-join → sort-merge on the key; hash computed
    map-side on both inputs before the shuffle so the compare is on a
    64-char string, not N columns.
    """
    from ..functions import hash_diff

    customer = load_table(spark, sf_dir, "customer")
    target = (
        customer.where(F.col("c_custkey") % 2 == 0)
        .select("c_custkey", "c_name", "c_mktsegment")
    )
    source = (
        customer.where(F.col("c_custkey") % 3 != 0)
        .select(
            "c_custkey",
            "c_name",
            F.when(F.col("c_custkey") % 5 == 0, F.lit("CHANGED"))
            .otherwise(F.col("c_mktsegment"))
            .alias("c_mktsegment"),
        )
    )
    s = source.withColumn("hash", hash_diff(["c_name", "c_mktsegment"])).alias("s")
    t = target.withColumn("hash", hash_diff(["c_name", "c_mktsegment"])).alias("t")
    joined = s.join(t, F.col("s.c_custkey") == F.col("t.c_custkey"), "full_outer")
    return joined.select(
        F.coalesce(F.col("s.c_custkey"), F.col("t.c_custkey")).alias("custkey"),
        F.when(F.col("t.c_custkey").isNull(), "INSERT")
        .when(F.col("s.c_custkey").isNull(), "ABSENT")
        .when(F.col("s.hash") != F.col("t.hash"), "UPDATE")
        .otherwise("NO CHANGE")
        .alias("action"),
    )


_SCD2_CLASSIFY_SQL = """
    WITH target AS (
        SELECT c_custkey, c_name, c_mktsegment,
               sha256(concat_ws('||', c_name::VARCHAR, c_mktsegment::VARCHAR)) AS hash
        FROM customer WHERE c_custkey % 2 = 0
    ),
    source AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS c_mktsegment,
               sha256(concat_ws('||', c_name::VARCHAR,
                   (CASE WHEN c_custkey % 5 = 0 THEN 'CHANGED' ELSE c_mktsegment END)::VARCHAR)) AS hash
        FROM customer WHERE c_custkey % 3 != 0
    )
    SELECT coalesce(s.c_custkey, t.c_custkey) AS custkey,
           CASE WHEN t.c_custkey IS NULL THEN 'INSERT'
                WHEN s.c_custkey IS NULL THEN 'ABSENT'
                WHEN s.hash != t.hash THEN 'UPDATE'
                ELSE 'NO CHANGE' END AS action
    FROM source s FULL OUTER JOIN target t ON s.c_custkey = t.c_custkey
"""


# ---------------------------------------------------------------------------
# set ops + ordered top-k (not in the reference — SURVEY §2.5 notes gold
# consumers implicitly sort/limit, so the engine covers them)
# ---------------------------------------------------------------------------


def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference). Catalyst plans this as a
    left-anti hash/sort-merge join on the key — same cost envelope as
    the SCD2 anti-join at scale."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return customer.exceptAll(urgent.distinct()).distinct()


_EXCEPT_SQL = """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ordered top-k: orderBy desc + limit, deterministic
    tie-break on the key. Spark executes this as a per-partition top-k
    (TakeOrderedAndProject) then a driver merge of k·partitions rows —
    no global sort, safe at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
        .orderBy(F.col("total_spent").desc(), F.col("o_custkey").asc())
        .limit(20)
    )


_TOP_SQL = """
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent
    FROM orders GROUP BY ALL
    ORDER BY total_spent DESC, o_custkey ASC
    LIMIT 20
"""


#: Columns profiled by ``table_profile``. min/max compute on the NATIVE
#: type (numeric order for ints, calendar order for dates) and only the
#: RESULT is stringified, so the list pins to types whose string forms
#: are engine-portable (ints, strings, dates) — doubles profile
#: null/distinct but not min/max (shortest-repr forms can diverge).
_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderdate",
    "o_orderpriority",
)


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table — row count, null count,
    distinct count, and min/max per column: the data-quality
    reconnaissance pass every ingestion pipeline runs before trusting a
    new source (the reference has no profiling step; its silent
    CSV-inference drift, SURVEY §1.2, is exactly what one catches).

    Plan shape: ONE aggregation pass computes every column's stats
    (count/count-distinct/min/max all map-side-combinable), then the
    single result row unpivots to (column, stats) rows with ``stack`` —
    no per-column jobs, no second scan. At 100 TB replace the exact
    ``count(DISTINCT)`` with ``approx_count_distinct`` per the
    ``_approx`` convention; the rest is already one pass.

    ``spread_for_cpu``: a single-file local scan gives the CPU-heavy
    profile pass (5-way distinct Expand + per-column string casts) ONE
    input task; fanning out costs one shuffle of the small input and
    parallelizes everything downstream (3.2 s → sub-second at sf0.1).
    At 100 TB the scan arrives in thousands of splits and it no-ops."""
    from ..functions import spread_for_cpu

    orders = spread_for_cpu(load_table(spark, sf_dir, "orders"))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            # Typed min/max, stringified AFTER: cast-then-min would rank
            # ints lexicographically ('99999' > '100000') and report
            # wrong bounds for numeric columns.
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def orders_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine through ``operators.validate`` on an orders
    feed with deterministically PLANTED corruption (the clean testdata
    would make every rule vacuously green): keys divisible by 97 get a
    negated total, keys divisible by 101 a nulled priority — so the
    query exercises real rule failures, multi-violation rows (9797·k),
    and the null-counts-as-violation policy. Output is the quarantine
    side: key + the sorted violated-rule list; the clean side is
    row-count-asserted in pytest.

    One narrow projection evaluates every rule, two filters split the
    stream — no shuffle, classification is a pure function of the row
    (retry/repartition-stable)."""
    from ..operators.validate import validate_and_quarantine

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 101 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        "o_orderstatus",
    )
    _good, bad = validate_and_quarantine(
        orders,
        {
            "nonneg_total": F.col("o_totalprice") >= 0,
            "priority_present": F.col("o_orderpriority").isNotNull(),
            "known_status": F.col("o_orderstatus").isin("O", "F", "P"),
        },
    )
    return bad.select("o_orderkey", "violations")


_VALIDATION_SQL = """
    WITH src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN o_orderkey % 101 = 0 THEN NULL
                    ELSE o_orderpriority END AS o_orderpriority,
               o_orderstatus
        FROM orders
    ),
    flagged AS (
        SELECT o_orderkey,
               array_to_string(list_sort(list_filter([
                   CASE WHEN NOT coalesce(o_totalprice >= 0, false)
                        THEN 'nonneg_total' END,
                   CASE WHEN o_orderpriority IS NULL
                        THEN 'priority_present' END,
                   CASE WHEN NOT coalesce(
                            o_orderstatus IN ('O', 'F', 'P'), false)
                        THEN 'known_status' END
               ], v -> v IS NOT NULL)), ',') AS violations
        FROM src
    )
    SELECT o_orderkey, violations FROM flagged WHERE violations != ''
"""


def _profile_sql() -> str:
    selects = []
    for c in _PROFILE_COLS:
        selects.append(
            f"""
            SELECT '{c}' AS column_name,
                   (SELECT count(*) FROM orders) AS n_rows,
                   CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
                   CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(min({c}) AS VARCHAR) AS min_value,
                   CAST(max({c}) AS VARCHAR) AS max_value
            FROM orders
            """
        )
    return " UNION ALL ".join(selects)


#: k-anonymity threshold: equivalence classes smaller than this are
#: re-identification risks.
_K_ANON = 5


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit before releasing or exporting a table: group rows
    by their QUASI-IDENTIFIERS — here (nation, market segment, account
    balance banded to 1000s), the attacker-linkable attributes — and
    report the distribution of equivalence-class sizes. A class of size
    < k means those rows are re-identifiable by joining public data on
    the quasi-identifiers alone; the fix is coarser banding /
    suppression until every class reaches k. Output is the SIZE
    histogram (one row per class size, how many classes and rows sit
    there, at_risk flag), not the risky rows themselves — an audit
    artifact that is itself k-anonymous.

    Shape: two hash aggregations — per-class counts (one shuffle on the
    quasi-identifier key), then a tiny re-agg over |distinct sizes|
    rows. The balance band is floor(x/1000) on the raw double: one IEEE
    division both engines evaluate identically."""
    customers = load_table(spark, sf_dir, "customer")
    classes = (
        customers.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    return (
        classes.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
        )
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            (F.col("class_size") < _K_ANON).alias("at_risk"),
        )
    )


_K_ANON_SQL = f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               count(*) AS class_size
        FROM customer
        GROUP BY ALL
    )
    SELECT CAST(class_size AS BIGINT) AS class_size,
           count(*) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           class_size < {_K_ANON} AS at_risk
    FROM classes
    GROUP BY class_size
"""


_L_DIVERSITY = 2  # minimum distinct sensitive values per QI class


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The companion privacy audit to [[k_anonymity_audit]]: k-anonymity
    alone is defeated by a HOMOGENEOUS class — if every row in an
    equivalence class shares the same sensitive value, an attacker who
    links a victim to the class learns the attribute without singling
    out the row. l-DIVERSITY requires >= l distinct sensitive values
    per class. Here the quasi-identifiers are (nation, $1000 balance
    band) and the sensitive attribute is the market segment; the output
    is the histogram of per-class sensitive-diversity (how many classes
    carry exactly l distinct segments, how many rows sit in them,
    at-risk flag for l < threshold) — an audit artifact that discloses
    no class's actual values.

    Shape: one exact distinct-count aggregate at QI grain (Spark plans
    count(DISTINCT) as a two-phase partial-distinct — no row explosion
    crosses the shuffle beyond the (QI, segment) dedup grain), then a
    tiny re-agg over |distinct l| rows."""
    customers = load_table(spark, sf_dir, "customer")
    classes = customers.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_band"),
    ).agg(
        F.countDistinct("c_mktsegment").alias("l_distinct"),
        F.count(F.lit(1)).alias("class_size"),
    )
    return (
        classes.groupBy("l_distinct")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
        )
        .select(
            "l_distinct",
            "n_classes",
            "n_rows",
            (F.col("l_distinct") < _L_DIVERSITY).alias("at_risk"),
        )
    )


_L_DIVERSITY_SQL = f"""
    WITH classes AS (
        SELECT c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
               count(*) AS class_size
        FROM customer
        GROUP BY ALL
    )
    SELECT l_distinct,
           count(*) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           l_distinct < {_L_DIVERSITY} AS at_risk
    FROM classes
    GROUP BY l_distinct
"""


_MASK_MOD = 10**9  # digit-preserving pseudonym width (9 digits)
_BAL_BAND_CENTS = 50_000  # $500 balance bands


def customer_masked_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance masking export — the share-with-analytics-vendor view
    of the customer dimension: (1) the key becomes a SALTED PSEUDONYM
    (16-hex sha256 slice — referentially STABLE, so the same customer
    pseudonymizes identically in every masked table and joins still
    work, but the mapping is not invertible without the salt); (2) the
    name's embedded digit run is rewritten FORMAT-PRESERVINGLY (9
    digits stay 9 digits — hex→bigint mod 10⁹, zero-padded — so
    downstream regex/length validations keep passing); (3) the
    account balance generalizes to $500 bands (the k-anonymity
    treatment `k_anonymity_audit` measures). Everything is
    deterministic shared-text arithmetic, so the masked export itself
    is value-oracled — the oracle proves masking is applied
    consistently, not just that it ran."""
    from ..functions import hex_to_bigint_sql

    cust = load_table(spark, sf_dir, "customer")
    digits = hex_to_bigint_sql(
        "substr(sha2(concat('mask:', CAST(c_custkey AS STRING)), 256), 1, 15)"
    )
    return cust.select(
        F.expr(
            "substr(sha2(concat('pseud:', CAST(c_custkey AS STRING)), 256), 1, 16)"
        ).alias("pseud_id"),
        F.expr(
            f"concat('Customer#', lpad(CAST({digits} % {_MASK_MOD} AS STRING), 9, '0'))"
        ).alias("c_name_masked"),
        # floor-aligned half-open bands: `div` truncates toward zero,
        # which would make band 0 span (-$500, +$500) and label negative
        # bands by their UPPER bound — the double-mod subtraction is
        # floor division for any sign (both engines' % follow the
        # dividend sign identically)
        F.expr(
            f"CAST(floor(c_acctbal * 100) AS BIGINT)"
            f" - ((CAST(floor(c_acctbal * 100) AS BIGINT) % {_BAL_BAND_CENTS}"
            f" + {_BAL_BAND_CENTS}) % {_BAL_BAND_CENTS})"
        ).alias("acctbal_band_cents"),
        "c_mktsegment",
        "c_nationkey",
    )


def _masked_sql() -> str:
    from ..functions import hex_to_bigint_sql

    digits = hex_to_bigint_sql(
        "substr(sha256('mask:' || CAST(c_custkey AS VARCHAR)), 1, 15)"
    )
    return f"""
    SELECT substr(sha256('pseud:' || CAST(c_custkey AS VARCHAR)), 1, 16)
               AS pseud_id,
           'Customer#' || lpad(CAST({digits} % {_MASK_MOD} AS VARCHAR), 9, '0')
               AS c_name_masked,
           CAST(floor(c_acctbal * 100) AS BIGINT)
               - ((CAST(floor(c_acctbal * 100) AS BIGINT) % {_BAL_BAND_CENTS}
                   + {_BAL_BAND_CENTS}) % {_BAL_BAND_CENTS})
               AS acctbal_band_cents,
           c_mktsegment, c_nationkey
    FROM customer
"""


_MASKED_SQL = _masked_sql()


_COMPLETENESS_BLOCK = 1024  # keyspace audit granularity (keys per block)


def key_completeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyspace-completeness audit — "did the extract drop rows?" for a
    source whose keys are contractually DENSE (sequence/identity
    columns): report every 1024-key block that is missing keys, with
    the block's present count, first/last present key, and missing
    count. The block grain is the form that survives scale — at 100 TB
    you triage damaged RANGES (one row per broken block, almost always
    a tiny result), not an enumeration of billions of individual gap
    keys; a damaged block then scopes a targeted re-extract (the
    `watermark_incremental_batch` machinery re-pulls exactly that key
    window).

    The audited subset here simulates a lossy extract deterministically
    (drops o_orderkey % 97 == 13, ~1% spread damage). Plan: one
    map-side-combined groupBy at the block grain + a broadcast 1-row
    scalar for the global max (the last block's expected span is
    shorter; keys lost AFTER the last present key are unknowable from
    the data alone — that tail needs the source's row count, which is
    exactly what the reference's ADF Lookup step fetched)."""
    keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 97 != 13)
        .select(F.col("o_orderkey").alias("k"))
    )
    blocks = keys.groupBy(
        F.expr(f"k DIV {_COMPLETENESS_BLOCK}").alias("block")
    ).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.min("k").alias("first_present"),
        F.max("k").alias("last_present"),
    )
    maxk = keys.agg(F.max("k").alias("global_max"))
    return (
        blocks.crossJoin(F.broadcast(maxk))
        .select(
            "block",
            "n_present",
            "first_present",
            "last_present",
            (
                F.least(
                    F.lit(_COMPLETENESS_BLOCK),
                    F.col("global_max") - F.col("block") * _COMPLETENESS_BLOCK + 1,
                )
                - F.col("n_present")
            ).alias("n_missing"),
        )
        .where(F.col("n_missing") > 0)
    )


_COMPLETENESS_SQL = f"""
    WITH keys AS (
        SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 97 != 13
    ),
    blocks AS (
        SELECT k // {_COMPLETENESS_BLOCK} AS block,
               count(*) AS n_present,
               min(k) AS first_present,
               max(k) AS last_present
        FROM keys GROUP BY 1
    )
    SELECT block, n_present, first_present, last_present,
           least({_COMPLETENESS_BLOCK},
                 (SELECT max(k) FROM keys) - block * {_COMPLETENESS_BLOCK} + 1)
               - n_present AS n_missing
    FROM blocks
    WHERE least({_COMPLETENESS_BLOCK},
                (SELECT max(k) FROM keys) - block * {_COMPLETENESS_BLOCK} + 1)
              - n_present > 0
"""


#: FK edges of the star schema: (fact, fk_col, dim, pk_col).
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
)


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table data-quality audit: for every foreign-key edge of
    the star schema, how many fact rows point at a dimension row that
    does not exist (orphans) — the complement of ``orders_validation``'s
    row-local rules, and the first thing to check after any partial
    load, late dimension, or botched backfill (the
    ``SCD2Table.ensure_members`` pattern exists precisely to drive this
    number to zero). Each edge costs one DISTINCT on the fact's FK
    values followed by a left-anti probe of the dimension's key — the
    anti-join carries |distinct keys| rows, never the fact — and a
    conditional re-count maps orphaned keys back to row counts. All
    edges union into one audit frame (one row per edge).

    NULL FK values are excluded on BOTH sides: "FK not set" is a
    different defect (orders_validation's territory) from "FK points at
    nothing", and SQL NOT IN / anti-join disagree about NULLs — Spark's
    left_anti counts a NULL fk as an orphan while NOT IN silently drops
    it (and returns zero rows if any dimension pk is NULL). Filtering
    IS NOT NULL pre-join pins one semantics both engines share
    (r6 advisory)."""
    out = None
    for fact, fk, dim, pk in _FK_EDGES:
        f = (
            load_table(spark, sf_dir, fact)
            .select(F.col(fk).alias("fk"))
            .where(F.col("fk").isNotNull())
        )
        d = (
            load_table(spark, sf_dir, dim)
            .select(F.col(pk).alias("fk"))
            .where(F.col("fk").isNotNull())
        )
        key_counts = f.groupBy("fk").agg(F.count(F.lit(1)).alias("n_rows_key"))
        orphan_keys = key_counts.join(d, "fk", "left_anti")
        edge = orphan_keys.agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_orphan_keys"),
            F.coalesce(F.sum("n_rows_key"), F.lit(0)).alias("n_orphan_rows"),
        ).select(
            F.lit(f"{fact}.{fk}->{dim}.{pk}").alias("fk_edge"),
            F.col("n_orphan_keys").cast("bigint"),
            F.col("n_orphan_rows").cast("bigint"),
        )
        out = edge if out is None else out.unionByName(edge)
    return out


def _ri_audit_sql() -> str:
    selects = []
    for fact, fk, dim, pk in _FK_EDGES:
        selects.append(
            f"""
            SELECT '{fact}.{fk}->{dim}.{pk}' AS fk_edge,
                   CAST(count(*) AS BIGINT) AS n_orphan_keys,
                   CAST(coalesce(sum(n_rows_key), 0) AS BIGINT) AS n_orphan_rows
            FROM (
                SELECT {fk} AS fk, count(*) AS n_rows_key
                FROM {fact} WHERE {fk} IS NOT NULL GROUP BY 1
            ) k
            WHERE NOT EXISTS (
                SELECT 1 FROM {dim} d
                WHERE d.{pk} = k.fk AND d.{pk} IS NOT NULL
            )
            """
        )
    return " UNION ALL ".join(selects)


def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship-class audit for every FK edge of the star schema —
    the dbt-style `relationships` contract one level deeper: not just
    "do the keys resolve" ([[referential_integrity_audit]]) but "is
    the edge still the SHAPE the joins assume". A duplicated dimension
    key silently FANS OUT every downstream join (revenue double-counts
    — the classic broken-mart incident); this reports, per edge, the
    observed child/parent multiplicities and the relationship class
    (one_to_one / many_to_one / many_to_many) so a contract test can
    pin `many_to_one` and fail loudly when a load breaks it.

    Shape: per edge, one group-count per side collapsed to a 1-row
    profile (map-side combined, |keys|-bounded), broadcast-joined —
    the union is |edges| rows. NULL keys excluded on both sides, same
    semantics note as the RI audit."""
    out = None
    for fact, fk, dim, pk in _FK_EDGES:
        f = (
            load_table(spark, sf_dir, fact)
            .select(F.col(fk).alias("fk"))
            .where(F.col("fk").isNotNull())
        )
        d = (
            load_table(spark, sf_dir, dim)
            .select(F.col(pk).alias("pk"))
            .where(F.col("pk").isNotNull())
        )
        child = (
            f.groupBy("fk")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum("n").cast("bigint").alias("n_child_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_child_keys"),
                F.max("n").cast("bigint").alias("max_rows_per_key"),
            )
        )
        parent = (
            d.groupBy("pk")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_parent_keys"),
                F.max("n").cast("bigint").alias("max_dup_pk"),
            )
        )
        edge = child.crossJoin(F.broadcast(parent)).select(
            F.lit(f"{fact}.{fk}->{dim}.{pk}").alias("fk_edge"),
            "n_child_rows",
            "n_child_keys",
            "max_rows_per_key",
            "n_parent_keys",
            "max_dup_pk",
            F.expr(
                "CASE WHEN max_dup_pk = 1 AND max_rows_per_key = 1"
                " THEN 'one_to_one'"
                " WHEN max_dup_pk = 1 THEN 'many_to_one'"
                " ELSE 'many_to_many' END"
            ).alias("relationship"),
        )
        out = edge if out is None else out.unionByName(edge)
    return out


def _join_cardinality_sql() -> str:
    selects = []
    for fact, fk, dim, pk in _FK_EDGES:
        selects.append(
            f"""
            SELECT '{fact}.{fk}->{dim}.{pk}' AS fk_edge,
                   c.n_child_rows, c.n_child_keys, c.max_rows_per_key,
                   p.n_parent_keys, p.max_dup_pk,
                   CASE WHEN p.max_dup_pk = 1 AND c.max_rows_per_key = 1
                        THEN 'one_to_one'
                        WHEN p.max_dup_pk = 1 THEN 'many_to_one'
                        ELSE 'many_to_many' END AS relationship
            FROM (
                SELECT CAST(sum(n) AS BIGINT) AS n_child_rows,
                       CAST(count(*) AS BIGINT) AS n_child_keys,
                       CAST(max(n) AS BIGINT) AS max_rows_per_key
                FROM (SELECT {fk}, count(*) AS n FROM {fact}
                      WHERE {fk} IS NOT NULL GROUP BY 1)
            ) c
            CROSS JOIN (
                SELECT CAST(count(*) AS BIGINT) AS n_parent_keys,
                       CAST(max(n) AS BIGINT) AS max_dup_pk
                FROM (SELECT {pk}, count(*) AS n FROM {dim}
                      WHERE {pk} IS NOT NULL GROUP BY 1)
            ) p
            """
        )
    return " UNION ALL ".join(selects)


def orders_quality_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative quality suite over orders, evaluated by
    ``operators.validate.metric_suite`` in ONE aggregate pass: key
    completeness and uniqueness (permille-scaled integers, never float
    ratios), money bounds in exact cents, accepted status values, and
    an out-of-range date count. One scan + one map-side-combined
    aggregate no matter how many checks — the table-level complement
    to [[orders_validation]]'s row-level quarantine. A plan audit pins
    the single-scan property."""
    from ..operators.validate import (
        ORDERS_MERGEABLE_CHECKS,
        ORDERS_UNIQUENESS_CHECK,
        MetricCheck,
        metric_suite,
    )

    bounds = dict(
        (n, (lo, hi)) for n, lo, hi in [*ORDERS_MERGEABLE_CHECKS, ORDERS_UNIQUENESS_CHECK]
    )
    orders = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) * 100 AS BIGINT)"
    )
    checks = [
        MetricCheck(
            "completeness_custkey_permille",
            F.expr("(1000 * count(o_custkey)) div count(1)"),
            *bounds["completeness_custkey_permille"],
        ),
        MetricCheck(
            "uniqueness_orderkey_permille",
            F.expr("(1000 * count(DISTINCT o_orderkey)) div count(1)"),
            *bounds["uniqueness_orderkey_permille"],
        ),
        MetricCheck("min_totalprice_cents", F.min(cents), *bounds["min_totalprice_cents"]),
        MetricCheck("max_totalprice_cents", F.max(cents), *bounds["max_totalprice_cents"]),
        MetricCheck(
            "status_accepted_permille",
            F.expr(
                "(1000 * sum(CASE WHEN o_orderstatus IN ('O','F','P') "
                "THEN 1 ELSE 0 END)) div count(1)"
            ),
            *bounds["status_accepted_permille"],
        ),
        MetricCheck(
            "orderdate_out_of_range",
            F.sum(
                F.when(
                    (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                    | (F.col("o_orderdate") >= F.lit("2010-01-01").cast("timestamp")),
                    1,
                ).otherwise(0)
            ),
            *bounds["orderdate_out_of_range"],
        ),
    ]
    return metric_suite(orders, checks)


_QUALITY_SUITE_SQL = """
    WITH agg AS (
        SELECT CAST((1000 * count(o_custkey)) // count(*) AS BIGINT) AS m0,
               CAST((1000 * count(DISTINCT o_orderkey)) // count(*) AS BIGINT)
                   AS m1,
               CAST(min(CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2)
                             * 100 AS BIGINT)) AS BIGINT) AS m2,
               CAST(max(CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2)
                             * 100 AS BIGINT)) AS BIGINT) AS m3,
               CAST((1000 * sum(CASE WHEN o_orderstatus IN ('O','F','P')
                                     THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
                   AS m4,
               CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                               OR o_orderdate >= TIMESTAMP '2010-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS m5
        FROM orders
    ),"""


def _quality_rows_tail() -> str:
    from ..operators.validate import (
        ORDERS_MERGEABLE_CHECKS,
        ORDERS_UNIQUENESS_CHECK,
        checks_rows_sql,
    )

    by_name = dict(
        (n, (lo, hi)) for n, lo, hi in [*ORDERS_MERGEABLE_CHECKS, ORDERS_UNIQUENESS_CHECK]
    )
    order = [
        ("completeness_custkey_permille", "m0"),
        ("uniqueness_orderkey_permille", "m1"),
        ("min_totalprice_cents", "m2"),
        ("max_totalprice_cents", "m3"),
        ("status_accepted_permille", "m4"),
        ("orderdate_out_of_range", "m5"),
    ]
    return checks_rows_sql([(n, col, *by_name[n]) for n, col in order])


_QUALITY_SUITE_SQL = _QUALITY_SUITE_SQL + _quality_rows_tail()


# ---------------------------------------------------------------------------
# functional-dependency discovery audit (profiling: does lhs -> rhs hold?)
# ---------------------------------------------------------------------------

#: Candidate FDs to probe: (table, lhs column, rhs column). Mix of
#: expected-to-hold (near-key lhs) and expected-to-fail — the audit
#: REPORTS, it does not assume.
_FD_CANDIDATES = (
    ("part", "p_name", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_name", "c_nationkey"),
    ("customer", "c_mktsegment", "c_nationkey"),
    ("nation", "n_name", "n_regionkey"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_returnflag"),
)


def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs —
    the schema-profiling step (Hyfd/Tane-style, restricted to a curated
    candidate list) that catches silently-denormalized columns before a
    dedup or SCD2 keyed on the wrong grain corrupts history: lhs → rhs
    holds iff no lhs group sees >1 distinct rhs.

    One hash aggregate per candidate — groupBy(lhs) with countDistinct
    (rhs) partial-aggregates map-side, then a one-row rollup per
    candidate; the union is |candidates| independent narrow jobs, each
    scanning only its two columns (column pruning visible in
    ReadSchema). No candidate-pair explosion: discovery over ALL column
    pairs is quadratic in width, which is why production profilers run
    a curated/lattice-pruned list — the operator shape is identical.
    """
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        g = (
            load_table(spark, sf_dir, table)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("n_rhs"))
            .agg(
                F.lit(table).alias("table_name"),
                F.lit(lhs).alias("lhs_col"),
                F.lit(rhs).alias("rhs_col"),
                F.count(F.lit(1)).alias("n_groups"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0)).alias(
                    "violating_groups"
                ),
                F.max("n_rhs").alias("max_distinct_rhs"),
            )
            .withColumn(
                "violation_permille",
                F.expr("(1000 * violating_groups) div n_groups"),
            )
            .withColumn("holds", F.col("violating_groups") == 0)
        )
        out = g if out is None else out.unionByName(g)
    return out


def _fd_audit_sql() -> str:
    legs = []
    for table, lhs, rhs in _FD_CANDIDATES:
        legs.append(
            f"""
    SELECT '{table}' AS table_name, '{lhs}' AS lhs_col, '{rhs}' AS rhs_col,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (n_rhs > 1) AS BIGINT) AS violating_groups,
           CAST(max(n_rhs) AS BIGINT) AS max_distinct_rhs,
           (1000 * count(*) FILTER (n_rhs > 1)) // count(*)
               AS violation_permille,
           count(*) FILTER (n_rhs > 1) = 0 AS holds
    FROM (
        SELECT {lhs}, count(DISTINCT {rhs}) AS n_rhs
        FROM {table} GROUP BY {lhs}
    )"""
        )
    return "\n    UNION ALL".join(legs)


_T_CLOSE_PERMILLE = 250  # EMD threshold: class dist > 0.25 from global


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third leg of the privacy triad ([[k_anonymity_audit]],
    [[l_diversity_audit]]): l-diversity is defeated by SKEW — a class
    can hold l distinct sensitive values yet still leak if its
    distribution differs sharply from the table's (a class that is 95%
    'high balance' tells an attacker plenty even with 2 distinct
    bands). t-CLOSENESS requires each class's sensitive distribution
    to sit within distance t of the global one; for an ORDERED
    sensitive attribute the distance is the Earth Mover's Distance,
    which for m equally-spaced ordered bins is
    EMD = Σᵢ |CumP(i) − CumQ(i)| / (m−1) (Li, Li & Venkatasubramanian,
    ICDE'07). Quasi-identifiers: (nation, market segment); sensitive:
    the $1000 account-balance band.

    Integer-exact: per-band cumulative counts cross-multiply instead
    of dividing — |cum_class·N − cum_global·n_class| in DECIMAL(38,0)
    (the product reaches n_class·N, past int64 at scale), summed, then
    t_permille = 1000·Σ div ((m−1)·n_class·N). Every class walks the
    SAME dense band grid (classes × global band dim, absent bands
    count 0), so the cumulative sums align band-for-band.

    Scale: one hash agg to (class, band) grain, a dense-grid cross
    join against the tiny band dimension, a PARTITIONED cumulative
    window (by class — never a global window; the global cumulative
    lives on the m-row band dim via a triangular join, the
    ``_prefix_offsets`` idiom), one per-class re-agg. Output is one
    row per class — bounded by the QI-grid cardinality, not the table.
    """
    from pyspark.sql.window import Window as W

    customers = load_table(spark, sf_dir, "customer")
    base = customers.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    cell = base.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    bands = cell.select("band").distinct()
    classes = cell.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("n_class")
    )
    # Global per-band counts and their cumulative — triangular join on
    # the m-row band dim, no single-partition window.
    g = cell.groupBy("band").agg(F.sum("cnt").cast("bigint").alias("gcnt"))
    gcum = (
        bands.alias("x")
        .join(g.alias("y"), F.col("y.band") <= F.col("x.band"))
        .groupBy(F.col("x.band").alias("band"))
        .agg(F.sum("gcnt").cast("bigint").alias("cum_g"))
    )
    scalars = cell.agg(
        F.sum("cnt").cast("bigint").alias("n_total"),
        F.countDistinct("band").cast("bigint").alias("m_bands"),
    )
    grid = (
        classes.crossJoin(bands)
        .join(cell, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_class",
            "band",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
    )
    w = W.partitionBy("c_nationkey", "c_mktsegment").orderBy("band").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = grid.withColumn("cum_c", F.sum("cnt").over(w))
    scored = (
        cum.join(F.broadcast(gcum), "band")
        .crossJoin(F.broadcast(scalars))
        .groupBy("c_nationkey", "c_mktsegment", "n_class", "n_total", "m_bands")
        .agg(
            F.sum(
                F.expr(
                    "abs(CAST(cum_c AS DECIMAL(38,0)) * n_total"
                    " - CAST(cum_g AS DECIMAL(38,0)) * n_class)"
                )
            ).alias("sdiff")
        )
    )
    return scored.select(
        "c_nationkey",
        "c_mktsegment",
        "n_class",
        F.expr(
            "CAST(1000 * sdiff div ((m_bands - 1)"
            " * CAST(n_class AS DECIMAL(38,0)) * n_total) AS BIGINT)"
        ).alias("t_permille"),
    ).withColumn("at_risk", F.col("t_permille") >= _T_CLOSE_PERMILLE)


_T_CLOSE_SQL = f"""
    WITH base AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
        FROM customer
    ),
    cell AS (
        SELECT c_nationkey, c_mktsegment, band,
               CAST(count(*) AS BIGINT) AS cnt
        FROM base GROUP BY ALL
    ),
    bands AS (SELECT DISTINCT band FROM cell),
    classes AS (
        SELECT c_nationkey, c_mktsegment, CAST(sum(cnt) AS BIGINT) AS n_class
        FROM cell GROUP BY 1, 2
    ),
    g AS (SELECT band, CAST(sum(cnt) AS BIGINT) AS gcnt FROM cell GROUP BY 1),
    gcum AS (
        SELECT x.band, CAST(sum(y.gcnt) AS BIGINT) AS cum_g
        FROM bands x JOIN g y ON y.band <= x.band
        GROUP BY x.band
    ),
    scalars AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
               CAST(count(DISTINCT band) AS BIGINT) AS m_bands
        FROM cell
    ),
    grid AS (
        SELECT c.c_nationkey, c.c_mktsegment, c.n_class, b.band,
               coalesce(cl.cnt, 0) AS cnt
        FROM classes c
        CROSS JOIN bands b
        LEFT JOIN cell cl ON cl.c_nationkey = c.c_nationkey
                         AND cl.c_mktsegment = c.c_mktsegment
                         AND cl.band = b.band
    ),
    cum AS (
        SELECT *, sum(cnt) OVER (
            PARTITION BY c_nationkey, c_mktsegment ORDER BY band
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
        FROM grid
    ),
    scored AS (
        SELECT c_nationkey, c_mktsegment, n_class, n_total, m_bands,
               sum(abs(CAST(cum_c AS HUGEINT) * n_total
                       - CAST(cum_g AS HUGEINT) * n_class)) AS sdiff
        FROM cum JOIN gcum USING (band) CROSS JOIN scalars
        GROUP BY 1, 2, 3, 4, 5
    )
    SELECT c_nationkey, c_mktsegment, n_class,
           CAST(1000 * sdiff // ((m_bands - 1)
                * CAST(n_class AS HUGEINT) * n_total) AS BIGINT)
               AS t_permille,
           CAST(1000 * sdiff // ((m_bands - 1)
                * CAST(n_class AS HUGEINT) * n_total) AS BIGINT)
               >= {_T_CLOSE_PERMILLE} AS at_risk
    FROM scored
"""


# ---------------------------------------------------------------------------
# differential-privacy release mechanics (Laplace mechanism, seeded demo)
# ---------------------------------------------------------------------------

_DP_B = 2.0  # Laplace scale b = sensitivity/epsilon = 1/0.5
_DP_U_SPAN = 2001  # uniform grid: u_int in [-1000, 1000], u = u_int/2001


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIAL-PRIVACY release mechanics — per-nation customer
    counts through the LAPLACE MECHANISM (sensitivity-1 count, ε = 0.5,
    b = 1/ε = 2): noisy = n + Lap(b), drawn via the inverse CDF
    x = −b·sgn(u)·ln(1 − 2|u|). The uniform draw here is a
    DETERMINISTIC hash of the group key (the sha256 ascii-fold the
    quality classifier uses) — that is a demo seam, NOT privacy (a real
    release draws fresh randomness per publication; swap the fold for a
    CSPRNG and nothing else changes — the [[media_decode_features]]
    stub discipline). What IS real and oracle-verified: the sensitivity
    arithmetic, the inverse-CDF transform through the engine-PORTABLE
    ln (bit-identical noise on both engines by construction), and the
    one-group-one-draw shape.

    Scale shape: one groupBy on the release grain + a broadcast dim
    join; the noise projection is a narrow codegen map — DP release
    cost is the aggregation, noise is free. Completes the governance
    family ([[k_anonymity_audit]] / l-diversity / t-closeness measure
    re-identification risk; this is the other standard mitigation)."""
    from ..functions import LN_Z_SQL, ln_from_kz_sql, ln_k_sql, ln_m_sql

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    counts = (
        customer.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    h = F.sha2(F.col("n_name"), 256)
    fold = sum(
        (F.ascii(F.substring(h, i, 1)) * F.lit(i)) for i in range(1, 17)
    )
    arg = (
        f"(CAST({_DP_U_SPAN} - 2 * abs(u_int) AS DOUBLE)"
        f" / {_DP_U_SPAN}.0e0)"
    )
    noisy = (
        f"CAST(n AS DOUBLE) + (-{_DP_B}e0) * CAST(sign(u_int) AS DOUBLE)"
        f" * ({ln_from_kz_sql('__ln_k', '__ln_z')})"
    )
    return (
        counts.withColumn(
            "u_int", (fold % F.lit(_DP_U_SPAN)) - F.lit(1000)
        )
        .withColumn("__ln_k", F.expr(ln_k_sql(arg)))
        .withColumn("__ln_m", F.expr(ln_m_sql(arg, "__ln_k")))
        .withColumn("__ln_z", F.expr(LN_Z_SQL))
        .select(
            F.col("n_name").alias("nation"),
            F.expr(f"CAST(floor(({noisy}) * 1000.0e0) AS BIGINT)").alias(
                "noisy_count_milli"
            ),
            F.lit(500).cast("bigint").alias("epsilon_milli"),
        )
        .orderBy("nation")
    )


def _dp_sql() -> str:
    from ..functions import LN_Z_SQL, ln_from_kz_sql, ln_k_sql, ln_m_sql

    fold = " + ".join(
        f"ascii(substr(h, {i}, 1)) * {i}" for i in range(1, 17)
    )
    arg = (
        f"(CAST({_DP_U_SPAN} - 2 * abs(u_int) AS DOUBLE)"
        f" / {_DP_U_SPAN}.0e0)"
    )
    noisy = (
        f"CAST(n AS DOUBLE) + (-{_DP_B}e0) * CAST(sign(u_int) AS DOUBLE)"
        f" * ({ln_from_kz_sql('__ln_k', '__ln_z')})"
    )
    return f"""
    WITH counts AS (
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS n
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    seeded AS (
        SELECT n_name, n,
               (({fold}) % {_DP_U_SPAN}) - 1000 AS u_int
        FROM (SELECT n_name, n, sha256(n_name) AS h FROM counts)
    ),
    s1 AS (SELECT *, {ln_k_sql(arg)} AS __ln_k FROM seeded),
    s2 AS (SELECT *, {ln_m_sql(arg, "__ln_k")} AS __ln_m FROM s1),
    s3 AS (SELECT *, {LN_Z_SQL} AS __ln_z FROM s2)
    SELECT n_name AS nation,
           CAST(floor(({noisy}) * 1000.0e0) AS BIGINT) AS noisy_count_milli,
           CAST(500 AS BIGINT) AS epsilon_milli
    FROM s3
    ORDER BY nation
"""


QUERIES = {
    "dp_noisy_counts": dp_noisy_counts,
    "star_projection": star_projection,
    "table_profile": table_profile,
    "k_anonymity_audit": k_anonymity_audit,
    "l_diversity_audit": l_diversity_audit,
    "t_closeness_audit": t_closeness_audit,
    "referential_integrity_audit": referential_integrity_audit,
    "functional_dependency_audit": functional_dependency_audit,
    "join_cardinality_audit": join_cardinality_audit,
    "customer_masked_export": customer_masked_export,
    "key_completeness_audit": key_completeness_audit,
    "orders_validation": orders_validation,
    "orders_quality_suite": orders_quality_suite,
    "drop_and_cast": drop_and_cast,
    "filter_sql_string": filter_sql_string,
    "filter_column_expr": filter_column_expr,
    "null_test_classify": null_test_classify,
    "distinct_keys": distinct_keys,
    "global_watermark": global_watermark,
    "hash_diff_rows": hash_diff_rows,
    "scd2_classify": scd2_classify,
    "customers_without_urgent_orders": customers_without_urgent_orders,
    "top_spenders": top_spenders,
}

ORACLES = {
    "dp_noisy_counts": _dp_sql(),
    "star_projection": _STAR_SQL,
    "table_profile": _profile_sql(),
    "k_anonymity_audit": _K_ANON_SQL,
    "l_diversity_audit": _L_DIVERSITY_SQL,
    "t_closeness_audit": _T_CLOSE_SQL,
    "referential_integrity_audit": _ri_audit_sql(),
    "functional_dependency_audit": _fd_audit_sql(),
    "join_cardinality_audit": _join_cardinality_sql(),
    "customer_masked_export": _MASKED_SQL,
    "key_completeness_audit": _COMPLETENESS_SQL,
    "orders_validation": _VALIDATION_SQL,
    "orders_quality_suite": _QUALITY_SUITE_SQL,
    "drop_and_cast": _DROP_CAST_SQL,
    "filter_sql_string": _FILTER_SQL_SQL,
    "filter_column_expr": _FILTER_COL_SQL,
    "null_test_classify": _NULL_TEST_SQL,
    "distinct_keys": _DISTINCT_SQL,
    "global_watermark": _WATERMARK_SQL,
    "hash_diff_rows": _HASH_SQL,
    "scd2_classify": _SCD2_CLASSIFY_SQL,
    "customers_without_urgent_orders": _EXCEPT_SQL,
    "top_spenders": _TOP_SQL,
}
