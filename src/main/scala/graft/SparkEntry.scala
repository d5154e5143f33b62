package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  *
  * Every entry in [[queries]] is an operator from the inventory expressed
  * through the graft library; entries with a matching [[oracleSql]] are
  * hash-checked against DuckDB at sf0.01 by the driver. Column names are
  * aliased identically on both sides (the driver sorts columns by name).
  */
object SparkEntry {

  /** Flagship on sf0.001: filter + three-hop broadcast join + aggregation +
    * order — revenue per region/market-segment over the full star schema.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    def t(n: String) = Tables.load(spark, dir, n)
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        countDistinct(col("o_orderkey")).as("order_cnt"))
      .orderBy(col("r_name"), col("c_mktsegment"))
  }

  // ---- query core (SURVEY §2 #4-#11, #18) --------------------------------

  private def core: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Note: lineitem's composite key is non-unique in the synthetic data, so
    // row-ordered pages use tables with unique keys; lineitem is covered by
    // aggregate and join queries (order-insensitive result sets).
    "q_filter_eq" -> ((s, dir) =>
      Tables.catalog(s, dir).from("orders")
        .where("o_orderstatus", Eq, "F")
        .orderBy("o_orderkey").pageSize(200)
        .execDf()
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")),
    "q_filter_startswith" -> ((s, dir) =>
      Tables.catalog(s, dir).from("part")
        .where("p_name", StartsWith, "small")
        .orderBy("p_partkey").pageSize(100)
        .execDf()
        .select("p_partkey", "p_name", "p_brand")),
    "q_filter_in" -> ((s, dir) =>
      Tables.catalog(s, dir).from("orders")
        .where("o_orderpriority", In, Seq("1-URGENT", "2-HIGH"))
        .orderBy("o_orderkey").pageSize(200)
        .execDf()
        .select("o_orderkey", "o_custkey", "o_orderpriority")),
    "q_filter_and" -> ((s, dir) =>
      Tables.catalog(s, dir).from("orders")
        .where("o_orderstatus", Eq, "F")
        .where("o_orderpriority", Eq, "1-URGENT")
        .pageSize(100)
        .execDf()
        .select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")),
    "q_orderby_asc" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer")
        .orderBy("c_acctbal", "asc").pageSize(50)
        .execDf()
        .select("c_custkey", "c_name", "c_acctbal")),
    "q_orderby_desc" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer")
        .orderBy("c_acctbal", "desc").pageSize(50)
        .execDf()
        .select("c_custkey", "c_name", "c_acctbal")),
    "q_find" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer").find("421")),
    "q_peek" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer")
        .orderBy("c_name").pageSize(50)
        .peek())
  )

  private def coreOracle: Map[String, String] = Map(
    "q_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey LIMIT 200""",
    "q_filter_startswith" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE p_name LIKE 'small%' ORDER BY p_partkey LIMIT 100""",
    "q_filter_in" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
         WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') ORDER BY o_orderkey LIMIT 200""",
    "q_filter_and" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
         FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
         ORDER BY o_orderkey LIMIT 100""",
    "q_orderby_asc" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_acctbal ASC, c_custkey ASC LIMIT 50""",
    "q_orderby_desc" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         ORDER BY c_acctbal DESC, c_custkey DESC LIMIT 50""",
    "q_find" ->
      """SELECT * FROM customer WHERE c_custkey = 421""",
    "q_peek" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS slug, c_name FROM customer
         ORDER BY c_name, c_custkey LIMIT 50"""
  )

  // ---- keyset cursor pagination (SURVEY §2 #10, #21) ---------------------

  private val pageCursor = Cursor.encode(Cursor("c_name", "Customer#000000299", "299"))

  private def pagination: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_page_first" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer")
        .orderBy("c_name").pageSize(20)
        .execDf().select("c_custkey", "c_name")),
    "q_page_after" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer")
        .orderBy("c_name").pageSize(20)
        .cursor(pageCursor, "after")
        .execDf().select("c_custkey", "c_name")),
    "q_page_before" -> ((s, dir) =>
      Tables.catalog(s, dir).from("customer")
        .orderBy("c_name").pageSize(20)
        .cursor(pageCursor, "before")
        .execDf().select("c_custkey", "c_name"))
  )

  private def paginationOracle: Map[String, String] = Map(
    "q_page_first" ->
      """SELECT c_custkey, c_name FROM customer ORDER BY c_name, c_custkey LIMIT 20""",
    "q_page_after" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_name > 'Customer#000000299' OR (c_name = 'Customer#000000299' AND c_custkey > 299)
         ORDER BY c_name, c_custkey LIMIT 20""",
    "q_page_before" ->
      """SELECT * FROM (
           SELECT c_custkey, c_name FROM customer
           WHERE c_name < 'Customer#000000299' OR (c_name = 'Customer#000000299' AND c_custkey < 299)
           ORDER BY c_name DESC, c_custkey DESC LIMIT 20
         ) ORDER BY c_name, c_custkey"""
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    core ++ pagination

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    coreOracle ++ paginationOracle
}
