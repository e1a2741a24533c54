"""End-to-end check of the PySpark binding against the driver's DuckDB
oracles — the Python replica of the fuzzy/theta/ineq/mem gate queries.

Run:  python3 python/test_graft.py [sfDir]
Needs the compiled graft classes on the driver classpath (handled
below) and driver-side pyspark + duckdb.
"""
import sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .appName("graft-pytest")
         .config("spark.driver.extraClassPath", "target/scala-2.13/classes")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "python")
from graft import (fuzzy_join, theta_join, ineq_join, as_of_join,
                   estimate_mem_cost_cartesian_mib)

import duckdb
con = duckdb.connect()
for t in ["customer", "supplier", "part", "events"]:
    con.sql(f"CREATE VIEW {t} AS FROM '{sf}/{t}.parquet'")


def check(name, got_df, oracle_sql):
    got = got_df.toPandas()
    want = con.sql(oracle_sql).df()
    g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
    w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
    assert sorted(got.columns) == sorted(want.columns), \
        f"{name}: cols {sorted(got.columns)} vs {sorted(want.columns)}"
    assert g == w, f"{name}: {len(g)} vs {len(w)} rows or value mismatch"
    print(f"PASS {name} ({len(g)} rows)")


cust = spark.read.parquet(f"{sf}/customer.parquet")
supp = spark.read.parquet(f"{sf}/supplier.parquet")
part = spark.read.parquet(f"{sf}/part.parquet")

# fuzzy_join_acctbal via Python — the driver gate's oracle verbatim
check(
    "fuzzy_join_acctbal(py)",
    fuzzy_join(cust, supp, left_on="c_acctbal", right_on="s_acctbal",
               tol=5.0).select("c_custkey", "c_acctbal", "s_suppkey", "s_acctbal"),
    """SELECT c_custkey, c_acctbal, s_suppkey, s_acctbal
       FROM customer JOIN supplier ON abs(c_acctbal - s_acctbal) <= 5.0""")

# the reference's DEFAULT tolerance (tol omitted -> 1e-3,
# pandance/pandance.py:24) — constructed rows so matches exist
ldf = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["lid", "v"])
rdf = spark.createDataFrame([(10, 1.0005), (20, 2.01)], ["rid", "w"])
got = sorted(map(tuple, fuzzy_join(ldf, rdf, left_on="v", right_on="w")
                 .select("lid", "rid").toPandas().values.tolist()))
assert got == [(1, 10)], f"default tol must be 1e-3, matched {got}"
print("PASS fuzzy_join_default_tol(py) (1 row)")

# ineq_join_acctbal via Python
check(
    "ineq_join_acctbal(py)",
    ineq_join(cust, supp, ">=", left_on="c_acctbal", right_on="s_acctbal")
    .select("c_custkey", "s_suppkey"),
    """SELECT c_custkey, s_suppkey
       FROM customer JOIN supplier ON c_acctbal >= s_acctbal""")

# theta_join_mod via Python (Column-expression condition)
check(
    "theta_join_mod(py)",
    theta_join(part, supp, lambda x, y: x % 32 == y % 32,
               left_on="p_partkey", right_on="s_suppkey")
    .select("p_partkey", "s_suppkey"),
    """SELECT p_partkey, s_suppkey
       FROM part JOIN supplier ON p_partkey % 32 = s_suppkey % 32""")

# fuzzy time join via Python (timedelta tolerance -> time path)
import datetime
ev = spark.read.parquet(f"{sf}/events.parquet")
clicks = ev.filter(ev.event_type == "click").select(
    ev.event_id.alias("click_id"), ev.ts.alias("click_ts"))
views = ev.filter(ev.event_type == "view").select(
    ev.event_id.alias("view_id"), ev.ts.alias("view_ts"))
check(
    "fuzzy_join_ts(py)",
    fuzzy_join(clicks, views, left_on="click_ts", right_on="view_ts",
               tol=datetime.timedelta(seconds=180))
    .select("click_id", "view_id"),
    """SELECT c.event_id AS click_id, v.event_id AS view_id
       FROM events c JOIN events v
         ON c.event_type = 'click' AND v.event_type = 'view'
        AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= 180000000""")

# as_of_join via Python (engine extension): every click takes its
# nearest view within 3 minutes
got = as_of_join(clicks, views, datetime.timedelta(seconds=180), "view_id",
                 left_on="click_ts", right_on="view_ts").toPandas()
want = con.sql("""
    SELECT click_id, view_id FROM (
      SELECT c.event_id AS click_id, v.event_id AS view_id,
             row_number() OVER (PARTITION BY c.event_id
               ORDER BY abs(epoch_us(c.ts) - epoch_us(v.ts)),
                        epoch_us(v.ts), v.event_id) AS rn
      FROM events c JOIN events v
        ON c.event_type = 'click' AND v.event_type = 'view'
       AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= 180000000)
    WHERE rn = 1""").df()
g = sorted(map(tuple, got[["click_id", "view_id"]].astype(str).values.tolist()))
w = sorted(map(tuple, want[["click_id", "view_id"]].astype(str).values.tolist()))
assert g == w, f"as_of_join(py): {len(g)} vs {len(w)}"
print(f"PASS as_of_join(py) ({len(g)} rows)")

# mem estimate parity: integer MiB of the would-be Cartesian result
est = estimate_mem_cost_cartesian_mib(cust, "c_acctbal", supp, "s_acctbal")
assert est >= 0
print(f"PASS estimate_mem_cost_cartesian_mib(py) = {est} MiB")

print("ALL PYTHON BINDING CHECKS PASS")
spark.stop()
