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

# ---- pipeline flagships through Python, against the same oracle style ----
# re-open a session context (the file above stopped it)
spark = (SparkSession.builder.master("local[8]")
         .appName("graft-pytest2")
         .config("spark.driver.extraClassPath", "target/scala-2.13/classes")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from graft import (dedup_exact, dedup_pairs_ngram_jaccard,
                   connected_components, ann_topk_brute, bm25_topk,
                   decontaminate, chunk_by_tokens, pack_greedy, dsir_score,
                   sem_dedup, dedup_pairs_minhash_lsh, dedup_pairs_simhash)

docs = spark.read.parquet(f"{sf}/documents.parquet")

# dedup_exact == DuckDB min-id-per-text
got = dedup_exact(docs.select("doc_id", "text"), "text", "doc_id").toPandas()
want = con.sql(f"""SELECT min(doc_id) AS doc_id, text
                   FROM '{sf}/documents.parquet' GROUP BY text""").df()
assert sorted(got["doc_id"]) == sorted(want["doc_id"]), "dedup_exact(py)"
print(f"PASS dedup_exact(py) ({len(got)} rows)")

# ngram jaccard pairs == DuckDB shingle replay (threshold 0.6, n=3)
got = dedup_pairs_ngram_jaccard(docs, "doc_id", "text", n=3,
                                threshold=0.6).toPandas()
want = con.sql(f"""
  WITH tokp AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
    FROM '{sf}/documents.parquet'),
  sh AS (
    SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
    FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
  cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
  inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
    FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY 1, 2)
  SELECT doc_a, doc_b FROM inter
  JOIN cnt ca ON ca.doc_id = doc_a JOIN cnt cb ON cb.doc_id = doc_b
  WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.6""").df()
g = sorted(map(tuple, got[["doc_a", "doc_b"]].values.tolist()))
w = sorted(map(tuple, want[["doc_a", "doc_b"]].values.tolist()))
assert g == w, f"ngram_jaccard(py): {len(g)} vs {len(w)}"
print(f"PASS dedup_pairs_ngram_jaccard(py) ({len(g)} pairs)")

# LSH banding finds the same >=0.8 pairs as the exact join (identity claim)
g_lsh = sorted(map(tuple, dedup_pairs_minhash_lsh(
    docs, "doc_id", "text", threshold=0.8)
    .select("doc_a", "doc_b").toPandas().values.tolist()))
g_exact = sorted(map(tuple, dedup_pairs_ngram_jaccard(
    docs, "doc_id", "text", threshold=0.8)
    .select("doc_a", "doc_b").toPandas().values.tolist()))
assert g_lsh == g_exact, "minhash_lsh(py) != exact pairs"
print(f"PASS dedup_pairs_minhash_lsh(py) ({len(g_lsh)} pairs)")

# simhash: hand-checked radius-0 self-pairs on duplicated texts
dup = spark.createDataFrame(
    [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
     (3, "completely different words here")], ["doc_id", "text"])
g = sorted(map(tuple, dedup_pairs_simhash(dup, "doc_id", "text", 0)
               .select("doc_a", "doc_b").toPandas().values.tolist()))
assert g == [(1, 2)], f"simhash(py): {g}"
print("PASS dedup_pairs_simhash(py)")

# connected components: chain 1-2-3 plus isolated pair
pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["a", "b"])
g = dict(connected_components(pairs, "a", "b").toPandas().values.tolist())
assert g == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}, f"cc(py): {g}"
# and the durable-checkpoint path agrees (forced distributed)
import tempfile
g2 = dict(connected_components(pairs, "a", "b", local_threshold=0,
                               checkpoint_dir=tempfile.mkdtemp())
          .toPandas().values.tolist())
assert g2 == g, f"cc reliable(py): {g2}"
print("PASS connected_components(py) (+ durable checkpoint)")

# bm25 == DuckDB grid replay? identity with known constants is enough
# for the binding layer — assert top-1 contains every query term
top = bm25_topk(docs, "doc_id", "text", ["vector", "stream", "spark"],
                k=5).toPandas()
assert len(top) == 5 and top["score"].is_monotonic_decreasing
print(f"PASS bm25_topk(py) (top-5, scores {top['score'].iloc[0]:.3f}..)")

# brute-force ANN: a planted exact twin (id + 10000) must be top-1
# (the operator excludes self-matches, so the twin is the argmax)
emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
    "vec_id", "embedding")
qs = emb.filter(emb.vec_id < 5)
twin = qs.selectExpr("vec_id + 10000 AS vec_id", "embedding")
nn = ann_topk_brute(qs, emb.unionByName(twin), "vec_id", "embedding",
                    1).toPandas()
assert sorted(nn["query_id"] + 10000) == sorted(nn["neighbor_id"]), nn
print("PASS ann_topk_brute(py) (planted twin top-1)")

# decontaminate == DuckDB 3-gram overlap (same shape as the Scala gate)
got = decontaminate(docs.filter(docs.doc_id % 5 != 0),
                    docs.filter(docs.doc_id % 5 == 0),
                    "doc_id", "text", n=3).toPandas()
want = con.sql(f"""
  WITH tokp AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
    FROM '{sf}/documents.parquet'),
  sh AS (
    SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
    FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
  ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 5 = 0),
  tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 5 <> 0),
  agg AS (SELECT tr.doc_id, count(*) AS n_shingles,
                 count(ev.shingle) AS n_shared
          FROM tr LEFT JOIN ev ON ev.shingle = tr.shingle GROUP BY 1)
  SELECT doc_id, n_shared, n_shingles
  FROM agg WHERE n_shared > 0""").df()
g = sorted(map(tuple, got[["doc_id", "n_shared", "n_shingles"]]
               .astype(str).values.tolist()))
w = sorted(map(tuple, want.astype(str).values.tolist()))
assert g == w, f"decontaminate(py): {len(g)} vs {len(w)}"
print(f"PASS decontaminate(py) ({len(g)} flagged)")

# chunking: token coverage identity on a constructed doc
cdf = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(10)))],
                            ["doc_id", "text"])
ch = chunk_by_tokens(cdf, "doc_id", "text", 4, overlap=1).toPandas()
assert list(ch["n_tokens"]) == [4, 4, 4] and ch["text"].iloc[0] == "t0 t1 t2 t3"
print("PASS chunk_by_tokens(py)")

# packing: greedy fill per chunk
pdf = spark.createDataFrame([(i, 60) for i in range(4)],
                            ["doc_id", "n_tokens"])
pk = pack_greedy(pdf, "doc_id", "n_tokens", 128, "0").toPandas()
assert sorted(pk["bin"]) == [0, 0, 1, 1], f"pack(py): {pk}"
print("PASS pack_greedy(py)")

# dsir: scores exist for every raw doc and are higher for target-like text
ds = dsir_score(docs, "doc_id", "text",
                docs.filter(docs.lang == "en"), "text").toPandas()
assert len(ds) == docs.count()
print(f"PASS dsir_score(py) ({len(ds)} rows)")

# semdedup: planted twins — exactly one of each pair pruned
import random
random.seed(7)
rows = []
for i in range(30):
    c = i % 3
    base = [1.0 if d == c else 0.0 for d in range(3)]
    if i < 6:
        v = [x + (i // 3) * 1e-4 for x in base]
    else:
        v = [x + random.gauss(0, 0.15) for x in base]
    rows.append((i, v))
sdf = spark.createDataFrame(rows, ["id", "emb"])
sd = sem_dedup(sdf, "id", "emb", k=3, threshold=0.999999).toPandas()
removed = set(sd[~sd["kept"]]["id"])
assert len(removed) == 3 and all((i in removed) ^ (i + 3 in removed)
                                 for i in range(3)), f"semdedup(py): {removed}"
print("PASS sem_dedup(py)")

print("ALL PIPELINE BINDING CHECKS PASS")
spark.stop()

# ---- persisted-index lifecycle through Python ----
spark = (SparkSession.builder.master("local[8]")
         .appName("graft-pytest3")
         .config("spark.driver.extraClassPath", "target/scala-2.13/classes")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from graft import (build_bm25_index, append_to_bm25_index,
                   delete_from_bm25_index, bm25_search_index, bm25_topk,
                   build_ivf_index, search_ivf, ann_topk_brute,
                   build_eval_index, delete_from_eval_index,
                   decontaminate_gate_from_index,
                   current_index_version, pin_index)
import tempfile

docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")

# BM25: build 2/3 + append 1/3 == inline scan over the whole corpus
idx = tempfile.mkdtemp(prefix="graft_py_bm25_")
build_bm25_index(docs.filter(docs.doc_id % 3 != 2), "doc_id", "text", idx)
append_to_bm25_index(docs.filter(docs.doc_id % 3 == 2), "doc_id", "text", idx)
served = bm25_search_index(spark, idx, ["vector", "stream", "spark"],
                           k=20).toPandas()
inline = bm25_topk(docs, "doc_id", "text", ["vector", "stream", "spark"],
                   k=20).toPandas()
assert served[["doc_id", "score"]].astype(str).values.tolist() == \
    inline[["doc_id", "score"]].astype(str).values.tolist()
print(f"PASS bm25 index build+append+search(py) (top-{len(served)})")

# time travel: pin the pre-delete version, delete, pinned serve unchanged
v = current_index_version(spark, idx)
pinned = pin_index(idx, v)
delete_from_bm25_index(docs.filter(docs.doc_id % 7 == 0).select("doc_id"),
                       "doc_id", idx)
after = bm25_search_index(spark, idx, ["vector", "stream", "spark"],
                          k=20).toPandas()
assert any(after["doc_id"] % 7 == 0) is False
via_pin = bm25_search_index(spark, pinned, ["vector", "stream", "spark"],
                            k=20).toPandas()
assert via_pin[["doc_id", "score"]].astype(str).values.tolist() == \
    served[["doc_id", "score"]].astype(str).values.tolist()
print("PASS bm25 delete + pinned time travel(py)")

# IVF: exhaustive probes == exact brute force (recall 1.0 by construction)
emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
    "vec_id", "embedding")
ividx = tempfile.mkdtemp(prefix="graft_py_ivf_")
build_ivf_index(emb, "vec_id", "embedding", ividx, n_centroids=8)
qs = emb.filter(emb.vec_id < 10)
approx = search_ivf(qs, ividx, "vec_id", "embedding", k=3,
                    n_probe=8).toPandas()
exact = ann_topk_brute(qs, emb, "vec_id", "embedding", 3).toPandas()
key = lambda d: sorted(map(tuple, d[["query_id", "neighbor_id"]]
                           .values.tolist()))
assert key(approx) == key(exact), "exhaustive IVF must equal brute force"
print("PASS ivf index build+search(py) (exhaustive == exact)")

# eval index: build both benchmarks, withdraw one, gate matches survivor
evA = spark.createDataFrame(
    [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"])
evB = spark.createDataFrame(
    [(101, "pack my box with five dozen liquor jugs")], ["doc_id", "text"])
corpus = spark.createDataFrame([
    (1, "completely unrelated words in this training document here"),
    (2, "someone wrote the quick brown fox jumps right into the corpus"),
    (4, "pack my box with five dozen liquor jugs and more text")],
    ["doc_id", "text"])
evidx = tempfile.mkdtemp(prefix="graft_py_eval_")
build_eval_index(evA.union(evB), "text", evidx, n=3)
keeps = set(decontaminate_gate_from_index(corpus, "doc_id", "text", evidx)
            .toPandas()["doc_id"])
assert keeps == {1}, keeps
delete_from_eval_index(evB, "text", evidx)
keeps = set(decontaminate_gate_from_index(corpus, "doc_id", "text", evidx)
            .toPandas()["doc_id"])
assert keeps == {1, 4}, keeps
print("PASS eval index build+takedown+gate(py)")

print("ALL INDEX LIFECYCLE CHECKS PASS")
spark.stop()
