"""Pytest suite for the PySpark binding — every test checks the Python
result against an inline DuckDB oracle (the driver gate's compare:
column-name-sorted, string-rendered, row-sorted).

Run:  pytest python/test_graft.py        (sf dir via GRAFT_SF_DIR)
Needs the compiled graft classes on the driver classpath (the session
fixture points at target/scala-2.13/classes relative to the repo root)
and driver-side pyspark + duckdb + pandas.
"""
import datetime
import os
import random
import sys
import tempfile

import pytest

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.environ.get(
    "GRAFT_CLASSPATH", os.path.join(REPO, "target", "scala-2.13", "classes"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[8]")
         .appName("graft-pytest")
         .config("spark.driver.extraClassPath", CLASSES)
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def con():
    import duckdb
    c = duckdb.connect()
    for t in ["customer", "supplier", "part", "events"]:
        c.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return c


def _check(con, got_df, oracle_sql):
    """Driver-gate compare: sort columns by name, render as str, sort rows."""
    got = got_df.toPandas()
    want = con.sql(oracle_sql).df()
    assert sorted(got.columns) == sorted(want.columns), \
        f"cols {sorted(got.columns)} vs {sorted(want.columns)}"
    g = sorted(map(tuple, got[sorted(got.columns)].astype(str).values.tolist()))
    w = sorted(map(tuple, want[sorted(want.columns)].astype(str).values.tolist()))
    assert g == w, f"{len(g)} vs {len(w)} rows or value mismatch"
    return len(g)


@pytest.fixture(scope="session")
def cust(spark):
    return spark.read.parquet(f"{SF}/customer.parquet")


@pytest.fixture(scope="session")
def supp(spark):
    return spark.read.parquet(f"{SF}/supplier.parquet")


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="session")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding")


# ---- parity operators (the reference's public surface) ----

def test_fuzzy_join_acctbal(con, cust, supp):
    from graft import fuzzy_join
    _check(
        con,
        fuzzy_join(cust, supp, left_on="c_acctbal", right_on="s_acctbal",
                   tol=5.0).select("c_custkey", "c_acctbal",
                                   "s_suppkey", "s_acctbal"),
        """SELECT c_custkey, c_acctbal, s_suppkey, s_acctbal
           FROM customer JOIN supplier ON abs(c_acctbal - s_acctbal) <= 5.0""")


def test_fuzzy_join_default_tol(spark):
    # the reference's DEFAULT tolerance (tol omitted -> 1e-3,
    # pandance/pandance.py:24) — constructed rows so matches exist
    from graft import fuzzy_join
    ldf = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["lid", "v"])
    rdf = spark.createDataFrame([(10, 1.0005), (20, 2.01)], ["rid", "w"])
    got = sorted(map(tuple, fuzzy_join(ldf, rdf, left_on="v", right_on="w")
                     .select("lid", "rid").toPandas().values.tolist()))
    assert got == [(1, 10)], f"default tol must be 1e-3, matched {got}"


def test_ineq_join_acctbal(con, cust, supp):
    from graft import ineq_join
    _check(
        con,
        ineq_join(cust, supp, ">=", left_on="c_acctbal",
                  right_on="s_acctbal").select("c_custkey", "s_suppkey"),
        """SELECT c_custkey, s_suppkey
           FROM customer JOIN supplier ON c_acctbal >= s_acctbal""")


def test_theta_join_mod(con, spark, supp):
    from graft import theta_join
    part = spark.read.parquet(f"{SF}/part.parquet")
    _check(
        con,
        theta_join(part, supp, lambda x, y: x % 32 == y % 32,
                   left_on="p_partkey", right_on="s_suppkey")
        .select("p_partkey", "s_suppkey"),
        """SELECT p_partkey, s_suppkey
           FROM part JOIN supplier ON p_partkey % 32 = s_suppkey % 32""")


@pytest.fixture(scope="session")
def clicks_views(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter(ev.event_type == "click").select(
        ev.event_id.alias("click_id"), ev.ts.alias("click_ts"))
    views = ev.filter(ev.event_type == "view").select(
        ev.event_id.alias("view_id"), ev.ts.alias("view_ts"))
    return clicks, views


def test_fuzzy_join_ts(con, clicks_views):
    from graft import fuzzy_join
    clicks, views = clicks_views
    _check(
        con,
        fuzzy_join(clicks, views, left_on="click_ts", right_on="view_ts",
                   tol=datetime.timedelta(seconds=180))
        .select("click_id", "view_id"),
        """SELECT c.event_id AS click_id, v.event_id AS view_id
           FROM events c JOIN events v
             ON c.event_type = 'click' AND v.event_type = 'view'
            AND abs(epoch_us(c.ts) - epoch_us(v.ts)) <= 180000000""")


def test_as_of_join(con, clicks_views):
    from graft import as_of_join
    clicks, views = clicks_views
    got = as_of_join(clicks, views, datetime.timedelta(seconds=180),
                     "view_id", left_on="click_ts",
                     right_on="view_ts").toPandas()
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
    g = sorted(map(tuple,
                   got[["click_id", "view_id"]].astype(str).values.tolist()))
    w = sorted(map(tuple,
                   want[["click_id", "view_id"]].astype(str).values.tolist()))
    assert g == w, f"{len(g)} vs {len(w)}"


def test_estimate_mem_cost(cust, supp):
    from graft import estimate_mem_cost_cartesian_mib
    est = estimate_mem_cost_cartesian_mib(cust, "c_acctbal",
                                          supp, "s_acctbal")
    assert est >= 0


# ---- LLM-pipeline flagships ----

def test_dedup_exact(con, docs):
    from graft import dedup_exact
    got = dedup_exact(docs.select("doc_id", "text"),
                      "text", "doc_id").toPandas()
    want = con.sql(f"""SELECT min(doc_id) AS doc_id, text
                       FROM '{SF}/documents.parquet' GROUP BY text""").df()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


_SHINGLE_CTE = """
  WITH tokp AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w,
           generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
    FROM '{sf}/documents.parquet'),
  sh AS (
    SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS shingle
    FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                JOIN tokp c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2)
"""


def test_dedup_pairs_ngram_jaccard(con, docs):
    from graft import dedup_pairs_ngram_jaccard
    got = dedup_pairs_ngram_jaccard(docs, "doc_id", "text", n=3,
                                    threshold=0.6).toPandas()
    want = con.sql(_SHINGLE_CTE.format(sf=SF) + """,
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
    assert g == w, f"{len(g)} vs {len(w)}"


def test_dedup_pairs_minhash_lsh(docs):
    # LSH banding finds the same >=0.8 pairs as the exact join
    from graft import dedup_pairs_minhash_lsh, dedup_pairs_ngram_jaccard
    g_lsh = sorted(map(tuple, dedup_pairs_minhash_lsh(
        docs, "doc_id", "text", threshold=0.8)
        .select("doc_a", "doc_b").toPandas().values.tolist()))
    g_exact = sorted(map(tuple, dedup_pairs_ngram_jaccard(
        docs, "doc_id", "text", threshold=0.8)
        .select("doc_a", "doc_b").toPandas().values.tolist()))
    assert g_lsh == g_exact


def test_char_span_pairs(spark):
    from graft import char_span_pairs
    docs = spark.createDataFrame(
        [(1, "aaHELLO WONDERFUL WORLDbb"), (2, "ccHELLO WONDERFUL WORLDdd")],
        ["doc_id", "text"])
    got = char_span_pairs(docs, "doc_id", "text", k=8,
                          min_span_chars=10).toPandas()
    assert sorted(map(tuple, got.values.tolist())) == [(1, 2, 2, 2, 21)]


def test_strip_repeated_char_spans(spark):
    from graft import strip_repeated_char_spans
    docs = spark.createDataFrame(
        [(1, "aaHELLO WONDERFUL WORLDbb"), (2, "ccHELLO WONDERFUL WORLDdd")],
        ["doc_id", "text"])
    out = dict(strip_repeated_char_spans(docs, "doc_id", "text", k=8,
                                         min_span_chars=10)
               .toPandas().values.tolist())
    assert out == {1: "aaHELLO WONDERFUL WORLDbb", 2: "ccdd"}


def test_dedup_pairs_simhash(spark):
    from graft import dedup_pairs_simhash
    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "completely different words here")], ["doc_id", "text"])
    g = sorted(map(tuple, dedup_pairs_simhash(dup, "doc_id", "text", 0)
                   .select("doc_a", "doc_b").toPandas().values.tolist()))
    assert g == [(1, 2)], f"simhash(py): {g}"


def test_connected_components(spark):
    from graft import connected_components
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], ["a", "b"])
    g = dict(connected_components(pairs, "a", "b").toPandas().values.tolist())
    assert g == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}, f"cc(py): {g}"
    # and the durable-checkpoint path agrees (forced distributed)
    g2 = dict(connected_components(pairs, "a", "b", local_threshold=0,
                                   checkpoint_dir=tempfile.mkdtemp())
              .toPandas().values.tolist())
    assert g2 == g


def test_bm25_topk(docs):
    from graft import bm25_topk
    top = bm25_topk(docs, "doc_id", "text", ["vector", "stream", "spark"],
                    k=5).toPandas()
    assert len(top) == 5 and top["score"].is_monotonic_decreasing


def test_ann_topk_brute(emb):
    # a planted exact twin (id + 10000) must be top-1 (self excluded)
    from graft import ann_topk_brute
    qs = emb.filter(emb.vec_id < 5)
    twin = qs.selectExpr("vec_id + 10000 AS vec_id", "embedding")
    nn = ann_topk_brute(qs, emb.unionByName(twin), "vec_id", "embedding",
                        1).toPandas()
    assert sorted(nn["query_id"] + 10000) == sorted(nn["neighbor_id"])


def test_decontaminate(con, docs):
    from graft import decontaminate
    got = decontaminate(docs.filter(docs.doc_id % 5 != 0),
                        docs.filter(docs.doc_id % 5 == 0),
                        "doc_id", "text", n=3).toPandas()
    want = con.sql(_SHINGLE_CTE.format(sf=SF) + """,
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
    assert g == w, f"{len(g)} vs {len(w)}"


def test_chunk_by_tokens(spark):
    from graft import chunk_by_tokens
    cdf = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"])
    ch = chunk_by_tokens(cdf, "doc_id", "text", 4, overlap=1).toPandas()
    assert list(ch["n_tokens"]) == [4, 4, 4]
    assert ch["text"].iloc[0] == "t0 t1 t2 t3"


def test_pack_greedy(spark):
    from graft import pack_greedy
    pdf = spark.createDataFrame([(i, 60) for i in range(4)],
                                ["doc_id", "n_tokens"])
    pk = pack_greedy(pdf, "doc_id", "n_tokens", 128, "0").toPandas()
    assert sorted(pk["bin"]) == [0, 0, 1, 1], f"pack(py): {pk}"


def test_dsir_score(docs):
    from graft import dsir_score
    ds = dsir_score(docs, "doc_id", "text",
                    docs.filter(docs.lang == "en"), "text").toPandas()
    assert len(ds) == docs.count()


def test_sem_dedup(spark):
    # planted twins — exactly one of each pair pruned
    from graft import sem_dedup
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
    assert len(removed) == 3
    assert all((i in removed) ^ (i + 3 in removed) for i in range(3))


# ---- persisted-index lifecycle ----

def test_bm25_index_lifecycle(spark, docs):
    from graft import (build_bm25_index, append_to_bm25_index,
                       delete_from_bm25_index, bm25_search_index, bm25_topk,
                       current_index_version, pin_index)
    d = docs.select("doc_id", "text")
    idx = tempfile.mkdtemp(prefix="graft_py_bm25_")
    # build 2/3 + append 1/3 == inline scan over the whole corpus
    build_bm25_index(d.filter(d.doc_id % 3 != 2), "doc_id", "text", idx)
    append_to_bm25_index(d.filter(d.doc_id % 3 == 2), "doc_id", "text", idx)
    served = bm25_search_index(spark, idx, ["vector", "stream", "spark"],
                               k=20).toPandas()
    inline = bm25_topk(d, "doc_id", "text", ["vector", "stream", "spark"],
                       k=20).toPandas()
    assert served[["doc_id", "score"]].astype(str).values.tolist() == \
        inline[["doc_id", "score"]].astype(str).values.tolist()
    # time travel: pin the pre-delete version, delete, pinned serve unchanged
    v = current_index_version(spark, idx)
    pinned = pin_index(idx, v)
    delete_from_bm25_index(d.filter(d.doc_id % 7 == 0).select("doc_id"),
                           "doc_id", idx)
    after = bm25_search_index(spark, idx, ["vector", "stream", "spark"],
                              k=20).toPandas()
    assert not any(after["doc_id"] % 7 == 0)
    via_pin = bm25_search_index(spark, pinned, ["vector", "stream", "spark"],
                                k=20).toPandas()
    assert via_pin[["doc_id", "score"]].astype(str).values.tolist() == \
        served[["doc_id", "score"]].astype(str).values.tolist()


def test_ivf_index_lifecycle(emb):
    from graft import build_ivf_index, search_ivf, ann_topk_brute
    ividx = tempfile.mkdtemp(prefix="graft_py_ivf_")
    build_ivf_index(emb, "vec_id", "embedding", ividx, n_centroids=8)
    qs = emb.filter(emb.vec_id < 10)
    approx = search_ivf(qs, ividx, "vec_id", "embedding", k=3,
                        n_probe=8).toPandas()
    exact = ann_topk_brute(qs, emb, "vec_id", "embedding", 3).toPandas()
    key = lambda d: sorted(map(tuple, d[["query_id", "neighbor_id"]]
                               .values.tolist()))
    assert key(approx) == key(exact), "exhaustive IVF must equal brute force"


def test_eval_index_lifecycle(spark):
    from graft import (build_eval_index, delete_from_eval_index,
                       decontaminate_gate_from_index)
    evA = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    evB = spark.createDataFrame(
        [(101, "pack my box with five dozen liquor jugs")],
        ["doc_id", "text"])
    corpus = spark.createDataFrame([
        (1, "completely unrelated words in this training document here"),
        (2, "someone wrote the quick brown fox jumps right into the corpus"),
        (4, "pack my box with five dozen liquor jugs and more text")],
        ["doc_id", "text"])
    evidx = tempfile.mkdtemp(prefix="graft_py_eval_")
    build_eval_index(evA.union(evB), "text", evidx, n=3)
    keeps = set(decontaminate_gate_from_index(corpus, "doc_id", "text",
                                              evidx).toPandas()["doc_id"])
    assert keeps == {1}, keeps
    delete_from_eval_index(evB, "text", evidx)
    keeps = set(decontaminate_gate_from_index(corpus, "doc_id", "text",
                                              evidx).toPandas()["doc_id"])
    assert keeps == {1, 4}, keeps


if __name__ == "__main__":
    # legacy entry point: `python3 python/test_graft.py [sfDir]`
    if len(sys.argv) > 1:
        os.environ["GRAFT_SF_DIR"] = sys.argv[1]
        SF = sys.argv[1]
    raise SystemExit(pytest.main([__file__, "-v"] ))
