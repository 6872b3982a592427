"""text_tfidf / text_rake_keywords / text_pmi_cooccurrence decomposition +
distinct-content contraction A/B (r15 continuation).

Usage: python tools/probes/text_contract_decomp.py <sf_dir> [keys...]
Fresh JVM, bench-like confs. Times the current registered plan and the
contracted candidate for each key; asserts value equality of the arms.

Design notes (measured spaces, sf0.1 -> sf10):
  documents rows 5k -> 500k but DISTINCT texts 4,992 at every SF (the
  gen_sf1 upscale clones text verbatim, CLAUDE.md); distinct phrases
  17,811; distinct (text,word >=3ch) 112k; pmi vocab 30. So every
  text-derived aggregate is content-bounded at ~1/100th of the sf10 row
  count, the same contraction class as text_ngrams (r8) / sim_maxsim.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sf_dir = sys.argv[1]
keys = sys.argv[2:] or ["text_tfidf", "text_rake_keywords", "text_pmi_cooccurrence"]
import pyarrow.parquet as pq

rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
from kwery_spark.session import builder

spark = (
    builder("text-contract-decomp")
    .config("spark.sql.shuffle.partitions", str(min(64, max(8, rows // 500_000))))
    .config("spark.sql.files.maxPartitionBytes", str(16 << 20))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import pyspark.sql.functions as F
from pyspark.sql import Window

import kwery_spark.all_ops  # noqa: F401
from kwery_spark.catalog import round6, table
from kwery_spark.registry import QUERIES


def t(label, fn, reps=4):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        if i > 0:
            best = min(best, dt)
        print(f"    rep{i}: {dt:.3f}s")
    print(f"  {label}: best {best:.3f}s")
    return best


def jobs(fn):
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    fn()
    after = len(st.getJobIdsForGroup(None) or [])
    print(f"    jobs: {after - before}")


table(spark, sf_dir, "documents").count()  # warm scan


def _tok(col="text"):
    return F.split(F.lower(F.col(col)), " ")


def _contr(with_ids=False):
    """Distinct-text frame with multiplicity (and optionally the doc_id
    list), eagerly checkpointed: |distinct texts| rows."""
    docs = table(spark, sf_dir, "documents")
    aggs = [F.count(F.lit(1)).alias("m")]
    if with_ids:
        aggs.append(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    return docs.groupBy("text").agg(*aggs).localCheckpoint(eager=True)


# ---------------------------------------------------------------- text_tfidf
def tfidf_contracted():
    contr = _contr(with_ids=True)
    tf = (
        contr.select("text", "m", F.explode(_tok()).alias("token"))
        .groupBy("text", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("m").alias("m"))
    )
    df = tf.groupBy("token").agg(F.sum("m").alias("df"))
    n_docs = contr.agg(F.sum("m").cast("double").alias("n_docs"))
    w = Window.partitionBy("text").orderBy(F.col("tfidf").desc(), F.col("token"))
    top = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "text",
            "token",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tfidf"
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        top.join(contr.select("text", "ids"), "text")
        .select(
            F.explode("ids").alias("doc_id"),
            F.col("token").alias("top_term"),
            "tfidf",
        )
    )


# -------------------------------------------------------- text_rake_keywords
def rake_phrase_contracted(text_contract):
    docs = table(spark, sf_dir, "documents")
    if text_contract:
        base = _contr().select(
            "m",
            F.explode(
                F.split(F.lower(F.col("text")), r" ?\b(?:the|a)\b ?")
            ).alias("raw"),
        )
    else:
        base = docs.select(
            F.lit(1).alias("m"),
            F.explode(
                F.split(F.lower(F.col("text")), r" ?\b(?:the|a)\b ?")
            ).alias("raw"),
        )
    phrases = base.select(F.trim(F.col("raw")).alias("phrase"), "m").filter(
        F.col("phrase") != ""
    )
    # ONE scan: phrase-level contraction carries everything downstream
    dp = (
        phrases.groupBy("phrase")
        .agg(F.sum("m").cast("long").alias("n_occ"))
        .localCheckpoint(eager=True)
    )
    dpw = dp.select(
        "phrase",
        "n_occ",
        F.size(F.split(F.col("phrase"), " ")).alias("plen"),
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    # wscore = sum(plen over instances)/count(instances)
    #        = sum(n_occ*plen over distinct phrases)/sum(n_occ) — same ints
    wscore = dpw.groupBy("w").agg(
        round6(
            F.sum(F.col("n_occ") * F.col("plen")).cast("double") / F.sum("n_occ")
        ).alias("wscore")
    )
    pscore = (
        dpw.select("phrase", "w")
        .join(wscore, "w")
        .groupBy("phrase")
        .agg(F.round(F.sum("wscore"), 4).alias("score"))
    )
    return (
        pscore.join(dp, "phrase")
        .select("phrase", "n_occ", "score")
        .orderBy(F.col("score").desc(), "phrase")
        .limit(15)
    )


# ----------------------------------------------------- text_pmi_cooccurrence
def pmi_contracted():
    contr = _contr()
    ctw = (
        contr.select("text", "m", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 3)
        .groupBy("text", "word")
        .agg(F.min("m").alias("m"))
    )
    df_counts = ctw.groupBy("word").agg(F.sum("m").alias("d"))
    top = df_counts.orderBy(F.col("d").desc(), "word").limit(50)
    present = ctw.join(F.broadcast(top), "word")
    a = present.alias("a")
    b = present.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.text") == F.col("b.text")) & (F.col("a.word") < F.col("b.word")),
        )
        .groupBy(
            F.col("a.word").alias("word_a"),
            F.col("b.word").alias("word_b"),
            F.col("a.d").alias("da"),
            F.col("b.d").alias("db"),
        )
        .agg(F.sum(F.col("a.m")).alias("dab"))
        .filter(F.col("dab") >= 5)
    )
    nd = contr.agg(F.sum("m").alias("nd"))
    return (
        pairs.join(F.broadcast(nd))
        .select(
            "word_a",
            "word_b",
            F.col("dab").cast("long").alias("n_cooccur"),
            F.round(
                F.log(
                    F.col("dab") * 1.0 * F.col("nd") / (F.col("da") * 1.0 * F.col("db"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "word_a", "word_b")
        .limit(30)
    )


def compare(key, cand_df_fn, sort_cols):
    cur = QUERIES[key](spark, sf_dir).toPandas()
    new = cand_df_fn().toPandas()
    cur = cur.sort_values(sort_cols).reset_index(drop=True)
    new = new.sort_values(sort_cols).reset_index(drop=True)
    same = cur.shape == new.shape and all(
        (cur[c] == new[c]).all()
        if cur[c].dtype.kind not in "fc"
        else (abs(cur[c] - new[c]) < 1e-9).all()
        for c in cur.columns
    )
    print(f"  {key} VALUES EQUAL: {same}  ({len(cur)} rows)")
    if not same:
        print(cur.head(10))
        print(new.head(10))
    return same


CANDS = {
    "text_tfidf": [("contracted", tfidf_contracted)],
    "text_rake_keywords": [
        ("phrase-contracted (raw scan)", lambda: rake_phrase_contracted(False)),
        ("phrase+text-contracted", lambda: rake_phrase_contracted(True)),
    ],
    "text_pmi_cooccurrence": [("contracted", pmi_contracted)],
}
SORT = {
    "text_tfidf": ["doc_id"],
    "text_rake_keywords": ["score", "phrase"],
    "text_pmi_cooccurrence": ["pmi", "word_a", "word_b"],
}

for key in keys:
    print(f"== {key} @ {sf_dir}")
    t("current", lambda: QUERIES[key](spark, sf_dir).toPandas())
    jobs(lambda: QUERIES[key](spark, sf_dir).toPandas())
    for label, fn in CANDS[key]:
        t(f"candidate {label}", lambda: fn().toPandas())
        jobs(lambda: fn().toPandas())
        compare(key, fn, SORT[key])

print("loadavg:", os.getloadavg())
