"""text_bm25 stage decomposition + single-scan rewrite A/B (r15, VERDICT r14 #1).

Usage: python tools/probes/bm25_decomp.py <sf_dir>
Fresh JVM, bench-like confs (shuffle partitions from lineitem rows, 16MB
splits). Times the current registered plan, its stages, and the candidate
single-scan rewrite; asserts value equality of the two arms.
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
sf_dir = sys.argv[1]
import pyarrow.parquet as pq
rows = pq.ParquetFile(os.path.join(sf_dir, 'lineitem.parquet')).metadata.num_rows
from kwery_spark.session import builder
spark = (builder('bm25-decomp')
    .config('spark.sql.shuffle.partitions', str(min(64, max(8, rows // 500_000))))
    .config('spark.sql.files.maxPartitionBytes', str(16 << 20))
    .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
import pyspark.sql.functions as F
from kwery_spark.catalog import table
import kwery_spark.all_ops
from kwery_spark.registry import QUERIES


def t(label, fn, reps=4):
    best = 9e9
    for i in range(reps):
        t0 = time.perf_counter(); fn(); dt = time.perf_counter() - t0
        if i > 0:
            best = min(best, dt)
    print(f"  {label}: best {best:.3f}s")
    return best


def jobs(fn):
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    fn()
    after = len(st.getJobIdsForGroup(None) or [])
    print(f"    jobs: {after - before}")


table(spark, sf_dir, 'documents').count()  # warm scan

docs = table(spark, sf_dir, 'documents')
_tok = F.split(F.lower(F.col('text')), ' ')
print('text_bm25 stages @', sf_dir)

# current registered plan
t('full key (current)', lambda: QUERIES['text_bm25'](spark, sf_dir).toPandas())
jobs(lambda: QUERIES['text_bm25'](spark, sf_dir).toPandas())

# stage: stats (scan+tokenize+1-row agg)
dl = docs.select('doc_id', F.size(_tok).alias('dl'))
t('stats only (1 scan+agg)', lambda: dl.agg(
    F.count(F.lit(1)).cast('double').alias('n_docs'), F.avg('dl').alias('avgdl')
).collect())

# stage: tf build (explode + broadcast semi + groupBy(doc,term))
terms = spark.createDataFrame([('join',), ('scan',), ('filter',)], 'term string')
def tf_build():
    tf = (docs.select('doc_id', F.explode(_tok).alias('term'))
          .join(F.broadcast(terms), 'term')
          .groupBy('doc_id', 'term').agg(F.count(F.lit(1)).alias('tf')))
    tf.agg(F.sum('tf')).collect()
t('tf build (1 scan+explode+agg)', tf_build)

# candidate: single-scan exploded per-doc profile
def candidate():
    per_doc = (docs.select('doc_id', F.explode(_tok).alias('term'))
        .groupBy('doc_id').agg(
            F.count(F.lit(1)).alias('dl'),
            F.sum(F.when(F.col('term') == 'join', 1).otherwise(0)).alias('tfj'),
            F.sum(F.when(F.col('term') == 'scan', 1).otherwise(0)).alias('tfs'),
            F.sum(F.when(F.col('term') == 'filter', 1).otherwise(0)).alias('tff'),
        ).localCheckpoint(eager=True))
    g = per_doc.agg(
        F.count(F.lit(1)).cast('double').alias('n_docs'),
        F.avg('dl').alias('avgdl'),
        F.sum(F.when(F.col('tfj') > 0, 1).otherwise(0)).cast('double').alias('dfj'),
        F.sum(F.when(F.col('tfs') > 0, 1).otherwise(0)).cast('double').alias('dfs'),
        F.sum(F.when(F.col('tff') > 0, 1).otherwise(0)).cast('double').alias('dff'),
    )
    K1, B = 1.2, 0.75
    def score(tf, df):
        idf = F.log(1 + (F.col('n_docs') - df + 0.5) / (df + 0.5))
        s = idf * tf * 2.2 / (tf + K1 * (1 - B + B * F.col('dl') / F.col('avgdl')))
        return F.when(tf > 0, s).otherwise(F.lit(0.0))
    hits = ((F.col('tfj') > 0).cast('long') + (F.col('tfs') > 0).cast('long')
            + (F.col('tff') > 0).cast('long'))
    return (per_doc.join(F.broadcast(g))
        .filter(hits > 0)
        .select('doc_id',
                F.round(score(F.col('tfj'), F.col('dfj'))
                        + score(F.col('tfs'), F.col('dfs'))
                        + score(F.col('tff'), F.col('dff')), 6).alias('bm25'),
                hits.alias('n_terms_hit'))
        .orderBy(F.col('bm25').desc(), 'doc_id').limit(20))

t('candidate single-scan', lambda: candidate().toPandas())
jobs(lambda: candidate().toPandas())

a = QUERIES['text_bm25'](spark, sf_dir).toPandas()
b = candidate().toPandas()
print('rows', len(a), len(b))
same = (list(a.doc_id) == list(b.doc_id)
        and list(a.n_terms_hit) == list(b.n_terms_hit)
        and all(abs(x - y) < 1e-9 for x, y in zip(a.bm25, b.bm25)))
print('VALUES EQUAL:', same)
if not same:
    print(a.head(25)); print(b.head(25))


# candidate2: no split/explode at all — token counts via length/replace
# arithmetic (space-doubling makes token matches non-overlapping substrings)
def candidate2():
    low = F.lower(F.col('text'))
    # dl: split(text,' ') ALWAYS yields (#spaces+1) elements
    dl = (F.length(low) - F.length(F.replace(low, F.lit(' '), F.lit('')))
          + F.lit(1)).alias('dl')
    s2 = F.concat(F.lit(' '), F.replace(low, F.lit(' '), F.lit('  ')), F.lit(' '))
    def tf_of(term):
        pat = F.lit(' ' + term + ' ')
        return ((F.length(s2) - F.length(F.replace(s2, pat, F.lit(''))))
                / F.lit(len(term) + 2)).cast('long')
    per_doc = docs.select(
        'doc_id', dl,
        tf_of('join').alias('tfj'), tf_of('scan').alias('tfs'),
        tf_of('filter').alias('tff'),
    ).localCheckpoint(eager=True)
    g = per_doc.agg(
        F.count(F.lit(1)).cast('double').alias('n_docs'),
        F.avg('dl').alias('avgdl'),
        F.sum(F.when(F.col('tfj') > 0, 1).otherwise(0)).cast('double').alias('dfj'),
        F.sum(F.when(F.col('tfs') > 0, 1).otherwise(0)).cast('double').alias('dfs'),
        F.sum(F.when(F.col('tff') > 0, 1).otherwise(0)).cast('double').alias('dff'),
    )
    K1, B = 1.2, 0.75
    def score(tf, df):
        idf = F.log(1 + (F.col('n_docs') - df + 0.5) / (df + 0.5))
        s = idf * tf * 2.2 / (tf + K1 * (1 - B + B * F.col('dl') / F.col('avgdl')))
        return F.when(tf > 0, s).otherwise(F.lit(0.0))
    hits = ((F.col('tfj') > 0).cast('long') + (F.col('tfs') > 0).cast('long')
            + (F.col('tff') > 0).cast('long'))
    return (per_doc.join(F.broadcast(g))
        .filter(hits > 0)
        .select('doc_id',
                F.round(score(F.col('tfj'), F.col('dfj'))
                        + score(F.col('tfs'), F.col('dfs'))
                        + score(F.col('tff'), F.col('dff')), 6).alias('bm25'),
                hits.alias('n_terms_hit'))
        .orderBy(F.col('bm25').desc(), 'doc_id').limit(20))

t('candidate2 string-ops', lambda: candidate2().toPandas())
jobs(lambda: candidate2().toPandas())
c = candidate2().toPandas()
same2 = (list(a.doc_id) == list(c.doc_id)
         and list(a.n_terms_hit) == list(c.n_terms_hit)
         and all(abs(x - y) < 1e-9 for x, y in zip(a.bm25, c.bm25)))
print('CANDIDATE2 VALUES EQUAL:', same2)
if not same2:
    print(a.head(25)); print(c.head(25))


# candidate3: dl via length arithmetic map-side; explode filtered to the
# 3 query terms BEFORE the per-doc aggregation (hash state = matching rows only)
def candidate3():
    low = F.lower(F.col('text'))
    dl = (F.length(low) - F.length(F.replace(low, F.lit(' '), F.lit('')))
          + F.lit(1)).alias('dl')
    per_doc = (docs.select('doc_id', dl, F.explode(_tok).alias('term'))
        .filter(F.col('term').isin('join', 'scan', 'filter'))
        .groupBy('doc_id').agg(
            F.max('dl').alias('dl'),
            F.sum(F.when(F.col('term') == 'join', 1).otherwise(0)).alias('tfj'),
            F.sum(F.when(F.col('term') == 'scan', 1).otherwise(0)).alias('tfs'),
            F.sum(F.when(F.col('term') == 'filter', 1).otherwise(0)).alias('tff'),
        ).localCheckpoint(eager=True))
    # stats over ALL docs: no split needed, dl is pure length arithmetic
    g0 = docs.select(dl).agg(
        F.count(F.lit(1)).cast('double').alias('n_docs'),
        F.avg('dl').alias('avgdl'))
    g1 = per_doc.agg(
        F.sum(F.when(F.col('tfj') > 0, 1).otherwise(0)).cast('double').alias('dfj'),
        F.sum(F.when(F.col('tfs') > 0, 1).otherwise(0)).cast('double').alias('dfs'),
        F.sum(F.when(F.col('tff') > 0, 1).otherwise(0)).cast('double').alias('dff'))
    K1, B = 1.2, 0.75
    def score(tf, df):
        idf = F.log(1 + (F.col('n_docs') - df + 0.5) / (df + 0.5))
        s = idf * tf * 2.2 / (tf + K1 * (1 - B + B * F.col('dl') / F.col('avgdl')))
        return F.when(tf > 0, s).otherwise(F.lit(0.0))
    hits = ((F.col('tfj') > 0).cast('long') + (F.col('tfs') > 0).cast('long')
            + (F.col('tff') > 0).cast('long'))
    return (per_doc.join(F.broadcast(g0)).join(F.broadcast(g1))
        .select('doc_id',
                F.round(score(F.col('tfj'), F.col('dfj'))
                        + score(F.col('tfs'), F.col('dfs'))
                        + score(F.col('tff'), F.col('dff')), 6).alias('bm25'),
                hits.alias('n_terms_hit'))
        .orderBy(F.col('bm25').desc(), 'doc_id').limit(20))

t('candidate3 arith-dl + prefiltered explode', lambda: candidate3().toPandas())
jobs(lambda: candidate3().toPandas())
d3 = candidate3().toPandas()
same3 = (list(a.doc_id) == list(d3.doc_id)
         and list(a.n_terms_hit) == list(d3.n_terms_hit)
         and all(abs(x - y) < 1e-9 for x, y in zip(a.bm25, d3.bm25)))
print('CANDIDATE3 VALUES EQUAL:', same3)
import os as _os
print('loadavg:', _os.getloadavg())
