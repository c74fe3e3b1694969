"""Training-data-pipeline queries: chunking, packing, contamination,
cross-corpus dedup, deterministic sampling, time rollups, range joins.

These are the ops a 100 TB pretraining-data pipeline runs downstream of
dedup (queries/llm.py) — all [EXT], mandated by the north star (SURVEY
§2.2-J). Each is expressed as narrow/bucketed Spark plans with a bit-exact
DuckDB oracle; engine-specific constructs (md5 bucketing, Carter-Wegman
minhash) reuse the cross-engine-stable primitives from functions/.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpr_spark.functions import chunking as ck
from dumpr_spark.functions import dedup as dd
from dumpr_spark.functions import sampling as sp
from dumpr_spark.functions import text as tx
from dumpr_spark.operators.rangejoin import bucketed_interval_join
from dumpr_spark.queries.base import eps_round, query, t
from dumpr_spark.queries.llm import _dup_corpus, _NEAR_CORPUS_CTE
from dumpr_spark.queries.llm import _minhash_bands_cte


# --------------------------------------------------------------------------
# Chunking / packing
# --------------------------------------------------------------------------

@query(
    "chunk_documents",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    st AS (
      SELECT doc_id, tk, unnest(generate_series(1, greatest(least(len(tk) - 4, len(tk)), 1), 12)) AS start
      FROM toks
    )
    SELECT doc_id, start,
           array_to_string(tk[start:start+15], ' ') AS chunk_text,
           len(tk[start:start+15])::BIGINT AS n_tokens
    FROM st ORDER BY doc_id, start
    """,
    tags=("training", "chunking"),
)
def chunk_documents(spark, sf_dir):
    """Context-length chunking: sliding windows of 16 whitespace tokens,
    stride 12 (25% overlap). Narrow JVM array plan — split + sequence +
    slice + one explode; output partitioning == input partitioning, so at
    100 TB this fuses into the scan stage (functions/chunking.py)."""
    d = t(spark, sf_dir, "documents")
    return ck.chunk_documents(d, chunk_tokens=16, stride=12).orderBy("doc_id", "start")


_PACK_BUDGET = 256

@query(
    "pack_sequences",
    f"""
    WITH RECURSIVE base AS (
      SELECT lang, doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT lang, doc_id, n_tok, rn, 0::BIGINT AS bin, n_tok AS fill
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.lang, b.doc_id, b.n_tok, b.rn,
             CASE WHEN p.fill + b.n_tok <= {_PACK_BUDGET} THEN p.bin ELSE p.bin + 1 END,
             CASE WHEN p.fill + b.n_tok <= {_PACK_BUDGET} THEN p.fill + b.n_tok ELSE b.n_tok END
      FROM packed p JOIN base b ON b.lang = p.lang AND b.rn = p.rn + 1
    )
    SELECT lang, doc_id, n_tok, bin FROM packed ORDER BY lang, doc_id
    """,
    tags=("training", "packing"),
)
def pack_sequences(spark, sf_dir):
    """Greedy first-fit-in-order sequence packing into 256-token training
    bins, stratified by language. Spark side: one Arrow applyInPandas pass
    per stratum (functions/chunking.py:pack_sequences); the oracle walks the
    identical order with a recursive CTE — packing is deterministic, so the
    two agree bin-for-bin."""
    d = t(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok")
    )
    return (
        ck.pack_sequences(d, "lang", "doc_id", "n_tok", budget=_PACK_BUDGET)
        .orderBy("lang", "doc_id")
    )


# --------------------------------------------------------------------------
# Contamination / cross-corpus dedup
# --------------------------------------------------------------------------

def _gram5_cte(src: str, out: str, distinct_docs: bool) -> str:
    """DuckDB 5-gram 56-bit hash CTE over (doc_id, text) CTE `src`."""
    g = ("COALESCE(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' "
         "|| tk[i+4], array_to_string(tk, ' '))")
    cols = "doc_id, " if distinct_docs else ""
    return f"""
    {out} AS (
      SELECT DISTINCT {cols}('0x' || substr(md5({g}), 1, 14))::BIGINT AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM {src}) b,
           LATERAL (SELECT unnest(generate_series(1, greatest(len(tk) - 4, 1))) AS i) s
    )"""


@query(
    "contamination_ngrams",
    _NEAR_CORPUS_CTE + ",\n    bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),"
    + _gram5_cte("bench", "bg", distinct_docs=False) + ","
    + _gram5_cte(
        "(SELECT doc_id, text FROM corpus WHERE NOT (doc_id < 100000 AND doc_id % 7 = 0))",
        "tg", distinct_docs=True,
    )
    + """
    SELECT tg.doc_id, count(DISTINCT tg.g)::BIGINT AS n_shared
    FROM tg JOIN bg USING (g)
    GROUP BY tg.doc_id ORDER BY doc_id
    """,
    tags=("training", "contamination"),
)
def contamination_ngrams(spark, sf_dir):
    """Benchmark-contamination check: flag training docs sharing any 5-gram
    with a held-out benchmark set (docs with doc_id % 7 == 0), the standard
    n-gram-overlap decontamination pass. The benchmark gram set is tiny
    relative to the corpus -> build it once, broadcast it, and the scan-side
    cost is one narrow gram projection + a broadcast semi-join: no shuffle
    of the 100 TB side. Near-twin plants (+100000 ids) are the expected
    hits."""
    from dumpr_spark.operators.scale import fan_out

    bench = t(spark, sf_dir, "documents").where(F.col("doc_id") % 7 == 0)
    bg = (
        fan_out(bench.select("doc_id", "text"), "doc_id")
        .select(F.explode(F.array_distinct(tx.gram_hashes(F.col("text"), 5))).alias("g"))
        .distinct()
    )
    train = _dup_corpus(spark, sf_dir, near=True).where(
        ~((F.col("doc_id") < 100000) & (F.col("doc_id") % 7 == 0))
    )
    # r17: conditional fan-out before the two ~100x gram explodes (both
    # otherwise ride the compact single-task documents scan); hashing the
    # train side on doc_id lets the per-doc rollup reuse the exchange
    tg = fan_out(train.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.explode(F.array_distinct(tx.gram_hashes(F.col("text"), 5))).alias("g")
    )
    return (
        tg.join(F.broadcast(bg), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_shared"))
        .orderBy("doc_id")
    )


@query(
    "dedup_cross_corpus",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000, substr(text, strpos(text, ' ') + 1)
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 200000, array_to_string(list_reverse(string_split(text, ' ')), ' ')
      FROM documents WHERE doc_id % 10 = 3
    )
    """
    + _minhash_bands_cte()
    + """
    , dirty AS (
      SELECT DISTINCT x.doc_id
      FROM bands x JOIN bands y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       AND x.doc_id >= 100000 AND y.doc_id < 100000
    )
    SELECT c.doc_id FROM corpus c
    LEFT JOIN dirty d USING (doc_id)
    WHERE c.doc_id >= 100000 AND d.doc_id IS NULL
    ORDER BY doc_id
    """,
    tags=("training", "dedup"),
)
def dedup_cross_corpus(spark, sf_dir):
    """Incremental (cross-corpus) near-dedup: admit only new-batch docs that
    are NOT near-duplicates of the existing corpus. Batch = near twins
    (+100000, expected dirty) + token-reversed docs (+200000, expected
    clean). MinHash bands of the existing corpus are the persisted index at
    scale; the new batch's bands semi-join against it on (band_idx,
    band_key) — the batch (small) shuffles, the corpus index is bucketed —
    then an anti-join admits the clean ids. No O(batch x corpus) compare."""
    existing = t(spark, sf_dir, "documents").select("doc_id", "text")
    d = existing
    twins = (
        d.where(F.col("doc_id") % 10 == 0)
        .select((F.col("doc_id") + 100000).alias("doc_id"),
                F.expr("substr(text, instr(text, ' ') + 1)").alias("text"))
    )
    fresh = (
        d.where(F.col("doc_id") % 10 == 3)
        .select((F.col("doc_id") + 200000).alias("doc_id"),
                F.array_join(F.reverse(F.split(F.col("text"), " ")), " ").alias("text"))
    )
    batch = twins.unionByName(fresh)
    eb = dd.lsh_bands(dd.minhash_signature(existing))
    bb = dd.lsh_bands(dd.minhash_signature(batch))
    dirty = (
        bb.join(eb.select("band_idx", "band_key"), ["band_idx", "band_key"], "left_semi")
        .select("doc_id").distinct()
    )
    return batch.join(dirty, "doc_id", "left_anti").select("doc_id").orderBy("doc_id")


# --------------------------------------------------------------------------
# Deterministic sampling
# --------------------------------------------------------------------------

_SAMPLE_RATES = {"en": 200, "de": 500, "es": 500, "fr": 500, "zh": 800}

@query(
    "sample_stratified_hash",
    """
    SELECT doc_id, lang FROM documents
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 1000 <
          CASE lang WHEN 'en' THEN 200 WHEN 'de' THEN 500 WHEN 'es' THEN 500
                    WHEN 'fr' THEN 500 WHEN 'zh' THEN 800 ELSE 0 END
    ORDER BY doc_id
    """,
    tags=("training", "sampling"),
)
def sample_stratified_hash(spark, sf_dir):
    """Deterministic stratified sampling: stable md5 bucket of doc_id under a
    per-language rate (down-weight dominant en at 20%, up-weight zh at 80%).
    Unlike df.sample(), re-runs and incremental batches select the SAME rows
    — the curation-grade form. Narrow filter, no shuffle, pushes through the
    scan (functions/sampling.py)."""
    d = t(spark, sf_dir, "documents")
    return (
        sp.stratified_sample(d, "doc_id", "lang", _SAMPLE_RATES)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Time-series rollup / range join
# --------------------------------------------------------------------------

@query(
    "rollup_timeseries",
    """
    WITH lv AS (
      SELECT 'minute' AS res, event_type, date_trunc('minute', ts) AS bucket,
             count(*)::BIGINT AS n, sum(value) AS sv
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'hour', event_type, date_trunc('hour', ts), count(*)::BIGINT, sum(value)
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'day', event_type, date_trunc('day', ts), count(*)::BIGINT, sum(value)
      FROM events GROUP BY 2, 3
    )
    SELECT res, event_type, bucket, n,
           round(sv + 1e-9, 4) AS sum_value,
           round(sv / n + 1e-9, 6) AS avg_value
    FROM lv ORDER BY res, event_type, bucket
    """,
    tags=("training", "timeseries"),
)
def rollup_timeseries(spark, sf_dir):
    """Hypertable-style multi-resolution rollup (minute/hour/day counts and
    sums per event type). The scale-correct shape: aggregate the raw stream
    ONCE at the finest grain, then re-aggregate each coarser level from the
    previous level's partials — hour reads minute rows (~60x smaller than
    raw), day reads hour rows. The oracle recomputes every level from raw,
    which doubles as a re-aggregation-correctness check."""
    e = t(spark, sf_dir, "events")
    m = e.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    h = m.groupBy(
        "event_type", F.date_trunc("hour", F.col("bucket")).alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    dy = h.groupBy(
        "event_type", F.date_trunc("day", F.col("bucket")).alias("bucket")
    ).agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
    lv = (
        m.select(F.lit("minute").alias("res"), "event_type", "bucket", "n", "sv")
        .unionByName(h.select(F.lit("hour").alias("res"), "event_type", "bucket", "n", "sv"))
        .unionByName(dy.select(F.lit("day").alias("res"), "event_type", "bucket", "n", "sv"))
    )
    return lv.select(
        "res", "event_type", "bucket", F.col("n").cast("long").alias("n"),
        eps_round(F.col("sv"), 4).alias("sum_value"),
        eps_round(F.col("sv") / F.col("n"), 6).alias("avg_value"),
    ).orderBy("res", "event_type", "bucket")


@query(
    "join_range_bucketed",
    """
    WITH iv AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS s,
             date_trunc('hour', min(ts)) + INTERVAL 6 HOUR AS e
      FROM events GROUP BY user_id
    )
    SELECT iv.user_id AS user_id, count(ev.ts)::BIGINT AS n_events
    FROM iv LEFT JOIN events ev ON ev.ts >= iv.s AND ev.ts < iv.e
    GROUP BY iv.user_id ORDER BY iv.user_id
    """,
    tags=("training", "join", "range"),
)
def join_range_bucketed(spark, sf_dir):
    """Pure range join (no equi key): count ALL events inside each user's
    first-6-hours interval. The oracle is the naive BETWEEN nested-loop
    join; the Spark plan is the bucketed form (operators/rangejoin.py):
    quantize time to 1 h buckets, explode each interval to its ~6 buckets,
    equi-join on bucket id, filter exactly — linear shuffle instead of
    O(|events| x |intervals|) BroadcastNestedLoopJoin. Empty intervals are
    restored by left-joining the counts back onto the interval set."""
    e = t(spark, sf_dir, "events")
    iv = (
        e.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("s"))
        .withColumn("e", F.col("s") + F.expr("INTERVAL 6 HOURS"))
    )
    pairs = bucketed_interval_join(
        e.select("ts"), iv, ts_col="ts", start_col="s", end_col="e", bucket_seconds=3600
    )
    cnt = pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        iv.join(cnt, "user_id", "left")
        .select("user_id", F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Model-based quality scoring
# --------------------------------------------------------------------------

# Fixed, documented linear-model coefficients: training happens offline
# (functions/quality_model.py:train_quality_model, exercised in tests); the
# scoring plan only ever sees constants, which is what makes it a narrow
# codegen projection AND bit-reproducible in the oracle.
_QM_W = {"log_tokens": 0.8, "mean_tok_len": -0.5, "distinct_ratio": 2.0, "stop_density": 3.0}
_QM_B = -2.0

@query(
    "text_quality_model",
    """
    WITH f AS (
      SELECT doc_id,
             ln(len(string_split(text, ' ')) + 1.0) AS log_tokens,
             list_sum(list_transform(string_split(text, ' '), x -> CAST(length(x) AS DOUBLE)))
               / len(string_split(text, ' ')) AS mean_tok_len,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS distinct_ratio,
             len(list_intersect(string_split(text, ' '), ['the','of','and','a','to'])) * 1.0
               / len(string_split(text, ' ')) AS stop_density
      FROM documents
    ),
    z AS (
      SELECT doc_id,
             -2.0 + 0.8 * log_tokens + (-0.5) * mean_tok_len
                  + 2.0 * distinct_ratio + 3.0 * stop_density AS z
      FROM f
    )
    SELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)) + 1e-9, 6) AS quality_score
    FROM z WHERE z > 0 ORDER BY doc_id
    """,
    tags=("training", "quality", "model"),
)
def text_quality_model(spark, sf_dir):
    """Learned quality filter: sigmoid(w . heuristic-features + b) with fixed
    coefficients (functions/quality_model.py). The keep decision filters on
    the LOGIT (z > 0 == score > 0.5) so the cross-engine comparison never
    sits on an exp() rounding boundary; scoring is one whole-stage-codegen
    projection — the 100 TB shape for model-based filtering."""
    from dumpr_spark.functions.quality_model import feature_columns

    d = t(spark, sf_dir, "documents")
    feats = feature_columns("text")
    z = F.lit(_QM_B)
    for name in ("log_tokens", "mean_tok_len", "distinct_ratio", "stop_density"):
        z = z + F.lit(_QM_W[name]) * feats[name]
    scored = d.select("doc_id", z.alias("z"))
    return (
        scored.where(F.col("z") > 0)
        .select(
            "doc_id",
            eps_round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("quality_score"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# End-to-end curation pipeline
# --------------------------------------------------------------------------

@query(
    "pipeline_curation",
    """
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 10 = 0
    ),
    quality AS (
      SELECT doc_id, text, lang, len(string_split(text, ' '))::BIGINT AS n_tok
      FROM corpus
      WHERE length(text) >= 100 AND len(string_split(text, ' ')) >= 20
        AND lang IN ('en', 'de', 'fr')
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, min(lang) AS lang, min(n_tok) AS n_tok
      FROM quality GROUP BY md5(text)
    )
    SELECT doc_id, lang, n_tok FROM deduped
    WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 1000 <
          CASE lang WHEN 'en' THEN 500 ELSE 800 END
    ORDER BY doc_id
    """,
    tags=("training", "pipeline", "flagship"),
)
def pipeline_curation(spark, sf_dir):
    """The end-to-end curation chain every pretraining corpus runs, as ONE
    declarative plan: quality gate (length + token floor) -> language filter
    -> exact dedup (min-id per md5, map-side-combining groupBy) ->
    deterministic stratified downsample. Catalyst fuses the narrow stages
    into the scan; the only shuffle is the dedup groupBy — at 100 TB the
    chain's cost IS that one shuffle of (hash, id, lang, n_tok) thin rows,
    everything else pipelines."""
    corpus = _dup_corpus(spark, sf_dir, near=False)
    quality = (
        corpus.where(
            (F.length("text") >= 100)
            & (F.size(F.split(F.col("text"), " ")) >= 20)
            & F.col("lang").isin("en", "de", "fr")
        )
        .select("doc_id", "text", "lang", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"))
    )
    deduped = (
        quality.groupBy(F.md5(F.col("text")).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("lang").alias("lang"), F.min("n_tok").alias("n_tok"))
        .drop("_h")
    )
    return (
        sp.stratified_sample(deduped, "doc_id", "lang", {"en": 500, "de": 800, "fr": 800})
        .select("doc_id", "lang", "n_tok")
        .orderBy("doc_id")
    )


@query(
    "dedup_keep_best",
    """
    WITH corpus AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 10 = 0
    ),
    scored AS (
      SELECT doc_id, md5(text) AS h,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS dr
      FROM corpus
    )
    SELECT arg_max(doc_id, dr + 1e-12 * doc_id) AS doc_id
    FROM scored GROUP BY h ORDER BY doc_id
    """,
    tags=("training", "dedup"),
)
def dedup_keep_best(spark, sf_dir):
    """Quality-aware exact dedup: among exact copies keep the copy with the
    best quality signal (here lexical diversity), not the smallest id —
    what a curation pipeline actually wants when duplicates differ in
    metadata/provenance. Same single map-side-combining groupBy as min-id
    dedup (`max_by(id, score)`); the deterministic id tiebreak makes the
    choice reproducible (exact copies tie on every content-derived score
    by construction)."""
    corpus = _dup_corpus(spark, sf_dir, near=False)
    toks = F.split(F.col("text"), " ")
    dr = F.size(F.array_distinct(toks)) / F.size(toks)
    scored = corpus.select(
        "doc_id", F.md5("text").alias("h"),
        (dr + F.lit(1e-12) * F.col("doc_id")).alias("score"),
    )
    return (
        scored.groupBy("h")
        .agg(F.max_by("doc_id", "score").alias("doc_id"))
        .select("doc_id")
        .orderBy("doc_id")
    )


@query(
    "text_unigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    n_total AS (SELECT count(*)::DOUBLE AS n FROM toks),
    freq AS (
      SELECT tok, count(*)::DOUBLE AS c FROM toks GROUP BY tok
    ),
    scored AS (
      SELECT t.doc_id, ln(f.c / (SELECT n FROM n_total)) AS lp
      FROM toks t JOIN freq f ON t.tok = f.tok
    )
    SELECT doc_id, ROUND(AVG(lp) + 1e-9, 4) AS avg_logprob,
           CAST(COUNT(*) AS BIGINT) AS n_tok
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("training", "quality", "lm"),
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram-LM scoring (the KenLM-perplexity-filter proxy): corpus token
    frequencies -> per-token log-probability -> per-doc average. Two-phase
    at scale: the frequency table is Zipf-small relative to the corpus, so
    phase 2 is a BROADCAST join against the token explode — the 100 TB side
    shuffles only for the final per-doc average, which map-side-combines.
    VOCAB-BROADCAST ASSUMPTION: the hint presumes the distinct-token table
    stays broadcast-sized (natural-language vocabularies grow ~ Heaps' law;
    at 100 TB the (token, count) table is a few hundred MB — near the
    ceiling). On an open-vocabulary crawl (URLs, hashes, code identifiers)
    DROP the `F.broadcast` hint and the join degrades gracefully to a
    shuffle equi-join on `tok` — same results, one extra exchange of the
    exploded tokens, no other plan change.
    Out-of-vocab is impossible by construction here (model == corpus); a
    held-out model would coalesce to a floor probability."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            eps_round(F.avg("lp"), 4).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tok"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Token accounting
# --------------------------------------------------------------------------

@query(
    "text_token_stats",
    r"""
    WITH tok AS (
      SELECT lang,
             len(string_split(text, ' '))::BIGINT AS ws,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS bpe
      FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(ws)::BIGINT AS ws_tokens, sum(bpe)::BIGINT AS bpe_tokens,
           round(sum(bpe)::DOUBLE / count(*) + 1e-9, 4) AS avg_bpe_tokens
    FROM tok GROUP BY lang ORDER BY lang
    """,
    tags=("training", "text"),
)
def text_token_stats(spark, sf_dir):
    """Token accounting per language: whitespace tokens vs BPE-ish regex
    tokens (word runs / digit runs / single non-alnum marks — the
    pre-tokenizer split every BPE vocabulary starts from). Both counts are
    JVM-side regex/array expressions; the per-doc projection is narrow and
    the per-lang aggregate map-side-combines to |langs| rows."""
    d = t(spark, sf_dir, "documents").select(
        "lang",
        tx.token_count(F.col("text")).alias("ws"),
        tx.regex_token_count(F.col("text")).alias("bpe"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            eps_round(F.sum("bpe").cast("double") / F.count(F.lit(1)), 4).alias("avg_bpe_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "text_markup_strip",
    """
    WITH wrapped AS (
      SELECT doc_id,
             '<html><body><p id="d' || doc_id || '">' || text || '</p></body></html>' AS html
      FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS clean,
           length(html) - length(trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))) AS removed
    FROM wrapped ORDER BY doc_id
    """,
    tags=("training", "text", "boilerplate"),
)
def text_markup_strip(spark, sf_dir):
    """Markup/boilerplate stripping — the first transform of every web-crawl
    curation pipeline: kill tags, collapse whitespace, measure what was
    removed (a boilerplate-ratio quality signal). Pure JVM regexp in
    whole-stage codegen; the html wrapper is synthesized deterministically
    so both engines strip the identical input."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    html = F.concat(
        F.lit('<html><body><p id="d'), F.col("doc_id").cast("string"), F.lit('">'),
        F.col("text"), F.lit("</p></body></html>"),
    )
    clean = F.trim(F.regexp_replace(F.regexp_replace(html, "<[^>]*>", " "), " +", " "))
    return d.select(
        "doc_id",
        clean.alias("clean"),
        (F.length(html) - F.length(clean)).alias("removed"),
    ).orderBy("doc_id")


@query(
    "scalar_url_parse",
    """
    WITH urls AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang || '/' || doc_id
               || '?ref=crawl&page=' || (doc_id % 7) AS url
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'page=([0-9]+)', 1) AS page
    FROM urls ORDER BY doc_id
    """,
    tags=("training", "scalar", "url"),
)
def scalar_url_parse(spark, sf_dir):
    """URL decomposition (provenance extraction for crawl curation):
    host / path / query-param pulls. Spark side uses the dedicated
    `parse_url` expression (JVM, codegen); DuckDB has no URL functions, so
    the oracle is the regexp formulation — same outputs, which is itself
    the compatibility check for the regex fallback an engine without
    parse_url would use."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?ref=crawl&page="), (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("page")).alias("page"),
    ).orderBy("doc_id")


@query(
    "text_vocab_topk",
    """
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (
      SELECT lang, tok, count(*)::BIGINT AS c FROM toks GROUP BY lang, tok
    ),
    ranked AS (
      SELECT lang, tok, c,
             row_number() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rnk
      FROM freq
    )
    SELECT lang, rnk, tok, c FROM ranked WHERE rnk <= 20
    ORDER BY lang, rnk
    """,
    tags=("training", "text", "vocab"),
)
def text_vocab_topk(spark, sf_dir):
    """Vocabulary builder: top-20 tokens per language by corpus frequency —
    the seed statistic of BPE/unigram tokenizer training. Token counting
    map-side-combines to |vocab| rows per lang before the shuffle; the
    top-k is a per-lang window over the ALREADY-aggregated frequency table
    (tiny), never over raw tokens. Deterministic count-then-token
    tiebreak."""
    d = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
    return (
        freq.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 20)
        .select("lang", "rnk", "tok", "c")
        .orderBy("lang", "rnk")
    )


@query(
    "split_train_val_test",
    """
    WITH b AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('split1:' || doc_id::VARCHAR), 1, 14))::BIGINT % 1000 AS bkt
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bkt < 800 THEN 'train'
                WHEN bkt < 900 THEN 'val'
                ELSE 'test' END AS split
    FROM b ORDER BY doc_id
    """,
    tags=("training", "split"),
)
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split: one stable hash bucket
    per doc keyed by a SALT + id, partitioned into disjoint ranges. The
    properties that matter: disjoint and exhaustive by construction, stable
    under corpus growth (a doc never migrates between splits when others are
    added), re-derivable by any engine, and a new salt gives an independent
    resplit. Narrow projection — no shuffle, no state."""
    d = t(spark, sf_dir, "documents")
    bkt = sp.hash_bucket(F.concat(F.lit("split1:"), F.col("doc_id").cast("string")))
    return d.select(
        "doc_id", "lang",
        F.when(bkt < 800, "train").when(bkt < 900, "val").otherwise("test").alias("split"),
    ).orderBy("doc_id")


@query(
    "shuffle_deterministic",
    """
    SELECT doc_id,
           ('0x' || substr(md5('epoch7:' || doc_id::VARCHAR), 1, 14))::BIGINT AS shuffle_key
    FROM documents ORDER BY shuffle_key, doc_id
    """,
    tags=("training", "shuffle"),
)
def shuffle_deterministic(spark, sf_dir):
    """Deterministic global shuffle for training-order randomization: a
    seeded hash of the id IS the shuffle order — reproducible across runs
    and engines, re-seedable per epoch. At scale the writer
    repartitionByRange(shuffle_key)s so shard files are globally shuffled
    without any single-partition sort; the key column is the contract, the
    presentation ORDER BY here is only for the oracle hash."""
    d = t(spark, sf_dir, "documents")
    key = dd.minhash_base_hash(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    return d.select("doc_id", key.alias("shuffle_key")).orderBy("shuffle_key", "doc_id")


@query(
    "dedup_lines_global",
    """
    WITH lines AS (
      SELECT doc_id, i AS pos, tk[i] AS line
      FROM (SELECT doc_id, string_split(text, '. ') AS tk FROM documents) d,
           LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) s
    ),
    firsts AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY md5(line)
                                ORDER BY doc_id, pos) AS occ
      FROM lines
    )
    SELECT doc_id,
           array_to_string(list(line ORDER BY pos), '. ') AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS kept_lines
    FROM firsts WHERE occ = 1
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("training", "dedup", "lines"),
)
def dedup_lines_global(spark, sf_dir):
    """Corpus-global line-level dedup (the C4/CCNet pass): explode docs into
    sentence-ish units, keep only each unit's FIRST occurrence corpus-wide
    (ordered by (doc_id, pos) — deterministic), reassemble survivors in
    original order. Shape: one explode -> one window over the 16-byte line
    hash (the only shuffle carries hashes + coordinates, not documents) ->
    regroup by doc. Docs whose every line was seen before vanish entirely —
    the boilerplate-killer behavior."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\\. ")).alias("pos0", "line")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "line")
    w = Window.partitionBy(F.md5("line")).orderBy("doc_id", "pos")
    firsts = lines.withColumn("occ", F.row_number().over(w)).where(F.col("occ") == 1)
    return (
        firsts.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda x: x["line"],
                ),
                ". ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("kept_lines"),
        )
        .orderBy("doc_id")
    )


@query(
    "events_retention",
    """
    WITH firsts AS (
      -- TIMESTAMP (not DATE) on both engines: pandas widens DuckDB DATE to
      -- datetime64 while Spark dates stay datetime.date, which a
      -- dtype-sensitive canonicalizer renders differently
      SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort,
             datediff('day', f.cohort, date_trunc('day', e.ts)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort, day_offset, CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity WHERE day_offset <= 7
    GROUP BY cohort, day_offset ORDER BY cohort, day_offset
    """,
    tags=("training", "events", "retention"),
)
def events_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-activity day, counted
    per day-offset of return visits (first week). Two aggregations on
    user_id + one broadcastable first-day join — the cohort table is
    |users| rows, tiny next to the event stream, so the 100 TB side joins
    against a broadcast and shuffles once for the distinct."""
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("timestamp_ntz").alias("cohort")
    )
    activity = (
        e.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id", "cohort",
            F.datediff(F.to_date("ts"), F.to_date("cohort")).alias("day_offset"),
        )
        .where(F.col("day_offset") <= 7)
        .distinct()
    )
    return (
        activity.groupBy("cohort", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort", "day_offset")
    )


@query(
    "join_fuzzy_edit1",
    """
    WITH a AS (
      SELECT doc_id AS a_id, lower(string_split(text, ' ')[1]) AS a_name
      FROM documents WHERE doc_id < 300
    ),
    b AS (
      SELECT doc_id + 100000 AS b_id,
             CASE WHEN doc_id % 3 = 0
                  THEN lower(substr(string_split(text, ' ')[1], 1, 1)
                       || substr(string_split(text, ' ')[1], 3))
                  ELSE lower(string_split(text, ' ')[1]) END AS b_name
      FROM documents WHERE doc_id < 300
    )
    SELECT a.a_id, b.b_id
    FROM a, b WHERE levenshtein(a.a_name, b.b_name) <= 1
    ORDER BY a_id, b_id
    """,
    tags=("training", "join", "fuzzy"),
)
def join_fuzzy_edit1(spark, sf_dir):
    """Fuzzy join (edit distance <= 1) between clean names and a feed with
    planted one-character typos. The oracle is the naive cross join +
    levenshtein; the Spark plan is the FastSS deletion-neighborhood
    equi-join (operators/fuzzyjoin.py) — O((n+m)*len) variant rows instead
    of O(n*m) comparisons, with a levenshtein verify on the candidates."""
    from dumpr_spark.operators.fuzzyjoin import edit1_join

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    first_tok = F.lower(F.element_at(F.split(F.col("text"), " "), 1))
    a = d.select(F.col("doc_id").alias("a_id"), first_tok.alias("a_name"))
    typo = F.lower(
        F.concat(
            F.substring(F.element_at(F.split(F.col("text"), " "), 1), 1, 1),
            F.expr("substr(split(text, ' ')[0], 3)"),
        )
    )
    b = d.select(
        (F.col("doc_id") + 100000).alias("b_id"),
        F.when(F.col("doc_id") % 3 == 0, typo).otherwise(first_tok).alias("b_name"),
    )
    return (
        edit1_join(a, b, "a_name", "b_name")
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    )


@query(
    "join_overlap_intervals",
    """
    WITH u AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS us,
             date_trunc('hour', min(ts)) + INTERVAL 6 HOUR AS ue
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT event_type, date_trunc('day', min(ts)) AS cs,
             date_trunc('day', min(ts)) + INTERVAL 2 DAY AS ce
      FROM events GROUP BY event_type
    )
    SELECT u.user_id, c.event_type
    FROM u, c WHERE u.us < c.ce AND c.cs < u.ue
    ORDER BY user_id, event_type
    """,
    tags=("training", "join", "range"),
)
def join_overlap_intervals(spark, sf_dir):
    """Interval x interval overlap join (user activity windows x per-type
    campaign windows): the bucketed both-sides-explode form
    (operators/rangejoin.py:bucketed_overlap_join) with first-shared-bucket
    dedup, against the naive cross+filter oracle."""
    from dumpr_spark.operators.rangejoin import bucketed_overlap_join

    e = t(spark, sf_dir, "events")
    u = (
        e.groupBy("user_id")
        .agg(F.date_trunc("hour", F.min("ts")).alias("us"))
        .withColumn("ue", F.col("us") + F.expr("INTERVAL 6 HOURS"))
    )
    c = (
        e.groupBy("event_type")
        .agg(F.date_trunc("day", F.min("ts")).alias("cs"))
        .withColumn("ce", F.col("cs") + F.expr("INTERVAL 2 DAYS"))
    )
    return (
        bucketed_overlap_join(u, c, "us", "ue", "cs", "ce", 3600)
        .select("user_id", "event_type")
        .orderBy("user_id", "event_type")
    )


@query(
    "dedup_url_canonical",
    """
    WITH urls AS (
      SELECT doc_id,
             'https://' ||
             (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
             source || '.Example.COM' ||
             '/docs/' || lang || '/' || (doc_id % 120) ||
             (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
             (CASE WHEN doc_id % 5 = 0
                   THEN '?utm_source=feed&utm_campaign=x&id=' || (doc_id % 120)
                   ELSE '?id=' || (doc_id % 120) END) AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             'https://' ||
             regexp_replace(lower(regexp_extract(url, '^https://([^/]+)', 1)), '^www\\.', '') ||
             regexp_replace(regexp_extract(url, '^https://[^/]+(/[^?]*)', 1), '/$', '') ||
             '?id=' || regexp_extract(url, '[?&]id=([0-9]+)', 1) AS curl
      FROM urls
    )
    SELECT curl, CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(MIN(doc_id) AS BIGINT) AS keeper
    FROM canon GROUP BY curl ORDER BY curl
    """,
    tags=("training", "dedup", "url"),
)
def dedup_url_canonical(spark, sf_dir):
    """URL-canonicalization dedup — the crawl-curation step before any text
    dedup: the same page arrives as http/https, WWW./apex, trailing-slash,
    and utm-tracking variants, and naive exact-URL dedup misses all of them.
    Canonical key = lowercased apex host + trailing-slash-trimmed path +
    tracking-params-stripped query; keeper = min doc_id per key (the same
    keep-first rule as dedup_exact).

    Variant URLs are derived deterministically from doc_id IN BOTH ENGINES
    (the corpus has no URL column), with collisions forced via doc_id % 120.
    Scale shape: canonicalization is a narrow regex projection fused into
    the scan; the only shuffle is the groupBy on the 16-byte-ish canonical
    key — identical to dedup_exact_hash's profile."""
    d = t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.when(k % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"), F.lit(".Example.COM"),
        F.lit("/docs/"), F.col("lang"), F.lit("/"), (k % 120).cast("string"),
        F.when(k % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            k % 5 == 0,
            F.concat(F.lit("?utm_source=feed&utm_campaign=x&id="), (k % 120).cast("string")),
        ).otherwise(F.concat(F.lit("?id="), (k % 120).cast("string"))),
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, r"^https://([^/]+)", 1)), r"^www\.", ""
    )
    path = F.regexp_replace(F.regexp_extract(url, r"^https://[^/]+(/[^?]*)", 1), r"/$", "")
    curl = F.concat(
        F.lit("https://"), host, path, F.lit("?id="),
        F.regexp_extract(url, r"[?&]id=([0-9]+)", 1),
    )
    return (
        d.select(k.alias("doc_id"), curl.alias("curl"))
        .groupBy("curl")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper"),
        )
        .orderBy("curl")
    )


@query(
    "text_bigram_logprob",
    """
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS a FROM documents
    ),
    bg AS (
      SELECT doc_id, a[i] AS prev, a[i + 1] AS cur
      FROM tk, LATERAL (SELECT unnest(generate_series(1, len(a) - 1)) AS i) g
    ),
    cb AS (SELECT prev, cur, count(*)::DOUBLE AS c FROM bg GROUP BY prev, cur),
    cp AS (SELECT prev, count(*)::DOUBLE AS cp FROM bg GROUP BY prev),
    sc AS (
      SELECT b.doc_id, ln(cb.c / cp.cp) AS lp
      FROM bg b
      JOIN cb ON b.prev = cb.prev AND b.cur = cb.cur
      JOIN cp ON b.prev = cp.prev
    )
    SELECT doc_id, ROUND(AVG(lp) + 1e-9, 4) AS avg_logprob,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams
    FROM sc GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("training", "quality", "lm"),
)
def text_bigram_logprob(spark, sf_dir):
    """Bigram-LM scoring: per-doc average of ln P(cur|prev) with MLE
    conditional probabilities (c(prev,cur) / c(prev,*)) — one LM order above
    `text_unigram_logprob`, the cheap perplexity proxy that actually catches
    shuffled-word salad (uniform unigrams, junk bigrams).

    The bigram explode is NARROW: arrays_zip of two slices of the token
    array fans out in-place, no per-doc window or sort. The model tables
    (bigram and prev counts) are Zipf-small next to the corpus, so both
    scoring joins broadcast; the only corpus-sized shuffle is the final
    per-doc average, which map-side-combines. In-corpus scoring means no
    OOV path (c >= 1 by construction); a held-out model would coalesce to a
    floor. Docs under two tokens have no bigrams and drop out identically
    in both engines."""
    d = t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    n = F.size(tk)
    bg = (
        d.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice(tk, 1, n - 1).alias("prev"),
                    F.slice(tk, 2, n - 1).alias("cur"),
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.prev").alias("prev"), F.col("b.cur").alias("cur"))
    )
    cb = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).cast("double").alias("c"))
    cp = bg.groupBy("prev").agg(F.count(F.lit(1)).cast("double").alias("cp"))
    scored = (
        bg.join(F.broadcast(cb), ["prev", "cur"])
        .join(F.broadcast(cp), "prev")
        .select("doc_id", F.log(F.col("c") / F.col("cp")).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            eps_round(F.avg("lp"), 4).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )


@query(
    "sample_temperature_mix",
    """
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT SUM(POW(n, 0.5)) AS sw, CAST(SUM(n) AS BIGINT) AS n_all FROM counts
    ),
    rates AS (
      SELECT c.lang, c.n,
             CAST(FLOOR(1000000 * LEAST(
               1.0, (0.5 * t.n_all / t.sw) * POW(c.n, -0.5))) AS BIGINT) AS thr
      FROM counts c CROSS JOIN tot t
    ),
    kept AS (
      SELECT d.lang FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 14))::BIGINT % 1000000 < r.thr
    ),
    kc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept GROUP BY lang)
    SELECT r.lang, r.n AS n_total, COALESCE(kc.n_kept, 0) AS n_kept
    FROM rates r LEFT JOIN kc ON r.lang = kc.lang
    ORDER BY r.lang
    """,
    tags=("training", "sampling"),
)
def sample_temperature_mix(spark, sf_dir):
    """Temperature-based mixture sampling (the multilingual-pretraining
    rebalance: sample language l with probability proportional to
    count^alpha, alpha = 0.5, total target = half the corpus): dominant
    languages are down-sampled, tail languages kept nearly whole. Unlike
    the fixed per-stratum rates of `sample_stratified_hash`, the rates here
    are DERIVED FROM THE DATA (per-language counts -> normalized
    temperature weights -> per-row keep threshold), then applied as the
    same stable md5-bucket filter — rerun-stable, oracle-recomputable.

    Scale shape: the rate table is |languages| rows built from one rollup
    + one scalar aggregate (both metadata-sized, broadcast back); the
    selection itself is a narrow filter under a broadcast join — one fact
    shuffle total (the count rollup), nothing resident. Both engines build
    the integer threshold with the same IEEE ops (pow/div/floor), so the
    boundary is bit-identical."""
    from dumpr_spark.functions.sampling import hash_bucket

    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(
        F.sum(F.pow("n", 0.5)).alias("sw"), F.sum("n").cast("long").alias("n_all")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        F.floor(
            1e6
            * F.least(
                F.lit(1.0), (0.5 * F.col("n_all") / F.col("sw")) * F.pow("n", -0.5)
            )
        ).cast("long").alias("thr"),
    )
    kept = d.join(F.broadcast(rates.select("lang", "thr")), "lang").where(
        hash_bucket("doc_id", 1_000_000) < F.col("thr")
    )
    kc = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        rates.join(kc, "lang", "left")
        .select(
            "lang",
            F.col("n").alias("n_total"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


@query(
    "export_shard_manifest",
    """
    WITH base AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    cum AS (
      SELECT doc_id, lang, n_chars, n_tokens, h,
             COALESCE(CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS tok_before
      FROM base
    ),
    sh AS (
      SELECT *, CAST(floor(tok_before / 500.0) AS BIGINT) AS shard_id FROM cum
    )
    SELECT lang, shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
           CAST(SUM(n_chars) AS BIGINT) AS bytes_total,
           arg_min(doc_id, h) AS first_doc
    FROM sh GROUP BY lang, shard_id ORDER BY lang, shard_id
    """,
    tags=("training", "export"),
)
def export_shard_manifest(spark, sf_dir):
    """Token-budget shard assignment + manifest — the training-export
    planning op: per language stratum, order documents by a deterministic
    content-independent hash (md5 of the id, so assignment is stable under
    corpus growth elsewhere), running-total their token counts, and cut
    ~500-token shards at the cumulative boundary (a doc belongs to
    floor(tokens_before / budget) — the greedy streaming-writer rule).
    The manifest rows (docs, tokens, bytes, first doc per shard) are what a
    downstream trainer consumes to schedule shard reads.

    Scale shape: one keyed window per stratum (PARTITION BY lang) — strata
    are many and independent, so the prefix sums parallelize across the
    cluster; the manifest rollup reuses the same (lang, shard) key. For a
    single giant stratum the same running total is computed with the
    two-phase distributed prefix scan (approxQuantile buckets -> per-bucket
    summaries -> broadcast offsets) used by operators/ntile and the batch
    tx filter — the shape is already in the repo, keyed windows are the
    right default while strata partition the corpus.
    """
    from dumpr_spark.functions.export import assign_shards

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    cum = assign_shards(d, "lang", "doc_id", "n_tokens", budget=500)
    return (
        cum.groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.sum("n_chars").cast("long").alias("bytes_total"),
            F.min_by("doc_id", "h").alias("first_doc"),
        )
        .orderBy("lang", "shard_id")
    )


# ---------------------------------------------------------------------------
# Round-5 additions (_R5_NEW): deterministic sampling, leakage-free time split
# ---------------------------------------------------------------------------


@query(
    "sample_reservoir_hash",
    """
    SELECT doc_id, lang, substring(md5('rsv1:' || doc_id), 1, 12) AS rank_key
    FROM documents
    ORDER BY rank_key, doc_id LIMIT 64
    """,
    tags=("training", "sampling"),
)
def sample_reservoir_hash(spark, sf_dir):
    """Deterministic uniform k-sample: the 64 documents with the smallest
    seeded-hash rank — the distributed replacement for reservoir sampling.
    A true reservoir is sequential (its state depends on arrival order);
    ranking by a seeded content hash gives the identical uniform
    distribution, is reproducible across engines and reruns, and composes
    (the union of two corpora re-ranks to the union sample; changing k
    only extends the prefix — same property the hash split relies on).

    Scale shape: global top-k by hash = TakeOrderedAndProject (per
    partition heap of 64, driver merges W heaps) — no global sort
    materializes; the hash is a narrow projection in the scan stage."""
    d = t(spark, sf_dir, "documents")
    rank_key = F.substring(
        F.md5(F.concat(F.lit("rsv1:"), F.col("doc_id").cast("string"))), 1, 12
    )
    return (
        d.select("doc_id", "lang", rank_key.alias("rank_key"))
        .orderBy("rank_key", "doc_id")
        .limit(64)
    )


@query(
    "sample_time_split",
    """
    WITH cutoff AS (
      SELECT quantile_cont(epoch_ms(ts), 0.9) AS cut_ms FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN epoch_ms(ts) <= cut_ms THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(SUM(CASE WHEN epoch_ms(ts) > cut_ms THEN 1 ELSE 0 END) AS BIGINT)
             AS n_holdout
    FROM events, cutoff
    GROUP BY event_type ORDER BY event_type
    """,
    tags=("training", "sampling", "timeseries"),
)
def sample_time_split(spark, sf_dir):
    """Temporal train/holdout split at the 90th time percentile: everything
    at-or-before the cutoff trains, the trailing 10% holds out — the
    leakage-free counterpart of the hash split (split_train_val_test) for
    forecasting/recency-sensitive models, where random splits leak future
    context into training.

    Scale shape: the cutoff is ONE interpolated order statistic (exact
    percentile here, matched to the oracle's quantile_cont; at 100 TB the
    production dial is approx_percentile with a documented error budget —
    the split only shifts by the accuracy band) broadcast against the
    grouped count — the stream is never sorted."""
    e = t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    cutoff = e.agg(F.percentile(ms, F.lit(0.9)).alias("cut_ms"))
    return (
        e.select("event_type", ms.alias("ms"))
        .crossJoin(F.broadcast(cutoff))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("ms") <= F.col("cut_ms"), 1).otherwise(0))
            .cast("long").alias("n_train"),
            F.sum(F.when(F.col("ms") > F.col("cut_ms"), 1).otherwise(0))
            .cast("long").alias("n_holdout"),
        )
        .orderBy("event_type")
    )


@query(
    "sample_weighted_topk",
    """
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROUND(LN((('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT + 1)
                      / (72057594037927936.0 + 1)) / n_chars + 1e-12, 9) AS es_key
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, es_key
    FROM keyed ORDER BY es_key DESC, doc_id LIMIT 20
    """,
    tags=("training", "sampling"),
)
def sample_weighted_topk(spark, sf_dir):
    """Weighted sampling without replacement (Efraimidis-Spirakis): each
    row draws u from a DETERMINISTIC md5-uniform of its id and keys on
    ln(u)/w (the log form of u^(1/w)); the global top-k by key IS a
    weighted sample — longer documents win proportionally more often, yet
    re-runs and incremental batches select the SAME rows (df.sample()
    cannot do either). The exp-key trick turns "sample k of N by weight"
    into an embarrassingly-parallel top-k.

    Scale shape: the key is a narrow projection off the scan (no shuffle);
    global top-20 is TakeOrdered (per-partition heaps + driver merge of
    k-row summaries), never a global sort or window. Ranking uses the
    eps-ROUNDED key with id tie-break so the cut is a pure function of
    published values on both engines."""
    d = t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 14), 16, 10).cast("long")
    u = (h + F.lit(1)) / F.lit(72057594037927936.0 + 1)  # (0, 1]: 2^56 buckets
    key = F.round(F.log(u) / F.col("n_chars") + F.lit(1e-12), 9)
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "doc_id")
        .limit(20)
    )


@query(
    "sample_balanced_classes",
    """
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 300 ORDER BY lang, rk
    """,
    tags=("training", "sampling"),
)
def sample_balanced_classes(spark, sf_dir):
    """Class-balanced training-set construction: cap every language at
    300 documents by DETERMINISTIC hash rank — rows are ordered within
    each class by md5(id) (a stable shuffle, not an RNG), so re-runs,
    retries, and any engine select the IDENTICAL balanced subset; corpus
    growth churns only MARGINALLY (a new row displaces at most one
    marginal rank-300 row — expected churn ~ cap x growth fraction,
    where a seeded random shuffle would reshuffle everything). The
    class-imbalance remedy next to
    sample_stratified_hash's rate-based thinning: caps equalize head
    classes without starving tail classes below their natural size.

    Scale shape: one class-PARTITIONED rank window (no global order) over
    a narrow (id, class) projection; Spark 4 plans rank-then-filter as
    WindowGroupLimit — a per-partition top-k heap, so each task retains
    300 rows per class, never the full class. At 100 TB the md5 rides the
    scan and the shuffle carries (id, class, hash) triples only."""
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 300)
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"))
        .orderBy("lang", "rk")
    )


@query(
    "text_perplexity",
    """
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    n_total AS (SELECT count(*)::DOUBLE AS n FROM toks),
    freq AS (SELECT tok, count(*)::DOUBLE AS c FROM toks GROUP BY tok),
    scored AS (
      SELECT t.lang, ln(f.c / (SELECT n FROM n_total)) AS lp
      FROM toks t JOIN freq f ON t.tok = f.tok
    ),
    per_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(AVG(lp) + 1e-9, 6) AS avg_lp
      FROM scored GROUP BY lang
    )
    SELECT lang, n_tokens,
           ROUND(exp(-avg_lp) + 1e-9, 4) AS perplexity,
           ROUND(-avg_lp / ln(2) + 1e-9, 4) AS bits_per_token
    FROM per_lang ORDER BY lang
    """,
    tags=("training", "quality", "lm"),
)
def text_perplexity(spark, sf_dir):
    """Per-language unigram perplexity and bits-per-token — the corpus-
    level LM-quality dial on top of text_unigram_logprob's per-doc
    scores: exp(-mean log p) over each language's tokens. Mixture design
    reads it directly (a language whose perplexity under the shared
    vocabulary is far above the rest is under-represented or noisy), and
    bits-per-token is the compression-cost number token-budget planning
    uses.

    Scale shape: identical two-phase LM as text_unigram_logprob — the
    Zipf-small frequency table broadcasts against the token explode, the
    per-lang average map-side-combines to |langs| rows. VOCAB-BROADCAST
    ASSUMPTION (the plan's one dial): `F.broadcast(freq)` presumes the
    distinct-token table stays broadcast-sized — true for natural-language
    corpora, whose vocabulary grows ~ Heaps' law (n^0.5-ish, tens of
    millions of types at 100 TB ~ a few hundred MB of (token, count)
    pairs, at or past the comfortable broadcast ceiling). On an
    open-vocabulary crawl (URLs, hashes, code identifiers) DROP the
    broadcast hint: the join degrades gracefully to a shuffle equi-join on
    `tok` — same results, one extra exchange of the exploded tokens —
    and the plan is otherwise unchanged. Determinism: the
    parallel AVG of logs is eps-rounded 6dp BEFORE the exp/log2
    transforms (identical inputs -> at most 1 ulp of libm divergence,
    absorbed by the 4dp output rounding); no hard decision reads any of
    it."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    scored = (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(total))
        .select("lang", F.log(F.col("c") / F.col("n")).alias("lp"))
    )
    per_lang = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        eps_round(F.avg("lp"), 6).alias("avg_lp"),
    )
    return per_lang.select(
        "lang", "n_tokens",
        eps_round(F.exp(-F.col("avg_lp")), 4).alias("perplexity"),
        eps_round(-F.col("avg_lp") / F.log(F.lit(2.0)), 4)
            .alias("bits_per_token"),
    ).orderBy("lang")


@query(
    "train_mixture_weights",
    """
    WITH per_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             SUM(len(string_split(text, ' ')))::BIGINT AS tokens
      FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT SUM(tokens)::DOUBLE AS t, COUNT(*)::DOUBLE AS n_langs
      FROM per_lang
    ),
    w AS (
      SELECT p.lang, p.n_docs, p.tokens,
             ROUND(LEAST((t.t / t.n_langs) / p.tokens, 4.0) + 1e-9, 6) AS weight
      FROM per_lang p, tot t
    ),
    e AS (
      SELECT lang, n_docs, tokens, weight,
             ROUND(tokens * weight + 1e-9, 4) AS expected_tokens
      FROM w
    ),
    s AS (SELECT SUM(expected_tokens) AS se FROM e)
    SELECT e.lang, e.n_docs, e.tokens, e.weight, e.expected_tokens,
           ROUND(e.expected_tokens / s.se + 1e-9, 6) AS final_share
    FROM e, s ORDER BY e.lang
    """,
    tags=("training", "mixture", "sampling"),
)
def train_mixture_weights(spark, sf_dir):
    """Training-mixture weight solver — the step between token accounting
    and the samplers: per-domain (language here) sampling weights that
    move the mixture toward a UNIFORM token target, with the standard
    max-epochs cap (4.0 — never upsample a small domain more than 4x, the
    repetition ceiling mixture recipes use), plus the resulting expected
    tokens and final realized share after the cap binds. Downstream,
    sample_weighted_topk / sample_temperature_mix consume exactly this
    weight column.

    Scale shape: the scan collapses to |domains| rows immediately
    (map-side combine of two integer sums); everything after is
    arithmetic on a metadata-sized frame with two 1-row scalar
    broadcasts. Determinism: token counts are exact integers, the cap
    compare LEAST(raw, 4.0) reads a ratio of exact-integer-derived
    doubles (identical both engines), weight and expected_tokens are
    eps-rounded before the tiny re-aggregation, and final_share is
    eps-rounded at output."""
    d = t(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long")
            .alias("tokens"),
    )
    tot = per_lang.agg(
        F.sum("tokens").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("n_langs"),
    )
    w = per_lang.crossJoin(F.broadcast(tot)).select(
        "lang", "n_docs", "tokens",
        eps_round(
            F.least((F.col("t") / F.col("n_langs")) / F.col("tokens"),
                    F.lit(4.0)),
            6,
        ).alias("weight"),
    )
    e = w.select(
        "lang", "n_docs", "tokens", "weight",
        eps_round(F.col("tokens") * F.col("weight"), 4)
            .alias("expected_tokens"),
    )
    s = e.agg(F.sum("expected_tokens").alias("se"))
    return (
        e.crossJoin(F.broadcast(s))
        .select(
            "lang", "n_docs", "tokens", "weight", "expected_tokens",
            eps_round(F.col("expected_tokens") / F.col("se"), 6)
                .alias("final_share"),
        )
        .orderBy("lang")
    )


@query(
    "text_hashed_features",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    bucketed AS (
      SELECT tok,
             ('0x' || substr(md5(tok), 1, 14))::BIGINT % 64 AS bucket
      FROM toks
    ),
    per_tok AS (
      SELECT bucket, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bucketed GROUP BY bucket, tok
    ),
    ranked AS (
      SELECT bucket, tok, cnt,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY cnt DESC, tok) AS rn
      FROM per_tok
    ),
    stats AS (
      SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS n_instances,
             CAST(COUNT(*) AS INT) AS n_distinct_tokens
      FROM per_tok GROUP BY bucket
    )
    SELECT s.bucket, s.n_instances, s.n_distinct_tokens,
           r.tok AS top_token
    FROM stats s JOIN ranked r ON s.bucket = r.bucket AND r.rn = 1
    ORDER BY s.bucket
    """,
    tags=("training", "features", "hashing"),
)
def text_hashed_features(spark, sf_dir):
    """Feature hashing (the hashing trick) over whitespace tokens: every
    token maps to md5-hash mod 64 — the fixed-width, vocabulary-free
    featurization linear quality models train on at corpus scale (no
    vocabulary build, no OOV, bounded feature width). Reports the bucket
    histogram a practitioner actually inspects before trusting hashed
    features: instances and DISTINCT tokens per bucket (collision load)
    plus each bucket's dominant token (cnt desc, token asc tie-break —
    deterministic).

    Scale shape: the explode collapses to (bucket, token) cells by
    map-side combine — distinct-token-bounded, not corpus-bounded — and
    then to 64 bucket rows; the dominant token is a WindowGroupLimit
    over the cell table, never a global sort. The md5-derived bucket is
    the same hash family every sampler/splitter here uses, so the
    assignment is engine-exact and stable across runs/engines."""
    d = t(spark, sf_dir, "documents")
    from dumpr_spark.functions.dedup import minhash_base_hash

    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
    per_tok = (
        toks.select("tok", (minhash_base_hash(F.col("tok")) % 64).alias("bucket"))
        .groupBy("bucket", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    rn_w = Window.partitionBy("bucket").orderBy(
        F.desc("cnt"), F.asc("tok")
    )
    top = (
        per_tok.withColumn("_rn", F.row_number().over(rn_w))
        .where(F.col("_rn") == 1)
        .select("bucket", F.col("tok").alias("top_token"))
    )
    stats = per_tok.groupBy("bucket").agg(
        F.sum("cnt").alias("n_instances"),
        F.count(F.lit(1)).cast("int").alias("n_distinct_tokens"),
    )
    return stats.join(top, "bucket").orderBy("bucket")
