"""Training-pipeline ops: chunking, packing, range join, deterministic
sampling — operator-level properties the DuckDB oracles don't pin."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def test_chunk_covers_every_token_when_stride_le_width(spark):
    from dumpr_spark.functions.chunking import chunk_documents

    docs = [(1, " ".join(f"t{i}" for i in range(50))), (2, "a b c"), (3, "solo")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=16, stride=12).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # stride <= width => union of chunk token ranges covers [1, n]
    covered = set()
    for r in by_doc[1]:
        covered.update(range(r["start"], r["start"] + r["n_tokens"]))
    assert covered == set(range(1, 51))
    # short docs: exactly one (partial) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 1


def test_pack_respects_budget_and_matches_greedy(spark):
    from dumpr_spark.functions.chunking import pack_sequences

    rows = [("en", i, (i * 37) % 90 + 10) for i in range(100)]
    rows += [("de", i, 300) for i in range(3)]  # oversized docs: bin of their own
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tok long")
    out = pack_sequences(df, budget=256).collect()
    got = {(r["lang"], r["doc_id"]): r["bin"] for r in out}

    # python greedy replica
    for lang in ("en", "de"):
        docs = sorted([(d, n) for (l, d, n) in rows if l == lang])
        cur, fill, expect = -1, 0, {}
        for d, n in docs:
            if cur < 0 or fill + n > 256:
                cur, fill = cur + 1, n
            else:
                fill += n
            expect[d] = cur
        for d, b in expect.items():
            assert got[(lang, d)] == b, (lang, d)

    # every multi-doc bin is within budget
    fills = {}
    for (lang, d), b in got.items():
        n = next(n for (l, dd, n) in rows if l == lang and dd == d)
        fills.setdefault((lang, b), []).append(n)
    for (lang, b), ns in fills.items():
        assert sum(ns) <= 256 or len(ns) == 1, (lang, b, ns)


def test_bucketed_range_join_equals_naive(spark):
    from dumpr_spark.operators.rangejoin import bucketed_interval_join

    t0 = dt.datetime(2024, 1, 1)
    events = [(i, t0 + dt.timedelta(minutes=7 * i)) for i in range(200)]
    edf = spark.createDataFrame(events, "event_id long, ts timestamp")
    ivs = [
        (1, t0, t0 + dt.timedelta(hours=1)),                      # end on bucket boundary
        (2, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(hours=5, minutes=30)),
        (3, t0 + dt.timedelta(days=2), t0 + dt.timedelta(days=2, hours=1)),  # empty
        (4, t0 + dt.timedelta(minutes=14), t0 + dt.timedelta(minutes=14)),   # zero-length
    ]
    idf = spark.createDataFrame(ivs, "iv_id long, s timestamp, e timestamp")
    got = {
        (r["iv_id"], r["event_id"])
        for r in bucketed_interval_join(edf, idf, "ts", "s", "e", 3600).collect()
    }
    naive = {
        (r["iv_id"], r["event_id"])
        for r in edf.crossJoin(idf)
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive
    assert not any(iv == 3 for iv, _ in got)  # empty interval truly empty
    # boundary exclusivity: ts == e must not match interval 1
    assert (1, 60 // 7 + 1) not in got


def test_stratified_sample_is_stable_and_nested(spark):
    from dumpr_spark.functions.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(1000)], "doc_id long, lang string"
    )
    small = {r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", {"en": 100, "de": 100}).collect()}
    big = {r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", {"en": 400, "de": 400}).collect()}
    again = {r["doc_id"] for r in stratified_sample(df, "doc_id", "lang", {"en": 100, "de": 100}).collect()}
    assert small == again            # deterministic across runs
    assert small <= big              # raising the rate only ADDS rows
    assert 20 <= len(small) <= 200   # ~10% of 1000, loose uniformity bound

    with pytest.raises(ValueError, match="0..1000"):
        stratified_sample(df, "doc_id", "lang", {"en": 2000})


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        n_toks=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=60),
        budget=st.integers(min_value=50, max_value=300),
    )
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_pack_property_greedy_tight(spark, n_toks, budget):
        """Property: bins fill greedily — every bin break is FORCED (the doc
        that opens bin b+1 would not have fit in bin b), and no multi-doc bin
        exceeds the budget."""
        from dumpr_spark.functions.chunking import pack_sequences

        rows = [("s", i, n) for i, n in enumerate(n_toks)]
        df = spark.createDataFrame(rows, "lang string, doc_id long, n_tok long")
        out = sorted(
            pack_sequences(df, budget=budget).collect(), key=lambda r: r["doc_id"]
        )
        fill = {}
        for r in out:
            fill.setdefault(r["bin"], []).append(r["n_tok"])
        assert sorted(fill) == list(range(len(fill)))  # bins are 0..k contiguous
        for b in sorted(fill)[1:]:
            # first doc of bin b did not fit into bin b-1
            assert sum(fill[b - 1]) + fill[b][0] > budget
        for b, ns in fill.items():
            assert sum(ns) <= budget or len(ns) == 1

    @given(
        lens=st.lists(st.integers(min_value=1, max_value=80), min_size=1, max_size=20),
        chunk=st.integers(min_value=2, max_value=24),
        stride_delta=st.integers(min_value=0, max_value=10),
    )
    @settings(max_examples=15, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def test_chunk_property_coverage_and_reconstruction(spark, lens, chunk, stride_delta):
        """Property: with stride <= width every token index is covered, chunk
        texts are exact token slices, and concatenating stride-aligned chunk
        prefixes reconstructs the document."""
        from dumpr_spark.functions.chunking import chunk_documents

        stride = max(1, chunk - stride_delta)
        docs = [(i, " ".join(f"w{i}_{j}" for j in range(n))) for i, n in enumerate(lens)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
        toks = {i: d.split(" ") for i, d in docs}
        covered = {i: set() for i, _ in docs}
        for r in out:
            want = toks[r["doc_id"]][r["start"] - 1 : r["start"] - 1 + chunk]
            assert r["chunk_text"].split(" ") == want
            covered[r["doc_id"]].update(range(r["start"], r["start"] + r["n_tokens"]))
        for i, n in enumerate(lens):
            assert covered[i] == set(range(1, n + 1)), f"doc {i} gap"
except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_quality_model_train_and_score(spark):
    """Train a LogisticRegression on a separable synthetic labeling (gibberish
    = repeated single token vs natural-ish text), then score with the pure-
    expression path: the learned weights must separate the classes."""
    from dumpr_spark.functions.quality_model import (
        score_quality, train_quality_model,
    )

    good = [
        (i, "the quick brown fox jumps over a lazy dog and runs to the hills " * 3, 1.0)
        for i in range(40)
    ]
    bad = [(100 + i, "spam " * 60, 0.0) for i in range(40)]
    df = spark.createDataFrame(good + bad, "doc_id long, text string, label double")
    weights, b = train_quality_model(df)
    scored = df.select(
        "label", score_quality("text", weights, b).alias("s")
    ).collect()
    mean_good = sum(r["s"] for r in scored if r["label"] == 1.0) / 40
    mean_bad = sum(r["s"] for r in scored if r["label"] == 0.0) / 40
    assert mean_good > 0.9 and mean_bad < 0.1, (mean_good, mean_bad)

    with pytest.raises(ValueError, match="unknown feature"):
        score_quality("text", {"nope": 1.0}, 0.0)


def test_hll_mergeable_accuracy_and_merge_equivalence(spark, sf_dir):
    """Mergeable-sketch contract: (a) union-of-daily-sketch estimates are
    within 5% of exact distinct counts; (b) merging partial sketches gives
    the SAME estimate as one sketch over all rows (lossless union)."""
    from dumpr_spark.queries import REGISTRY
    from dumpr_spark.sources.files import load_table

    rows = REGISTRY["agg_hll_mergeable"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["within_bound"], dict(r)
        assert r["merge_consistent"], dict(r)

    e = load_table(spark, sf_dir, "events")
    single = e.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    ).first()["est"]
    merged = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.hll_sketch_agg("user_id").alias("s"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("s")).alias("est"))
        .first()["est"]
    )
    # NOT exact equality: past small-count mode, datasketches union keeps
    # the error bound but not register-identical state (0.4% gap at sf0.1)
    assert abs(single - merged) / max(single, 1) < 0.01, (single, merged)


def test_bucketed_range_join_subsecond_end(spark):
    """Regression: an interval ending mid-second must still match events in
    its final fractional second (bucket ids come from microsecond epochs)."""
    from dumpr_spark.operators.rangejoin import bucketed_interval_join

    t0 = dt.datetime(2024, 1, 1)
    edf = spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=1, microseconds=200_000)),   # 01:00:00.2
         (2, t0 + dt.timedelta(hours=1, microseconds=700_000))],  # 01:00:00.7 (outside)
        "event_id long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1, microseconds=500_000))],  # end 01:00:00.5
        "iv_id long, s timestamp, e timestamp",
    )
    got = {(r["iv_id"], r["event_id"])
           for r in bucketed_interval_join(edf, idf, "ts", "s", "e", 3600).collect()}
    assert got == {(1, 1)}


def test_bucketed_range_join_inverted_interval(spark):
    """Regression (r2 advice): an empty/inverted interval (end <= start) must
    emit no matches and no runaway bucket fan-out (Spark sequences run
    backwards when stop < start; the greatest() clamp caps it at one bucket)."""
    from dumpr_spark.operators.rangejoin import bucketed_interval_join

    t0 = dt.datetime(2024, 1, 1)
    edf = spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=1))], "event_id long, ts timestamp"
    )
    idf = spark.createDataFrame(
        # interval inverted by 1000h — unclamped this fans out a 1000-element
        # descending bucket array per row
        [(1, t0 + dt.timedelta(hours=1000), t0)], "iv_id long, s timestamp, e timestamp"
    )
    joined = bucketed_interval_join(edf, idf, "ts", "s", "e", 3600)
    assert joined.count() == 0
    # the exploded bucket list is clamped to a single element
    from pyspark.sql import functions as F
    w_us = 3600 * 1_000_000
    s_bkt = F.floor(F.unix_micros(F.col("s")) / w_us)
    e_bkt = F.floor((F.unix_micros(F.col("e")) - 1) / w_us)
    n_bkts = idf.select(
        F.size(F.sequence(s_bkt, F.greatest(e_bkt, s_bkt))).alias("n")
    ).first()["n"]
    assert n_bkts == 1


def test_snapshot_table_seq_bound(spark):
    """Regression (r2 advice): table_seq outside 0..1023 would overflow the
    2^53 seq stride into negative/disordered values — must raise instead."""
    import pytest as _pytest

    from dumpr_spark.cdc.envelope import snapshot_to_changes

    df = spark.createDataFrame([(1, "a")], "id INT, v STRING")
    with _pytest.raises(ValueError, match="table_seq"):
        snapshot_to_changes(df, "t", "id", table_seq=1024)
    with _pytest.raises(ValueError, match="table_seq"):
        snapshot_to_changes(df, "t", "id", table_seq=-1)
    # boundary value is fine
    assert snapshot_to_changes(df, "t", "id", table_seq=1023).count() == 1


def test_compact_small_files_recovers_torn_swap(spark, tmp_path):
    """Regression: a crash between the two swap renames leaves only the
    .compact-bak copy; the next compaction run must restore it first."""
    import os
    import shutil

    from dumpr_spark.operators.scale import compact_small_files

    path = str(tmp_path / "tbl")
    spark.range(1000).repartition(8).write.parquet(path)
    # simulate the torn state: state dir renamed away, nothing swapped in
    shutil.move(path, path + ".compact-bak")
    assert not os.path.exists(path)
    n = compact_small_files(spark, path, target_file_mb=128)
    assert n == 1
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(path + ".compact-bak")


def test_edit1_join_equals_naive_and_rejects_distance2(spark):
    """Deletion-neighborhood join == naive levenshtein<=1 join; in particular
    'abc' vs 'cab' (neighborhoods intersect at 'ab' but distance 2) must be
    rejected by the verify step."""
    from dumpr_spark.operators.fuzzyjoin import edit1_join

    names = ["abc", "cab", "abcd", "xbc", "abx", "zzz", "ab", "abcx", ""]
    a = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "a_id long, a_name string")
    b = spark.createDataFrame([(i, n) for i, n in enumerate(names)], "b_id long, b_name string")
    got = {(r["a_id"], r["b_id"]) for r in edit1_join(a, b, "a_name", "b_name").collect()}

    def ed(x, y):
        import functools
        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0: return j
            if j == 0: return i
            return min(d(i-1, j) + 1, d(i, j-1) + 1,
                       d(i-1, j-1) + (x[i-1] != y[j-1]))
        return d(len(x), len(y))

    naive = {(i, j) for i, x in enumerate(names) for j, y in enumerate(names) if ed(x, y) <= 1}
    assert got == naive
    assert (0, 1) not in got  # abc vs cab: shared deletion 'ab' but ed=2


def test_bucketed_overlap_join_equals_naive(spark):
    """Interval-overlap join: bucketed form == naive cross+filter, each pair
    exactly once even when the overlap spans many buckets."""
    from dumpr_spark.operators.rangejoin import bucketed_overlap_join

    t0 = dt.datetime(2024, 1, 1)

    def iv(i, s_min, e_min):
        return (i, t0 + dt.timedelta(minutes=s_min), t0 + dt.timedelta(minutes=e_min))

    left = spark.createDataFrame(
        [iv(1, 0, 300), iv(2, 90, 100), iv(3, 500, 500)],  # long, short, empty
        "l_id long, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [iv(10, 250, 600), iv(11, 95, 96), iv(12, 700, 800)],
        "r_id long, rs timestamp, re timestamp",
    )
    got = {
        (r["l_id"], r["r_id"])
        for r in bucketed_overlap_join(left, right, "ls", "le", "rs", "re", 3600).collect()
    }
    naive = {
        (r["l_id"], r["r_id"])
        for r in left.crossJoin(right)
        .where((F.col("ls") < F.col("re")) & (F.col("rs") < F.col("le")))
        .collect()
    }
    assert got == naive
    assert (1, 10) in got          # multi-bucket overlap counted once
    out = bucketed_overlap_join(left, right, "ls", "le", "rs", "re", 3600)
    assert out.where((F.col("l_id") == 1) & (F.col("r_id") == 10)).count() == 1


def test_paragraph_dedup_keeps_one_canonical_copy(spark, tmp_path):
    """Every duplicated passage survives exactly once corpus-wide (at its
    min-(doc_id,pos) occurrence); unique passages all survive."""
    import duckdb

    boiler = " ".join(f"b{i}" for i in range(10))  # exact 10-token passage
    docs = [
        (1, boiler + " " + " ".join(f"u1x{i}" for i in range(10))),
        (2, " ".join(f"u2x{i}" for i in range(10)) + " " + boiler),
        (3, boiler),
        (4, " ".join(f"u4x{i}" for i in range(7))),  # short doc: one partial passage
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, txt, "en", "s", len(txt)) for i, txt in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).toPandas().to_parquet(tmp_path / "documents.parquet")

    from dumpr_spark.queries import REGISTRY

    got = {r["doc_id"]: r for r in REGISTRY["dedup_paragraphs"].fn(spark, sf).collect()}
    # doc 1 holds the canonical (min doc_id, min pos) boilerplate copy
    assert got[1]["n_paras"] == 2 and got[1]["n_kept"] == 2
    # docs 2 and 3 lose their boilerplate passage, keep their unique ones
    assert got[2]["n_paras"] == 2 and got[2]["n_kept"] == 1
    assert got[3]["n_paras"] == 1 and got[3]["n_kept"] == 0
    assert got[4]["n_kept"] == 1 and got[4]["kept_tokens"] == 7
    # zero-kept doc recomposes to the md5 of the empty string on both engines
    assert got[3]["new_text_md5"] == duckdb.sql("SELECT md5('')").fetchone()[0]


def test_shard_manifest_budget_and_stability(spark):
    """Shard token totals never exceed budget + the largest doc (the greedy
    streaming-writer bound); assignment is stable when other strata grow."""
    rows = [(i, "en" if i % 2 else "de", " ".join(["w"] * ((i * 13) % 80 + 20))) for i in range(120)]
    df = spark.createDataFrame(
        [(i, txt, lang, "s", len(txt)) for i, lang, txt in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    def manifest(frame):
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            frame.toPandas().to_parquet(d + "/documents.parquet")
            from dumpr_spark.queries import REGISTRY

            return REGISTRY["export_shard_manifest"].fn(spark, d).collect()

    out = manifest(df)
    max_doc = 99  # largest n_tokens in the corpus above
    assert sum(r["n_docs"] for r in out) == 120
    for r in out:
        assert r["tokens_total"] <= 500 + max_doc
    # growing the de stratum must not move any en doc's shard
    en_before = {(r["lang"], r["shard_id"]): r["first_doc"] for r in out if r["lang"] == "en"}
    grown = df.union(
        spark.createDataFrame(
            [(1000 + i, "x y z", "de", "s", 5) for i in range(30)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    out2 = manifest(grown)
    en_after = {(r["lang"], r["shard_id"]): r["first_doc"] for r in out2 if r["lang"] == "en"}
    assert en_before == en_after


def test_paragraph_dedup_property_random_corpora(spark):
    """Property (random corpora, tiny vocab => heavy passage collisions):
    per-doc survivor counts match a pure-Python replica of the fold, and
    every distinct passage survives exactly once corpus-wide."""
    import math
    import tempfile
    from collections import defaultdict

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from dumpr_spark.queries import REGISTRY

    def py_oracle(docs):
        paras = []
        for did, txt in docs:
            tks = txt.split(" ")
            for p in range(math.ceil(len(tks) / 10)):
                paras.append((did, p + 1, " ".join(tks[p * 10:(p + 1) * 10])))
        occ = defaultdict(list)
        for did, pos, para in paras:
            occ[para].append((did, pos))
        stats = defaultdict(lambda: [0, 0])  # doc_id -> [n_paras, n_kept]
        for para, lst in occ.items():
            lst.sort()
            for i, (did, pos) in enumerate(lst):
                stats[did][0] += 1
                if len(lst) == 1 or i == 0:
                    stats[did][1] += 1
        return dict(stats)

    @given(
        corpora=st.lists(
            st.lists(st.sampled_from("a b c".split()), min_size=1, max_size=35),
            min_size=1,
            max_size=12,
        )
    )
    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def prop(corpora):
        docs = [(i, " ".join(tks)) for i, tks in enumerate(corpora)]
        with tempfile.TemporaryDirectory() as d:
            spark.createDataFrame(
                [(i, txt, "en", "s", len(txt)) for i, txt in docs],
                "doc_id long, text string, lang string, source string, n_chars long",
            ).toPandas().to_parquet(d + "/documents.parquet")
            got = {
                r["doc_id"]: (r["n_paras"], r["n_kept"])
                for r in REGISTRY["dedup_paragraphs"].fn(spark, d).collect()
            }
        want = {k: tuple(v) for k, v in py_oracle(docs).items()}
        assert got == want
        # corpus-wide: kept occurrences == number of DISTINCT passages
        n_distinct = len({
            " ".join(tks[p * 10:(p + 1) * 10])
            for _i, tks in enumerate(corpora)
            for p in range(math.ceil(len(tks) / 10))
        })
        assert sum(k for _n, k in got.values()) == n_distinct

    prop()


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """The sharded writer materializes one lang=/shard_id= partition dir per
    shard, the read-back manifest matches the plan's budget bound, and the
    layout is consumable by a plain partitioned read."""
    import os

    from dumpr_spark.functions.export import write_training_shards

    rows = [(i, "en" if i % 2 else "de", (i * 13) % 80 + 20) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = str(tmp_path / "shards")
    manifest = write_training_shards(df, out, budget=500).collect()
    assert sum(r["n_docs"] for r in manifest) == 120
    for r in manifest:
        assert r["tokens_total"] <= 500 + 99  # budget + max doc
    # hive layout: lang=*/shard_id=* directories exist for every manifest row
    for r in manifest:
        assert os.path.isdir(os.path.join(out, f"lang={r['lang']}", f"shard_id={r['shard_id']}"))
    # round-trip: the written corpus is complete and partition-readable
    back = spark.read.json(out)
    assert back.count() == 120
    assert back.where("lang = 'en' AND shard_id = 0").count() > 0


def test_shingle_overlap_matches_python_sets(spark):
    """functions/dedup.shingle_overlap_pairs vs plain Python set algebra
    over an adversarial mini-corpus (exact copy, strict containment,
    partial overlap, disjoint, shorter-than-k doc): ni/na/nb must equal
    the true 3-gram-set intersection and sizes for EVERY requested pair —
    including a zero-overlap pair (ni = 0.0 via the left join, not a
    dropped row)."""
    from dumpr_spark.functions.dedup import shingle_overlap_pairs

    docs = {
        1: "a b c d e f",
        2: "a b c d e f",          # exact copy of 1
        3: "a b c d",              # contained in 1's shingles
        4: "c d e f g h",          # partial overlap with 1
        5: "x y z w",              # disjoint
        6: "q r",                  # shorter than k=3 -> whole-text shingle
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id INT, text STRING")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (3, 4)], "a INT, b INT"
    )

    def grams(s):
        tk = s.split()
        if len(tk) < 3:
            return {s}
        return {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}

    got = {
        (r["a"], r["b"]): (r["ni"], r["na"], r["nb"])
        for r in shingle_overlap_pairs(df, pairs).collect()
    }
    assert set(got) == {(1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (3, 4)}
    for (a, b), (ni, na, nb) in got.items():
        ga, gb = grams(docs[a]), grams(docs[b])
        assert (ni, na, nb) == (float(len(ga & gb)), float(len(ga)), float(len(gb))), (a, b)


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    """The registered bootstrap table must behave like a CI: for every
    priority the interval is ordered (lo <= hi), has positive width, and
    brackets the full-sample mean (a 95% CI of the mean over thousands of
    rows essentially always contains the point estimate — deterministic
    resamples make this a stable assertion, not a flaky one)."""
    from dumpr_spark.queries.relational import agg_bootstrap_ci

    rows = agg_bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo"] <= r["mean_price"] <= r["ci_hi"], r
        assert r["ci_width"] > 0
        # the interval is meaningfully narrower than the mean itself
        assert r["ci_width"] < r["mean_price"]


def test_balanced_sample_cap_and_determinism(spark, sf_dir):
    """sample_balanced_classes: every class capped at 300, classes
    smaller than the cap kept whole, ranks contiguous from 1, and the
    selected id set is bit-stable across re-runs (hash rank, not RNG)."""
    from dumpr_spark.queries.training import sample_balanced_classes
    from dumpr_spark.sources.files import load_table

    out = sample_balanced_classes(spark, sf_dir).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append((r["rk"], r["doc_id"]))
    class_sizes = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, rows in by_lang.items():
        rks = sorted(rk for rk, _ in rows)
        assert rks == list(range(1, len(rks) + 1))
        assert len(rows) == min(300, class_sizes[lang])
    rerun = {(r["lang"], r["doc_id"]) for r in
             sample_balanced_classes(spark, sf_dir).collect()}
    assert rerun == {(r["lang"], r["doc_id"]) for r in out}
