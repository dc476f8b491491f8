"""Round-8 operators: IVF index lifecycle (compaction + maintenance
probe) and the signature-collapse LSH tier's member-cap invariants."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_database_watermarking_spark.operators import similarity


def _result_set(df):
    return sorted(
        (r["src"], r["rank"], r["dst"], round(r["cos_sim"], 9))
        for r in df.collect()
    )


@pytest.fixture()
def ivf_dir(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    assigned, cents = similarity.ivf_build_fixed(emb, n_clusters=8)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(assigned, cents, path)
    return path, emb


def test_ivf_compact_preserves_search_and_merges_files(spark, ivf_dir):
    """Repeated appends fragment cluster partitions; compaction must
    merge the files WITHOUT changing any search result."""
    path, emb = ivf_dir
    # three append batches -> >= 4 files in every touched cluster
    for i in range(3):
        batch = emb.filter(
            (F.col("vec_id") >= 20 * i) & (F.col("vec_id") < 20 * (i + 1))
        ).select((F.col("vec_id") + F.lit((i + 1) * 10_000_000)).alias("vec_id"), "embedding")
        similarity.ivf_append(spark, path, batch)

    q = emb.filter(F.col("vec_id") < 10)
    a0, c0 = similarity.load_ivf_index(spark, path)
    before = _result_set(
        similarity.ivf_search_fixed(q, a0, c0, k=5, nprobe=3).localCheckpoint(
            eager=True
        )
    )
    report = similarity.ivf_compact(spark, path)
    a1, c1 = similarity.load_ivf_index(spark, path)
    after = _result_set(similarity.ivf_search_fixed(q, a1, c1, k=5, nprobe=3))
    assert before == after
    # fragmentation actually went down, and rows were preserved
    assert report["after"]["n_files"] < report["before"]["n_files"]
    assert report["rows"] == a1.count()
    # post-compaction: at most one file per cluster partition here
    # (every cluster far below target_rows_per_file)
    base = f"{path}/assigned"
    for entry in os.listdir(base):
        if entry.startswith("cluster="):
            n = sum(
                1
                for f in os.listdir(os.path.join(base, entry))
                if f.endswith(".parquet")
            )
            assert n == 1, (entry, n)


def test_ivf_maintenance_report_flags_fragmentation_then_clears(spark, ivf_dir):
    path, emb = ivf_dir
    for i in range(10):  # heavy fragmentation
        batch = emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + F.lit((i + 1) * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        similarity.ivf_append(spark, path, batch)
    rep = similarity.ivf_maintenance_report(spark, path, files_per_cluster=8)
    assert rep["recommend_compact"] is True
    assert rep["max_files_per_cluster"] > 8
    assert rep["rows"] == rep["rows"]  # well-formed
    similarity.ivf_compact(spark, path)
    rep2 = similarity.ivf_maintenance_report(spark, path, files_per_cluster=8)
    assert rep2["recommend_compact"] is False
    assert rep2["max_files_per_cluster"] == 1
    assert rep2["rows"] == rep["rows"]
    assert rep2["clusters"] == rep["clusters"]


def test_ivf_maintenance_report_flags_occupancy_skew(spark, ivf_dir):
    """Appending a pile of copies of ONE vector makes its cluster hot;
    the probe must recommend retrain on occupancy skew."""
    path, emb = ivf_dir
    one = emb.filter(F.col("vec_id") == 0).select("vec_id", "embedding")
    # ~480 copies of one vector (base is 500 rows over 8 clusters) —
    # all land in a single cluster, skewing its occupancy
    big = one.crossJoin(spark.range(480)).select(
        (F.lit(50_000_000) + F.col("id")).alias("vec_id"), "embedding"
    )
    similarity.ivf_append(spark, path, big)
    rep = similarity.ivf_maintenance_report(spark, path, occupancy_skew=3.0)
    assert rep["recommend_retrain"] is True
    assert any("skew" in r or "drift" in r for r in rep["reasons"])


def test_time_weighted_avg_hand_computed(spark):
    from vector_database_watermarking_spark.operators.temporal import (
        time_weighted_avg,
    )

    rows = [
        # user 1: value 2.0 held 10s, value 4.0 held 5s -> twap 8/3
        (1, 1, "2024-01-01 00:00:00", 2.0),
        (2, 1, "2024-01-01 00:00:10", 4.0),
        (3, 1, "2024-01-01 00:00:15", 99.0),  # last: no duration
        # user 2: single observation -> null twap, zero sums
        (4, 2, "2024-01-01 00:00:00", 7.0),
        # user 3: duplicate ts tie -> event_id order pins the holder
        (5, 3, "2024-01-01 00:00:00", 1.0),
        (6, 3, "2024-01-01 00:00:00", 3.0),
        (7, 3, "2024-01-01 00:00:02", 5.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: r for r in time_weighted_avg(ev).collect()}
    u1 = got[1]
    assert u1["n_holds"] == 2
    assert u1["dur_us"] == 15_000_000
    assert u1["num_scaled_us"] == 200 * 10_000_000 + 400 * 5_000_000
    assert u1["twap_scaled"] == u1["num_scaled_us"] // u1["dur_us"]  # ~267
    assert abs(u1["twap_scaled"] / 100 - 8 / 3) < 0.01
    u2 = got[2]
    assert (u2["n_holds"], u2["dur_us"], u2["twap_scaled"]) == (0, 0, None)
    u3 = got[3]
    # event 5 (value 1.0) holds 0s to event 6; event 6 (3.0) holds 2s
    assert u3["dur_us"] == 2_000_000
    assert u3["twap_scaled"] == 300


def test_dominant_suppliers_hand_computed(spark, tmp_path):
    import os

    li = spark.createDataFrame(
        [
            # part 100: supplier 1 ships 30 of 100 (>20%), supplier 2
            # ships 15 (not >20%... 15% no), supplier 3 ships 55 (yes)
            (1, 100, 1, 30.0), (2, 100, 2, 15.0), (3, 100, 3, 55.0),
            # part 200: exact fifth (20 of 100) -> NOT dominant (strict >)
            (4, 200, 1, 20.0), (5, 200, 2, 80.0),
            # part 300: supplier 2 ships all of it -> dominant
            (6, 300, 2, 10.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double",
    ).withColumn("l_shipdate", F.lit("2024-01-01").cast("timestamp"))
    s = spark.createDataFrame(
        [(1, "Supp#1"), (2, "Supp#2"), (3, "Supp#3")],
        "s_suppkey long, s_name string",
    )
    d = str(tmp_path)
    li.write.parquet(os.path.join(d, "lineitem.parquet"))
    s.write.parquet(os.path.join(d, "supplier.parquet"))
    from vector_database_watermarking_spark.registry import QUERIES

    got = {
        r["s_name"]: (r["n_parts_dominated"], r["dominated_qty"])
        for r in QUERIES["rel_dominant_suppliers"].fn(spark, d).collect()
    }
    assert got == {
        "Supp#1": (1, 30),   # part 100 at 30%
        "Supp#2": (2, 90),   # part 200 at 80% + part 300 at 100%
        "Supp#3": (1, 55),   # part 100 at 55%
    }


def test_time_weighted_avg_hypothesis_vs_bruteforce(spark):
    """Hypothesis differential: the distributed TWAP must equal a
    pure-Python reference on arbitrary small feeds (duplicate
    timestamps, single-event keys, many keys)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vector_database_watermarking_spark.operators.temporal import (
        time_weighted_avg,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 3),          # user
                st.integers(0, 50),         # seconds offset
                st.integers(1, 50_000),     # value in cents
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(raw):
        rows = [
            (
                i,
                u,
                f"2024-01-01 00:00:{'%02d' % (sec % 60)}.{'%03d' % (sec * 17 % 1000)}",
                cents / 100.0,
            )
            for i, (u, sec, cents) in enumerate(raw)
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        got = {
            r["user_id"]: (r["n_holds"], r["num_scaled_us"], r["dur_us"], r["twap_scaled"])
            for r in time_weighted_avg(ev).collect()
        }
        # brute force
        import datetime

        per = {}
        for i, (u, sec, cents) in enumerate(raw):
            us = (sec % 60) * 1_000_000 + (sec * 17 % 1000) * 1000
            per.setdefault(u, []).append((us, i, cents))
        expect = {}
        for u, obs in per.items():
            obs.sort()
            num = dur = holds = 0
            for (us, _i, cents), (us2, _i2, _c2) in zip(obs, obs[1:]):
                dt = us2 - us
                num += cents * dt
                dur += dt
                holds += 1
            expect[u] = (holds, num, dur, num // dur if dur > 0 else None)
        assert got == expect, (got, expect)

    check()


def test_prefix_jaccard_lossless_vs_bruteforce(spark):
    """The prefix filter is LOSSLESS blocking: the prefix-filtered join
    must return exactly the all-pairs word-set Jaccard >= 4/5 answer on
    random corpora (including duplicate docs and empty-prefix edges)."""
    import itertools
    import random

    from vector_database_watermarking_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(60):
        k = rng.randint(3, 12)
        toks = rng.sample(vocab, k)
        docs.append((d, " ".join(toks)))
    # plant exact duplicates and supersets
    docs.append((60, docs[0][1]))
    docs.append((61, docs[1][1] + " " + vocab[39]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc1"], r["doc2"]): (r["inter_size"], r["union_size"], r["jac_e6"])
        for r in prefix_jaccard_pairs(df, t_num=4, t_den=5).collect()
    }
    sets = {d: set(t.split()) for d, t in docs}
    expect = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 5 * inter >= 4 * union:
            expect[(a, b)] = (inter, union, 1_000_000 * inter // union)
    assert got == expect


def test_prefix_jaccard_hand_case(spark):
    from vector_database_watermarking_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),     # jac 4/6 = 0.667 < 0.8
            (3, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (4, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc1"], r["doc2"]): r["jac_e6"]
        for r in prefix_jaccard_pairs(df, t_num=4, t_den=5).collect()
    }
    assert got == {(1, 3): 1_000_000}


def test_tws_sessionizer_matches_v1_tier(spark, sf_dir, tmp_path):
    """transformWithState (state-v2) sessionizer must emit the same
    closed sessions as the applyInPandasWithState tier over the same
    sentinel-flushed replay (structure only — total_value is a float
    sum with loop-order ambiguity, same carve-out as the replay gate).
    Environment-gated like the Pillow multimodal test: PySpark's
    transformWithState protocol needs the protobuf package."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql.functions import expr, lit
    from vector_database_watermarking_spark.sources.tables import load_table
    from vector_database_watermarking_spark.streaming.sessions import (
        sessionize_stream,
        sessionize_stream_tws,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    max_ts = ev.agg(F.max("ts").alias("m")).head()["m"]
    sentinel = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            (lit(max_ts) + expr("INTERVAL 10 DAYS")).alias("ts"),
            lit(0.0).alias("value"),
        )
    )
    src = str(tmp_path / "tws_events")
    ev.unionByName(sentinel).orderBy("user_id", "ts").coalesce(1).write.parquet(src)

    def run(factory, name, extra_conf=None):
        prev = {}
        if extra_conf:
            for k, v in extra_conf.items():
                prev[k] = spark.conf.get(k, None)
                spark.conf.set(k, v)
        try:
            stream = (
                spark.readStream.schema("user_id long, ts timestamp, value double")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = factory(stream, watermark="1 hour")
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
            return sorted(
                (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
                for r in spark.sql(
                    f"SELECT user_id, session_start, session_end, n_events FROM {name}"
                ).collect()
            )
        finally:
            for k, v in prev.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

    v1 = run(sessionize_stream, "tws_par_v1")
    v2 = run(
        sessionize_stream_tws,
        "tws_par_v2",
        extra_conf={
            "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        },
    )
    assert v1 == v2
    assert len(v1) > 0


def test_synth_datasource_batch_matches_formula(spark):
    """The custom Python DataSource's batch reader must produce exactly
    the formula rows, across partition boundaries."""
    import hashlib

    from vector_database_watermarking_spark.sources.synthetic import (
        EVENT_TYPES,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthevents")
        .option("rows", 503)  # prime: uneven partition boundaries
        .option("users", 11)
        .option("partitions", 7)
        .load()
    )
    rows = {r["event_id"]: r for r in df.collect()}
    assert len(rows) == 503

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for i in (0, 1, 250, 502):
        r = rows[i]
        assert r["user_id"] == h60(f"sev_u_{i}") % 11
        assert r["event_type"] == EVENT_TYPES[h60(f"sev_t_{i}") % 4]
        assert abs(r["value"] - (h60(f"sev_v_{i}") % 100000) / 100.0) < 1e-9


def test_synth_datasource_stream_delivers_all_rows_once(spark):
    """The streaming reader's offset bookkeeping must deliver every row
    exactly once across micro-batches."""
    from vector_database_watermarking_spark.sources.synthetic import (
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthevents")
        .option("rows", 1000)
        .option("rows_per_batch", 170)  # 6 triggers, last one short
        .option("users", 13)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = [r["event_id"] for r in spark.sql("SELECT event_id FROM synth_stream").collect()]
    assert sorted(got) == list(range(1000))
    n_batches = spark.sql(
        "SELECT count(DISTINCT event_id div 170) FROM synth_stream"
    ).head()[0]
    assert n_batches >= 6  # really arrived across micro-batches


def test_manifest_jsonl_sink_two_phase_commit(spark, tmp_path):
    """Custom Python DataSource SINK: staged files become visible only
    through the committed manifest; the round-trip preserves content."""
    import json
    import os

    from vector_database_watermarking_spark.sources.synthetic import (
        read_manifest_jsonl,
        register_manifest_sink,
        register_synthetic_source,
    )

    register_synthetic_source(spark)
    register_manifest_sink(spark)
    src = (
        spark.read.format("synthevents")
        .option("rows", 600)
        .option("users", 7)
        .option("partitions", 5)
        .load()
        .select("event_id", "user_id", "event_type")
    )
    out = str(tmp_path / "sink")
    src.write.format("manifest_jsonl").option("path", out).mode("append").save()

    assert os.path.exists(os.path.join(out, "_MANIFEST"))
    with open(os.path.join(out, "_MANIFEST")) as f:
        manifest = json.load(f)
    assert manifest["total_rows"] == 600
    assert len(manifest["files"]) >= 1

    back, total = read_manifest_jsonl(spark, out)
    assert total == 600
    got = sorted(
        (int(r["event_id"]), int(r["user_id"]), r["event_type"])
        for r in back.collect()
    )
    expect = sorted(
        (r["event_id"], r["user_id"], r["event_type"]) for r in src.collect()
    )
    assert got == expect

    # a staged-but-unlisted orphan (an aborted attempt's leftovers)
    # must be invisible to the manifest reader
    with open(os.path.join(out, "part-99999-deadbeef.jsonl"), "w") as f:
        f.write('{"event_id": 123456, "user_id": 0, "event_type": "view"}\n')
    back2, total2 = read_manifest_jsonl(spark, out)
    assert total2 == 600
    assert back2.count() == 600


def test_prefix_jaccard_budget_guard_fails_fast_on_degenerate_corpus(spark):
    """A tiny-vocabulary corpus (every doc's rarest tokens shared by
    most docs) must be refused with the measured candidate bound, not
    silently launched as a near-all-pairs join."""
    from vector_database_watermarking_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    # 300 docs over a 6-word vocabulary: prefix df ~ O(n_docs)
    docs = spark.createDataFrame(
        [(i, f"w{i % 2} w{(i + 1) % 3} w{(i + 2) % 6}") for i in range(300)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="candidate bound"):
        prefix_jaccard_pairs(docs, candidate_budget=1000)
    # and the explicit override still runs (losslessness over budget)
    out = prefix_jaccard_pairs(docs, candidate_budget=None)
    assert out.count() > 0


def test_source_top_tokens_hand_computed(spark, tmp_path):
    import os

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha beta xx", "news"),
            (2, "alpha gamma gamma gamma", "news"),
            (3, "delta delta epsilon", "web"),
        ],
        "doc_id long, text string, source string",
    ).withColumn("lang", F.lit("en")).withColumn("n_chars", F.length("text"))
    docs.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    from vector_database_watermarking_spark.registry import QUERIES

    got = sorted(
        (r["source"], r["rank"], r["tok"], r["n"])
        for r in QUERIES["ext_source_top_tokens"].fn(spark, str(tmp_path)).collect()
    )
    # "xx" dropped (length < 3); ties (alpha=3 vs gamma=3) break by token
    assert got == [
        ("news", 1, "alpha", 3),
        ("news", 2, "gamma", 3),
        ("news", 3, "beta", 1),
        ("web", 1, "delta", 2),
        ("web", 2, "epsilon", 1),
    ]
