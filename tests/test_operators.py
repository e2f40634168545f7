"""Operator tests: dedup recall on planted near-dups, ANN recall, text
stats, multimodal plumbing, skew-safe aggregation, KS drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fs_schema_validator_spark.engine import ValidationEngine
from fs_schema_validator_spark.functions import skew
from fs_schema_validator_spark.operators import dedup, multimodal, similarity, textstats

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor"
).split()


def _doc(i: int, mutate: int | None = None) -> str:
    # seeded per-doc RNG: docs are mutually independent word sequences
    # (a rotating-window generator makes every doc a near-dup of every other)
    import random

    rng = random.Random(i)
    ws = rng.choices(WORDS, k=30)
    if mutate is not None:
        ws[mutate] = "zulu"
    return " ".join(ws)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(40):
        rows.append((i, _doc(i)))
    # planted near-duplicates: single-word mutations of docs 0..4
    for i in range(5):
        rows.append((1000 + i, _doc(i, mutate=15)))
    # planted exact duplicate
    rows.append((2000, _doc(7)))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [7, 2000]
    assert groups[0].keeper == 7


def test_jaccard_finds_planted_near_dups(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs_exact(docs, k=3, threshold=0.5).collect()
    }
    for i in range(5):
        assert (i, 1000 + i) in pairs, f"planted near-dup {i} not found"
        assert pairs[(i, 1000 + i)] > 0.7
    assert (7, 2000) in pairs and pairs[(7, 2000)] == 1.0


@pytest.mark.parametrize("strategy", ["arrow", "sql"])
def test_minhash_lsh_recall(docs, strategy):
    sigs = dedup.minhash_signatures(docs, k=3, num_perm=64, strategy=strategy)
    cands = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sigs, bands=16, rows_per_band=4).collect()
    }
    # all planted pairs (jaccard ~0.8+) must surface as LSH candidates
    for i in range(5):
        assert (i, 1000 + i) in cands, f"LSH missed planted pair {i} ({strategy})"
    assert (7, 2000) in cands


def test_verify_candidate_pairs_filters_lsh_output(docs):
    sigs = dedup.minhash_signatures(docs, k=3, num_perm=64)
    cand = dedup.lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.verify_candidate_pairs(docs, cand, k=3, threshold=0.5).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs_exact(docs, k=3, threshold=0.5).collect()
    }
    # candidates+verify reproduces the exact result on planted dupes
    assert verified == exact


def test_embedding_near_dup_pairs(spark):
    import math

    rows = []
    for i in range(100):
        rows.append((i, [math.sin(i * 1.7 + d * 0.9) for d in range(16)]))
    # planted near-identical copies of vectors 3 and 42
    for j, src in enumerate((3, 42)):
        vec = [math.sin(src * 1.7 + d * 0.9) for d in range(16)]
        vec[0] += 0.01
        rows.append((1000 + j, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    pairs = {
        (r.id_a, r.id_b): r.cos
        for r in similarity.near_dup_pairs(emb, dim=16, threshold=0.99).collect()
    }
    assert (3, 1000) in pairs and pairs[(3, 1000)] > 0.999
    assert (42, 1001) in pairs and pairs[(42, 1001)] > 0.999
    for (a, b) in pairs:
        assert (a, b) in {(3, 1000), (42, 1001)} or pairs[(a, b)] >= 0.99


def test_ks_vs_global_flags_shifted_group(spark):
    from fs_schema_validator_spark.functions import sketches

    rows = [(i, "steady", float(i % 100)) for i in range(2000)]
    rows += [(10_000 + i, "shifted", float(400 + i % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, grp_name string, v double")
    out = {
        r.grp: r.ks_d
        for r in sketches.ks_vs_global(
            df, col="v", group_col="grp_name", lo=0.0, hi=500.0, buckets=10
        ).collect()
    }
    # each group is half the table shifted to opposite ends: D = 0.5 exactly
    assert out["steady"] == pytest.approx(0.5)
    assert out["shifted"] == pytest.approx(0.5)


def test_simhash_near_dups_collide(docs):
    sigs = dedup.simhash_signatures(docs)
    cands = {
        (r.doc_a, r.doc_b) for r in dedup.simhash_candidates(sigs).collect()
    }
    # exact duplicate must share all bands; near-dups share at least one
    assert (7, 2000) in cands
    hits = sum((i, 1000 + i) in cands for i in range(5))
    assert hits >= 3


def test_ann_topk_exact_vs_lsh(spark):
    import math

    rows = []
    for i in range(200):
        vec = [math.sin(i * 0.1 + d) for d in range(8)]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    query = [math.sin(0.5 + d) for d in range(8)]  # equals vec 5

    exact = [r.vec_id for r in similarity.topk_cosine(emb, query, k=5).collect()]
    assert exact[0] == 5  # the identical vector ranks first

    approx = similarity.lsh_bucketed_topk(emb, query, k=5, n_planes=4).collect()
    assert [r.vec_id for r in approx][0] == 5  # same bucket as itself


def test_quality_and_tokens(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on a mat"), (2, ""), (3, "  spaced   out  ")],
        "doc_id bigint, text string",
    )
    tc = {r.doc_id: r.n_words for r in textstats.token_count(df).collect()}
    assert tc == {1: 6, 2: 0, 3: 2}
    q = {r.doc_id: r for r in textstats.quality_features(df).collect()}
    assert q[1].stopword_ratio == pytest.approx(2 / 6, abs=1e-4)
    assert q[2].avg_word_len == 0.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house", "en"),
            (2, "der hund und die katze zu haus", "de"),
            (3, "xyzzy plugh", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )
    got = {r.doc_id: r.predicted_lang for r in textstats.lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


def test_multimodal_declared_vs_actual(spark):
    media = spark.createDataFrame(
        [
            ("m1", b"IMG:4x3:data", "image", 4, 3),
            ("m2", b"IMG:4x3:data", "image", 8, 8),
            ("m3", b"NOT AN IMAGE", "image", 4, 3),
            ("m4", None, "image", 4, 3),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    feats = multimodal.extract_features(media, codec=multimodal.FakeCodec)
    violations = {
        r.subject: r.reason
        for r in multimodal.metadata_violations(feats, media).collect()
    }
    assert "m1" not in violations
    assert violations["m2"] == "image dims 4x3 do not match declared 8x8"
    assert violations["m3"] == "file does not contain a valid image"
    assert violations["m4"] == "file does not contain a valid image"


def test_multimodal_resize(spark):
    media = spark.createDataFrame(
        [
            ("m1", b"IMG:4x3:data", "image", 4, 3),
            ("m2", b"NOT AN IMAGE", "image", 8, 8),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r
        for r in multimodal.resize(
            media, 32, 24, codec=multimodal.FakeCodec
        ).collect()
    }
    assert out["m1"].ok and (out["m1"].width, out["m1"].height) == (32, 24)
    assert bytes(out["m1"].payload).startswith(b"IMG:32x24:")
    assert not out["m2"].ok and out["m2"].payload is None


def test_multimodal_frame_sampling(spark):
    media = spark.createDataFrame(
        [("v1", b"VID:25:data"), ("v2", b"VID:7:x"), ("v3", b"IMG:4x3:d")],
        "media_id string, payload binary",
    )
    frames = multimodal.sample_frames(media, every_n=10).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    # every 10th frame; non-video payloads are skipped entirely
    assert sorted(by_media["v1"]) == [0, 10, 20]
    assert sorted(by_media["v2"]) == [0]
    assert "v3" not in by_media
    # frame payloads are deterministic functions of (payload, frame_idx)
    f0 = [bytes(r.frame_payload) for r in frames if r.media_id == "v1" and r.frame_idx == 10]
    assert f0[0].startswith(b"FRM:10:")


def test_salted_collect_list_matches_plain(spark):
    from fs_schema_validator_spark.sources import synth

    df = synth.gen_sequences(spark, 500, skew=True).select("source", "n_tok")
    salted = {
        r.source: r.values
        for r in skew.salted_collect_list(df, ["source"], "n_tok").collect()
    }
    plain = {
        r.source: sorted(r.vals)
        for r in df.groupBy("source")
        .agg(F.collect_list("n_tok").alias("vals"))
        .collect()
    }
    assert salted == plain


def test_skewed_source_distribution(spark):
    from fs_schema_validator_spark.sources import synth

    counts = {
        r.source: r.n
        for r in synth.gen_sequences(spark, 1000, skew=True)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts["cc"] == 900


def test_ks_drift_rule(spark):
    from fs_schema_validator_spark.sources import synth

    n = 4096
    seq = synth.gen_sequences(spark, n).withColumn(
        "n_tok",
        F.when(
            F.col("source") == "wiki", F.least(F.col("n_tok") + 192, F.lit(512))
        ).otherwise(F.col("n_tok")),
    )
    rules = """
schema:
  - type: drift_psi
    id: ntok_ks
    column: n_tok
    group_col: source
    ref: ref_distribution
    metric: ks
    buckets: 16
    lo: 0
    hi: 512
    threshold: 0.2
"""
    res = ValidationEngine(subject_col="doc_id").validate(
        seq, rules, {"ref_distribution": synth.gen_ref_distribution(spark)}
    )
    rows = res.violations.collect()
    assert [r.subject for r in rows] == ["wiki"]
    assert "KS" in rows[0].reason


def test_bucketed_equality_join_has_no_exchange(spark):
    import io
    from contextlib import redirect_stdout

    from fs_schema_validator_spark.sources import synth, tables

    seq = synth.gen_sequences(spark, 200)
    ref = seq.select("doc_id", "tokens")
    tables.write_bucketed(seq, "bkt_sequences", ["doc_id"], buckets=4)
    tables.write_bucketed(ref, "bkt_reference", ["doc_id"], buckets=4)
    try:
        a = spark.table("bkt_sequences")
        b = spark.table("bkt_reference").withColumnRenamed("tokens", "ref_tokens")
        # merge hint: at test scale AQE would broadcast instead; production
        # reference side is far past the broadcast threshold
        joined = a.join(b.hint("merge"), "doc_id")
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        # co-located bucketed join: sort-merge with zero shuffles
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 200
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_sequences")
        spark.sql("DROP TABLE IF EXISTS bkt_reference")


def test_subword_token_count(spark):
    df = spark.createDataFrame(
        [(1, "It's 42 degrees, really!"), (2, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in textstats.subword_token_count(df).collect()}
    # It | 's | _42 | _degrees | , | _really | !
    assert out[1].n_subwords == 7
    assert out[1].n_alpha == 3  # It, degrees, really ('s is a contraction)
    assert out[1].n_numeric == 1
    assert out[2].n_subwords == 0


def test_rolling_hashes(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "XXabcdefghij"), (3, "ab"), (4, "")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in textstats.rolling_hashes(df, k=8).collect()}
    # the min 8-gram fingerprint survives a prefix edit; the whole-doc
    # polynomial hash does not
    assert out[1].min_kgram_hash == out[2].min_kgram_hash
    assert out[1].rhash != out[2].rhash
    # short docs fall back to the whole-document hash
    assert out[3].min_kgram_hash == out[3].rhash
    assert out[4].rhash == 7  # empty text -> seed


def test_ivf_topk_on_clustered_data(spark):
    import math

    # 8 well-separated clusters of 25 vectors each; cluster centers are the
    # first row of each cluster, so the deterministic-sample quantizer
    # (first n_centroids rows by id) picks one representative per cluster
    rows = []
    for c in range(8):
        center = [math.sin(c * 2.3 + d) * 5 for d in range(8)]
        for j in range(25):
            jitter = [math.sin(c * 31 + j * 7 + d) * 0.1 for d in range(8)]
            rows.append((c * 1000 + j, [a + b for a, b in zip(center, jitter)]))
    # ids sorted: 0..24 are cluster 0, 1000.. cluster 1, etc.; first 8 rows
    # by id are all cluster 0 — so pass explicit per-cluster seeds instead
    emb = spark.createDataFrame(
        sorted(rows), "vec_id bigint, embedding array<double>"
    )
    query = [math.sin(3 * 2.3 + d) * 5 for d in range(8)]  # cluster 3 center

    from fs_schema_validator_spark.operators.similarity import (
        ivf_topk,
        topk_cosine,
    )

    exact = [r.vec_id for r in topk_cosine(emb, query, k=10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk(emb, query, k=10, n_centroids=16, probes=4).collect()
    ]
    # all exact top-10 live in cluster 3; IVF probes must find them
    overlap = len(set(exact) & set(approx))
    assert overlap >= 8, (exact, approx)


def test_load_table_format_dispatch(spark, tmp_path):
    from fs_schema_validator_spark.sources import synth, tables

    seq = synth.gen_sequences(spark, 50).select("doc_id", "n_tok", "source")
    for fmt, path in [
        ("parquet", tmp_path / "t.parquet"),
        ("orc", tmp_path / "t.orc"),
        ("json", tmp_path / "t.json"),
        ("csv", tmp_path / "t.csv"),
    ]:
        w = seq.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        getattr(w, fmt)(str(path))
        got = tables.load_table(
            spark,
            str(path),
            schema="doc_id string, n_tok bigint, source string"
            if fmt in ("json", "csv")
            else None,
        )
        assert got.count() == 50, fmt
        assert set(got.columns) == {"doc_id", "n_tok", "source"}, fmt
        # declared-schema path keeps strict types for the rule compiler
        # (parquet/orc carry their own written types)
        want = "bigint" if fmt in ("json", "csv") else dict(seq.dtypes)["n_tok"]
        assert dict(got.dtypes)["n_tok"] == want, fmt


def test_load_table_explicit_fmt_overrides_extension(spark, tmp_path):
    """Directory names are never sniffed: a parquet dir named *_orc reads
    as parquet (the default), and `fmt` forces the reader explicitly."""
    from fs_schema_validator_spark.sources import synth, tables

    seq = synth.gen_sequences(spark, 20).select("doc_id", "n_tok", "source")
    path = str(tmp_path / "events_orc")
    seq.write.mode("overwrite").parquet(path)
    assert tables.load_table(spark, path).count() == 20
    assert tables.load_table(spark, path, fmt="parquet").count() == 20


def test_simhash_strategies_agree(docs):
    """Arrow kernel and pure-expression SimHash produce identical sigs."""
    arrow = {r.doc_id: r.simhash for r in dedup.simhash_signatures(docs).collect()}
    sql = {
        r.doc_id: r.simhash
        for r in dedup.simhash_signatures(docs, strategy="sql").collect()
    }
    assert arrow == sql
    assert all(s >= 0 for s in arrow.values())


def test_rolling_hash_strategies_agree(docs):
    arrow = {
        r.doc_id: (r.rhash, r.min_kgram_hash)
        for r in textstats.rolling_hashes(docs, k=8).collect()
    }
    sql = {
        r.doc_id: (r.rhash, r.min_kgram_hash)
        for r in textstats.rolling_hashes(docs, k=8, strategy="sql").collect()
    }
    assert arrow == sql


def test_lsh_bucket_cap_bounds_hot_buckets(spark):
    """A planted exact-dup cluster collides in EVERY band; the cap keeps
    the expansion to a bounded clique plus linear star links."""
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(300)]
    rows += [(1000 + i, _doc(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = dedup.minhash_signatures(df, k=3, num_perm=64)
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(
            sigs, bands=16, rows_per_band=4, max_bucket=50
        ).collect()
    }
    want_clique = {(a, b) for a in range(50) for b in range(a + 1, 50)}
    want_star = {(0, b) for b in range(50, 300)}
    # independent docs may add a few incidental candidates; the planted
    # cluster must produce exactly clique+star (no O(m^2) tail pairs)
    cluster_pairs = {p for p in got if p[0] < 1000 and p[1] < 1000}
    assert cluster_pairs == want_clique | want_star


def test_lsh_cap_disabled_matches_capped_on_small_buckets(docs):
    sigs = dedup.minhash_signatures(docs, k=3, num_perm=64)
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sigs, max_bucket=512).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(sigs, max_bucket=None).collect()
    }
    assert capped == uncapped


def test_cache_registry_releases_tracked_frames(docs):
    from fs_schema_validator_spark.functions import cache

    cache.release_all()  # start clean
    sigs = dedup.minhash_signatures(docs, k=3, num_perm=64)
    cand = dedup.lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    dedup.verify_candidate_pairs(docs, cand, k=3, threshold=0.5).collect()
    assert cache.release_all() >= 1
    assert cache.release_all() == 0


def test_bucketed_join_has_no_exchange(spark):
    """Co-bucketed tables join with zero Exchange on either side — the
    shuffle-eliminating layout for the engine's recurring equality join."""
    from fs_schema_validator_spark.sources import synth, tables as tbl

    seq = synth.gen_sequences(spark, 200).select("doc_id", "n_tok")
    ref = synth.gen_sequences(spark, 200).select("doc_id", "source")
    j = tbl.bucketed_equi_join(spark, seq, ref, "doc_id", buckets=8, tag="test")
    assert j.count() == 200
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_asof_join_semantics(spark):
    from fs_schema_validator_spark.operators import joins

    left = spark.createDataFrame(
        [(1, "u", "2024-01-01 10:00:00"),
         (2, "u", "2024-01-01 10:05:00"),
         (3, "u", "2024-01-01 09:00:00"),   # before any mark
         (4, "v", "2024-01-01 10:10:00")],
        "id bigint, k string, ts string",
    ).select("id", "k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [("u", "2024-01-01 10:00:00", 100),  # equal ts matches (backward)
         ("u", "2024-01-01 10:04:00", 101),
         ("v", "2024-01-01 08:00:00", 200)],
        "k string, mts string, mark bigint",
    ).select("k", F.col("mts").cast("timestamp").alias("mts"), "mark")
    out = {
        r.id: r.asof_mark
        for r in joins.asof_join(left, right, "k", "ts", "mts").collect()
    }
    assert out == {1: 100, 2: 101, 3: None, 4: 200}
    # tolerance: v's mark is >2h stale -> nulled
    tol = {
        r.id: r.asof_mark
        for r in joins.asof_join(
            left, right, "k", "ts", "mts", tolerance_sec=3600
        ).collect()
    }
    assert tol == {1: 100, 2: 101, 3: None, 4: None}


def test_bucketed_range_join_matches_naive(spark):
    from fs_schema_validator_spark.operators import joins

    pts = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(60)], "pid bigint, p double"
    )
    iv = spark.createDataFrame(
        [(j, float(j * 10 - 5), float(j * 10 + 12)) for j in range(11)],
        "iid bigint, lo double, hi double",
    )
    got = {
        (r.pid, r.iid)
        for r in joins.bucketed_range_join(pts, iv, "p", "lo", "hi", 8.0).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in pts.crossJoin(iv)
        .filter(F.col("p").between(F.col("lo"), F.col("hi")))
        .collect()
    }
    assert got == naive and len(got) > 60  # overlapping bands: multi-match


def test_connected_components_and_summary(spark):
    from fs_schema_validator_spark.operators import graph

    # components: {1..5} as a chain (diameter 4), {10,11}, {20,21,22} star
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    cc = {r.node: r.cluster for r in graph.connected_components(edges).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10,
                  20: 20, 21: 20, 22: 20}
    summary = {
        r.cluster: (r.n_docs, r.keeper, r.dropped)
        for r in graph.dedup_cluster_summary(edges).collect()
    }
    assert summary == {
        1: (5, 1, [2, 3, 4, 5]),
        10: (2, 10, [11]),
        20: (3, 20, [21, 22]),
    }


def test_connected_components_raises_on_iteration_cap(spark):
    from fs_schema_validator_spark.operators import graph

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(chain, max_iter=2)


def test_table_profile_exact_and_approx(spark):
    from fs_schema_validator_spark.operators import profile

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (4, "b")], "id bigint, tag string"
    )
    exact = {r.col_name: r for r in profile.table_profile(df, exact=True).collect()}
    assert exact["id"].n_rows == 4 and exact["id"].n_nulls == 0
    assert exact["id"].n_distinct == 4
    assert (exact["id"].min_value, exact["id"].max_value) == ("1", "4")
    assert exact["tag"].n_nulls == 1 and exact["tag"].n_distinct == 2
    assert (exact["tag"].min_value, exact["tag"].max_value) == ("a", "b")
    # approx mode: same shape, distinct within HLL tolerance on tiny input
    approx = {r.col_name: r for r in profile.table_profile(df).collect()}
    assert approx["id"].n_distinct == 4


def test_hash_split_is_deterministic_and_partition_invariant(spark):
    from fs_schema_validator_spark.operators import sampling

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    w = {"train": 8, "val": 1, "test": 1}
    a = {r.doc_id: r.split for r in sampling.hash_split(df, "doc_id", w).collect()}
    b = {
        r.doc_id: r.split
        for r in sampling.hash_split(df.repartition(13), "doc_id", w).collect()
    }
    assert a == b  # pure function of the id: repartitioning can't move rows
    from collections import Counter

    counts = Counter(a.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85  # ~8/10 within tolerance
    # a different salt reshuffles the assignment
    c = {
        r.doc_id: r.split
        for r in sampling.hash_split(df, "doc_id", w, salt="v2").collect()
    }
    assert c != a


def test_pack_offsets_concat_and_chop(spark):
    from fs_schema_validator_spark.operators import sampling

    df = spark.createDataFrame(
        [(1, "g", 100), (2, "g", 50), (3, "g", 120), (4, "h", 300)],
        "doc_id bigint, grp string, n bigint",
    )
    got = {
        r.doc_id: (r.start_bin, r.start_offset, r.end_bin)
        for r in sampling.pack_offsets(
            df, "n", capacity=128, group_cols=["grp"], order_col="doc_id"
        ).collect()
    }
    # g: doc1 [0,100) bin0; doc2 [100,150) straddles 0->1; doc3 [150,270)
    # bins 1->2; h restarts at 0: [0,300) bins 0->2
    assert got == {
        1: (0, 0, 0),
        2: (0, 100, 1),
        3: (1, 22, 2),
        4: (0, 0, 2),
    }


def test_ann_index_bucket_pruning(spark):
    """The materialized LSH index prunes buckets at the scan: the probe
    filter's executed plan selects only the probed buckets, and results
    equal the in-flight lsh_bucketed_topk."""
    import math

    rows = [(i, [math.sin(i * 0.37 + d) for d in range(16)]) for i in range(400)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    query = [math.sin(7 * 0.37 + d) for d in range(16)]

    similarity.write_ann_index(
        emb, dim=16, n_planes=6, table="fsv_ann_test", buckets=16
    )
    got = similarity.topk_from_index(
        spark, "fsv_ann_test", query, k=5, n_planes=6, probes=7
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan, plan
    live = similarity.lsh_bucketed_topk(
        emb, query, k=5, n_planes=6, probes=7
    )
    assert [(r.vec_id, r.cos) for r in got.collect()] == [
        (r.vec_id, r.cos) for r in live.collect()
    ]


def test_vocab_top_terms_global_and_grouped(spark):
    df = spark.createDataFrame(
        [(1, "a", "x x x y"), (2, "a", "x z"), (3, "b", "q q y")],
        "doc_id bigint, lang string, text string",
    )
    top = [(r.token, r.n) for r in textstats.vocab_top_terms(df, k=2).collect()]
    assert top == [("x", 4), ("q", 2)]  # q beats y on the tie via token asc
    by_lang = {
        (r.lang, r.rank): (r.token, r.n)
        for r in textstats.vocab_top_terms(df, k=2, group_col="lang").collect()
    }
    assert by_lang[("a", 1)] == ("x", 4)
    assert by_lang[("b", 1)] == ("q", 2)


def test_cross_table_overlap_finds_exact_leaks(spark):
    corpus = spark.createDataFrame(
        [(1, "The Answer"), (2, "other text"), (3, "the answer  ")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the answer"), (101, "unseen eval item")],
        "doc_id bigint, text string",
    )
    got = {
        (r.bench_id, r.corpus_id)
        for r in textstats.cross_table_overlap(corpus, bench).collect()
    }
    assert got == {(100, 1), (100, 3)}  # normalization catches case/trim


def test_stratified_sample_rate_and_determinism(spark):
    from fs_schema_validator_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, "g1" if i % 2 else "g2") for i in range(3000)],
        "doc_id bigint, lang string",
    )
    s1 = {r.doc_id for r in sampling.stratified_sample(df, "doc_id", 30, ["lang"]).collect()}
    s2 = {
        r.doc_id
        for r in sampling.stratified_sample(
            df.repartition(17), "doc_id", 30, ["lang"]
        ).collect()
    }
    assert s1 == s2
    per_g = [
        sum(1 for d in s1 if d % 2 == r) / 1500 for r in (0, 1)
    ]
    assert all(0.25 < frac < 0.35 for frac in per_g), per_g


def test_psi_full_grid_catches_concentrated_drift(spark):
    """A group concentrated in one bucket while the global mass is spread
    must report LARGE psi — the grid form includes the (EPS - p) terms
    for the group's empty buckets (a group-histogram-only join drops
    exactly those and underestimates drift)."""
    from fs_schema_validator_spark.functions import sketches

    rows = [(i, "spread", float(i % 100)) for i in range(2000)]
    rows += [(10_000 + i, "peaked", 5.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id bigint, grp_name string, v double")
    out = {
        r.grp: r.psi
        for r in sketches.psi_vs_global(
            df, col="v", group_col="grp_name", lo=0.0, hi=100.0, buckets=10
        ).collect()
    }
    assert out["peaked"] > 3.0, out  # concentrated: many dropped-mass terms
    assert out["spread"] > 0.1, out


def test_histogram_excludes_nulls(spark):
    from fs_schema_validator_spark.functions import sketches

    df = spark.createDataFrame(
        [(1, "g", 10.0), (2, "g", None), (3, "g", 90.0)],
        "id bigint, grp_name string, v double",
    )
    hist = {
        (r.grp, r.bucket): r.cnt
        for r in sketches.histogram(
            df, "v", "grp_name", 0.0, 100.0, 10
        ).collect()
    }
    assert hist == {("g", 1): 1, ("g", 9): 1}  # null row in NO bucket


def test_iceberg_probe_is_false_without_runtime(spark):
    from fs_schema_validator_spark.sources import tables

    assert tables.iceberg_available(spark) is False
    assert tables.current_snapshot_id(spark, "some_table") == "-"


def test_summary_counts_each_violation_once_and_surfaces_orphans(spark):
    df = spark.createDataFrame(
        [("d1", "cc", []), ("d1", "wiki", [1]), ("d2", "cc", [2])],
        "doc_id string, source string, tokens array<int>",
    )
    manifest = spark.createDataFrame([("d1",), ("d2",), ("d9",)], "doc_id string")
    rules = """
schema:
  - {type: not_empty, column: tokens}
  - {type: completeness, id: c, manifest: m, key: doc_id}
"""
    res = ValidationEngine(subject_col="doc_id").validate(df, rules, {"m": manifest})
    s = {r.source: (r.rows, r.violations) for r in res.summary("source").collect()}
    # d1 spans cc+wiki; its single not_empty violation counts ONCE (min
    # group 'cc'); orphan d9's completeness violation gets its own row
    assert s["cc"] == (2, 1)
    assert s["wiki"] == (1, 0)
    assert s[None] == (0, 1)
    total = res.violations.count()
    assert sum(v for _, v in s.values()) == total


@pytest.mark.parametrize("strategy", ["arrow", "sql", "portable"])
def test_null_text_docs_never_pair(spark, strategy):
    """Null-text docs must emit NO candidate pairs (ADVICE r2): a sentinel
    signature would make every null doc collide in every LSH band. The
    wrappers emit NULL sigs, banding drops them, and the SQL oracle
    excludes null-text docs to match. Empty-STRING docs are NOT
    degenerate: they carry the one-element sentinel shingle, so two empty
    docs pair with each other (exact dups) — in both engines."""
    rows = [(i, _doc(i)) for i in range(10)]
    rows += [(100, None), (101, None), (102, None), (103, ""), (104, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    if strategy == "portable":
        sigs = dedup.minhash_signatures_portable(df, k=3, num_perm=64)
    else:
        sigs = dedup.minhash_signatures(df, k=3, num_perm=64, strategy=strategy)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dedup.lsh_candidate_pairs(
            sigs, bands=16, rows_per_band=4
        ).collect()
    }
    involved = {a for a, _ in pairs} | {b for _, b in pairs}
    assert not involved & {100, 101, 102}, (
        f"null docs paired: {sorted(involved & {100, 101, 102})}"
    )
    assert (103, 104) in pairs
    assert all(103 not in p and 104 not in p for p in pairs - {(103, 104)})


def test_minhash_oracle_agrees_on_null_and_empty_text(spark, tmp_path):
    """Cross-engine repro of the review finding: DuckDB's hash join pairs
    sig=[NULL..] list keys, so without the oracle's `text IS NOT NULL`
    exclusion null docs form an all-pairs clique there while the engine
    emits none. Runs the REAL oracle SQL and the REAL driver query on a
    null/empty fixture and asserts identical pair sets."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [(i, _doc(i)) for i in range(8)]
    rows += [(100, None), (101, None), (102, None), (103, ""), (104, "")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b)
        for r in entrymod.queries()["minhash_lsh_pairs"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.sql(
        entrymod.oracle_sql()["minhash_lsh_pairs"]
    ).fetchall()}
    assert got == want
    assert (103, 104) in got  # empty-string docs pair in BOTH engines
    assert not ({100, 101, 102} & {x for p in got for x in p})


def test_stratified_sample_null_group_and_delimiter(spark):
    """Null group values and '|' inside values must not alias strata
    (ADVICE r2: concat_ws silently skips nulls; raw '|' collides). The
    hash input encodes each group part as 'n' | 'v'+md5(value); this
    replays the exact membership in pure Python."""
    import hashlib

    from fs_schema_validator_spark.operators import sampling

    rows = [(i, None if i % 3 == 0 else ("a|b" if i % 3 == 1 else "a"))
            for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    got = {r.doc_id for r in
           sampling.stratified_sample(df, "doc_id", 20, ["lang"]).collect()}

    def enc(lang):
        if lang is None:
            return "n"
        return "v" + hashlib.md5(lang.encode()).hexdigest()

    expect = set()
    for i, lang in rows:
        payload = f"sample|{enc(lang)}|{i}"
        h = int(hashlib.md5(payload.encode()).hexdigest()[:15], 16)
        if h % 100 < 20:
            expect.add(i)
    assert got == expect
    # every stratum (incl. the null one) is represented
    for r in (0, 1, 2):
        assert any(i % 3 == r for i in got), f"stratum {r} empty"


def test_parity_tool_rejects_complex_output_columns(spark):
    """tools/oracle_parity.py must reproduce the driver's failure mode on
    array-typed output cells (round-2's skew_salted_stats escape)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import oracle_parity as op

    df = spark.createDataFrame([(1, [1, 2])], "id bigint, xs array<bigint>")
    assert op.complex_cols(df) == ["xs"]
    assert op.complex_cols(df.select("id")) == []
    with pytest.raises(TypeError, match="unhashable"):
        op.norm_rows(["id", "xs"], [(1, [1, 2])])


@pytest.mark.parametrize("strategy", ["propagate", "star"])
def test_connected_components_strategies_agree(spark, strategy):
    """Both CC strategies produce the identical (node → component-min)
    labeling on a mixed random graph."""
    import random

    from fs_schema_validator_spark.operators import graph

    rng = random.Random(13)
    edges_py = [(rng.randrange(150), rng.randrange(150)) for _ in range(120)]
    edges_py = [(x, y) for x, y in edges_py if x != y]
    df = spark.createDataFrame(edges_py, "doc_a bigint, doc_b bigint")
    got = {
        (r.node, r.cluster)
        for r in graph.connected_components(
            df, strategy=strategy, max_iter=40
        ).collect()
    }

    # pure-Python union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in edges_py:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    expect = {(n, find(n)) for n in parent}
    assert got == expect


def test_star_strategy_handles_long_paths_in_few_rounds(spark):
    """A 40-edge path (diameter 40) defeats min-label propagation at
    max_iter=10 but star contraction converges well inside it — the
    O(log n) claim the propagate docstring defers to."""
    from fs_schema_validator_spark.operators import graph

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(chain, max_iter=10)
    cc = {
        r.node: r.cluster
        for r in graph.connected_components(
            chain, strategy="star", max_iter=10
        ).collect()
    }
    assert cc == {i: 0 for i in range(41)}


def test_hot_bucket_cap_keeps_planted_cluster_connected(spark):
    """Realistic-skew contract (VERDICT r2 item 6): a dup cluster far over
    max_bucket must (a) expand O(N + cap²) pairs, not O(N²), and (b) stay
    ONE connected component end-to-end via the star tail — under both CC
    strategies."""
    from fs_schema_validator_spark.operators import graph

    n_dup, cap = 3000, 64
    boiler = "identical boilerplate terms " + " ".join(WORDS[:12])
    rows = [(i, _doc(i)) for i in range(50)]
    rows += [(10_000 + i, boiler) for i in range(n_dup)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sigs = dedup.minhash_signatures(df, k=3, num_perm=64)
    pairs = dedup.lsh_candidate_pairs(
        sigs, bands=16, rows_per_band=4, max_bucket=cap
    )
    from fs_schema_validator_spark.functions.cache import track

    pairs = track(pairs.cache())
    n_pairs = pairs.count()
    # clique over the first cap members + one star edge per tail member;
    # random background collisions can only add a handful
    assert n_pairs < cap * (cap - 1) // 2 + (n_dup - cap) + 100, n_pairs
    assert n_pairs >= cap * (cap - 1) // 2 + (n_dup - cap)
    for strategy in ("propagate", "star"):
        cc = graph.connected_components(pairs, strategy=strategy)
        planted = cc.filter(F.col("node") >= 10_000)
        clusters = planted.select("cluster").distinct().count()
        assert clusters == 1, f"{strategy}: cluster split into {clusters}"
        assert planted.count() == n_dup
    from fs_schema_validator_spark.functions.cache import release_all

    release_all()


def test_default_codec_selection():
    """FakeCodec in this sandbox (no Pillow); PillowCodec picked up
    automatically where the real library exists."""
    expected = (
        multimodal.PillowCodec
        if multimodal.pillow_available()
        else multimodal.FakeCodec
    )
    assert multimodal.default_codec() is expected


@pytest.mark.skipif(
    "not __import__('fs_schema_validator_spark.operators.multimodal', "
    "fromlist=['multimodal']).pillow_available()",
    reason="Pillow not installed in this sandbox",
)
def test_pillow_codec_real_image_roundtrip(spark):
    """Exercised only where Pillow exists: a real PNG decodes to its true
    dims through the same Spark plumbing the FakeCodec path uses."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16)).save(buf, "PNG")
    df = spark.createDataFrame(
        [("m1", bytearray(buf.getvalue()), "image", 32, 16)],
        multimodal.MEDIA_SCHEMA,
    )
    feats = multimodal.extract_features(df, codec=multimodal.PillowCodec).collect()
    assert feats[0].ok and (feats[0].actual_width, feats[0].actual_height) == (32, 16)
    resized = multimodal.resize(
        df, target_width=8, target_height=6, codec=multimodal.PillowCodec
    ).collect()
    assert resized[0].ok
    with Image.open(io.BytesIO(resized[0].payload)) as im:
        assert im.size == (8, 6)


def test_skew_salted_stats_keeps_null_lang_group(spark, tmp_path):
    """The counts↔lists join is null-SAFE: a NULL-lang group must appear
    in engine output exactly as the oracle's plain GROUP BY emits it."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [(1, "en"), (2, "en"), (3, None), (4, None), (5, "de")]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.lang, r.n, r.doc_ids)
        for r in entrymod.queries()["skew_salted_stats"](spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {tuple(r) for r in con.sql(
        entrymod.oracle_sql()["skew_salted_stats"]
    ).fetchall()}
    assert got == want
    assert (None, 2, "3,4") in got


def test_repetition_features_flags_boilerplate(spark):
    """Planted: a templated doc (repeated lines + dominant 2-gram) vs a
    varied doc; Gopher-style signals must separate them."""
    boiler = "buy now click here\nbuy now click here\nbuy now click here"
    varied = "alpha bravo charlie delta\necho foxtrot golf hotel"
    df = spark.createDataFrame(
        [(1, boiler), (2, varied), (3, ""), (4, "single")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in textstats.repetition_features(df).collect()}
    assert got[1].n_lines == 3
    assert got[1].dup_line_frac == pytest.approx(1 - 1 / 3, abs=1e-4)
    # "buy now"/"now click"/"click here" each appear 3x of 9+2... the top
    # 2-gram share: 12 grams total per line boundarylessness — compute:
    # words = 12, grams = 11; "now click" appears 3x -> but "here buy"
    # crosses lines (split is on whitespace incl newline) 2x; top=3
    assert got[1].top_2gram_frac == pytest.approx(3 / 11, abs=1e-4)
    assert got[2].dup_line_frac == 0.0
    assert got[2].top_2gram_frac == pytest.approx(1 / 7, abs=1e-4)
    assert got[3].n_lines == 0 and got[3].top_2gram_frac == 0.0
    assert got[4].top_2gram_frac == 0.0  # <2 words -> no grams


def test_unigram_entropy_extremes(spark):
    import math

    df = spark.createDataFrame(
        [
            (1, "same same same same"),          # entropy 0
            (2, "a b c d"),                      # uniform: ln(4)
            (3, ""),                             # empty: 0
            (4, "x x y"),                        # 2/3,1/3 mix
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: (r.n_words, r.entropy) for r in textstats.unigram_entropy(df).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, round(math.log(4), 4))
    assert got[3] == (0, 0.0)
    expected = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert got[4] == (3, round(expected, 4))


def test_pii_scrub_counts_and_replacement(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at jane.doe+x@example.org or bob@test.io"),
            (2, "call +1 (555) 123-4567 today"),
            (3, "no pii here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert got[1].n_emails == 2 and got[1].n_phones == 0
    assert got[2].n_phones == 1 and got[2].n_emails == 0
    assert got[3].n_emails == 0 and got[3].n_phones == 0
    # scrubbed length reflects tag substitution
    assert got[3].scrubbed_len == len("no pii here")
    assert got[2].scrubbed_len == len("call <PHONE> today")


def test_kmeans_quantizer_tightens_cells_and_keeps_recall(spark):
    """Lloyd training must (a) move the deterministic-sample seeds onto
    the true cluster means, (b) strictly reduce quantization inertia, and
    (c) match exact top-k through the probed cells on clustered data."""
    import math

    import numpy as np

    from fs_schema_validator_spark.operators.similarity import (
        ivf_topk_kmeans,
        topk_cosine,
        train_centroids_kmeans,
    )

    rows = []
    centers = []
    for c in range(8):
        center = [math.sin(c * 2.3 + d) * 5 for d in range(8)]
        centers.append(center)
        for j in range(25):
            jitter = [math.sin(c * 31 + j * 7 + d) * 0.1 for d in range(8)]
            rows.append((c * 1000 + j, [a + b for a, b in zip(center, jitter)]))
    emb = spark.createDataFrame(
        sorted(rows), "vec_id bigint, embedding array<double>"
    )

    def inertia(cent):
        data = np.asarray([v for _, v in sorted(rows)])
        cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        dn = data / np.linalg.norm(data, axis=1, keepdims=True)
        best = np.argmax(dn @ cn.T, axis=1)
        return float(((data - cent[best]) ** 2).sum())

    seeds = train_centroids_kmeans(emb, n_centroids=8, n_iter=0, init="sample")
    trained = train_centroids_kmeans(emb, n_centroids=8, n_iter=3)
    assert inertia(trained) < inertia(seeds) * 0.5
    # every true cluster mean is approximated by some trained centroid
    true_means = np.asarray(
        [
            np.mean(
                [v for i, v in rows if i // 1000 == c], axis=0
            )
            for c in range(8)
        ]
    )
    for m in true_means:
        assert np.min(np.linalg.norm(trained - m, axis=1)) < 0.2

    query = [math.sin(3 * 2.3 + d) * 5 for d in range(8)]
    exact = [r.vec_id for r in topk_cosine(emb, query, k=10).collect()]
    approx = [
        r.vec_id
        for r in ivf_topk_kmeans(
            emb, query, k=10, n_centroids=8, probes=2, n_iter=3
        ).collect()
    ]
    assert set(exact) == set(approx)


def test_cross_table_lsh_catches_edited_benchmark_leak(spark):
    """A one-word-edited copy of a benchmark doc must surface in the
    fuzzy cross-table screen while the exact-fingerprint screen misses
    it; clean docs must not pair."""
    corpus_rows = [(i, _doc(i)) for i in range(20)]
    corpus_rows.append((50, _doc(3, mutate=10)))  # edited leak of bench doc
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(900 + i, _doc(i)) for i in (3, 7)], "doc_id bigint, text string"
    )
    fuzzy = {
        (r.corpus_id, r.bench_id)
        for r in dedup.cross_table_lsh_pairs(corpus, bench).collect()
    }
    assert (50, 903) in fuzzy          # edited leak caught
    assert (3, 903) in fuzzy and (7, 907) in fuzzy  # exact copies too
    exact = {
        (r.corpus_id, r.bench_id)
        for r in textstats.cross_table_overlap(corpus, bench).collect()
    }
    assert (50, 903) not in exact      # the case exact fingerprints miss


def _vec(i: int, dim: int = 64) -> list:
    import random

    rng = random.Random(7000 + i)
    return [rng.uniform(-1.0, 1.0) for _ in range(dim)]


@pytest.mark.parametrize("strategy", ["kernel", "pairs"])
def test_semantic_dedup_flags_planted_copies(spark, strategy):
    """SemDeDup keep-first semantics under BOTH strategies: an exact
    copy under a larger id is flagged, the original is not; random
    non-dup rows are not flagged; null-vector, wrong-dimension, and
    null-id rows get a NULL cell and never pair."""
    rows = [(i, _vec(i)) for i in range(40)]
    rows += [(1000 + i, _vec(i)) for i in range(3)]     # exact copies
    rows += [(2000, None), (2001, [1.0, 2.0, 3.0])]     # degenerate rows
    rows += [(2002, _vec(0) + [0.5])]                   # LONGER than dim
    rows += [(None, _vec(5))]                           # null id, valid vec
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = {
        r.vec_id: r
        for r in similarity.semantic_dedup(
            emb, n_centroids=4, threshold=0.95, max_bucket=None,
            strategy=strategy,
        ).collect()
    }
    assert len(out) == 47
    for i in range(3):
        assert out[1000 + i].is_dup
        assert not out[i].is_dup
        assert out[1000 + i].cell == out[i].cell  # identical vec, same cell
    assert sum(bool(r.is_dup) for r in out.values()) == 3
    # 2002 is a 65-dim vector equal to vec 0 plus one extra component: a
    # LONGER-than-dim row must get a NULL cell (strict == dim mask), not
    # a truncated assignment that would crash the rectangular cell
    # matrix or flag vec 0
    for bad in (2000, 2001, 2002, None):
        assert out[bad].cell is None and not out[bad].is_dup
    # the null-id copy of vec 5 must NOT flag vec 5 (it never pairs)
    assert not out[5].is_dup


def test_semantic_dedup_strategies_agree(spark):
    """Differential: the kernel (BLAS block) and pairs (bucket_pairs +
    expression cosine) strategies flag the identical set on a mixed
    fixture with planted copies across multiple cells."""
    rows = [(i, _vec(i)) for i in range(60)]
    rows += [(500 + i, _vec(i * 7)) for i in range(6)]  # copies, scattered
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    runs = {
        s: sorted(
            (r.vec_id, r.cell, r.is_dup)
            for r in similarity.semantic_dedup(
                emb, n_centroids=8, threshold=0.9, max_bucket=None,
                strategy=s,
            ).collect()
        )
        for s in ("kernel", "pairs")
    }
    assert runs["kernel"] == runs["pairs"]
    assert sum(d for _, _, d in runs["kernel"]) == 6


def test_semantic_dedup_cap_star_pairs_still_flag_tail(spark):
    """Pairs strategy with a hot cell larger than max_bucket: the star
    tail (keeper = min id) must still flag every exact-copy member —
    the keeper-member cosine is 1.0, so capping trades pair scores, not
    dup recall. (The kernel strategy has no cap; it is blockwise.)"""
    base = _vec(0)
    rows = [(i, base) for i in range(20)]            # one 20-member clique
    rows += [(100 + i, _vec(50 + i)) for i in range(10)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = {
        r.vec_id: r.is_dup
        for r in similarity.semantic_dedup(
            emb, n_centroids=2, threshold=0.95, max_bucket=4,
            strategy="pairs",
        ).collect()
    }
    assert not out[0]                                # keeper survives
    assert all(out[i] for i in range(1, 20))         # every copy flagged
    assert not any(out[100 + i] for i in range(10))


def test_semantic_dedup_kernel_blockwise_matches_small_blocks(spark):
    """The kernel's block loop must not change flags across block sizes
    (a 20-member exact clique spans several 4-row blocks, exercising the
    earlier-blocks comparison path)."""
    base = _vec(0)
    rows = [(i, base) for i in range(20)]
    rows += [(100 + i, _vec(50 + i)) for i in range(5)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    from fs_schema_validator_spark.operators.similarity import (
        _cell_dedup_kernel,
        _collect_seed_matrix,
    )
    from fs_schema_validator_spark.functions.arrays import ivf_assign_arrow

    cents = _collect_seed_matrix(emb, 2, "embedding", "vec_id")
    eligible = ivf_assign_arrow(emb, cents).filter(F.col("cell").isNotNull())
    flags = {}
    for blk in (4, 256):
        flags[blk] = sorted(
            (r.vec_id, r.is_dup)
            for r in _cell_dedup_kernel(
                emb, eligible, 0.95, "embedding", "vec_id", 5, dim=64,
                block=blk,
            ).collect()
        )
    assert flags[4] == flags[256]
    assert sum(d for _, d in flags[4]) == 19


def test_pq_encode_eligibility_and_adc_roundtrip(spark):
    """pq_encode_arrow: null / wrong-dim / zero-norm rows get NULL codes;
    eligible rows get m one-byte codes whose ADC distance under a
    query-derived LUT reproduces the NumPy computation exactly."""
    import numpy as np

    from fs_schema_validator_spark.functions.arrays import (
        pq_adc_scores_arrow,
        pq_encode_arrow,
    )

    rng = np.random.RandomState(11)
    cb = rng.uniform(-1, 1, size=(8, 16, 8))
    rows = [(i, [float(x) for x in rng.uniform(-1, 1, 64)]) for i in range(20)]
    rows += [(50, None), (51, [0.5] * 3), (52, [0.0] * 64)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    codes = {r.vec_id: r.codes for r in pq_encode_arrow(df, cb).collect()}
    for bad in (50, 51, 52):
        assert codes[bad] is None
    assert all(len(codes[i]) == 8 for i in range(20))
    # ADC against a fixed LUT
    lut = rng.uniform(0, 2, size=(8, 16))
    out = {
        r.vec_id: r.adist
        for r in pq_adc_scores_arrow(
            pq_encode_arrow(df, cb), lut
        ).collect()
    }
    for bad in (50, 51, 52):
        assert out[bad] is None
    for i in range(20):
        want = float(lut[np.arange(8), np.frombuffer(codes[i], np.uint8)].sum())
        assert abs(out[i] - want) < 1e-12


def test_pq_training_tightens_quantization(spark):
    """Per-subspace Lloyd iterations must not increase total quantization
    error on unit vectors (Lloyd is monotone); trained codebooks keep
    shape (m, ks, sub)."""
    import numpy as np

    from fs_schema_validator_spark.operators import similarity

    rng = np.random.RandomState(5)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, 64)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    def qerr(cb):
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        u = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        tot = 0.0
        for s in range(8):
            us = u[:, s * 8 : (s + 1) * 8]
            d = ((us[:, None, :] - cb[s][None]) ** 2).sum(-1)
            tot += d.min(axis=1).sum()
        return tot

    cb0 = similarity.train_pq_codebooks(df, m=8, ks=16, n_iter=0)
    cb2 = similarity.train_pq_codebooks(df, m=8, ks=16, n_iter=2)
    assert cb0.shape == cb2.shape == (8, 16, 8)
    assert qerr(cb2) <= qerr(cb0) + 1e-9


def test_ivf_pq_recall_vs_exact_and_oracle(spark, tmp_path):
    """ivf_pq_topk recall ≥ 0.9 against exact top-k on a clustered
    fixture, and the REAL driver query matches its REAL DuckDB oracle
    value-for-value on the same fixture."""
    import random

    import duckdb

    import __spark_entry__ as entrymod
    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(777)
    centers = [_vec(9100 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
        for i in range(80)
    ]
    rows += [(200, [0.25] * 5), (201, [0.0] * 64)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = rows[0][1]
    # exact baseline over the clean rows only: cosine_scores is the
    # raw ANSI expression, undefined on zero-norm/wrong-dim rows (the
    # PQ path excludes them via kernel eligibility instead)
    clean = emb.filter(F.col("vec_id") < 100)
    exact = {
        r.vec_id for r in similarity.topk_cosine(clean, q, k=10).collect()
    }
    approx = {
        r.vec_id
        for r in similarity.ivf_pq_topk(
            emb, q, k=10, n_centroids=8, probes=4, m=8, ks=8, n_iter=2
        ).collect()
    }
    assert len(exact & approx) >= 9

    sf_dir = str(tmp_path)
    emb.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in entrymod.queries()["ann_topk_ivf_pq"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(entrymod.oracle_sql()["ann_topk_ivf_pq"]).fetchall()
    )
    assert got == want


def test_kmeans_pinned_oracle_agrees_on_clustered_fixture(spark, tmp_path):
    """Cross-engine: the REAL pinned-kmeans driver query vs its REAL
    DuckDB oracle on a clustered fixture (3 planted clusters + noise +
    a wrong-dim and a zero-norm row) — the value-level gate for the
    Lloyd path, where the previous rows-only check couldn't see a wrong
    centroid update."""
    import random

    import duckdb

    import __spark_entry__ as entrymod

    rng = random.Random(424242)
    centers = [_vec(9000 + c) for c in range(3)]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append(
            (i, [v + rng.uniform(-0.05, 0.05) for v in c])
        )
    rows += [(100, _vec(100)), (101, [0.25] * 5), (102, [0.0] * 64)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    sf_dir = str(tmp_path)
    emb.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")
    got = sorted(
        tuple(r)
        for r in entrymod.queries()["ann_topk_ivf_kmeans_pinned"](
            spark, sf_dir
        ).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            entrymod.oracle_sql()["ann_topk_ivf_kmeans_pinned"]
        ).fetchall()
    )
    assert got == want
    ids = {v for v, _ in got}
    # the query vector is vec_id 0; its own cluster (ids ≡ 0 mod 3)
    # must dominate the top-k after two Lloyd rounds
    assert 0 in ids
    assert sum(1 for v in ids if v % 3 == 0 and v < 60) >= 8


def test_semantic_dedup_oracle_agrees_on_null_and_wrong_dim(spark, tmp_path):
    """Cross-engine: the REAL driver query vs the REAL oracle SQL on a
    fixture with null and wrong-dimension vectors (one of them at a
    vec_id the query's planted-copy derivation picks up, so the copy of
    a null row is exercised too)."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [(i, _vec(i)) for i in range(36)]
    rows += [(40, None), (41, [0.5] * 3)]   # 40 % 20 == 0: planted-null copy
    rows += [(None, _vec(3))]               # null id, valid vector
    # zero-norm contract: a directionless vector is ineligible like
    # null/wrong-dim (kernel cosine-0, pairs-null, and DuckDB NaN would
    # otherwise three-way diverge); 60 % 20 == 0 exercises its copy too
    rows += [(42, [0.0] * 64), (60, [0.0] * 64)]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    sf_dir = str(tmp_path)
    emb.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")

    got = {
        (r.vec_id, r.cell, r.is_dup)
        for r in entrymod.queries()["semantic_dup_flags"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = {
        tuple(r)
        for r in con.sql(
            entrymod.oracle_sql()["semantic_dup_flags"]
        ).fetchall()
    }
    assert got == want
    by_id = {v: (c, d) for v, c, d in got}
    # keep-first with the negative planted ids: the COPY (smaller id) is
    # the keeper, the original gets flagged
    assert by_id[0] == (by_id[-1][0], True)
    assert not by_id[-1][1]
    assert by_id[40] == (None, False)             # null vec: no cell
    assert by_id[-41] == (None, False)            # copy of the null vec
    assert by_id[41] == (None, False)             # wrong-dim vec
    assert by_id[None] == (None, False)           # null id: masked cell
    assert by_id[42] == (None, False)             # zero-norm vec: no cell
    assert by_id[60] == (None, False)             # zero-norm at a copy id
    assert by_id[-61] == (None, False)            # its planted zero copy
    # the null-id duplicate of vec 3 must not flag vec 3
    assert not by_id[3][1]


def test_dsir_scores_target_lookalikes_higher(spark):
    """DSIR importance: corpus docs made of target-domain words must
    outscore corpus docs from the off-domain vocabulary; null/empty
    docs score 0.0 with n_words = 0."""
    from fs_schema_validator_spark.operators import selection

    a_words = "alpha bravo charlie delta echo"
    b_words = "uniform victor whiskey xray yankee"
    corpus = spark.createDataFrame(
        [
            (1, a_words), (2, a_words + " foxtrot"),
            (3, b_words), (4, b_words + " zulu"),
            (5, None), (6, ""),
        ],
        "doc_id bigint, text string",
    )
    target = spark.createDataFrame(
        [(100, b_words), (101, b_words)], "doc_id bigint, text string"
    )
    out = {
        r.doc_id: r
        for r in selection.dsir_importance(
            corpus, target, n_buckets=64
        ).collect()
    }
    assert len(out) == 6
    assert min(out[3].dsir_score, out[4].dsir_score) > max(
        out[1].dsir_score, out[2].dsir_score
    )
    for null_doc in (5, 6):
        assert out[null_doc].n_words == 0
        assert out[null_doc].dsir_score == 0.0
    assert out[1].n_words == 5 and out[2].n_words == 6


def test_classifier_score_hand_computed(spark):
    """fastText-style inference on a 1-bucket model: every feature hashes
    to bucket 0 with weight w0, so logit = bias + w0 exactly; a 3-word
    doc has 3 unigrams + 2 bigrams; null/empty docs score sigmoid(bias)
    with n_features = 0."""
    import math

    from fs_schema_validator_spark.operators import selection

    corpus = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd"), (3, None), (4, "")],
        "doc_id bigint, text string",
    )
    weights = spark.createDataFrame([(0, 2.0)], "bucket bigint, w double")
    out = {
        r.doc_id: r
        for r in selection.classifier_score(
            corpus, weights, n_buckets=1, bias=-1.0
        ).collect()
    }
    sig = lambda x: round(1.0 / (1.0 + math.exp(-x)), 4)  # noqa: E731
    assert out[1].n_features == 5 and out[1].clf_score == sig(1.0)
    assert out[2].n_features == 1 and out[2].clf_score == sig(1.0)
    for d in (3, 4):
        assert out[d].n_features == 0 and out[d].clf_score == sig(-1.0)


def test_classifier_score_unigram_only_and_missing_buckets(spark):
    """word_ngrams=1 drops the bigram features; a feature whose bucket is
    absent from the weight table weighs 0 (not null-poisoned)."""
    from fs_schema_validator_spark.operators import selection

    corpus = spark.createDataFrame(
        [(1, "aa bb cc")], "doc_id bigint, text string"
    )
    empty = spark.createDataFrame([], "bucket bigint, w double")
    out = selection.classifier_score(
        corpus, empty, n_buckets=64, bias=0.0, word_ngrams=1
    ).collect()[0]
    assert out.n_features == 3          # no bigrams
    assert out.clf_score == 0.5         # all-zero weights -> sigmoid(0)
    import pytest

    with pytest.raises(ValueError, match="word_ngrams"):
        selection.classifier_score(corpus, empty, word_ngrams=3)


def test_classifier_oracle_agrees_on_null_and_empty_text(spark, tmp_path):
    """Cross-engine: REAL driver query vs REAL oracle SQL on a fixture
    with null, empty, single-word (no bigram), and repeated-word
    documents."""
    import duckdb

    import __spark_entry__ as entrymod

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en"),
            (2, "the the the", "en"),          # repeated uni+bigrams
            (3, "solo", "en"),                 # 1 word: no bigram
            (4, None, "en"),
            (5, "", "en"),
            (6, "  ", "en"),                   # whitespace-only
        ],
        "doc_id bigint, text string, lang string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    got = {
        tuple(r)
        for r in entrymod.queries()["classifier_scores"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        tuple(r)
        for r in con.sql(entrymod.oracle_sql()["classifier_scores"]).fetchall()
    }
    assert got == want
    by_id = {r[0]: r[1:] for r in got}
    assert by_id[1][0] == 7             # 4 unigrams + 3 bigrams
    assert by_id[3][0] == 1
    for d in (4, 5, 6):
        assert by_id[d][0] == 0


def test_dsir_oracle_agrees_on_null_and_empty_text(spark, tmp_path):
    """Cross-engine: REAL driver query vs REAL oracle SQL on a fixture
    with null and empty documents, including a null doc inside the
    target set (doc_id % 25 == 0)."""
    import duckdb

    import __spark_entry__ as entrymod

    rows = [(i, _doc(i)) for i in range(30)]
    rows += [(100, None), (102, ""), (103, "   ")]  # 100 % 25 == 0
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.doc_id, r.n_words, r.dsir_score)
        for r in entrymod.queries()["dsir_importance_weights"](
            spark, sf_dir
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = {
        tuple(r)
        for r in con.sql(
            entrymod.oracle_sql()["dsir_importance_weights"]
        ).fetchall()
    }
    assert got == want
    by_id = {d: (n, s) for d, n, s in got}
    for deg in (100, 102, 103):
        assert by_id[deg] == (0, 0.0)


def test_token_ngram_dup_stats_planted_and_degenerate(spark):
    """Token k-gram dedup semantics: exact copies rate 1.0; a doc sharing
    exactly one window gets 1/n_windows; intra-doc repeats of a window
    seen in only ONE doc are NOT dups (min_docs counts distinct docs);
    null / child-null / short token lists have zero windows."""
    from fs_schema_validator_spark.operators.dedup import (
        token_ngram_dup_stats,
    )

    rows = [
        ("a", list(range(20))),
        ("b", list(range(20))),                     # exact copy of a
        ("c", [100 + 17 * i for i in range(20)]),   # unique stream
        ("d", list(range(8)) + [999 - i for i in range(7)]),  # 1 shared win
        ("e", None),
        ("f", [1, 2, 3]),                           # < k tokens
        ("g", [5] * 30),                            # intra-doc repeats only
        ("h", [4, None, 6, 7, 8, 9, 10, 11, 12]),   # child null
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_rate)
        for r in token_ngram_dup_stats(df, k=8).collect()
    }
    assert len(out) == 8
    assert out["a"] == (13, 13, 1.0)
    assert out["b"] == (13, 13, 1.0)
    assert out["c"] == (13, 0, 0.0)
    assert out["d"] == (8, 1, 0.125)
    assert out["g"] == (23, 0, 0.0)
    for deg in ("e", "f", "h"):
        assert out[deg] == (0, 0, 0.0)


def test_token_ngram_dup_stats_oracle_parity():
    """Cross-engine: the REAL driver query vs its REAL DuckDB oracle
    (generator + closed-form window-hash replay) must agree bit-exactly."""
    import duckdb
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from fs_schema_validator_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    got = sorted(
        tuple(r) for r in m.token_ngram_dup_stats(spark, "unused").collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r) for r in con.sql(m._token_ngram_oracle()).fetchall()
    )
    assert got == want


def test_token_ngram_dedup_hand_computed_spans(spark):
    """Span-removal golden, k=2, spans worked out by hand:
    dup windows are (1,2) {A,C} and (2,3) {A,B}. A's covered union is
    [0,2)∪[1,3) = [0,3) (overlap merge), leaving [4,5]; B loses [1,3);
    C loses [0,2); degenerate rows pass through untouched."""
    from fs_schema_validator_spark.operators.dedup import token_ngram_dedup

    rows = [
        ("A", [1, 2, 3, 4, 5]),
        ("B", [9, 2, 3, 7]),
        ("C", [1, 2, 9]),
        ("N", None),
        ("S", [5]),                 # shorter than k
        ("X", [1, None, 3]),        # child null -> no windows
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {
        r.doc_id: (r.tokens_clean, r.n_removed)
        for r in token_ngram_dedup(df, k=2).collect()
    }
    assert out["A"] == ([4, 5], 3)
    assert out["B"] == ([9, 7], 2)
    assert out["C"] == ([9], 2)
    assert out["N"] == (None, 0)
    assert out["S"] == ([5], 0)
    assert out["X"] == ([1, None, 3], 0)


def test_token_ngram_dedup_full_erasure_and_dup_stats_consistency(spark):
    """An exact copy pair erases BOTH instances entirely (symmetric
    semantics), and n_removed > 0 exactly where token_ngram_dup_stats
    reports n_dup_windows > 0 on the same corpus."""
    from fs_schema_validator_spark.operators.dedup import (
        token_ngram_dedup,
        token_ngram_dup_stats,
    )

    rows = [
        ("a", list(range(20))),
        ("b", list(range(20))),
        ("c", [100 + 17 * i for i in range(20)]),
        ("d", list(range(8)) + [999 - i for i in range(7)]),
        ("g", [5] * 30),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    cleaned = {
        r.doc_id: (r.tokens_clean, r.n_removed)
        for r in token_ngram_dedup(df, k=8).collect()
    }
    assert cleaned["a"] == ([], 20)
    assert cleaned["b"] == ([], 20)
    assert cleaned["c"][1] == 0
    # d shares exactly its first window [0..8) with a/b
    assert cleaned["d"] == ([999 - i for i in range(7)], 8)
    assert cleaned["g"][1] == 0  # intra-doc repeats are not cross-doc dups
    stats = {
        r.doc_id: r.n_dup_windows
        for r in token_ngram_dup_stats(df, k=8).collect()
    }
    for doc, (_, n_removed) in cleaned.items():
        assert (n_removed > 0) == (stats[doc] > 0), doc


def test_token_ngram_dedup_clean_oracle_parity():
    """Cross-engine: the REAL driver query vs its REAL DuckDB oracle
    (generator + positional window-hash + span-union replay)."""
    import duckdb
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from fs_schema_validator_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    got = sorted(
        tuple(r)
        for r in m.token_ngram_dedup_clean(spark, "unused").collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r) for r in con.sql(m._token_span_dedup_oracle()).fetchall()
    )
    assert got == want


def test_semantic_dedup_kernel_duplicate_id_wrong_dim_sibling(spark):
    """Regression: a DUPLICATED id whose sibling row has a wrong (longer)
    dimension must not crash the cell kernel — the join back that
    re-fetches vectors by id would otherwise mix both siblings into one
    ragged cell matrix."""
    rows = [(i, _vec(i)) for i in range(20)]
    rows += [(3, _vec(3) + [0.5])]   # duplicate id, 65-dim sibling
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )
    out = similarity.semantic_dedup(
        emb, n_centroids=4, threshold=0.95
    ).collect()
    assert len(out) == 21
    assert sum(bool(r.is_dup) for r in out) == 0
    assert sum(r.cell is None for r in out) == 1   # the 65-dim sibling


def test_token_ngram_contamination_semantics(spark):
    """Token-level decontamination: a corpus doc whose token stream is a
    benchmark doc is fully contaminated; sharing exactly one window
    gives 1/n_windows; disjoint streams score 0; degenerate rows have
    zero windows. Benchmark-side degenerate rows contribute nothing."""
    from fs_schema_validator_spark.operators.dedup import (
        token_ngram_contamination,
    )

    corpus = spark.createDataFrame(
        [
            ("a", list(range(20))),
            ("b", [900 + 13 * i for i in range(20)]),
            ("c", list(range(8)) + [777 - i for i in range(7)]),
            ("e", None),
            ("f", [1, 2, 3]),
        ],
        "doc_id string, tokens array<int>",
    )
    bench = spark.createDataFrame(
        [("q1", list(range(20))), ("q2", None), ("q3", [5, 6])],
        "doc_id string, tokens array<int>",
    )
    out = {
        r.doc_id: (r.n_windows, r.n_contaminated, r.contamination_rate)
        for r in token_ngram_contamination(corpus, bench, k=8).collect()
    }
    assert len(out) == 5
    assert out["a"] == (13, 13, 1.0)
    assert out["b"] == (13, 0, 0.0)
    assert out["c"] == (8, 1, 0.125)
    assert out["e"] == (0, 0, 0.0)
    assert out["f"] == (0, 0, 0.0)


def test_token_ngram_contamination_oracle_parity():
    """Cross-engine: the REAL driver query vs its REAL DuckDB oracle."""
    import duckdb
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod2", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from fs_schema_validator_spark.session import get_spark

    spark = get_spark(master="local[4]", shuffle_partitions=4)
    got = sorted(
        tuple(r)
        for r in m.token_ngram_contamination(spark, "unused").collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.sql(m._token_contamination_oracle()).fetchall()
    )
    assert got == want


def test_temperature_sample_properties(spark):
    """Temperature mixing semantics: alpha=1 reduces to a uniform
    target_frac for every group; alpha=0 splits the budget equally
    across groups so the small group caps at full inclusion; the keep
    decision is deterministic; null-group rows form their own stratum."""
    from fs_schema_validator_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(f"a{i}", "cc", 100) for i in range(900)]
    rows += [(f"b{i}", "books", 100) for i in range(60)]
    rows += [(f"n{i}", None, 100) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, lang string, w int")

    # alpha=1: every group's keep_rate is exactly target_frac
    out1 = temperature_sample(df, "lang", "w", alpha=1.0, target_frac=0.4)
    rates = {r.lang: r.keep_rate for r in out1.collect()}
    assert set(rates.values()) == {0.4}
    n1 = out1.count()
    assert 0.3 * 1000 < n1 < 0.5 * 1000     # ~400 of 1000 kept

    # alpha=0: budget splits equally over the 3 strata (incl. the null
    # one) -> the small groups' rates cap at 1.0, the big one shrinks
    out0 = temperature_sample(df, "lang", "w", alpha=0.0, target_frac=0.5)
    r0 = {r.lang: r.keep_rate for r in out0.collect()}
    assert r0["books"] == 1.0 and r0[None] == 1.0
    assert 0 < r0["cc"] < 0.5
    # every books/null row is kept (rate 1.0)
    assert out0.filter(F.col("lang").isNull()).count() == 40
    assert out0.filter(F.col("lang") == "books").count() == 60

    # deterministic: identical kept sets across runs
    ids = lambda d: sorted(r.doc_id for r in d.collect())
    assert ids(out0) == ids(
        temperature_sample(df, "lang", "w", alpha=0.0, target_frac=0.5)
    )


def test_temperature_sample_degenerate_groups_cross_engine(spark):
    """Zero-weight and all-NULL-weight groups get rate 0.0 (no ANSI
    divide-by-zero abort, no least(1.0, NULL) full inclusion), and
    null-id rows are excluded — verified CROSS-ENGINE against the real
    oracle SQL on the same hostile fixture."""
    import importlib.util

    import duckdb
    import pandas as pd

    from fs_schema_validator_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(f"a{i}", "en", 100) for i in range(30)]
    rows += [(f"z{i}", "zero", 0) for i in range(5)]    # zero weight
    rows += [(f"m{i}", "nullw", None) for i in range(5)]  # null weights
    rows += [(None, "en", 100)]                          # null id
    df = spark.createDataFrame(rows, "doc_id string, lang string, n_chars int")
    got = sorted(
        tuple(r)
        for r in temperature_sample(
            df, "lang", "n_chars", alpha=0.7, target_frac=0.5
        ).collect()
    )
    # no zero/nullw/null-id rows survive
    assert all(v[1] == "en" for v in got)
    assert all(v[0] is not None for v in got)

    spec = importlib.util.spec_from_file_location(
        "entrymod3", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"]),
    )
    want = sorted(tuple(r) for r in con.sql(m._temperature_oracle()).fetchall())
    assert got == want


def test_bigram_cross_entropy_semantics(spark):
    """Perplexity-filter semantics: documents matching the LM corpus
    score the same, low cross-entropy; an out-of-distribution doc
    scores strictly higher; docs with < 2 words (incl. null/empty
    text) report (0, 0.0)."""
    from fs_schema_validator_spark.operators.selection import (
        bigram_cross_entropy,
    )

    rows = [
        ("a", "the cat sat on the mat"),
        ("b", "the cat sat on the mat"),
        ("c", "zq xv qq zz pp ww"),
        ("d", "one"),
        ("e", None),
        ("f", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    lm = df.filter("doc_id in ('a', 'b')")
    out = {
        r.doc_id: (r.n_bigrams, r.cross_entropy)
        for r in bigram_cross_entropy(df, lm, n_buckets=16).collect()
    }
    assert len(out) == 6
    assert out["a"] == out["b"] and out["a"][0] == 5
    assert out["c"][0] == 5 and out["c"][1] > out["a"][1]
    for z in ("d", "e", "f"):
        assert out[z] == (0, 0.0)


def test_bigram_xent_oracle_agrees_on_null_and_empty_text(spark, tmp_path):
    """Cross-engine: the REAL driver query vs the REAL oracle SQL on a
    hostile fixture — null text, empty text, one-word docs, and a null
    text INSIDE the LM set (doc_id % 25 == 0)."""
    import importlib.util

    import duckdb

    rows = [(i, f"w{i % 7} common text w{i % 5} tail") for i in range(40)]
    rows += [(50, None), (75, ""), (77, "solo"), (100, None)]  # 50,75,100 in LM
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    path = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(path)

    spec = importlib.util.spec_from_file_location(
        "entrymod4", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    got = sorted(
        tuple(r)
        for r in m.bigram_xent_scores(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    # Spark writes a DIRECTORY of part files — glob it for DuckDB
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.sql(m._bigram_xent_oracle()).fetchall())
    assert got == want
    by_id = {v[0]: v for v in got}
    for deg in (50, 75, 77, 100):
        assert by_id[deg][1:] == (0, 0.0)


def test_ann_oracles_agree_with_zero_vector_in_seed_window(spark, tmp_path):
    """Cross-engine contract pin: a ZERO vector planted inside the
    id-ordered seed window must not become a centroid on either side.
    Before the shared _SEED_WINDOW_SQL exclusion, the engine kept it as
    a real zero centroid (guarded norm -> cosine 0, can win over
    all-negative scores) while DuckDB's dp/0 is NULL-ranked-last — a
    silent seed divergence. Fixture also plants a null embedding, a
    wrong-dimension row, a NULL-ELEMENT vector, and an INF-ELEMENT
    vector inside the window
    (np.asarray turns a None element into a NaN centroid that poisons
    every engine argmax, while DuckDB's sum() skips null terms — the
    opposite-polarity divergence of the zero-vector case)."""
    import duckdb

    import __spark_entry__ as entrymod

    dim = 64
    rows = []
    for vid in range(60):
        if vid == 3:
            vec = [0.0] * dim                      # zero-norm, in-window
        elif vid == 5:
            vec = None                             # null, in-window
        elif vid == 7:
            vec = [1.0] * 8                        # wrong dim, in-window
        elif vid == 9:
            vec = [1.0] * (dim - 1) + [None]       # null element, in-window
        elif vid == 11:
            vec = [1.0] * (dim - 1) + [float("inf")]  # inf elem, in-window
        else:
            vec = [
                float(((vid * 31 + i * 7) % 13) - 6) for i in range(dim)
            ]
        rows.append((vid, vec, 0))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    sf_dir = str(tmp_path)
    emb.coalesce(1).write.parquet(f"{sf_dir}/embeddings.parquet")
    entrymod._QUERY_VEC_CACHE.pop(sf_dir, None)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    for name in ("ann_topk_ivf", "ann_topk_ivf_kmeans_pinned",
                 "ann_topk_ivf_pq"):
        got = sorted(
            tuple(r)
            for r in entrymod.queries()[name](spark, sf_dir).collect()
        )
        want = sorted(
            tuple(r) for r in con.sql(entrymod.oracle_sql()[name]).fetchall()
        )
        assert got == want, name
        assert len(got) == 10, name
        ids = {r[0] for r in got}
        assert 3 not in ids, name                  # zero vec ineligible
        assert 9 not in ids, name                  # null-element ineligible
        assert 11 not in ids, name                 # inf-element ineligible


def test_coarse_probe_tie_break_is_deterministic(spark):
    """Bit-identical duplicate seed centroids must probe the LOWER cell
    first (the oracles' ORDER BY sim DESC, cell ASC) — a bare
    np.argsort(-sims) is quicksort, unstable on ties."""
    import numpy as np

    from fs_schema_validator_spark.operators.similarity import _coarse_probe

    dup = [1.0, 0.0, 0.0, 0.0]
    cents = np.array([dup, dup, dup, [0.0, 1.0, 0.0, 0.0]])
    df = spark.createDataFrame(
        [(i, [float(i + 1), 1.0, 0.0, 0.0]) for i in range(8)],
        "vec_id bigint, embedding array<float>",
    )
    in_cells, qn = _coarse_probe(df, cents, dup, probes=2, vec_col="embedding",
                                 id_col="vec_id")
    assert np.allclose(qn, dup)
    # all 8 vectors score highest on the duplicated direction; the argmax
    # assignment and the probe ranking must both resolve ties to the
    # LOWEST cell, so probing cells {0, 1} covers every vector
    assert in_cells.count() == 8


def test_pq_index_build_query_matches_direct_and_prunes_partitions(
    spark, tmp_path
):
    """The standing IVF-PQ index: write_pq_index + pq_topk_from_index
    must return EXACTLY what the one-shot ivf_pq_topk computes (same
    deterministic seeds/params), ineligible rows must not be indexed,
    and the probe query's code scan must carry a `cell` PARTITION filter
    (directory-level pruning — the point of the layout)."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(424)
    centers = [_vec(9300 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
        for i in range(80)
    ]
    rows += [(200, [0.25] * 5), (201, [0.0] * 64), (202, None)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = rows[0][1]
    params = dict(n_centroids=8, m=8, ks=8, n_iter=2)

    path = str(tmp_path / "pq_index")
    similarity.write_pq_index(emb, path, **params)

    direct = [
        tuple(r)
        for r in similarity.ivf_pq_topk(
            emb, q, k=10, probes=4, refine=4, **params
        ).collect()
    ]
    from_index = similarity.pq_topk_from_index(
        spark, path, q, emb, k=10, probes=4, refine=4
    )
    assert [tuple(r) for r in from_index.collect()] == direct
    assert len(direct) == 10

    codes = spark.read.parquet(f"{path}/codes")
    assert codes.count() == 80          # ineligible rows not indexed
    assert codes.filter(F.col("cell").isNull()).count() == 0

    pruned = codes.filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the filter must be INSIDE the PartitionFilters bracket list — an
    # unpartitioned regression would show 'PartitionFilters: []' with
    # the cell filter demoted to PushedFilters (row-group, not
    # directory-level pruning) and still contain 'cell' nearby
    import re

    mpf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert mpf is not None and "cell" in mpf.group(1), plan[:500]


def test_pq_index_one_pass_equals_two_pass_kernels(spark):
    """ivf_pq_index_arrow (the standing-index build pass) must emit, for
    EVERY row, exactly the cell ivf_assign_arrow assigns and the codes
    pq_encode_arrow produces — including the NULL contract on
    null / wrong-dimension / zero-norm rows."""
    import numpy as np

    from fs_schema_validator_spark.functions.arrays import (
        ivf_assign_arrow,
        ivf_pq_index_arrow,
        pq_encode_arrow,
    )

    dim, m, ks = 8, 4, 4
    rows = [
        (i, [float(((i + 1) * 7 + j * 3) % 11 - 5) for j in range(dim)])
        for i in range(40)
    ]
    rows += [(100, None), (101, [1.0] * 3), (102, [0.0] * dim)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    cents = np.asarray([r[1] for r in rows[:6]])
    cb = (
        np.asarray([r[1] for r in rows[:ks]])
        .reshape(ks, m, dim // m)
        .transpose(1, 0, 2)
        .copy()
    )

    one = {
        r.vec_id: (r.cell, r.codes)
        for r in ivf_pq_index_arrow(df, cents, cb).collect()
    }
    cells = {r.vec_id: r.cell for r in ivf_assign_arrow(df, cents).collect()}
    codes = {r.vec_id: r.codes for r in pq_encode_arrow(df, cb).collect()}
    assert set(one) == set(cells) == set(codes)
    for vid in one:
        assert one[vid] == (cells[vid], codes[vid]), vid
    for vid in (100, 101, 102):
        assert one[vid] == (None, None)


def test_pq_index_append_extends_without_retraining(spark, tmp_path):
    """append_pq_index must encode the delta with the FROZEN sidecar
    models (same codes the original build would give those rows) and
    leave existing entries untouched; a post-append probe query sees
    the new vectors."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(515)
    centers = [_vec(9400 + c) for c in range(4)]
    base_rows = [
        (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
        for i in range(60)
    ]
    new_rows = [
        (1000 + i, [v + rng.uniform(-0.08, 0.08) for v in centers[0]])
        for i in range(12)
    ] + [(2000, [0.0] * 64)]                    # ineligible delta row
    base = spark.createDataFrame(
        base_rows, "vec_id bigint, embedding array<float>"
    )
    delta = spark.createDataFrame(
        new_rows, "vec_id bigint, embedding array<float>"
    )
    path = str(tmp_path / "pq_index")
    similarity.write_pq_index(base, path, n_centroids=8, m=8, ks=8, n_iter=2)
    before = {
        r.vec_id: (r.cell, bytes(r.codes))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    similarity.append_pq_index(delta, path)
    after = {
        r.vec_id: (r.cell, bytes(r.codes))
        for r in spark.read.parquet(f"{path}/codes").collect()
    }
    assert len(after) == 60 + 12                # zero-norm row skipped
    for vid, entry in before.items():
        assert after[vid] == entry              # history untouched
    # the frozen models give the delta the same codes a joint build's
    # kernel would (same centroids/codebooks ship either way)
    coarse, cb = similarity._load_pq_model(spark, path)
    from fs_schema_validator_spark.functions.arrays import ivf_pq_index_arrow

    expect = {
        r.vec_id: (r.cell, bytes(r.codes))
        for r in ivf_pq_index_arrow(delta, coarse, cb)
        .filter(F.col("cell").isNotNull())
        .collect()
    }
    for vid, entry in expect.items():
        assert after[vid] == entry
    # a query near centers[0] can now surface appended ids
    got = {
        r.vec_id
        for r in similarity.pq_topk_from_index(
            spark, path, centers[0], base.unionByName(delta), k=10,
            probes=2, refine=4,
        ).collect()
    }
    assert got & {1000 + i for i in range(12)}


def test_pq_index_append_is_idempotent_and_dim_guard(spark, tmp_path):
    """Re-appending the same delta must be a no-op (skip_existing
    anti-join), and ivf_pq_index_arrow must fail fast on centroid /
    codebook dimension mismatch instead of silently half-encoding."""
    import random

    import numpy as np
    import pytest

    from fs_schema_validator_spark.functions.arrays import ivf_pq_index_arrow
    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(616)
    centers = [_vec(9500 + c) for c in range(4)]
    base = spark.createDataFrame(
        [
            (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
            for i in range(40)
        ],
        "vec_id bigint, embedding array<float>",
    )
    delta = spark.createDataFrame(
        [
            (1000 + i, [v + rng.uniform(-0.08, 0.08) for v in centers[1]])
            for i in range(6)
        ],
        "vec_id bigint, embedding array<float>",
    )
    path = str(tmp_path / "pq_index")
    similarity.write_pq_index(base, path, n_centroids=8, m=8, ks=8, n_iter=2)
    similarity.append_pq_index(delta, path)
    similarity.append_pq_index(delta, path)       # retried ingest
    counts = (
        spark.read.parquet(f"{path}/codes")
        .groupBy("vec_id").count().filter(F.col("count") > 1).count()
    )
    assert counts == 0
    assert spark.read.parquet(f"{path}/codes").count() == 46

    cents = np.eye(8)[:4]                          # dim 8
    cb = np.zeros((4, 4, 1))                       # covers 4 dims only
    with pytest.raises(ValueError, match="dims"):
        ivf_pq_index_arrow(base, cents, cb)


def test_ivf_knn_join_matches_per_query_ivf_topk(spark):
    """The batch kNN join must return, for EVERY query id, exactly what
    the single-query IVF path returns for that query vector (same
    seeds, same probe contract) — including ineligible corpus rows
    (null / wrong-dim / zero) never appearing, and self-matches ranking
    first at cos 1."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(717)
    centers = [_vec(9600 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
        for i in range(60)
    ]
    rows += [(200, [0.25] * 5), (201, [0.0] * 64), (202, None)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 100))

    joined = similarity.ivf_knn_join(
        emb, queries, k=5, n_centroids=8, probes=3
    ).collect()
    by_q = {}
    for r in joined:
        by_q.setdefault(r.qid, []).append((r.vec_id, r.cos))

    qrows = {r.vec_id: list(r.embedding) for r in queries.collect()}
    assert set(by_q) == set(qrows)
    for qid, qvec in qrows.items():
        single = [
            (r.vec_id, r.cos)
            for r in similarity.ivf_topk(
                emb, qvec, k=5, n_centroids=8, probes=3
            ).collect()
        ]
        assert by_q[qid] == single, qid
        assert by_q[qid][0] == (qid, 1.0)          # self-match first
        assert {200, 201, 202} & {v for v, _ in by_q[qid]} == set()


def test_pq_knn_join_matches_per_query_index_topk(spark, tmp_path):
    """The PQ batch kNN join must return, per query id, exactly what the
    single-query pq_topk_from_index path returns against the same index
    (same sidecar models, probe contract, ADC math, rerank)."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(818)
    centers = [_vec(9700 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
        for i in range(60)
    ]
    rows += [(201, [0.0] * 64), (202, None)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    path = str(tmp_path / "pq_index")
    similarity.write_pq_index(emb, path, n_centroids=8, m=8, ks=8, n_iter=2)

    queries = emb.filter((F.col("vec_id") % 15 == 0) & (F.col("vec_id") < 100))
    joined = similarity.pq_knn_join(
        spark, path, queries, emb, k=5, probes=3, refine=4
    ).collect()
    by_q = {}
    for r in joined:
        by_q.setdefault(r.qid, []).append((r.vec_id, r.cos))

    qrows = {r.vec_id: list(r.embedding) for r in queries.collect()}
    assert set(by_q) == set(qrows)
    for qid, qvec in qrows.items():
        single = [
            (r.vec_id, r.cos)
            for r in similarity.pq_topk_from_index(
                spark, path, qvec, emb, k=5, probes=3, refine=4
            ).collect()
        ]
        assert by_q[qid] == single, qid
        assert by_q[qid][0] == (qid, 1.0)
        # a shared eligibility regression letting the zero/null rows
        # into the index would keep parity green on BOTH paths — pin it
        assert {201, 202} & {v for v, _ in by_q[qid]} == set()


def test_ivf_knn_join_accepts_trained_quantizer(spark):
    """The centroids override must match the per-query probe path with
    the SAME matrix, and malformed matrices must fail fast instead of
    silently returning an empty graph."""
    import random

    import numpy as np
    import pytest

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(919)
    centers = [_vec(9800 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.08, 0.08) for v in centers[i % 4]])
        for i in range(40)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    cents = similarity.train_centroids_kmeans(emb, n_centroids=4, n_iter=2)

    joined = similarity.ivf_knn_join(
        emb, queries, k=3, probes=2, centroids=cents
    ).collect()
    by_q = {}
    for r in joined:
        by_q.setdefault(r.qid, []).append((r.vec_id, r.cos))
    qrows = {r.vec_id: list(r.embedding) for r in queries.collect()}
    assert set(by_q) == set(qrows)
    for qid, qvec in qrows.items():
        single = [
            (r.vec_id, r.cos)
            for r in similarity._probe_topk(
                emb, cents, qvec, k=3, probes=2,
                vec_col="embedding", id_col="vec_id",
            ).collect()
        ]
        assert by_q[qid] == single, qid

    with pytest.raises(ValueError, match="2-D"):
        similarity.ivf_knn_join(
            emb, queries, centroids=np.array([], dtype=np.float64)
        )


def test_ivf_knn_join_cell_vs_pairs_scoring_identical(spark):
    """The cogrouped cell-BLAS scorer and the per-pair Arrow kernel are
    two physical strategies for the SAME logical join — every (qid,
    vec_id, cos) row must be identical, including with the corpus side
    salted into sub-blocks (corpus_blocks changes task boundaries,
    never results)."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(522)
    centers = [_vec(7300 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.1, 0.1) for v in centers[i % 4]])
        for i in range(80)
    ]
    rows += [(300, [1.0] * 3), (301, [0.0] * 64), (302, None)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    queries = emb.filter(F.col("vec_id") % 10 == 0)

    def rows_of(**kw):
        return sorted(
            (r.qid, r.vec_id, r.cos)
            for r in similarity.ivf_knn_join(
                emb, queries, k=4, n_centroids=8, probes=3, **kw
            ).collect()
        )

    cell = rows_of(scoring="cell")
    assert cell == rows_of(scoring="pairs")
    assert cell == rows_of(scoring="cell", corpus_blocks=3)
    assert len(cell) > 0


def test_pq_knn_join_cell_vs_pairs_scoring_identical(spark, tmp_path):
    """The cogrouped per-cell ADC-top-k scorer and the per-pair ADC
    kernel must produce the identical kNN join (the per-cell shortlist
    is a superset of the global shortlist and the fp association
    orders match bit-for-bit)."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(914)
    centers = [_vec(8200 + c) for c in range(4)]
    rows = [
        (i, [v + rng.uniform(-0.1, 0.1) for v in centers[i % 4]])
        for i in range(90)
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    path = str(tmp_path / "pqidx")
    similarity.write_pq_index(emb, path, n_centroids=8, m=4, ks=8, n_iter=2)
    queries = emb.filter(F.col("vec_id") % 9 == 0)

    def rows_of(strategy, **kw):
        return sorted(
            (r.qid, r.vec_id, r.cos)
            for r in similarity.pq_knn_join(
                spark, path, queries, emb, k=4, probes=3, refine=2,
                scoring=strategy, **kw,
            ).collect()
        )

    cell = rows_of("cell")
    assert cell == rows_of("pairs")
    assert cell == rows_of("cell", corpus_blocks=3)
    assert len(cell) > 0


def test_semantic_dedup_pq_matches_all_pairs_kernel(spark, tmp_path):
    """SemDeDup over the standing PQ index (code-bound screen + exact
    verify of the uncertain band) must flag EXACTLY the rows the
    all-pairs kernel flags — same quantizer, same rounding contract —
    including near-threshold pairs, exact duplicates, and ineligible
    rows (null / wrong-dim / zero vectors, null id)."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(333)
    centers = [_vec(4100 + c) for c in range(4)]
    rows = []
    for i in range(60):
        base = centers[i % 4]
        rows.append((i, [v + rng.uniform(-0.2, 0.2) for v in base]))
    # exact duplicates and near-duplicates of earlier rows
    for j, src in enumerate([3, 7, 11]):
        rows.append((100 + j, list(rows[src][1])))
    for j, src in enumerate([4, 8]):
        rows.append(
            (200 + j, [v + rng.uniform(-0.01, 0.01) for v in rows[src][1]])
        )
    rows += [(300, None), (301, [1.0] * 5), (302, [0.0] * 64), (None, [1.0] * 64)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    base_flags = {
        (r.vec_id): (r.cell, r.is_dup)
        for r in similarity.semantic_dedup(
            emb, n_centroids=8, threshold=0.95
        ).collect()
        if r.vec_id is not None
    }
    path = str(tmp_path / "sdidx")
    similarity.write_pq_index(emb, path, n_centroids=8, m=8, ks=16, n_iter=2)
    pq_flags = {
        (r.vec_id): (r.cell, r.is_dup)
        for r in similarity.semantic_dedup_pq(
            spark, path, emb, threshold=0.95
        ).collect()
        if r.vec_id is not None
    }
    assert pq_flags == base_flags
    assert any(d for _, d in base_flags.values())  # fixture plants dups

    # OFF-GRID threshold: round(cos, 5) >= 0.951234 is the same
    # condition as >= 0.95124 — the screen's certainty grid must ceil
    # to the rounding grid or the lower-bound proof flags pairs the
    # exact kernel rejects
    for thr in (0.951234, 0.89999):
        a = {
            r.vec_id: r.is_dup
            for r in similarity.semantic_dedup(
                emb, n_centroids=8, threshold=thr
            ).collect()
            if r.vec_id is not None
        }
        b = {
            r.vec_id: r.is_dup
            for r in similarity.semantic_dedup_pq(
                spark, path, emb, threshold=thr
            ).collect()
            if r.vec_id is not None
        }
        assert a == b, thr


def test_append_token_dedup_equals_full_rebuild(spark, tmp_path):
    """Incremental span-removal: state built over the OLD corpus, a
    delta appended — the returned rewrites, overlaid on the old
    corpus's original clean outputs, must equal a full
    token_ngram_dedup rebuild over old ∪ delta; the merged state must
    equal a from-scratch state; a retried append must be a no-op."""
    from fs_schema_validator_spark.operators import dedup

    def toks(i, n):
        return [(i * 31 + j * 7) % 1000 for j in range(n)]

    old_rows = [(f"doc-{i:03d}", toks(i, 10 + i % 7)) for i in range(40)]
    new_rows = [(f"new-{i:03d}", toks(100 + i, 12)) for i in range(6)]
    # re-plants of old docs: their windows flip to duplicated, so the
    # ORIGINAL docs must be rewritten too
    new_rows += [("rep-000", list(old_rows[5][1])),
                 ("rep-001", list(old_rows[9][1]))]
    # a new-only duplicate pair + degenerate rows
    new_rows += [("twin-a", toks(500, 15)), ("twin-b", toks(500, 15)),
                 ("deg-null", None), ("deg-short", [1, 2, 3])]
    schema = "doc_id string, tokens array<int>"
    old = spark.createDataFrame(old_rows, schema)
    delta = spark.createDataFrame(new_rows, schema)

    path = str(tmp_path / "tokstate")
    dedup.write_token_dedup_state(old, path, k=8)
    base_out = {
        r.doc_id: (r.tokens_clean, r.n_removed)
        for r in dedup.token_ngram_dedup(old, k=8).collect()
    }
    rewrites = {
        r.doc_id: (r.tokens_clean, r.n_removed)
        for r in dedup.append_token_dedup(delta, old, path).collect()
    }
    assert "rep-000" in rewrites and "doc-005" in rewrites  # old affected
    combined = {**base_out, **rewrites}
    full = {
        r.doc_id: (r.tokens_clean, r.n_removed)
        for r in dedup.token_ngram_dedup(old.unionByName(delta), k=8)
        .collect()
    }
    assert combined == full

    # merged state == from-scratch state over old ∪ delta
    path2 = str(tmp_path / "tokstate2")
    dedup.write_token_dedup_state(old.unionByName(delta), path2, k=8)
    merged = sorted(
        map(tuple, spark.read.parquet(f"{path}/counts").collect())
    )
    scratch = sorted(
        map(tuple, spark.read.parquet(f"{path2}/counts").collect())
    )
    assert merged == scratch

    # retried append: skip_existing makes it a no-op
    again = dedup.append_token_dedup(delta, old, path).collect()
    assert again == []
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/counts").collect())
    ) == scratch


def test_append_minhash_dedup_equals_full_rebuild(spark, tmp_path):
    """Incremental MinHash-LSH: state over the OLD corpus + an appended
    delta must accumulate exactly the verified pair set a from-scratch
    rebuild over old ∪ delta produces (max_bucket=None so capped and
    uncapped coincide); a retried append is a no-op."""
    from fs_schema_validator_spark.operators import dedup

    def doc(i, extra=""):
        return (
            f"d-{i:03d}",
            f"the quick brown fox {i} jumps over the lazy dog "
            f"pack my box with five dozen liquor jugs {i % 7} {extra}",
        )

    old_rows = [doc(i) for i in range(30)]
    new_rows = [doc(100 + i) for i in range(6)]
    # near-copies of OLD docs (cross-batch pairs) and an exact pair
    # within the delta
    new_rows += [(f"n-{j}", old_rows[j][1] + " tail") for j in (2, 5)]
    new_rows += [("twin-a", "alpha beta gamma delta epsilon zeta eta " * 3),
                 ("twin-b", "alpha beta gamma delta epsilon zeta eta " * 3),
                 ("deg-null", None), ("deg-empty", "")]
    schema = "doc_id string, text string"
    old = spark.createDataFrame(old_rows, schema)
    delta = spark.createDataFrame(new_rows, schema)

    path = str(tmp_path / "mhstate")
    dedup.write_minhash_dedup_state(old, path, max_bucket=None)
    new_pairs = dedup.append_minhash_dedup(
        delta, old, path, max_bucket=None
    ).collect()
    cross = {(r.doc_a, r.doc_b) for r in new_pairs}
    assert ("d-002", "n-2") in cross and ("twin-a", "twin-b") in cross

    got = sorted(
        map(tuple, spark.read.parquet(f"{path}/pairs").collect())
    )
    both = old.unionByName(delta)
    want = sorted(
        map(
            tuple,
            dedup.verify_candidate_pairs(
                both,
                dedup.lsh_candidate_pairs(
                    dedup.minhash_signatures_portable(both),
                    max_bucket=None,
                ),
            ).collect(),
        )
    )
    assert got == want
    assert len(want) > 2

    again = dedup.append_minhash_dedup(delta, old, path, max_bucket=None)
    assert again.count() == 0
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/pairs").collect())
    ) == want


def test_embedding_cell_drift_flags_concentrated_group(spark):
    """PSI in IVF-cell space: a group whose vectors all collapse onto
    one planted direction must score far above a group that mirrors the
    corpus mix; ineligible vectors and null labels never count."""
    import random

    from fs_schema_validator_spark.operators import similarity

    rng = random.Random(88)
    centers = [_vec(6600 + c) for c in range(4)]
    rows, labels = [], []
    for i in range(80):
        c = i % 4
        rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in centers[c]]))
        labels.append((i, "balanced"))
    for i in range(100, 140):
        rows.append((i, [v + rng.uniform(-0.05, 0.05) for v in centers[0]]))
        labels.append((i, "drifted"))
    rows += [(900, None), (901, [0.0] * 64), (902, [1.0] * 64)]
    labels += [(900, "drifted"), (901, "drifted"), (902, None)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    grp = spark.createDataFrame(labels, "vec_id bigint, grp string")
    out = {
        r.grp: r.psi
        for r in similarity.embedding_cell_drift(
            emb, grp, n_centroids=8
        ).collect()
    }
    assert set(out) == {"balanced", "drifted"}
    assert out["drifted"] > out["balanced"] + 0.5
    assert out["balanced"] >= 0.0
