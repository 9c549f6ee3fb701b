"""Dataset-assembly operator semantics: split determinism + leakage
guarantee, stratified quotas, packing bin invariants."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from heparchy_spark.operators.dataset import (
    pack_sequences,
    split_assign,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"document number {i % 40}", "en" if i % 3 else "de") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_split_weights_and_determinism(docs):
    out = split_assign(docs, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert counts.get("train", 0) > counts.get("val", 0)
    # determinism: re-running assigns identically
    again = split_assign(docs, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_split_no_duplicate_leakage(docs):
    # identical texts (i % 40 collides) must always land in the same split
    out = split_assign(docs, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
    n_violations = (
        out.groupBy("text")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n_violations == 0


def test_split_stability_under_growth(docs):
    # adding rows must not reassign existing ones
    small = docs.where(F.col("doc_id") < 100)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    before = {
        r["doc_id"]: r["split"] for r in split_assign(small, "text", w).collect()
    }
    after = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs, "text", w).collect()
        if r["doc_id"] < 100
    }
    assert before == after


def test_split_bad_weights(docs):
    with pytest.raises(ValueError):
        split_assign(docs, "text", {"a": 0.5, "b": 0.2})


def test_stratified_sample_quota(docs):
    out = stratified_sample(docs, "lang", "text", "doc_id", 0.25)
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    want = {
        r["lang"]: -(-r["count"] // 4)  # ceil(n/4)
        for r in docs.groupBy("lang").count().collect()
    }
    assert got == want
    # determinism
    again = stratified_sample(docs, "lang", "text", "doc_id", 0.25)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_pack_sequences_invariants(spark):
    rows = [(i, "s", 100) for i in range(10)] + [(100, "s", 9000)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n long")
    out = pack_sequences(df, "shard", "doc_id", "n", budget=512).collect()
    by_id = {r["doc_id"]: r for r in out}
    # docs 0..9 at 100 tokens: cum-len = 0,100,...,900 -> bins 0,0,0,0,0
    # then 500//512=0? cum-len for doc5 = 500 -> bin 0; doc6 600 -> bin 1...
    assert by_id[0]["bin_id"] == 0
    assert by_id[5]["bin_id"] == 0  # (600-100)=500 < 512
    assert by_id[6]["bin_id"] == 1
    # oversized row gets its own high bin, not an error
    assert by_id[100]["seq_len"] == 9000
    # bins are contiguous, non-negative
    assert all(r["bin_id"] >= 0 for r in out)


def test_pack_bins_fill_close_to_budget(spark):
    rows = [(i, "s", 1 + (i * 37) % 200) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, shard string, n long")
    out = pack_sequences(df, "shard", "doc_id", "n", budget=1000)
    fills = (
        out.groupBy("bin_id")
        .agg(F.sum("seq_len").alias("fill"))
        .orderBy("bin_id")
        .collect()
    )
    # every bin except possibly the last overflows-then-closes around budget
    for r in fills[:-1]:
        assert r["fill"] >= 801  # cannot close a bin while under budget - max_len
        assert r["fill"] <= 1000 + 200  # cannot exceed budget + max_len


def test_mix_sources_quotas_and_mix(docs):
    from heparchy_spark.operators.dataset import mix_sources

    # docs: ~2/3 en, ~1/3 de.  Target a 50/50 mix: de is the binding
    # source, so the output keeps every de row's quota and downsamples en.
    out = mix_sources(docs, "lang", "text", "doc_id", {"en": 500, "de": 500})
    counts = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    n_de = docs.where(F.col("lang") == "de").count()
    n_star = (1000 * n_de) // 500  # de binds: floor(1000*n_de/500)
    assert counts["de"] == (500 * n_star) // 1000
    assert counts["en"] == (500 * n_star) // 1000
    # determinism
    again = mix_sources(docs, "lang", "text", "doc_id", {"en": 500, "de": 500})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mix_sources_drops_unlisted_and_validates(docs):
    from heparchy_spark.operators.dataset import mix_sources

    out = mix_sources(docs, "lang", "text", "doc_id", {"en": 1000})
    assert out.where(F.col("lang") == "de").count() == 0
    with pytest.raises(ValueError):
        mix_sources(docs, "lang", "text", "doc_id", {"en": 700, "de": 200})


def test_shuffle_shards_permutation(docs):
    from heparchy_spark.operators.dataset import shuffle_shards

    out = shuffle_shards(docs, "text", "doc_id", n_shards=4).collect()
    assert len(out) == docs.count()
    # every row assigned a shard in range, positions are 1..n per shard
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["shard_id"] < 4
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_shuffle_shards_salt_changes_order(docs):
    from heparchy_spark.operators.dataset import shuffle_shards

    a = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shuffle_shards(docs, "text", "doc_id", 4, salt="a").collect()
    }
    b = {
        (r["doc_id"], r["shard_id"], r["pos"])
        for r in shuffle_shards(docs, "text", "doc_id", 4, salt="b").collect()
    }
    assert a != b  # different permutation
    assert {t[0] for t in a} == {t[0] for t in b}  # same rows


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def mix_corpora(draw):
    n_sources = draw(st.integers(min_value=1, max_value=4))
    sources = [f"s{i}" for i in range(n_sources)]
    rows = []
    for si, s in enumerate(sources):
        n = draw(st.integers(min_value=1, max_value=30))
        rows += [(len(rows) + j, f"doc {si} {j}", s) for j in range(n)]
    # random integer weights summing to 1000
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=999),
                min_size=n_sources - 1,
                max_size=n_sources - 1,
                unique=True,
            )
        )
    )
    bounds = [0, *cuts, 1000]
    weights = {
        s: bounds[i + 1] - bounds[i] for i, s in enumerate(sources)
    }
    return rows, weights


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=mix_corpora())
def test_mix_sources_quota_invariants(spark, case):
    """Property: output counts equal floor(w_s * N* / 1000) with
    N* = min_s floor(1000 * n_s / w_s); no source is upsampled."""
    from heparchy_spark.operators.dataset import mix_sources

    rows, weights = case
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = mix_sources(df, "src", "text", "doc_id", weights)
    got = {
        r["src"]: r["count"] for r in out.groupBy("src").count().collect()
    }
    n_by_src: dict[str, int] = {}
    for _, _, s in rows:
        n_by_src[s] = n_by_src.get(s, 0) + 1
    n_star = min(1000 * n_by_src[s] // w for s, w in weights.items())
    for s, w in weights.items():
        expect = w * n_star // 1000
        assert got.get(s, 0) == expect
        assert expect <= n_by_src[s]  # never upsampled


def test_merge_actions_and_snapshot(spark):
    """MERGE primitives: null-safe action classification and snapshot
    column coalescing, including null->value transitions and the
    delete_missing (NOT MATCHED BY SOURCE) path."""
    from heparchy_spark.operators.upsert import merge_actions, merge_snapshot

    base = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, None, "c"), (4, 40.0, "d")],
        "k long, price double, tag string",
    )
    upd = spark.createDataFrame(
        [(2, 20.0, "b"),      # unchanged
         (3, 30.0, "c"),      # null -> value = update
         (4, 40.0, "D"),      # tag change = update
         (9, 90.0, "z")],     # insert
        "k long, price double, tag string",
    )
    acts = {r.k: r.action for r in merge_actions(base, upd, ["k"]).collect()}
    assert acts == {1: "keep", 2: "unchanged", 3: "update", 4: "update", 9: "insert"}

    snap = {r.k: (r.price, r.tag) for r in merge_snapshot(base, upd, ["k"]).collect()}
    assert snap == {
        1: (10.0, "a"), 2: (20.0, "b"), 3: (30.0, "c"), 4: (40.0, "D"), 9: (90.0, "z"),
    }
    snap_del = merge_snapshot(base, upd, ["k"], delete_missing=True).collect()
    assert {r.k for r in snap_del} == {2, 3, 4, 9}


def test_scd2_history_runs_and_current(spark):
    """SCD2: consecutive same-attribute rows collapse into one interval,
    intervals chain [valid_from, valid_to), the last run per key is open
    and current, and the tiebreak pins same-timestamp ordering."""
    from datetime import datetime as dt

    from heparchy_spark.operators.upsert import scd2_history

    rows = [
        (1, "a", dt(2024, 1, 1), 0),
        (1, "a", dt(2024, 1, 2), 1),
        (1, "b", dt(2024, 1, 3), 2),
        (1, "a", dt(2024, 1, 4), 3),   # a again -> NEW run, not merged
        (2, "x", dt(2024, 1, 1), 4),
        (2, "y", dt(2024, 1, 1), 5),   # same ts, id breaks the tie
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts timestamp, eid long")
    out = sorted(
        scd2_history(df, "k", "attr", "ts", tiebreak_col="eid").collect(),
        key=lambda r: (r.k, r.valid_from),
    )
    k1 = [r for r in out if r.k == 1]
    assert [(r.attr, r.n_events, r.is_current) for r in k1] == [
        ("a", 2, False), ("b", 1, False), ("a", 1, True),
    ]
    assert [r.valid_to for r in k1] == [dt(2024, 1, 3), dt(2024, 1, 4), None]
    k2 = [r for r in out if r.k == 2]
    assert [(r.attr, r.is_current) for r in k2] == [("x", False), ("y", True)]


def test_weighted_sample_bias_determinism_and_plan(spark):
    """A-ES weighted sampling: selection is rerun-stable, biased toward
    heavy rows (sample mean weight far above corpus mean), zero-weight
    rows never selected, and the plan is TakeOrdered (no global sort)."""
    import pyspark.sql.functions as F

    from heparchy_spark.operators.dataset import weighted_sample
    from heparchy_spark.plans.inspect import physical_plan

    rows = [(i, f"doc-{i}", (i % 10) * 100) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, w long")
    out = weighted_sample(df, "text", "w", k=50)
    got = out.collect()
    assert len(got) == 50
    assert got == weighted_sample(df, "text", "w", k=50).collect()
    assert all(r.weight > 0 for r in got)
    corpus_mean = 450.0  # mean of (i%10)*100 over 500 rows
    sample_mean = sum(r.weight for r in got) / len(got)
    assert sample_mean > corpus_mean * 1.3
    assert "TakeOrderedAndProject" in physical_plan(out)


def test_contrastive_negatives_semantics(spark):
    """Negative mining: never the anchor's own label, at most k per
    anchor, deterministic across runs, and bucket-bounded fan-out (an
    anchor whose bucket lacks other labels simply gets fewer rows)."""
    from heparchy_spark.operators.dataset import contrastive_negatives

    rows = [(i, i % 3) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out = contrastive_negatives(df, "vec_id", "label", k=3, n_buckets=4)
    got = out.collect()
    assert got == contrastive_negatives(
        df, "vec_id", "label", k=3, n_buckets=4
    ).collect()
    labels = dict(rows)
    per_anchor: dict[int, int] = {}
    for r in got:
        assert labels[r.neg_id] == r.neg_label
        assert r.neg_label != labels[r.anchor_id]
        per_anchor[r.anchor_id] = per_anchor.get(r.anchor_id, 0) + 1
    assert max(per_anchor.values()) <= 3
    assert len(per_anchor) == 60  # every anchor found some negative


def test_scd2_merge_equals_rebuild(spark):
    """Incremental SCD2: applying a one-event-per-key batch (timestamps
    after each key's history) must equal rebuilding the history from
    the appended event log — absorbed runs, closed runs, new keys."""
    from datetime import datetime as dt

    from heparchy_spark.operators.upsert import scd2_history, scd2_merge

    base_rows = [
        (1, "a", dt(2024, 1, 1), 0), (1, "b", dt(2024, 1, 3), 1),
        (2, "x", dt(2024, 1, 2), 2),
    ]
    batch_rows = [
        (1, "b", dt(2024, 1, 5), 3),   # same attr -> absorbed
        (2, "y", dt(2024, 1, 6), 4),   # changed -> close + open
        (9, "z", dt(2024, 1, 7), 5),   # new key
    ]
    schema = "k long, attr string, ts timestamp, eid long"
    base = spark.createDataFrame(base_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    hist = scd2_history(base, "k", "attr", "ts", tiebreak_col="eid")
    merged = scd2_merge(hist, batch, "k", "attr", "ts")
    rebuilt = scd2_history(
        base.unionByName(batch), "k", "attr", "ts", tiebreak_col="eid"
    )
    canon = lambda df: sorted(  # noqa: E731
        (r["k"], r[1], r["valid_from"], r["valid_to"], r["n_events"],
         r["is_current"])
        for r in df.collect()
    )
    assert canon(merged) == canon(rebuilt)


def test_merge_snapshot_writes_null_updates(spark):
    """A value->NULL update must land as NULL in the snapshot (a naive
    coalesce would silently resurrect the old value while merge_actions
    reports 'update')."""
    from heparchy_spark.operators.upsert import merge_actions, merge_snapshot

    base = spark.createDataFrame([(1, "old"), (2, "keepme")], "k long, tag string")
    upd = spark.createDataFrame([(1, None)], "k long, tag string")
    acts = {r.k: r.action for r in merge_actions(base, upd, ["k"]).collect()}
    assert acts == {1: "update", 2: "keep"}
    snap = {r.k: r.tag for r in merge_snapshot(base, upd, ["k"]).collect()}
    assert snap == {1: None, 2: "keepme"}


def test_scd2_merge_null_attributes(spark):
    """NULL attribute runs survive the incremental merge: NULL->NULL
    absorbs, NULL->value closes and opens, value->NULL closes and opens
    — and the merge still equals the full rebuild."""
    from datetime import datetime as dt

    from heparchy_spark.operators.upsert import scd2_history, scd2_merge

    schema = "k long, attr string, ts timestamp, eid long"
    base = spark.createDataFrame(
        [(1, None, dt(2024, 1, 1), 0), (2, None, dt(2024, 1, 1), 1),
         (3, "v", dt(2024, 1, 1), 2)],
        schema,
    )
    batch = spark.createDataFrame(
        [(1, None, dt(2024, 1, 2), 3),    # NULL -> NULL: absorb
         (2, "x", dt(2024, 1, 2), 4),     # NULL -> value: close + open
         (3, None, dt(2024, 1, 2), 5)],   # value -> NULL: close + open
        schema,
    )
    hist = scd2_history(base, "k", "attr", "ts", tiebreak_col="eid")
    merged = scd2_merge(hist, batch, "k", "attr", "ts")
    rebuilt = scd2_history(
        base.unionByName(batch), "k", "attr", "ts", tiebreak_col="eid"
    )
    canon = lambda df: sorted(  # noqa: E731
        (
            (r["k"], r[1], r["valid_from"], r["valid_to"], r["n_events"],
             r["is_current"])
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[1] is None, t[1] or "", t[2]),
    )
    assert canon(merged) == canon(rebuilt)
    assert len(merged.collect()) == 5


def test_mix_sources_zero_row_source_yields_empty(spark):
    """A weighted source with no input rows must drive N* to 0 (empty,
    exactly-mixed output) — not silently fall out of the min and return
    a wrong mix."""
    from heparchy_spark.operators.dataset import mix_sources

    df = spark.createDataFrame(
        [(i, f"doc {i}", "a") for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = mix_sources(
        df, "source", "text", "doc_id", {"a": 500, "b": 500}
    )
    assert out.count() == 0


def test_salted_join_rejects_unsafe_types(spark):
    """Right/full-outer salted joins would duplicate unmatched
    replicated-side rows factor times — rejected with a clear error."""
    import pytest as _pytest

    from heparchy_spark.operators.layout import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    for how in ("right", "full", "full_outer"):
        with _pytest.raises(ValueError, match="salt-safe"):
            salted_join(a, b, "k", factor=4, how=how)
    assert salted_join(a, b, "k", factor=4, how="inner").count() == 1


def test_topk_per_group_matches_window_form(spark):
    """Two-phase bounded top-k equals the declarative window top-k on
    real data (multiple partitions + small Arrow batches so the pruning
    phase actually prunes), and boundary ties resolve by the tiebreak."""
    from pyspark.sql import Window as W

    from heparchy_spark.operators.topk import topk_per_group
    from heparchy_spark.queries.tables import load

    ev = (
        load(spark, "/root/testdata/sf0.001", "events")
        .where(F.col("value").isNotNull())
        .repartition(8)
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        got = {
            (r["event_type"], r["event_id"], r["rk"])
            for r in topk_per_group(
                ev, ["event_type"], "value", 5, tiebreak="event_id"
            ).collect()
        }
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    w = W.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    want = {
        (r["event_type"], r["event_id"], r["rk"])
        for r in ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .collect()
    }
    assert got == want and len(want) > 0

    # boundary ties: 3 rows share the k-th value; tiebreak picks lowest id
    rows = [("g", i, 10.0 if i < 4 else 5.0) for i in range(8)]
    tied = spark.createDataFrame(rows, "g string, id long, v double")
    top = topk_per_group(
        tied.repartition(4), ["g"], "v", 5, tiebreak="id"
    ).collect()
    assert sorted(r["id"] for r in top) == [0, 1, 2, 3, 4]


def test_dsir_logweights_orders_by_target_affinity(spark):
    """DSIR: documents made of target-typical tokens get higher log
    importance than off-target documents, and the value matches the
    plain-Python unigram mirror exactly (round-8 ratios, round-6 sum)."""
    import math

    import pyspark.sql.functions as F

    from heparchy_spark.operators.dataset import dsir_logweights

    rows = [
        (0, "good clean prose", "en"),
        (1, "good good text", "en"),
        (2, "spam spam spam", "xx"),
        (3, "good spam", "xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r.doc_id: r
        for r in dsir_logweights(
            df, "text", "doc_id", F.col("lang") == "en"
        ).collect()
    }
    # python mirror
    toks = {i: t.split() for i, t, _ in rows}
    tgt = [tok for i, t, l in rows if l == "en" for tok in t.split()]
    raw = [tok for i, t, l in rows for tok in t.split()]
    vocab = sorted(set(raw))
    v, n_t, n_r = len(vocab), len(tgt), len(raw)
    lr = {
        w: round(
            math.log((tgt.count(w) + 1) / (n_t + v))
            - math.log((raw.count(w) + 1) / (n_r + v)),
            8,
        )
        for w in vocab
    }
    for i, t, _ in rows:
        expect = round(sum(lr[w] for w in toks[i]), 6)
        assert out[i].dsir_logweight == expect, (i, out[i], expect)
        assert out[i].n_toks == len(toks[i])
    assert out[1].dsir_logweight > out[2].dsir_logweight


def test_logreg_learns_separable_toy_corpus(spark):
    """Logistic quality classifier: on a corpus where the label is
    token-separable, training pushes positive docs above 0.5 and
    negative docs below; a repeat run reproduces identical weights
    (engine-exact trajectory)."""
    import pyspark.sql.functions as F

    from heparchy_spark.operators.classifier import (
        hashed_features,
        logreg_score,
        logreg_train,
    )

    rows = [
        (0, "good clean helpful prose", 1),
        (1, "good careful writing good", 1),
        (2, "good good good content", 1),
        (3, "spam junk garbage words", 0),
        (4, "junk spam noise spam", 0),
        (5, "garbage noise junk filler", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y int")
    feats = hashed_features(df, "text", "doc_id", n_buckets=16)
    labels = df.select("doc_id", "y")
    w = logreg_train(feats, labels, n_buckets=16, iters=8, lr_pct=900)
    scored = {r.doc_id: r for r in logreg_score(feats, w).collect()}
    for did, _, y in rows:
        assert scored[did].keep == bool(y), (did, scored[did])
    assert min(scored[d].quality_score for d in (0, 1, 2)) > max(
        scored[d].quality_score for d in (3, 4, 5)
    )
    w2 = logreg_train(feats, labels, n_buckets=16, iters=8, lr_pct=900)
    assert w2 == w


def test_temperature_sample_flattens_distribution(spark):
    """Alpha-sampling: with alpha=0.5, a 4:1 source imbalance flattens
    to 2:1 quotas (sqrt rule); every quota is capped by availability and
    the draw is reproducible."""
    rows = [(i, f"doc number {i} text", "big" if i < 80 else "small")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    from heparchy_spark.operators.dataset import temperature_sample

    out = temperature_sample(df, "lang", "text", "doc_id", total=60,
                             alpha_pct=50)
    got = out.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in got}
    # sqrt(80)=8.944..., sqrt(20)=4.472... -> shares 2/3 and 1/3 of 60;
    # the small share is exactly 1/3 in the reals but the round-8 power
    # grid lands 60*pw/z at 19.999999x, and the floor rule takes 19 —
    # quotas are documented as floor-of-grid, never rounded up.
    assert by == {"big": 40, "small": 19}
    again = temperature_sample(df, "lang", "text", "doc_id", total=60,
                               alpha_pct=50)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_histogram_auc_known_values(spark):
    """The score-histogram AUC algebra (quality_logreg_auc's shape) on
    hand-checkable inputs: perfect separation -> 1.0, a tie block of
    half-positives -> the Mann-Whitney tie-averaged value."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score double, y int")
        hist = df.groupBy("score").agg(
            F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("npos")
        )
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        ranked = hist.withColumn(
            "before", F.coalesce(F.sum("n").over(w), F.lit(0))
        )
        return ranked.agg(
            (
                (
                    F.sum(
                        F.col("npos")
                        * (F.col("before") + (F.col("n") + F.lit(1)) / F.lit(2.0))
                    )
                    - F.sum("npos") * (F.sum("npos") + F.lit(1)) / F.lit(2.0)
                )
                / (F.sum("npos") * F.sum(F.col("n") - F.col("npos")))
            ).alias("auc")
        ).head()["auc"]

    perfect = [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    assert auc_of(perfect) == 1.0
    # every score tied: AUC must be exactly 0.5
    tied = [(0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)]
    assert auc_of(tied) == 0.5
    # one discordant pair out of 4: AUC = 3/4
    mixed = [(0.9, 1), (0.3, 1), (0.5, 0), (0.1, 0)]
    assert auc_of(mixed) == 0.75


def test_histogram_auc_equals_pair_counting_property(spark):
    """Property: the score-histogram AUC algebra equals the O(n^2)
    pair-counting definition (ties count half) on random score/label
    multisets — ties, duplicate scores, and degenerate distributions
    included."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    def spark_auc(rows):
        df = spark.createDataFrame(rows, "score double, y int")
        hist = df.groupBy("score").agg(
            F.count(F.lit(1)).alias("n"), F.sum("y").cast("long").alias("npos")
        )
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
        ranked = hist.withColumn(
            "before", F.coalesce(F.sum("n").over(w), F.lit(0))
        )
        return ranked.agg(
            (
                (
                    F.sum(
                        F.col("npos")
                        * (F.col("before") + (F.col("n") + F.lit(1)) / F.lit(2.0))
                    )
                    - F.sum("npos") * (F.sum("npos") + F.lit(1)) / F.lit(2.0)
                )
                / (F.sum("npos") * F.sum(F.col("n") - F.col("npos")))
            ).alias("auc")
        ).head()["auc"]

    def pair_auc(rows):
        pos = [s for s, y in rows if y == 1]
        neg = [s for s, y in rows if y == 0]
        total = 0.0
        for p in pos:
            for q in neg:
                total += 1.0 if p > q else (0.5 if p == q else 0.0)
        return total / (len(pos) * len(neg))

    # scores drawn from a tiny grid to force heavy ties
    row = st.tuples(
        st.sampled_from([0.1, 0.2, 0.3, 0.5, 0.5, 0.9]), st.integers(0, 1)
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(row, min_size=2, max_size=24))
    def check(rows):
        from hypothesis import assume

        ys = {y for _, y in rows}
        assume(ys == {0, 1})  # need at least one of each class
        assert abs(spark_auc(rows) - pair_auc(rows)) < 1e-12

    check()


def test_logreg_score_rejects_bucket_weight_mismatch(spark):
    """A feature bucket beyond the weight vector means the model was
    trained with a different n_buckets — the score pass must fail loudly
    (the join would otherwise silently DROP those feature rows and emit
    plausible-looking scores)."""
    import pytest as _pytest

    from heparchy_spark.operators.classifier import logreg_score

    feats = spark.createDataFrame(
        [(1, 0, 1.0), (1, 7, 2.0)], "doc_id long, bucket long, x double"
    )
    with _pytest.raises(Exception, match="out of range"):
        logreg_score(feats, [0.1] * 4).collect()


def test_kcenter_coreset_picks_one_per_cluster(spark):
    """Farthest-point sampling on 4 well-separated clusters must pick
    exactly one center per cluster before refining, and the trajectory
    must match a plain-Python greedy mirror (round-8 fold, low-id
    ties)."""
    import numpy as np

    from heparchy_spark.operators.dataset import kcenter_coreset

    rng = np.random.RandomState(2)
    anchors = np.array(
        [[0.0] * 8, [100.0] + [0.0] * 7, [0.0, 100.0] + [0.0] * 6,
         [0.0, 0.0, 100.0] + [0.0] * 5]
    )
    pts = np.vstack(
        [anchors[i % 4] + rng.standard_normal(8) * 0.1 for i in range(40)]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_coreset(df, "embedding", "vec_id", k=4).collect()
    got = [(r.center_rank, r.vec_id, r.sep_dist2) for r in out]
    got.sort()
    # mirror: greedy with identical rounding/tie rules
    def d2(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s += (x - y) * (x - y)
        return round(s, 8)

    centers = [0]
    mind = {i: d2(pts[i], pts[0]) for i in range(40)}
    want = [(1, 0, 0.0)]
    for rank in range(2, 5):
        best = max(
            ((m, -i) for i, m in mind.items() if i not in centers),
        )
        pick = -best[1]
        want.append((rank, pick, mind[pick]))
        centers.append(pick)
        for i in range(40):
            mind[i] = min(mind[i], d2(pts[i], pts[pick]))
    assert got == want
    # one center per planted cluster
    assert sorted(v % 4 for _, v, _ in got) == [0, 1, 2, 3]
    # empty input
    assert kcenter_coreset(
        spark.createDataFrame([], "vec_id long, embedding array<double>"),
        "embedding", "vec_id", k=3,
    ).count() == 0


def test_cluster_safe_split_coassigns_near_dup_clusters(spark):
    """Every near-dup CLUSTER lands wholly in one split (the leakage
    property dataset_split_leakage can only detect), singletons keep
    their own id as component, and weights must sum to 1."""
    import pytest as _pytest

    from heparchy_spark.operators.dataset import cluster_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # two clusters: a 3-clique {0,1,2} and a CHAIN 10-11-12 (transitive
    # closure must merge non-adjacent 10 and 12), rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12)],
        "id_a long, id_b long",
    )
    out = cluster_safe_split(
        docs, pairs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 40
    assert {rows[i].component for i in (0, 1, 2)} == {0}
    assert {rows[i].component for i in (10, 11, 12)} == {10}
    assert len({rows[i].split for i in (0, 1, 2)}) == 1
    assert len({rows[i].split for i in (10, 11, 12)}) == 1
    assert rows[5].component == 5  # singleton
    assert set(out.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test",
    }

    with _pytest.raises(ValueError):
        cluster_safe_split(docs, pairs, "doc_id", {"train": 0.5, "val": 0.1})
