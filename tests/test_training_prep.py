"""Property tests pinning the semantic claims of the training-prep
operators (nzgmdb_spark/queries/training_prep.py): classifier score
semantics, random-projection invariants, edit-distance near-dup recall +
flood linearity, and UniMax waterfilling feasibility."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nzgmdb_spark.queries import load_registry
from tests.conftest import SF_MEDIUM


def _q(name):
    return load_registry()[name].fn


def test_quality_classifier_score_semantics(spark):
    out = _q("text_quality_classifier")(spark, SF_MEDIUM).toPandas()
    assert len(out) == 500
    assert ((out.quality_prob > 0.0) & (out.quality_prob < 1.0)).all()
    # keep is the sign of the pre-sigmoid score. quality_prob is the
    # 6-digit ROUNDED sigmoid, so a slightly-negative score can round up
    # to exactly 0.5 — at the boundary either keep value is consistent.
    boundary = out.quality_prob == 0.5
    assert (out.keep == (out.quality_prob >= 0.5))[~boundary].all()
    assert (out.n_tokens >= 1).all()


def test_random_projection_shape_and_duplicate_invariance(spark, tmp_path):
    # every vector gets exactly the 8 projection dims
    out = _q("similarity_random_projection")(spark, SF_MEDIUM)
    per_vec = out.groupBy("vec_id").agg(
        F.count("*").alias("n"), F.collect_set("proj_dim").alias("dims")
    )
    bad = per_vec.filter(
        (F.col("n") != 8) | (F.size("dims") != 8)
    ).count()
    assert bad == 0

    # planted corpus: duplicate vectors project identically; a negated
    # vector (exact .25 grid -> quantization-symmetric) projects negated
    base = [0.25 * ((i % 7) - 3) for i in range(64)]
    pd.DataFrame(
        {
            "vec_id": [0, 1, 2],
            "embedding": [base, list(base), [-v for v in base]],
            "label": [0, 0, 0],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")
    planted = (
        _q("similarity_random_projection")(spark, str(tmp_path))
        .toPandas()
        .pivot(index="proj_dim", columns="vec_id", values="proj")
    )
    assert (planted[0] == planted[1]).all()
    assert (planted[0] == -planted[2]).all()


def test_edit_distance_finds_planted_near_dup(spark, tmp_path):
    # B = A with 3 chars edited (same 16-char prefix, same 32-char length
    # band) -> found at distance 3; C shares the block but its tail is
    # rewritten far past the 20% relative cap -> excluded.
    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = a[:40] + "XYZ" + a[43:]
    c = a[:20] + "q" * (len(a) - 20)
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [a, b, c],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(a), len(b), len(c)],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = _q("dedup_edit_distance")(spark, str(tmp_path)).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.doc_a, row.doc_b, row.edit_distance) == (1, 2, 3)
    assert 0 < row.rel_distance <= 0.2


def test_edit_distance_flood_is_linear(spark, tmp_path):
    # 500 identical docs collide in ONE block (the block key is a function
    # of the doc) -> the capped clique/star helper must emit the 499-pair
    # star, not the 124,750-pair clique, and every member stays reachable
    # from the representative.
    n = 500
    text = "identical flood document body repeated verbatim in every row"
    pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [text] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": [len(text)] * n,
        }
    ).to_parquet(tmp_path / "documents.parquet")
    out = _q("dedup_edit_distance")(spark, str(tmp_path)).toPandas()
    assert len(out) == n - 1
    assert (out.doc_a == 0).all()
    assert set(out.doc_b) == set(range(1, n))
    assert (out.edit_distance == 0).all()


def test_edit_distance_blocks_under_cap_at_gate_sf(spark):
    # The oracle enumerates the full within-block clique; parity with the
    # capped Spark path holds only while every block is under the cap.
    # Assert it at the driver's correctness-gate scale (same contract as
    # dedup_semantic_semdedup's cell-size assertion).
    from nzgmdb_spark.operators.lsh import DEFAULT_BUCKET_CAP
    from nzgmdb_spark.queries.training_prep import _edit_blocks

    max_block = (
        _edit_blocks(spark, SF_MEDIUM)
        .groupBy("pfx", "band")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert max_block < DEFAULT_BUCKET_CAP


def test_unimax_waterfilling_feasible_and_tight(spark):
    out = _q("sample_unimax_budget")(spark, SF_MEDIUM).toPandas()
    total = out.n_docs.sum()
    budget = int(0.5 * total)
    # feasibility: no domain over-allocated
    assert (out.quota <= out.n_docs + 1e-9).all()
    assert (out.quota_docs <= out.n_docs).all()
    # tightness: fractional quotas hit the budget exactly (up to pround)
    assert out.quota.sum() == pytest.approx(budget, abs=1e-3 * len(out))
    # waterfilling shape: domains at-or-below the water level are taken
    # whole; capped domains all sit at the same level
    t = out[out.quota < out.n_docs].quota
    if len(t):
        assert t.nunique() == 1
        whole = out[out.quota >= out.n_docs]
        assert (whole.n_docs <= t.iloc[0] + 1e-9).all()


def test_sessionize_planted_sessions(spark, tmp_path):
    # planted boundary pin for the existing w_sessionize_gaps operator —
    # user 1: events at +0, +10 min, +45 min -> the 35-min gap breaks the
    # session at the third event; user 2: one lonely event.
    base = pd.Timestamp("2024-01-01 00:00:00")
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [
                base,
                base + pd.Timedelta(minutes=10),
                base + pd.Timedelta(minutes=45),
                base,
            ],
            "user_id": [1, 1, 1, 2],
            "event_type": ["c"] * 4,
            "value": [1.0, 2.0, 4.0, 8.0],
            "props": ['{"k": 1}'] * 4,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    out = (
        _q("w_sessionize_gaps")(spark, str(tmp_path))
        .toPandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    assert list(out.user_id) == [1, 1, 2]
    assert list(out.session_idx) == [1, 2, 1]
    assert list(out.n_events) == [2, 1, 1]


def test_knn_label_vote_matches_neighbor_mode(spark):
    from nzgmdb_spark.tables import tbl

    pred = (
        _q("knn_label_vote")(spark, SF_MEDIUM)
        .toPandas()
        .set_index("q_id")
        .sort_index()
    )
    knn = _q("knn_cosine_bruteforce")(spark, SF_MEDIUM).toPandas()
    labels = (
        tbl(spark, SF_MEDIUM, "embeddings")
        .select("vec_id", "label")
        .toPandas()
        .set_index("vec_id")
        .label
    )
    assert len(pred) == 5
    for q_id, g in knn.groupby("q_id"):
        votes = labels.loc[g.vec_id].value_counts()
        top = votes[votes == votes.max()].index.min()  # smallest label wins ties
        assert pred.loc[q_id, "predicted_label"] == top
        assert pred.loc[q_id, "n_votes"] == votes.max()
