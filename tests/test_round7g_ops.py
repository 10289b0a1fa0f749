"""Semantic twin for multimodal_video_keyframe_per_shot: replay the
synthetic motion-Y4M geometry in pure Python and check the shot
segmentation and medoid pick, plus structural invariants against the
scene-cut operator it extends."""

from __future__ import annotations

import pytest

from awsbeats_spark.operators.llm.multimodal import (
    _CUT_MAX_FRAMES,
    _CUT_ROTATE,
    _CUT_THRESHOLD,
)
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _expected(raw: bytes):
    n = len(raw)
    w = 10 + 2 * (n % 7)
    h = 10 + 2 * ((7 * n) % 5)
    n_frames = 1 + n % 24
    probed = min(n_frames, _CUT_MAX_FRAMES)
    area = w * h
    sums = []
    for i in range(probed):
        s = 0
        for j in range(area):
            b = raw[(i * _CUT_ROTATE + j) % n]
            s += (255 - b) if i % 4 == 3 else b
        sums.append(s)
    shot_of = [0] * probed
    shot = 0
    for i in range(1, probed):
        if abs(sums[i] - sums[i - 1]) / area > _CUT_THRESHOLD:
            shot += 1
        shot_of[i] = shot
    out = []
    for sh in range(shot + 1):
        fs = [i for i in range(probed) if shot_of[i] == sh]
        tot = sum(sums[i] for i in fs)
        key = min(fs, key=lambda i: (abs(sums[i] * len(fs) - tot), i))
        out.append((sh, fs[0], fs[-1], len(fs), key))
    return out


def test_keyframes_match_python_replay(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables

    docs = tables(spark, sf_dir).documents.toPandas()
    got = run("multimodal_video_keyframe_per_shot")
    by_doc = {d: g for d, g in got.groupby("doc_id")}
    checked = 0
    for _, row in docs.iterrows():
        raw = row.text.encode()
        if len(raw) % 3 != 2:
            assert row.doc_id not in by_doc
            continue
        exp = _expected(raw)
        g = by_doc[row.doc_id].sort_values("shot_idx")
        rows = list(
            g[
                ["shot_idx", "start_frame", "end_frame", "n_frames_shot",
                 "keyframe"]
            ].itertuples(index=False, name=None)
        )
        assert rows == exp, f"doc {row.doc_id}"
        checked += 1
        if checked >= 40:
            break
    assert checked == 40


def test_keyframes_consistent_with_scene_cuts(run):
    kf = run("multimodal_video_keyframe_per_shot")
    cuts = run("multimodal_video_scene_cuts").set_index("doc_id")
    shots_per_doc = kf.groupby("doc_id").shot_idx.max() + 1
    for doc_id, n_shots in shots_per_doc.items():
        assert n_shots == cuts.loc[doc_id].n_cuts + 1
    # every keyframe lies inside its shot's frame range
    assert ((kf.keyframe >= kf.start_frame) & (kf.keyframe <= kf.end_frame)).all()
    # shots partition the probed prefix: per doc, shot lengths sum to n_probed
    tot = kf.groupby("doc_id").n_frames_shot.sum()
    for doc_id, n in tot.items():
        assert n == cuts.loc[doc_id].n_probed
