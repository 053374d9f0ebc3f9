"""Golden tests for the PAVE answer-text composer (byte-compat with
reference utils/PAVE_dataset.py:123-191)."""
import json
import os

import pytest

from walkgpt_tpu.data.pave import (LabelMap, compose_answer_text,
                                   depth_prompt_ins, normalize_questions,
                                   strip_assessment_tags)

LABELMAP = {
    "name_to_id": {"sidewalk": 3, "curb": 2, "stairs": 15, "paved trail": 6},
    "id_to_name": {"3": "sidewalk", "2": "curb", "15": "stairs", "6": "paved trail"},
    "accessibility_scores": {"sidewalk": 1.0, "curb": 0.2, "stairs": 0.1,
                             "paved trail": 0.95},
}


@pytest.fixture
def labelmap(tmp_path):
    p = tmp_path / "labelmap.json"
    p.write_text(json.dumps(LABELMAP))
    return LabelMap.load(str(p))


def test_strip_assessment_tags():
    assert strip_assessment_tags("<assessment> Clear path. </assessment>") == "Clear path."
    assert strip_assessment_tags("  plain text ") == "plain text"
    assert strip_assessment_tags(None) == ""


def test_compose_full(labelmap):
    ex = {
        "assessment": "<assessment> The sidewalk is clear. </assessment>",
        "depth": {"3": 2.34, "2": 1.06, "15": 7.9},
    }
    got = compose_answer_text(ex, labelmap)
    expected = (
        "[assessment] The sidewalk is clear. [/assessment]"
        " Accessible features are here: [p] sidewalk [/p][SEG]"
        " Non-accessible features are here: [p] curb [/p][SEG][p] stairs [/p][SEG]"
        " [distance] Distance from the user to the to the curb: 1.1 m; "
        "to the sidewalk: 2.3 m; to the stairs: 7.9 m. [/distance]"
    )
    # NOTE: the 'Distance from the user to the to the X' doubling comes from the
    # reference format string f"Distance from the user to the {body}" where body
    # items already start with "to the" — preserved byte-for-byte.
    assert got == expected


def test_compose_assessment_only(labelmap):
    ex = {"assessment": "ok", "depth": {}}
    assert compose_answer_text(ex, labelmap) == "[assessment] ok [/assessment]"


def test_compose_skips_unknown_ids(labelmap):
    ex = {"assessment": "x", "depth": {"99": 1.0}}
    assert compose_answer_text(ex, labelmap) == "[assessment] x [/assessment]"


def test_feature_lists_dedup_sorted(labelmap):
    ex = {"assessment": "y", "depth": {"3": 5.0, "6": 1.0}}
    got = compose_answer_text(ex, labelmap)
    # alphabetical: paved trail < sidewalk
    assert ("Accessible features are here: [p] paved trail [/p][SEG]"
            "[p] sidewalk [/p][SEG]") in got
    assert "Non-accessible" not in got


def test_multi_seg_marker(labelmap):
    ex = {"assessment": "z", "depth": {"3": 5.0}}
    got = compose_answer_text(ex, labelmap, seg_token_marker="[SEG0] [SEG1]")
    assert "[p] sidewalk [/p][SEG0] [SEG1]" in got


def test_depth_prompt_ins(labelmap):
    ex = {"depth": {"15": 7.95, "3": 2.0}}
    assert depth_prompt_ins(ex, labelmap) == \
        "PAVE depth cues: sidewalk at 2.0 m, stairs at 8.0 m"
    assert depth_prompt_ins({}, labelmap) == "PAVE depth cues: none available."


def test_normalize_questions():
    assert normalize_questions({"question": " hi "}) == ["hi"]
    assert normalize_questions({"question": ["a", "", "b"]}) == ["a", "b"]
    fallback = normalize_questions({})
    assert len(fallback) == 1 and "pedestrian-friendly" in fallback[0]


REF_VAL = "/root/reference/datasets/val.jsonl"
REF_LABELMAP = "/root/reference/datasets/labelmap.json"


@pytest.mark.skipif(not os.path.exists(REF_VAL), reason="reference manifest absent")
def test_compose_on_reference_manifest_rows():
    """Structural checks over real PAVE val rows: grammar well-formed, counts
    match the depth dict, distances ascending."""
    lm = LabelMap.load(REF_LABELMAP)
    with open(REF_VAL) as f:
        rows = [json.loads(next(f)) for _ in range(5)]
    for ex in rows:
        text = compose_answer_text(ex, lm)
        assert text.startswith("[assessment] ") and "[/assessment]" in text
        mapped = [k for k in (ex.get("depth") or {}) if str(k) in lm.id_to_name]
        names = {lm.id_to_name[str(k)] for k in mapped}
        scored = [n for n in names if n in lm.accessibility_scores]
        assert text.count("[SEG]") == len(set(scored))
        assert text.count("[p] ") == len(set(scored))
        if mapped:
            body = text.split("[distance] Distance from the user to the ", 1)[1]
            body = body.split(". [/distance]")[0]
            dists = [float(p.rsplit(": ", 1)[1].rstrip(" m"))
                     for p in body.split("; ")]
            assert dists == sorted(dists)
            assert len(dists) == len(mapped)


@pytest.mark.skipif(not os.path.exists(REF_VAL), reason="reference manifest absent")
def test_mask_order_seg_matches_answer_order():
    """mask_order='seg' reorders GT planes to the answer's [SEG] sequence
    (accessible alphabetical, then non-accessible alphabetical)."""
    from walkgpt_tpu.data.pave import PAVEDataset
    ds = PAVEDataset(REF_VAL, REF_LABELMAP, image_size=64, pad_size=64,
                     is_val=True, mask_order="seg")
    s = ds[0]
    lm = ds.labelmap
    names = [lm.id_to_name[c[0]] for c in s.sampled_classes]
    scores = [lm.accessibility_scores[n] for n in names]
    # accessible block first, each block alphabetical
    k = sum(1 for sc in scores if sc >= 0.5)
    assert all(sc >= 0.5 for sc in scores[:k])
    assert all(sc < 0.5 for sc in scores[k:])
    assert names[:k] == sorted(names[:k])
    assert names[k:] == sorted(names[k:])
