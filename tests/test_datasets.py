import json
import os
import pickle

import numpy as np
import pytest

from walkgpt_tpu.data import rle as rle_mod
from walkgpt_tpu.data import conversation as conv_lib
from walkgpt_tpu.data.mask_json import get_mask_from_json
from walkgpt_tpu.data.templates import (allocate_class, canonicalize_obj,
                                        compose_multiseg_answer, join_names,
                                        join_seg_tokens)


def setup_module(module):
    conv_lib.set_default_conversation("llava_v1")


# ---------------------------------------------------------------------------
# RLE
# ---------------------------------------------------------------------------

def test_rle_roundtrip_uncompressed_and_compressed():
    rng = np.random.RandomState(0)
    m = (rng.rand(17, 23) > 0.6).astype(np.uint8)
    enc_u = rle_mod.encode(m, compressed=False)
    np.testing.assert_array_equal(rle_mod.decode(enc_u), m)
    enc_c = rle_mod.encode(m, compressed=True)
    assert isinstance(enc_c["counts"], bytes)
    np.testing.assert_array_equal(rle_mod.decode(enc_c), m)
    assert rle_mod.area(enc_c) == int(m.sum())


def test_rle_column_major_convention():
    # one fg pixel at (row=0, col=1) -> column-major offset = h
    m = np.zeros((3, 2), np.uint8)
    m[0, 1] = 1
    enc = rle_mod.encode(m, compressed=False)
    assert enc["counts"] == [3, 1, 2]


def test_rle_merge_and_frpyobjects():
    a = np.zeros((8, 8), np.uint8); a[:4] = 1
    b = np.zeros((8, 8), np.uint8); b[:, :4] = 1
    merged = rle_mod.decode(rle_mod.merge([rle_mod.encode(a), rle_mod.encode(b)]))
    np.testing.assert_array_equal(merged, a | b)
    polys = [[1.0, 1.0, 6.0, 1.0, 6.0, 6.0, 1.0, 6.0]]
    rles = rle_mod.frPyObjects(polys, 8, 8)
    dec = rle_mod.decode(rles[0])
    assert dec[3, 3] == 1 and dec[0, 0] == 0


# ---------------------------------------------------------------------------
# templates
# ---------------------------------------------------------------------------

def test_canonicalize_obj():
    assert canonicalize_obj("Side Walk") == "sidewalk"
    assert canonicalize_obj("guardrail") == "guard rail/road barrier"
    assert canonicalize_obj("cars") == "vehicle"
    assert canonicalize_obj("poles") == "pole"
    assert canonicalize_obj("waterbody") == "water body"
    assert canonicalize_obj("stairs") == "stairs"
    assert canonicalize_obj("unknown thing") == "unknown thing"
    assert canonicalize_obj("") == ""


def test_allocate_class_covers_all():
    rng = np.random.RandomState(0)
    _, groups = allocate_class(None, list("abcdefg"), max_question_num=3,
                               max_class_per_question=3, rng=rng)
    flat = [c for g in groups for c in g]
    assert sorted(flat) == list("abcdefg")
    assert all(len(g) <= 3 for g in groups)
    assert all(len(g) >= 1 for g in groups)


def test_join_helpers():
    assert join_names(["a"]) == "a"
    assert join_names(["a", "b"]) == "a and b"
    assert join_names(["a", "b", "c"]) == "a, b and c"
    assert join_seg_tokens(3) == "[SEG], [SEG] and [SEG]"


def test_compose_multiseg_answer_counts():
    rng = np.random.RandomState(1)
    for n in (1, 2, 3):
        for _ in range(10):
            a = compose_multiseg_answer(["x"] * n, rng=rng)
            assert a.count("[SEG]") == n, a


# ---------------------------------------------------------------------------
# reason_seg json rasterizer
# ---------------------------------------------------------------------------

def _write_reason_item(dirpath, name, h=40, w=50):
    import cv2
    img = np.zeros((h, w, 3), np.uint8)
    cv2.imwrite(os.path.join(dirpath, name + ".jpg"), img)
    anno = {
        "text": ["the large square"],
        "is_sentence": True,
        "shapes": [
            {"label": "target", "points": [[5, 5], [30, 5], [30, 30], [5, 30]]},
            {"label": "ignore_region", "points": [[35, 35], [45, 35], [45, 39],
                                                  [35, 39]]},
            {"label": "flag", "points": [[0, 0], [1, 0], [1, 1]]},
        ],
    }
    with open(os.path.join(dirpath, name + ".json"), "w") as f:
        json.dump(anno, f)


def test_get_mask_from_json(tmp_path):
    _write_reason_item(str(tmp_path), "img0")
    import cv2
    img = cv2.imread(str(tmp_path / "img0.jpg"))
    mask, text, is_sentence = get_mask_from_json(str(tmp_path / "img0.json"), img)
    assert is_sentence and text == ["the large square"]
    assert mask[10, 10] == 1
    assert mask[37, 40] == 255
    assert mask[0, 45] == 0


def test_reason_seg_dataset(tmp_path):
    from walkgpt_tpu.data.seg_datasets import ReasonSegDataset
    d = tmp_path / "reason_seg" / "ReasonSeg" / "train"
    d.mkdir(parents=True)
    _write_reason_item(str(d), "a")
    _write_reason_item(str(d), "b")
    ds = ReasonSegDataset(str(tmp_path), image_size=64, clip_image_size=28,
                          pad_size=64)
    s = ds[0]
    assert s.image.shape == (64, 64, 3)
    assert s.masks.shape[0] == len(s.conversations)
    assert "[SEG]" in s.conversations[0]
    assert "segmentation mask" in s.conversations[0]


def test_val_dataset_reason(tmp_path):
    from walkgpt_tpu.data.seg_datasets import ValDataset
    d = tmp_path / "reason_seg" / "ReasonSeg" / "val"
    d.mkdir(parents=True)
    _write_reason_item(str(d), "v")
    ds = ValDataset(str(tmp_path), "ReasonSeg|val", image_size=64,
                    clip_image_size=28, pad_size=64)
    assert len(ds) == 1
    s = ds[0]
    assert s.inference
    assert s.masks.shape == (1, *s.resize)
    assert s.conversations[0].count("[SEG].") == 1


# ---------------------------------------------------------------------------
# multi reason seg (MUSE json)
# ---------------------------------------------------------------------------

def test_multi_reason_seg(tmp_path):
    import cv2
    img_dir = tmp_path
    cv2.imwrite(str(tmp_path / "m0.jpg"), np.zeros((32, 32, 3), np.uint8))
    m = np.zeros((32, 32), np.uint8)
    m[:8] = 1
    items = [{
        "image": "m0.jpg",
        "question": "<image>\nWhat objects are here?",
        "targets": [
            {"name": "roof", "rle": {"size": [32, 32],
                                     "counts": rle_mod.encode(m)["counts"]
                                     .decode("ascii")}},
            {"name": "door", "polygon": [[2, 20], [10, 20], [10, 30], [2, 30]]},
        ],
    }]
    with open(tmp_path / "muse_train.json", "w") as f:
        json.dump(items, f)
    from walkgpt_tpu.data.seg_datasets import MultiReasonSegDataset
    ds = MultiReasonSegDataset(str(tmp_path), image_size=32, clip_image_size=28,
                               pad_size=32)
    s = ds[0]
    assert s.masks.shape[0] == 2
    assert s.conversations[0].count("[SEG]") == 2
    assert s.sampled_classes == [["roof", "door"]]


# ---------------------------------------------------------------------------
# REFER API + ReferSegDataset
# ---------------------------------------------------------------------------

def _make_refcoco_fixture(root):
    import cv2
    ds_dir = os.path.join(root, "refer_seg", "refcoco")
    img_dir = os.path.join(root, "refer_seg", "images/mscoco/images/train2014")
    os.makedirs(ds_dir); os.makedirs(img_dir)
    cv2.imwrite(os.path.join(img_dir, "x.jpg"), np.zeros((20, 20, 3), np.uint8))
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 1
    ann = {"id": 7, "image_id": 1, "category_id": 3,
           "segmentation": rle_mod.encode(m, compressed=False)}
    instances = {"images": [{"id": 1, "file_name": "x.jpg",
                             "height": 20, "width": 20}],
                 "annotations": [ann],
                 "categories": [{"id": 3, "name": "box"}]}
    with open(os.path.join(ds_dir, "instances.json"), "w") as f:
        json.dump(instances, f)
    refs = [{"ref_id": 0, "ann_id": 7, "image_id": 1, "category_id": 3,
             "split": "train",
             "sentences": [{"sent_id": 0, "sent": "the box", "tokens": []},
                           {"sent_id": 1, "sent": "a square", "tokens": []}]}]
    with open(os.path.join(ds_dir, "refs(unc).p"), "wb") as f:
        pickle.dump(refs, f)


def test_refer_api_and_dataset(tmp_path):
    _make_refcoco_fixture(str(tmp_path))
    from walkgpt_tpu.data.refer import REFER
    api = REFER(str(tmp_path / "refer_seg"), "refcoco", "unc")
    ids = api.getRefIds(split="train")
    assert ids == [0]
    ref = api.loadRefs(ids)[0]
    mask = api.getMask(ref)["mask"]
    assert mask[10, 10] == 1 and mask[0, 0] == 0

    from walkgpt_tpu.data.seg_datasets import ReferSegDataset
    ds = ReferSegDataset(str(tmp_path), refer_seg_data="refcoco",
                         image_size=32, clip_image_size=28, pad_size=32,
                         num_classes_per_sample=2)
    s = ds[0]
    assert s.masks.shape[0] == len(s.sampled_classes)
    assert all("[SEG]" in c for c in s.conversations)


# ---------------------------------------------------------------------------
# VQA + Hybrid
# ---------------------------------------------------------------------------

def test_vqa_dataset(tmp_path):
    import cv2
    (tmp_path / "coco" / "train2017").mkdir(parents=True)
    (tmp_path / "llava_dataset").mkdir()
    cv2.imwrite(str(tmp_path / "coco/train2017/i.jpg"),
                np.zeros((24, 24, 3), np.uint8))
    items = [{"image": "i.jpg", "conversations": [
        {"from": "human", "value": "<image>\nWhat is this?"},
        {"from": "gpt", "value": "A test image."}]}]
    with open(tmp_path / "llava_dataset" / "llava_instruct_150k.json", "w") as f:
        json.dump(items, f)
    from walkgpt_tpu.data.seg_datasets import VQADataset
    ds = VQADataset(str(tmp_path), image_size=32, clip_image_size=28, pad_size=32)
    s = ds[0]
    assert s.masks.shape[0] == 0
    assert "A test image." in s.conversations[0]


def test_hybrid_dataset_mixture(tmp_path):
    class Fake:
        def __init__(self, tag):
            self.tag = tag
        def __len__(self):
            return 10
        def __getitem__(self, i):
            return self.tag

    from walkgpt_tpu.data.seg_datasets import HybridDataset
    h = HybridDataset({"a": Fake("a"), "b": Fake("b")}, sample_rate=[9, 1],
                      samples_per_epoch=200, seed=0)
    draws = [h[i] for i in range(200)]
    assert draws.count("a") > draws.count("b")
    # PAVE-only path is deterministic-length
    h2 = HybridDataset({"PAVE": Fake("p")})
    assert len(h2) == 10


# ---------------------------------------------------------------------------
# COCO-annotation part datasets (paco_lvis / pascal_part)
# ---------------------------------------------------------------------------

def _make_pascal_part_fixture(root):
    import cv2
    img_dir = os.path.join(root, "vlpart/pascal_part/VOCdevkit/VOC2010/JPEGImages")
    os.makedirs(img_dir)
    os.makedirs(os.path.join(root, "vlpart/pascal_part"), exist_ok=True)
    cv2.imwrite(os.path.join(img_dir, "p.jpg"), np.zeros((30, 30, 3), np.uint8))
    m = np.zeros((30, 30), np.uint8)
    m[5:15, 5:15] = 1
    ann = {"id": 1, "image_id": 1, "category_id": 2,
           "segmentation": rle_mod.encode(m, compressed=False)}
    d = {"images": [{"id": 1, "file_name": "p.jpg", "height": 30, "width": 30}],
         "annotations": [ann],
         "categories": [{"id": 2, "name": "aeroplane:wing"}]}
    with open(os.path.join(root, "vlpart/pascal_part/train.json"), "w") as f:
        json.dump(d, f)


def test_pascal_part_dataset(tmp_path):
    _make_pascal_part_fixture(str(tmp_path))
    from walkgpt_tpu.data.seg_datasets import SemSegDataset
    ds = SemSegDataset(str(tmp_path), sem_seg_data="pascal_part",
                       image_size=32, clip_image_size=28, pad_size=32)
    s = ds[0]
    assert s.masks.shape[0] == 1
    name = s.sampled_classes[0][0]
    assert name in ("aeroplane wing", "the wing of the aeroplane")
    assert "[SEG]" in s.conversations[0]


def test_coco_api_ann_to_mask(tmp_path):
    _make_pascal_part_fixture(str(tmp_path))
    from walkgpt_tpu.data.coco import COCO
    api = COCO(str(tmp_path / "vlpart/pascal_part/train.json"))
    assert api.getImgIds() == [1]
    ann = api.loadAnns(api.getAnnIds(imgIds=1))[0]
    m = api.annToMask(ann)
    assert m[10, 10] == 1 and m[0, 0] == 0


def test_rotating_logger(tmp_path):
    from walkgpt_tpu.utils.logging import setup_logging
    lg = setup_logging(str(tmp_path))
    lg.info("first run")
    lg2 = setup_logging(str(tmp_path))
    lg2.info("second run")
    assert (tmp_path / "meta.log").exists()
    assert (tmp_path / "meta_1.log").exists()
    assert "first run" in (tmp_path / "meta_1.log").read_text()
    assert setup_logging(str(tmp_path), rank=1) is None


def test_caption_pretrain_dataset_and_plain_collate(tmp_path):
    import cv2
    (tmp_path / "images").mkdir()
    cv2.imwrite(str(tmp_path / "images/c.jpg"), np.zeros((24, 24, 3), np.uint8))
    items = [{"image": "c.jpg", "conversations": [
        {"from": "human", "value": "<image>"},
        {"from": "gpt", "value": "a quiet street with a wide sidewalk"}]}]
    with open(tmp_path / "blip_laion_cc_sbu_558k.json", "w") as f:
        json.dump(items, f)
    from walkgpt_tpu.data.seg_datasets import CaptionPretrainDataset
    from walkgpt_tpu.data.collate import collate_batch
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, setup_walkgpt_tokens
    ds = CaptionPretrainDataset(str(tmp_path), image_size=32,
                                clip_image_size=28, pad_size=32)
    s = ds[0]
    assert s.conversations[0].startswith("<image>\n")
    assert s.conversations[0].endswith("sidewalk\n")
    tok = ByteTokenizer(2048)
    setup_walkgpt_tokens(tok)
    batch = collate_batch([s], tok, conv_type="plain")
    ids, labels = batch["input_ids"][0], batch["labels"][0]
    # image part masked, caption supervised
    assert labels[0] == -100
    sup = labels != -100
    n_sup = int(sup.sum())
    text = tok.decode([int(t) for t in ids[sup]])
    assert "sidewalk" in text
    # nothing before the caption is supervised
    first_sup = int(np.argmax(sup))
    assert (labels[:first_sup] == -100).all()
