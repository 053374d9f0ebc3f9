"""train_cli smoke tests: LoRA injection wiring, the '||' task-mixture DSL,
and the stage-1 projector-pretrain driver (reference train_walkgpt.py:263-305,
:74-83 + utils/dataset.py:202-397 + train/train.py:810-1038)."""
import json
import os

import numpy as np
import pytest

from walkgpt_tpu.runtime import train_cli

REF_DATASETS = "/root/reference/datasets"


def _write_pave_fixture(root):
    os.makedirs(root, exist_ok=True)
    labelmap = {
        "0": "sidewalk", "1": "pole",
        "name_to_id": {"sidewalk": 0, "pole": 1},
        "accessibility_scores": {"sidewalk": 0.9, "pole": 0.1},
    }
    # match the reference labelmap layout the loader expects
    import shutil
    ref_lm = os.path.join(REF_DATASETS, "labelmap.json")
    if os.path.exists(ref_lm):
        shutil.copy(ref_lm, os.path.join(root, "labelmap.json"))
    else:  # minimal synthetic fallback
        with open(os.path.join(root, "labelmap.json"), "w") as f:
            json.dump(labelmap, f)
    rows = []
    if os.path.exists(os.path.join(REF_DATASETS, "val.jsonl")):
        with open(os.path.join(REF_DATASETS, "val.jsonl")) as f:
            rows = [next(f) for _ in range(4)]
    with open(os.path.join(root, "train.jsonl"), "w") as f:
        f.writelines(rows)
    with open(os.path.join(root, "val.jsonl"), "w") as f:
        f.writelines(rows)


def _write_reason_fixture(root):
    import cv2
    d = os.path.join(root, "reason_seg", "ReasonSeg", "train")
    os.makedirs(d, exist_ok=True)
    for name in ("a", "b"):
        cv2.imwrite(os.path.join(d, name + ".jpg"),
                    np.zeros((40, 50, 3), np.uint8))
        with open(os.path.join(d, name + ".json"), "w") as f:
            json.dump({"text": ["the thing"], "is_sentence": True,
                       "shapes": [{"label": "target",
                                   "points": [[5, 5], [30, 5], [30, 30]]}]}, f)


def _write_vqa_fixture(root):
    os.makedirs(os.path.join(root, "llava_dataset"), exist_ok=True)
    os.makedirs(os.path.join(root, "coco", "train2017"), exist_ok=True)
    items = [{"image": "missing.jpg",
              "conversations": [
                  {"from": "human", "value": "<image>\nWhat is shown?"},
                  {"from": "gpt", "value": "A street scene."}]}
             for _ in range(3)]
    with open(os.path.join(root, "llava_dataset",
                           "llava_instruct_150k.json"), "w") as f:
        json.dump(items, f)


def _write_muse_fixture(root):
    import cv2
    os.makedirs(root, exist_ok=True)
    img = os.path.join(root, "m.jpg")
    cv2.imwrite(img, np.zeros((32, 32, 3), np.uint8))
    items = [{"image": "m.jpg",
              "questions": ["Find the things."],
              "targets": [{"name": "thing",
                           "polygon": [[2, 2], [20, 2], [20, 20], [2, 20]]}]}]
    with open(os.path.join(root, "muse_train.json"), "w") as f:
        json.dump(items, f)


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DATASETS, "val.jsonl")),
                    reason="reference manifests absent")
def test_train_cli_smoke_pave_lora(tmp_path):
    """Two steps of the canonical recipe: PAVE + fresh r=2 LoRA on q/v."""
    root = str(tmp_path / "data")
    _write_pave_fixture(root)
    state = train_cli.main([
        "--model_size", "tiny", "--dataset", "PAVE",
        "--dataset_dir", root, "--log_base_dir", str(tmp_path / "runs"),
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "1",
        "--lora_r", "2", "--no_eval", "--max_segs", "8",
        "--seq_multiple", "64", "--model_max_length", "512",
    ])
    for layer in state.params["llm"]["layers"]:
        assert "lora_a" in layer["attn"]["q"]
        assert "lora_a" in layer["attn"]["v"]
    # checkpoint + projector artifact written
    runs = tmp_path / "runs" / "walkgpt_train" / "ckpt_model"
    assert (runs / "latest").exists()


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DATASETS, "val.jsonl")),
                    reason="reference manifests absent")
def test_train_cli_smoke_qlora_quant_base(tmp_path):
    """--quant_base int4x: frozen int8-attn/int4-MLP base + fresh LoRA,
    partitioned gradients (state.params is the TRAINABLE subtree only)."""
    import jax
    import jax.numpy as jnp
    root = str(tmp_path / "data")
    _write_pave_fixture(root)
    state = train_cli.main([
        "--model_size", "tiny", "--dataset", "PAVE",
        "--dataset_dir", root, "--log_base_dir", str(tmp_path / "runs"),
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "1",
        "--lora_r", "2", "--quant_base", "int4x", "--no_eval",
        "--max_segs", "8", "--seq_multiple", "64",
        "--model_max_length", "512",
    ])
    for layer in state.params["llm"]["layers"]:
        assert "lora_a" in layer["attn"]["q"]
        assert "lora_a" in layer["attn"]["v"]
    # trainable subtree only: every array leaf is float (base stayed behind)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert jnp.issubdtype(leaf.dtype, jnp.inexact), leaf.dtype
    assert int(state.step) == 2


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DATASETS, "val.jsonl")),
                    reason="reference manifests absent")
def test_train_cli_mixture_three_tasks(tmp_path):
    """The reference's '||' DSL builds a HybridDataset and a mixture step with
    three task types runs (train_walkgpt.py:74-83)."""
    root = str(tmp_path / "data")
    _write_pave_fixture(root)
    _write_reason_fixture(root)
    _write_vqa_fixture(root)
    _write_muse_fixture(root)
    state = train_cli.main([
        "--model_size", "tiny",
        "--dataset", "PAVE||reason_seg||vqa||multi_reason_seg",
        "--sample_rates", "9,3,3,1",
        "--dataset_dir", root, "--log_base_dir", str(tmp_path / "runs"),
        "--epochs", "1", "--steps_per_epoch", "3", "--batch_size", "2",
        "--lora_r", "0", "--no_eval", "--max_segs", "8",
        "--seq_multiple", "64", "--model_max_length", "512",
    ])
    assert state is not None


def test_build_train_dataset_validates(tmp_path):
    import argparse
    from walkgpt_tpu.core.config import tiny_config
    cfg = tiny_config()
    args = argparse.Namespace(
        dataset="PAVE||nope", sample_rates="", dataset_dir=str(tmp_path),
        train_split="train", val_split="val", image_size=64, seed=0,
        sem_seg_data="", refer_seg_data="", vqa_data="", reason_seg_data="")
    with pytest.raises(ValueError, match="unknown --dataset"):
        train_cli.build_train_dataset(args, cfg, samples_per_epoch=4)
    args.dataset = "PAVE||vqa"
    args.sample_rates = "1,2,3"
    with pytest.raises(ValueError, match="sample_rates"):
        train_cli.build_train_dataset(args, cfg, samples_per_epoch=4)


@pytest.mark.skipif(not os.path.exists(os.path.join(REF_DATASETS, "val.jsonl")),
                    reason="reference manifests absent")
def test_train_cli_stage1_projector_pretrain(tmp_path):
    """--tune_mm_adapter: caption data under the plain template, projector-only
    trainable set, and the out_mm_projector artifact that --projector_ckpt
    consumes (train/train.py:810-1038)."""
    import cv2
    root = str(tmp_path / "data")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    _write_pave_fixture(root)    # labelmap for the val path (unused here)
    cv2.imwrite(os.path.join(root, "images", "c.jpg"),
                np.zeros((30, 30, 3), np.uint8))
    caps = [{"image": "c.jpg",
             "conversations": [{"from": "human", "value": "<image>"},
                               {"from": "gpt", "value": "a street."}]}
            for _ in range(2)]
    with open(os.path.join(root, "captions.json"), "w") as f:
        json.dump(caps, f)

    import jax
    state = train_cli.main([
        "--model_size", "tiny", "--tune_mm_adapter",
        "--caption_data", "captions.json",
        "--dataset_dir", root, "--log_base_dir", str(tmp_path / "runs"),
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "1",
        "--max_segs", "4", "--seq_multiple", "64",
        "--model_max_length", "256", "--exp_name", "s1",
    ])
    # the projector artifact exists and reloads as an overlay
    import glob
    projs = glob.glob(str(tmp_path / "runs" / "s1" / "ckpt_model" /
                          "global_step*" / "out_mm_projector"))
    assert projs, "stage-1 must write the out_mm_projector artifact"
    from walkgpt_tpu.runtime import checkpoint as ck
    tree = ck.load_orbax(projs[-1],
                         like={"msqp": state.params["msqp"],
                               "mm_projector": state.params["mm_projector"]})
    assert "msqp" in tree and "mm_projector" in tree
