import numpy as np
import pytest

import jax
import jax.numpy as jnp

from walkgpt_tpu.core.config import SAM_VIT_TINY, MaskDecoderConfig
from walkgpt_tpu.models import sam
from walkgpt_tpu.models.sam_predictor import (SamAutomaticMaskGenerator,
                                              SamPredictor, batched_mask_to_box,
                                              box_nms, build_point_grid,
                                              calculate_stability_score)


@pytest.fixture(scope="module")
def tiny():
    cfg = sam.SamConfig.for_encoder(SAM_VIT_TINY)
    params = sam.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_predictor_point_and_box(tiny):
    cfg, params = tiny
    pred = SamPredictor(params, cfg)
    img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    pred.set_image(img)
    masks, iou, low = pred.predict(point_coords=np.array([[32.0, 24.0]]),
                                   point_labels=np.array([1]),
                                   multimask_output=True)
    assert masks.shape == (3, 48, 64) and masks.dtype == bool
    assert iou.shape == (3,)
    m2, i2, _ = pred.predict(box=np.array([5.0, 5.0, 40.0, 30.0]),
                             multimask_output=False)
    assert m2.shape == (1, 48, 64)
    # logits mode
    m3, _, _ = pred.predict(point_coords=np.array([[10.0, 10.0]]),
                            point_labels=np.array([1]),
                            multimask_output=False, return_logits=True)
    assert m3.dtype != bool


def test_point_grid_and_stability():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert (g > 0).all() and (g < 1).all()
    logits = np.array([np.full((4, 4), 5.0), np.full((4, 4), 0.5)])
    s = calculate_stability_score(logits, 0.0, 1.0)
    assert s[0] == 1.0 and s[1] == 0.0


def test_mask_to_box_and_nms():
    m = np.zeros((2, 10, 10), bool)
    m[0, 2:5, 3:7] = True
    boxes = batched_mask_to_box(m)
    np.testing.assert_array_equal(boxes[0], [3, 2, 7, 5])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])
    bxs = np.array([[0, 0, 10, 10], [1, 1, 9, 9], [20, 20, 30, 30]], np.float32)
    keep = box_nms(bxs, np.array([0.9, 0.8, 0.7]), 0.5)
    assert keep == [0, 2]


def test_amg_generate(tiny):
    cfg, params = tiny
    amg = SamAutomaticMaskGenerator(params, cfg, points_per_side=2,
                                    pred_iou_thresh=-1e9,
                                    stability_score_thresh=-1e9)
    img = (np.random.RandomState(1).rand(64, 64, 3) * 255).astype(np.uint8)
    out = amg.generate(img)
    assert isinstance(out, list) and len(out) > 0
    rec = out[0]
    assert {"segmentation", "area", "bbox", "predicted_iou",
            "stability_score", "point_coords"} <= set(rec)
    from walkgpt_tpu.data import rle as rle_mod
    m = rle_mod.decode(rec["segmentation"])
    assert m.shape == (64, 64)


def test_multiscale_decoder(tiny):
    cfg, params = tiny
    from walkgpt_tpu.models import sam_decoder_multiscale as msd
    mcfg = MaskDecoderConfig(transformer_dim=32, transformer_mlp_dim=64,
                             transformer_num_heads=2)
    p = msd.init(jax.random.PRNGKey(1), mcfg, image_feature_scale_num=2)
    feats = jnp.zeros((1, 4, 4, 32))
    pe = jnp.zeros((1, 4, 4, 32))
    sparse = jnp.ones((3, 1, 32))
    dense = jnp.zeros((3, 4, 4, 32))
    m0, i0 = msd.apply(p, mcfg, image_embeddings=feats, image_pe=pe,
                       sparse_prompt=sparse, dense_prompt=dense,
                       multimask_output=False, level_num=0)
    assert m0.shape == (3, 1, 8, 8)
    # level 1: 2x upsampled grid gated by previous masks
    m1, i1 = msd.apply(p, mcfg, image_embeddings=feats, image_pe=pe,
                       sparse_prompt=sparse, dense_prompt=dense,
                       multimask_output=True, level_num=1,
                       previous_masks=m0)
    assert m1.shape == (3, 4, 16, 16)
    assert jnp.isfinite(m1).all()


def test_sam_vision_tower(tiny):
    cfg, params = tiny
    from walkgpt_tpu.models.sam_tower import SAMVisionTower
    tower = SAMVisionTower(params["image_encoder"], cfg.encoder)
    out = tower(jnp.zeros((2, 64, 64, 3)))
    assert out.tokens.shape == (2, 16, 32)
    assert out.spatial.shape == (2, 4, 4, 32)
    assert out.grid == (4, 4)
    assert tower.num_patches == 16


def test_truncate_at_keywords():
    from walkgpt_tpu.runtime.generate import truncate_at_keywords
    toks = [5, 6, 7, 8, 9, 10]
    assert truncate_at_keywords(toks, [[8, 9]]) == [5, 6, 7]
    assert truncate_at_keywords(toks, [[99]]) == toks
    from walkgpt_tpu.data.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    ids = tok.encode("hello###world", add_special_tokens=False)
    out = truncate_at_keywords(ids, [], tokenizer=tok, keywords=["###"])
    assert tok.decode(out).startswith("hello")
    assert "world" not in tok.decode(out)


def test_projector_only_mask():
    from walkgpt_tpu.core.config import tiny_config
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.runtime import train as tr
    from walkgpt_tpu.parallel import sharding as shd
    params = walkgpt.init(jax.random.PRNGKey(2), tiny_config())
    mask = tr.trainable_mask(params, tr.TrainConfig(tune_projector_only=True))
    flat = {shd._path_str(p): v for p, v in
            jax.tree_util.tree_flatten_with_path(mask)[0]}
    assert all(v for k, v in flat.items() if k.startswith("msqp/"))
    assert all(not v for k, v in flat.items() if k.startswith("llm/"))
    assert all(not v for k, v in flat.items() if k.startswith("ctp/"))


def test_merge_lora_cli(tmp_path):
    import jax
    from walkgpt_tpu.core.config import tiny_config
    from walkgpt_tpu.models import walkgpt
    from walkgpt_tpu.runtime import checkpoint as ck
    from walkgpt_tpu.runtime.merge_lora_cli import main
    cfg = tiny_config()
    params = walkgpt.init(jax.random.PRNGKey(3), cfg)
    src = str(tmp_path / "src")
    ck.save_orbax(src, params)
    merged = main(["--weight", src, "--model_size", "tiny",
                   "--save_path", str(tmp_path / "merged")])
    assert "clip" not in merged
    assert (tmp_path / "merged").exists()


def test_generate_crop_boxes_layout():
    from walkgpt_tpu.models.sam_predictor import generate_crop_boxes
    boxes, layers = generate_crop_boxes((100, 150), n_layers=2,
                                        overlap_ratio=0.2)
    # 1 full-image + 4 layer-1 + 16 layer-2
    assert len(boxes) == 1 + 4 + 16
    assert layers.count(0) == 1 and layers.count(1) == 4 and \
        layers.count(2) == 16
    assert boxes[0] == [0, 0, 150, 100]
    for (x0, y0, x1, y1), li in zip(boxes, layers):
        assert 0 <= x0 < x1 <= 150 and 0 <= y0 < y1 <= 100
    # layer-1 crops overlap: union covers the image
    cover = np.zeros((100, 150), bool)
    for (x0, y0, x1, y1), li in zip(boxes, layers):
        if li == 1:
            cover[y0:y1, x0:x1] = True
    assert cover.all()


def test_remove_small_regions_modes():
    from walkgpt_tpu.models.sam_predictor import remove_small_regions
    m = np.zeros((40, 40), bool)
    m[5:25, 5:25] = True
    m[10, 10] = False               # 1-px hole
    m[35, 35] = True                # 1-px island
    out, changed = remove_small_regions(m, area_thresh=4, mode="holes")
    assert changed and out[10, 10]
    out2, changed2 = remove_small_regions(out, area_thresh=4, mode="islands")
    assert changed2 and not out2[35, 35] and out2[6, 6]
    # below-threshold everything: keep the largest island
    tiny_m = np.zeros((10, 10), bool)
    tiny_m[0, 0] = True
    tiny_m[5:7, 5:7] = True
    out3, _ = remove_small_regions(tiny_m, area_thresh=100, mode="islands")
    assert out3[5, 5] and not out3[0, 0]


def test_amg_crop_pyramid_and_small_regions(tiny):
    """crop_n_layers=1 re-prompts 4 overlapping crops; min_mask_region_area
    fills holes/drops islands instead of discarding masks."""
    cfg, params = tiny
    amg = SamAutomaticMaskGenerator(params, cfg, points_per_side=2,
                                    pred_iou_thresh=-1e9,
                                    stability_score_thresh=-1e9,
                                    crop_n_layers=1,
                                    crop_n_points_downscale_factor=2,
                                    min_mask_region_area=4)
    img = (np.random.RandomState(2).rand(64, 64, 3) * 255).astype(np.uint8)
    out = amg.generate(img)
    assert isinstance(out, list) and len(out) > 0
    from walkgpt_tpu.data import rle as rle_mod
    for rec in out:
        m = rle_mod.decode(rec["segmentation"])
        assert m.shape == (64, 64)
        assert rec["area"] == int(m.sum()) > 0
