"""FULL-PIPELINE cross-framework parity: the reference's OWN evaluate()
generate loop (/root/reference/model/walkgpt.py:607-746) vs our
generate_and_segment, at tiny scale on CPU torch.

This is the strongest buildable proxy for the BASELINE.json north-star
contract while the released weights are absent from this image: the
reference model is constructed from its own classes (walkgptForCausalLM
over LlavaLlamaForCausalLM, with build_sam_vit_h monkeypatched to a tiny
Sam built from the reference's own modeling classes), random-initialized,
its state dict converted through runtime/checkpoint.convert_walkgpt_state,
and the two frameworks must produce
  * IDENTICAL greedy token sequences (prompt -> decode -> stop),
  * the same [SEG] count through each side's own extraction bookkeeping,
  * masks with IoU >= 1 - 1e-3 after each side's own postprocessing to the
    original image size (crop pad -> bilinear -> binarize at 0).
Module-level parity (tests/test_reference_parity.py) cannot catch
decode-loop bookkeeping, 255-offset timeline, or SEG-order drift — this
does.

CPU-run shims (semantics-preserving): Tensor.cuda -> identity (evaluate()
hardcodes .cuda()), use_cache=False (the reference pins transformers 4.31
whose legacy tuple-cache fast path the installed version no longer feeds;
cache-free decode recomputes the identical logits), and
CLIPVisionConfig.from_pretrained -> default config (the delay-loaded CLIP
tower is never invoked — generation runs in the tokens-passthrough mode,
encode_images case (a), exactly like generate_predictions_from_questions,
evaluation_walkgpt.py:535-577).
"""
import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
SID = 500


def _stub_torchvision():
    for name, attrs in {
        "torchvision": {},
        "torchvision.ops": {},
        "torchvision.ops.boxes": {"batched_nms": None, "box_area": None},
        "torchvision.transforms": {},
        "torchvision.transforms.functional": {"resize": None,
                                              "to_pil_image": None},
    }.items():
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = []
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mod.__version__ = "0.0.0"
        for a, v in attrs.items():
            setattr(mod, a, v)
        sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_model():
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from transformers.models.auto import configuration_auto
    orig = configuration_auto.AutoConfig.register
    configuration_auto.AutoConfig.register = staticmethod(
        lambda mt, c, exist_ok=False: orig(mt, c, exist_ok=True))
    import transformers.models.bloom.modeling_bloom as bloom
    import transformers.models.opt.modeling_opt as opt
    for mod in (bloom, opt):
        for symn in ("_expand_mask", "_make_causal_mask"):
            if not hasattr(mod, symn):
                setattr(mod, symn, lambda *a, **k: None)
    from transformers import CLIPVisionConfig
    orig_cfg_fp = CLIPVisionConfig.from_pretrained
    CLIPVisionConfig.from_pretrained = classmethod(
        lambda cls, *a, **k: cls())
    try:
        import model.walkgpt as ref_wg
        from model.llava_walkgpt.model.language_model.llava_llama import (
            LlavaConfig)
        from model.segment_anything.modeling import Sam
        from model.segment_anything.modeling.image_encoder import (
            ImageEncoderViT)
        from model.segment_anything.modeling.mask_decoder import MaskDecoder
        from model.segment_anything.modeling.prompt_encoder import (
            PromptEncoder)
        from model.segment_anything.modeling.transformer import (
            TwoWayTransformer)
    finally:
        configuration_auto.AutoConfig.register = orig

    def tiny_sam(ckpt=None):
        enc = ImageEncoderViT(
            img_size=64, patch_size=16, embed_dim=32, depth=2, num_heads=2,
            out_chans=256, qkv_bias=True, use_rel_pos=True, window_size=2,
            global_attn_indexes=(1,),
            norm_layer=lambda c: torch.nn.LayerNorm(c, eps=1e-6))
        pe = PromptEncoder(embed_dim=256, image_embedding_size=(4, 4),
                           input_image_size=(64, 64), mask_in_chans=16)
        md = MaskDecoder(
            transformer_dim=256,
            transformer=TwoWayTransformer(depth=2, embedding_dim=256,
                                          num_heads=8, mlp_dim=2048),
            num_multimask_outputs=3)
        return Sam(image_encoder=enc, prompt_encoder=pe, mask_decoder=md,
                   pixel_mean=[0, 0, 0], pixel_std=[1, 1, 1])

    ref_wg.build_sam_vit_h = tiny_sam

    hf_cfg = LlavaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        attn_implementation="eager", pad_token_id=None)
    hf_cfg.mm_vision_select_layer = -2
    hf_cfg.mm_hidden_size = 64
    tm = ref_wg.walkgptForCausalLM(hf_cfg, seg_token_idx=SID, out_dim=256,
                                   vision_pretrained=None)
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(p.shape, generator=gen,
                                dtype=torch.float32) * 0.18)
        # bias lm_head toward [SEG] so random-weight decode emits segs and
        # the mask branch actually exercises
        tm.lm_head.weight[SID] += 0.5
    tm.generation_config.use_cache = False
    tm.config.use_cache = False
    tm = tm.eval()
    CLIPVisionConfig.from_pretrained = orig_cfg_fp
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    yield tm
    torch.Tensor.cuda = orig_cuda


def test_full_generate_loop_parity(ref_model):
    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import (LLMConfig, PromptEncoderConfig,
                                         SAMEncoderConfig, WalkGPTConfig)
    from walkgpt_tpu.models import walkgpt as wg
    from walkgpt_tpu.runtime import checkpoint as ck

    tm = ref_model
    rng = np.random.RandomState(0)
    images_t = torch.from_numpy(rng.randn(1, 3, 64, 64).astype(np.float32))
    ids = np.array([[1, 7, 8, -200, 9, 10, 11]], np.int64)

    # --- reference side: _prepare_sam_tokens equivalent + evaluate() ---
    with torch.no_grad():
        feats = tm.get_visual_embs(images_t)
        sam_tokens = tm.get_model().out_mm_projector(
            feats.flatten(2).transpose(1, 2))
        all_ids, pred_masks, seg_counts, _scores = tm.evaluate(
            sam_tokens, images_t, torch.from_numpy(ids),
            resize_list=[(48, 64)], clip_resize_list=None,
            original_size_list=[(96, 128)], max_new_tokens=8)
    ref_gen = all_ids[0].numpy()[0][ids.shape[1]:]
    ref_masks = pred_masks[0].numpy() > 0

    # --- our side: convert the reference's full state dict and run the one
    # compiled generate+mask graph ---
    cfg = WalkGPTConfig(
        llm=LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      max_position_embeddings=512),
        sam=SAMEncoderConfig(img_size=64, patch_size=16, embed_dim=32,
                             depth=2, num_heads=2, out_chans=256,
                             window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoderConfig(embed_dim=256,
                                           image_embedding_size=(4, 4),
                                           input_image_size=(64, 64),
                                           mask_in_chans=16),
        clip=None, seg_token_id=SID, use_flash_attention=False)
    sd = {k: np.asarray(v.detach().float().numpy())
          for k, v in tm.state_dict().items()}
    params = ck.convert_walkgpt_state(sd, cfg)

    ev = jax.jit(lambda p, im, ii, am, ri, phw: wg.generate_and_segment(
        p, cfg, images=im, input_ids=ii, attention_mask=am,
        row_image_idx=ri, pixel_hw=phw, max_new_tokens=8, max_segs=8,
        eos_id=2))(
        params, jnp.asarray(images_t.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ids.astype(np.int32)), jnp.ones(ids.shape, bool),
        jnp.zeros((1,), jnp.int32), jnp.asarray([[48, 64]], jnp.int32))

    # 1. token identity (greedy, through each side's own decode loop)
    got_gen = np.asarray(ev.tokens)[0][: int(ev.lengths[0])]
    np.testing.assert_array_equal(got_gen, ref_gen)
    assert SID in got_gen, "test is vacuous without [SEG] emissions"

    # 2. [SEG] extraction bookkeeping agrees
    m = int(ev.seg_valid.sum())
    assert m == int(seg_counts[0][0]) and m > 0

    # 3. masks at ORIGINAL size through each side's own postprocess:
    #    gIoU drift <= 1e-3, and non-vacuously (foreground present)
    ours = np.asarray(wg.finalize_masks(ev.pred_masks[:m], (48, 64),
                                        (96, 128))) > 0
    assert ref_masks.shape == ours.shape
    assert ref_masks.sum() > 0, "vacuous: reference masks empty"
    for i in range(m):
        union = (ours[i] | ref_masks[i]).sum()
        iou = 1.0 if union == 0 else (ours[i] & ref_masks[i]).sum() / union
        assert 1.0 - iou <= 1e-3, (i, iou)


def test_full_generate_loop_parity_batched_rows(ref_model):
    """Our BATCHED right-padded decode vs the reference's row-by-row loop
    (evaluate() trims each row at the first 0-pad, model/walkgpt.py:620-626)
    on two prompts of different lengths over two images — covers the
    padding/position bookkeeping a single-row test cannot."""
    import jax
    import jax.numpy as jnp
    from walkgpt_tpu.core.config import (LLMConfig, PromptEncoderConfig,
                                         SAMEncoderConfig, WalkGPTConfig)
    from walkgpt_tpu.models import walkgpt as wg
    from walkgpt_tpu.runtime import checkpoint as ck

    tm = ref_model
    rng = np.random.RandomState(3)
    images_t = torch.from_numpy(rng.randn(2, 3, 64, 64).astype(np.float32))
    # row 0 length 7, row 1 length 5; 0-padded to 7 (the reference's pad)
    ids = np.zeros((2, 7), np.int64)
    ids[0] = [1, 7, 8, -200, 9, 10, 11]
    ids[1, :5] = [1, 12, -200, 13, 14]

    with torch.no_grad():
        feats = tm.get_visual_embs(images_t)
        sam_tokens = tm.get_model().out_mm_projector(
            feats.flatten(2).transpose(1, 2))          # [2, 36, H]
        # reference loop: one generate per row, images_clip row-matched
        ref_rows = []
        for r in range(2):
            out_ids, _, _, _ = tm.evaluate(
                sam_tokens[r:r + 1], images_t[r:r + 1],
                torch.from_numpy(ids[r:r + 1]),
                resize_list=[(48, 64)], clip_resize_list=None,
                original_size_list=[(96, 128)], max_new_tokens=6)
            row = out_ids[0].numpy()[0]
            prompt_len = int((ids[r] != 0).sum())
            ref_rows.append(row[prompt_len:])

    cfg = WalkGPTConfig(
        llm=LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      max_position_embeddings=512),
        sam=SAMEncoderConfig(img_size=64, patch_size=16, embed_dim=32,
                             depth=2, num_heads=2, out_chans=256,
                             window_size=2, global_attn_indexes=(1,)),
        prompt_encoder=PromptEncoderConfig(embed_dim=256,
                                           image_embedding_size=(4, 4),
                                           input_image_size=(64, 64),
                                           mask_in_chans=16),
        clip=None, seg_token_id=SID, use_flash_attention=False)
    sd = {k: np.asarray(v.detach().float().numpy())
          for k, v in tm.state_dict().items()}
    params = ck.convert_walkgpt_state(sd, cfg)

    attn = ids != 0
    ev = jax.jit(lambda p, im, ii, am, ri, phw: wg.generate_and_segment(
        p, cfg, images=im, input_ids=ii, attention_mask=am,
        row_image_idx=ri, pixel_hw=phw, max_new_tokens=6, max_segs=8,
        eos_id=2))(
        params, jnp.asarray(images_t.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ids.astype(np.int32)), jnp.asarray(attn),
        jnp.arange(2, dtype=jnp.int32), jnp.asarray([[48, 64]] * 2,
                                                    jnp.int32))
    for r in range(2):
        got = np.asarray(ev.tokens)[r][: int(ev.lengths[r])]
        np.testing.assert_array_equal(got, ref_rows[r], err_msg=f"row {r}")
