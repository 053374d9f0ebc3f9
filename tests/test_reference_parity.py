"""Cross-implementation parity against the reference's OWN torch modules.

The reference repo sits importable at /root/reference (CPU torch installed).
These tests random-initialize the reference's novel modules — the SAM stack
(ImageEncoderViT, PromptEncoder, MaskDecoder/TwoWayTransformer,
image_encoder.py:17-125, prompt_encoder.py:16-186, mask_decoder.py:16-164),
the WalkGPT task modules (MultiScaleQFormerProjector, CalibratedTextProjector,
TinyCrossAttn, utils/utils_walkgpt.py:220-357) and the loss functions
(utils/utils_walkgpt.py:8-120) — push their state dicts through our
runtime/checkpoint converters, and assert the JAX forwards match to fp32
tolerance. This is the VERDICT round-1 "Next #2" harness: it fails if any
converter or forward drifts from the code we claim byte-compatibility with.
"""
import importlib.machinery
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from walkgpt_tpu.core.config import (CTPConfig, MaskDecoderConfig, MSQPConfig,
                                     PromptEncoderConfig, SAMEncoderConfig)
from walkgpt_tpu.models import projectors, sam_decoder, sam_prompt
from walkgpt_tpu.models import sam_encoder as sam_enc
from walkgpt_tpu.ops import losses
from walkgpt_tpu.runtime import checkpoint as ck

REF = "/root/reference"


def _stub_torchvision():
    """model/segment_anything/__init__ pulls torchvision (absent here); the
    modeling code under test never touches it — stub just the import surface."""
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
def ref():
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from model.segment_anything.modeling.image_encoder import ImageEncoderViT
    from model.segment_anything.modeling.mask_decoder import MaskDecoder
    from model.segment_anything.modeling.prompt_encoder import PromptEncoder
    from model.segment_anything.modeling.transformer import TwoWayTransformer
    import utils.utils_walkgpt as uw
    return types.SimpleNamespace(
        ImageEncoderViT=ImageEncoderViT, MaskDecoder=MaskDecoder,
        PromptEncoder=PromptEncoder, TwoWayTransformer=TwoWayTransformer,
        uw=uw)


def _randomize(module: "torch.nn.Module", seed: int, std: float = 0.05):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=gen, dtype=torch.float32)
                    * std)
    return module.eval()


def _sd(module) -> dict:
    return {k: np.asarray(v.detach().float().numpy())
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# SAM image encoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("img_size,window", [(64, 2), (48, 2)])
def test_sam_encoder_parity(ref, img_size, window):
    """Windowed + global blocks, decomposed rel-pos, neck. The 48px case makes
    grid=3, which window=2 must bottom/right-pad (image_encoder.py:285-293)."""
    cfg = SAMEncoderConfig(img_size=img_size, patch_size=16, embed_dim=32,
                           depth=2, num_heads=2, out_chans=16,
                           window_size=window, global_attn_indexes=(1,))
    tm = ref.ImageEncoderViT(
        img_size=img_size, patch_size=16, embed_dim=32, depth=2, num_heads=2,
        out_chans=16, qkv_bias=True, use_rel_pos=True, window_size=window,
        global_attn_indexes=(1,),
        norm_layer=lambda c: torch.nn.LayerNorm(c, eps=1e-6))
    _randomize(tm, seed=img_size)

    x = np.random.RandomState(0).randn(2, 3, img_size, img_size).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()            # [B, C, g, g]

    params = ck.convert_sam_encoder(ck.SDReader(_sd(tm)), depth=cfg.depth)
    got = np.asarray(sam_enc.apply(params, cfg,
                                   jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SAM prompt encoder
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def prompt_pair(ref):
    cfg = PromptEncoderConfig(embed_dim=32, image_embedding_size=(8, 8),
                              input_image_size=(128, 128), mask_in_chans=16)
    tm = ref.PromptEncoder(embed_dim=32, image_embedding_size=(8, 8),
                           input_image_size=(128, 128), mask_in_chans=16)
    _randomize(tm, seed=7)
    params = ck.convert_sam_prompt_encoder(ck.SDReader(_sd(tm)))
    # pe_gaussian is a buffer, not in parameters(); converter must carry it
    params["pe_gaussian"] = np.asarray(
        tm.pe_layer.positional_encoding_gaussian_matrix.numpy())
    return ref, tm, cfg, params


def test_prompt_encoder_dense_pe(prompt_pair):
    ref, tm, cfg, params = prompt_pair
    with torch.no_grad():
        want = tm.get_dense_pe().numpy()                   # [1, C, H, W]
    got = np.asarray(sam_prompt.get_dense_pe(params, cfg))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_prompt_encoder_text_embeds(prompt_pair):
    ref, tm, cfg, params = prompt_pair
    text = np.random.RandomState(1).randn(3, 1, 32).astype(np.float32)
    with torch.no_grad():
        sp, de = tm(points=None, boxes=None, masks=None,
                    text_embeds=torch.from_numpy(text))
    got_sp, got_de = sam_prompt.apply(params, cfg, text_embeds=jnp.asarray(text))
    np.testing.assert_allclose(np.asarray(got_sp), sp.detach().numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_de).transpose(0, 3, 1, 2),
                               de.detach().numpy(), rtol=1e-5, atol=1e-5)


def test_prompt_encoder_points_boxes_masks(prompt_pair):
    ref, tm, cfg, params = prompt_pair
    rng = np.random.RandomState(2)
    pts = rng.uniform(0, 128, (2, 3, 2)).astype(np.float32)
    lab = rng.randint(0, 2, (2, 3)).astype(np.int64)
    boxes = np.sort(rng.uniform(0, 128, (2, 2, 2)).astype(np.float32), axis=1
                    ).reshape(2, 4)
    masks = rng.randn(2, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        sp, de = tm(points=(torch.from_numpy(pts), torch.from_numpy(lab)),
                    boxes=torch.from_numpy(boxes),
                    masks=torch.from_numpy(masks), text_embeds=None)
    got_sp, got_de = sam_prompt.apply(
        params, cfg, points=(jnp.asarray(pts), jnp.asarray(lab)),
        boxes=jnp.asarray(boxes),
        masks=jnp.asarray(masks.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_sp), sp.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_de).transpose(0, 3, 1, 2),
                               de.detach().numpy(), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# SAM mask decoder + TwoWayTransformer (real dims: d=256, depth 2, mlp 2048)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("multimask", [False, True])
def test_mask_decoder_parity(ref, multimask):
    cfg = MaskDecoderConfig()
    tm = ref.MaskDecoder(
        transformer_dim=256,
        transformer=ref.TwoWayTransformer(depth=2, embedding_dim=256,
                                          num_heads=8, mlp_dim=2048),
        num_multimask_outputs=3)
    _randomize(tm, seed=11)
    params = ck.convert_sam_mask_decoder(ck.SDReader(_sd(tm)))

    rng = np.random.RandomState(3)
    img = rng.randn(1, 256, 8, 8).astype(np.float32)
    pe = rng.randn(1, 256, 8, 8).astype(np.float32)
    sparse = rng.randn(2, 1, 256).astype(np.float32)
    dense = rng.randn(2, 256, 8, 8).astype(np.float32)
    with torch.no_grad():
        want_m, want_iou = tm(
            image_embeddings=torch.from_numpy(img),
            image_pe=torch.from_numpy(pe),
            sparse_prompt_embeddings=torch.from_numpy(sparse),
            dense_prompt_embeddings=torch.from_numpy(dense),
            multimask_output=multimask)
    got_m, got_iou = sam_decoder.apply(
        params, cfg,
        image_embeddings=jnp.asarray(img.transpose(0, 2, 3, 1)),
        image_pe=jnp.asarray(pe.transpose(0, 2, 3, 1)),
        sparse_prompt=jnp.asarray(sparse),
        dense_prompt=jnp.asarray(dense.transpose(0, 2, 3, 1)),
        multimask_output=multimask)
    np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou.numpy(),
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# MSQP — at the module's REAL fixed dims (d_proj=1024, 2 layers, 8 heads)
# ---------------------------------------------------------------------------

def test_msqp_parity(ref):
    cfg = MSQPConfig()                      # sam_dim 256, d_proj 1024, 6x6 pad
    tm = ref.uw.MultiScaleQFormerProjector(sam_dim=256, llama_dim=96,
                                           target_square_side=6)
    _randomize(tm, seed=13)
    params = ck.convert_msqp(_sd(tm))

    x = np.random.RandomState(4).randn(2, 64, 256).astype(np.float32)  # 8x8 grid
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()            # [2, 36, 96]
    got = np.asarray(projectors.msqp_apply(params, cfg, jnp.asarray(x)))
    assert got.shape == want.shape == (2, 36, 96)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# CTP
# ---------------------------------------------------------------------------

def test_ctp_parity(ref):
    tm = ref.uw.CalibratedTextProjector(in_dim=64, out_dim=256)
    _randomize(tm, seed=17)
    params = ck.convert_ctp(ck.SDReader(_sd(tm)))
    # 3-D input like the real call site (model/walkgpt.py:405-408 applies the
    # CTP to [B, T, H] hidden states; text_type is a (1,1,256) broadcast)
    x = np.random.RandomState(5).randn(2, 7, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(projectors.ctp_apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# TinyCrossAttn + InfoNCE
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_pair(ref):
    tm = ref.uw.TinyCrossAttn(d=256)
    _randomize(tm, seed=19)
    return tm, ck.convert_tiny_xattn(ck.SDReader(_sd(tm)))


def test_tiny_xattn_parity(ref, tiny_pair):
    tm, params = tiny_pair
    rng = np.random.RandomState(6)
    q = rng.randn(5, 256).astype(np.float32)
    kv = rng.randn(5, 16, 256).astype(np.float32)
    with torch.no_grad():
        want_v, want_a = tm(torch.from_numpy(q), torch.from_numpy(kv))
    got_v, got_a = projectors.tiny_xattn_apply(params, jnp.asarray(q),
                                               jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("top_k,exclude", [(8, True), (None, True), (8, False)])
def test_infonce_parity(ref, tiny_pair, top_k, exclude):
    tm, params = tiny_pair
    rng = np.random.RandomState(8)
    pred = rng.randn(5, 256).astype(np.float32)
    sam_tokens = rng.randn(3, 16, 256).astype(np.float32)
    row_ids = np.array([0, 0, 1, 2, 2])
    with torch.no_grad():
        want = ref.uw.infonce_loss(
            torch.from_numpy(pred), torch.from_numpy(sam_tokens),
            torch.from_numpy(row_ids), tm, top_k=top_k,
            exclude_same_row=exclude).item()
    got = float(losses.infonce_loss(
        jnp.asarray(pred), jnp.asarray(sam_tokens), jnp.asarray(row_ids),
        params, top_k=top_k, exclude_same_row=exclude))
    assert abs(got - want) < 2e-5, (got, want)


# ---------------------------------------------------------------------------
# LLaVA splice + label-smoothed CE chain vs the reference's own
# LlavaLlamaForCausalLM (llava_arch.py prepare_inputs_labels_for_multimodal +
# llava_llama.py:111-125). Note the reference's full model_forward mask path
# is NOT runnable as committed (WART-1: LLM-space 6x6 maps cannot broadcast
# against [B,256,64,64] dense prompts inside MaskDecoder.predict_masks,
# mask_decoder.py:137-138) — the CE/splice chain below plus the module-level
# tests above cover every component that actually executes.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_llava():
    _stub_torchvision()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    transformers = pytest.importorskip("transformers")
    # installed transformers is newer than the reference's 4.31 pin; patch the
    # two incompatibilities its import path trips over
    from transformers.models.auto import configuration_auto
    orig = configuration_auto.AutoConfig.register

    def register(model_type, config, exist_ok=False):
        return orig(model_type, config, exist_ok=True)

    configuration_auto.AutoConfig.register = staticmethod(register)
    import transformers.models.bloom.modeling_bloom as bloom
    import transformers.models.opt.modeling_opt as opt
    for mod in (bloom, opt):
        for sym in ("_expand_mask", "_make_causal_mask"):
            if not hasattr(mod, sym):
                setattr(mod, sym, lambda *a, **k: None)
    try:
        from model.llava_walkgpt.model.language_model.llava_llama import (
            LlavaConfig, LlavaLlamaForCausalLM)
    finally:
        configuration_auto.AutoConfig.register = orig
    return LlavaConfig, LlavaLlamaForCausalLM


def test_llava_splice_ce_parity(ref_llava):
    """Tokens-passthrough mode (encode_images case 2, llava_arch.py:141-154):
    [R,36,H] visual tokens -> bilinear 16x16=256 -> spliced at the -200
    sentinel -> LLaMA -> label-smoothed CE. Logits and loss must match our
    visual-grid resize + splice_visual + llm.forward + CE chain."""
    from walkgpt_tpu.core.config import (CLIPVisionConfig, LLMConfig,
                                         WalkGPTConfig)
    from walkgpt_tpu.models import llm, walkgpt
    from walkgpt_tpu.ops.losses import cross_entropy_with_smoothing
    from walkgpt_tpu.ops.resize import bilinear_resize

    LlavaConfig, LlavaLlamaForCausalLM = ref_llava
    hf_cfg = LlavaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        attn_implementation="eager")
    hf_cfg.separate_mm_projector = False        # read unconditionally
    torch.manual_seed(0)
    tm = LlavaLlamaForCausalLM(hf_cfg).eval()
    # non-None tower gates the splice path; never called for 3-D token input
    tm.model.vision_tower = object()

    rng = np.random.RandomState(21)
    r, t = 2, 9
    ids = rng.randint(3, 128, (r, t))
    ids[0, 1] = -200
    ids[1, 3] = -200
    labels = ids.copy()
    labels[:, :4] = -100
    labels[ids == -200] = -100
    attn = np.ones((r, t), np.int64)
    vis36 = rng.randn(r, 36, 64).astype(np.float32)

    with torch.no_grad():
        out = tm(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(attn),
                 labels=torch.from_numpy(labels),
                 images=torch.from_numpy(vis36))
    want_logits = out.logits.float().numpy()
    want_loss = float(out.loss)

    cfg = WalkGPTConfig(
        llm=LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      max_position_embeddings=512),
        clip=None, use_flash_attention=False)
    params = {"llm": ck.convert_llama(_sd(tm), num_layers=2)}

    grid = jnp.asarray(vis36).reshape(r, 6, 6, 64)
    vis256 = bilinear_resize(grid, (16, 16)).reshape(r, 256, 64)
    sp = walkgpt.splice_visual(params, cfg, jnp.asarray(ids), vis256,
                               attention_mask=jnp.asarray(attn, bool),
                               labels=jnp.asarray(labels))
    hidden, _ = llm.forward(params["llm"], cfg.llm, sp.embeds,
                            attention_mask=sp.attention_mask)
    got_logits = np.asarray(llm.lm_logits(params["llm"], cfg.llm, hidden))
    np.testing.assert_allclose(got_logits, want_logits, rtol=3e-4, atol=3e-4)

    shift_logits = got_logits[:, :-1].reshape(-1, 128)
    shift_labels = np.asarray(sp.labels)[:, 1:].reshape(-1)
    got_loss = float(cross_entropy_with_smoothing(
        jnp.asarray(shift_logits), jnp.asarray(shift_labels),
        label_smoothing=0.1))
    assert abs(got_loss - want_loss) < 2e-5, (got_loss, want_loss)


# ---------------------------------------------------------------------------
# mask losses vs the reference's own functions
# ---------------------------------------------------------------------------

def test_mask_losses_parity(ref):
    rng = np.random.RandomState(9)
    logits = rng.randn(4, 24, 24).astype(np.float32) * 3
    targets = (rng.rand(4, 24, 24) > 0.6).astype(np.float32)
    tl, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    for num_masks in (4.0, 7.0):
        want_d = ref.uw.dice_loss(tl, tt, num_masks).item()
        want_b = ref.uw.sigmoid_ce_loss(tl, tt, num_masks).item()
        got_d = float(losses.dice_loss(jnp.asarray(logits),
                                       jnp.asarray(targets), num_masks))
        got_b = float(losses.sigmoid_ce_loss(jnp.asarray(logits),
                                             jnp.asarray(targets), num_masks))
        assert abs(got_d - want_d) < 1e-5, (got_d, want_d)
        assert abs(got_b - want_b) < 1e-5, (got_b, want_b)
