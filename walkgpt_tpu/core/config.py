"""Configuration dataclasses for the WalkGPT-TPU stack.

Unlike the reference (argparse flags silently overridden inside the model
constructor — /root/reference/model/walkgpt.py:174-181, SURVEY WART-3), all
effective configuration lives here, explicitly. The reference's hardcoded
choices (448px CLIP resize, separate MSQP projector, 1 feature scale, padded
CLIP images) are the *defaults* of these dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


# ---------------------------------------------------------------------------
# vision towers
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SAMEncoderConfig:
    """SAM ViT image encoder (reference: model/segment_anything/modeling/image_encoder.py:17-125)."""
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280          # ViT-H
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    use_rel_pos: bool = True

    @property
    def grid(self) -> int:
        return self.img_size // self.patch_size  # 64 for 1024/16


SAM_VIT_H = SAMEncoderConfig()
SAM_VIT_L = SAMEncoderConfig(embed_dim=1024, depth=24, num_heads=16,
                             global_attn_indexes=(5, 11, 17, 23))
SAM_VIT_B = SAMEncoderConfig(embed_dim=768, depth=12, num_heads=12,
                             global_attn_indexes=(2, 5, 8, 11))
# Small config for tests / CI.
SAM_VIT_TINY = SAMEncoderConfig(img_size=64, patch_size=16, embed_dim=32, depth=2,
                                num_heads=2, out_chans=32, window_size=2,
                                global_attn_indexes=(1,))


@dataclasses.dataclass(frozen=True)
class PromptEncoderConfig:
    """(reference: prompt_encoder.py:16-186; text_embeds path at :176-177)"""
    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16


@dataclasses.dataclass(frozen=True)
class MaskDecoderConfig:
    """(reference: mask_decoder.py:16-164 + transformer.py TwoWayTransformer)"""
    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @property
    def num_mask_tokens(self) -> int:
        return self.num_multimask_outputs + 1


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP ViT-L/14 vision tower, position embeddings bilinearly resized to
    image_size=448 (reference: multimodal_encoder/clip_encoder.py:38-55)."""
    image_size: int = 448
    native_image_size: int = 224   # pretrain size the pos-emb was trained at
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_dim: int = 4096
    select_layer: int = -2         # hidden_states[select_layer][:, 1:]
    aux_layer: int = -11
    ln_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size  # 32 for 448/14


CLIP_VIT_L_448 = CLIPVisionConfig()
CLIP_VIT_TINY = CLIPVisionConfig(image_size=28, native_image_size=28, patch_size=14,
                                 hidden_size=32, num_layers=2, num_heads=2, mlp_dim=64,
                                 select_layer=-2, aux_layer=-1)


# ---------------------------------------------------------------------------
# LLM decoder — one implementation covering the reference's three backbones
# (LLaMA: RoPE+RMSNorm+SiLU; MPT: ALiBi+LN+GELU, no biases on qkv;
#  StableLM-Epoch: partial RoPE + LN + SiLU + GQA)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32                 # < num_heads => GQA (StableLM repeat_kv)
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    rope_pct: float = 1.0                  # StableLM rotates only a fraction of head_dim
    pos_emb: str = "rope"                  # "rope" | "alibi" (MPT)
    norm: str = "rmsnorm"                  # "rmsnorm" | "layernorm"
    norm_eps: float = 1e-6
    act: str = "silu"                      # "silu" | "gelu"
    qkv_bias: bool = False
    mlp_bias: bool = False
    tie_embeddings: bool = False
    family: str = "llama"                  # "llama" | "mpt" | "stablelm"
    # flat [B, L, Hkv*D] KV cache + fused Pallas decode attention (rope
    # models only). Off by default: on v5e the per-pallas-call launch
    # overhead (x num_layers per step) outweighs the full-bandwidth cache
    # reads — see ops/flash_attention.py decode-attention notes.
    fused_decode: bool = False
    # explicit head_dim override. None = hidden_size // num_heads. Set by
    # parallel/tp.tp_llm_cfg for manual tensor parallelism, where the LOCAL
    # config halves/quarters num_heads while hidden_size (the replicated
    # residual width) stays global — the derived quotient would be wrong.
    head_dim_value: Optional[int] = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_value is not None:
            return self.head_dim_value
        return self.hidden_size // self.num_heads


LLAMA_7B = LLMConfig()
LLAMA_13B = LLMConfig(hidden_size=5120, intermediate_size=13824,
                      num_layers=40, num_heads=40, num_kv_heads=40)
LLAMA_1B = LLMConfig(hidden_size=2048, intermediate_size=5504,
                     num_layers=16, num_heads=16, num_kv_heads=16)
LLAMA_TINY = LLMConfig(vocab_size=512, hidden_size=64, intermediate_size=128,
                       num_layers=2, num_heads=4, num_kv_heads=4,
                       max_position_embeddings=512)
MPT_7B = LLMConfig(hidden_size=4096, intermediate_size=16384, num_layers=32,
                   num_heads=32, num_kv_heads=32, pos_emb="alibi",
                   norm="layernorm", norm_eps=1e-5, act="gelu",
                   vocab_size=50432, tie_embeddings=True, family="mpt")
STABLELM_3B = LLMConfig(hidden_size=2560, intermediate_size=6912, num_layers=32,
                        num_heads=32, num_kv_heads=32, rope_pct=0.25,
                        norm="layernorm", norm_eps=1e-5, vocab_size=50304,
                        family="stablelm")


# ---------------------------------------------------------------------------
# WalkGPT task modules
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MSQPConfig:
    """Multi-Scale QFormer Projector (reference: utils/utils_walkgpt.py:220-300)."""
    sam_dim: int = 256
    d_proj: int = 1024
    num_heads: int = 8
    num_layers: int = 2
    mlp_ratio: float = 4.0
    queries_x1: int = 12
    queries_x2: int = 8
    queries_x4: int = 8
    queries_global: int = 4
    target_square_side: int = 6            # pads 32 queries -> 36 (6x6) tokens
    gate_hidden: int = 128

    @property
    def num_queries(self) -> int:
        return self.queries_x1 + self.queries_x2 + self.queries_x4 + self.queries_global

    @property
    def num_tokens(self) -> int:
        return self.target_square_side ** 2


@dataclasses.dataclass(frozen=True)
class CTPConfig:
    """Calibrated Text Projector (reference: utils/utils_walkgpt.py:302-327)."""
    out_dim: int = 256
    widen: int = 2


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """Effective loss weighting (reference: train_walkgpt.py:100-103 + the
    hardcoded 0.2 NCE factor at model/walkgpt.py:593 — SURVEY WART-2)."""
    ce: float = 0.1
    dice: float = 0.05
    bce: float = 0.35
    nce: float = 0.2
    label_smoothing: float = 0.1           # reference llava_llama.py:120 (WART-7)
    nce_tau: float = 0.07
    nce_topk: int = 8
    dice_scale: float = 1000.0


@dataclasses.dataclass(frozen=True)
class WalkGPTConfig:
    llm: LLMConfig = LLAMA_7B
    sam: SAMEncoderConfig = SAM_VIT_H
    prompt_encoder: PromptEncoderConfig = PromptEncoderConfig()
    mask_decoder: MaskDecoderConfig = MaskDecoderConfig()
    clip: Optional[CLIPVisionConfig] = CLIP_VIT_L_448
    msqp: MSQPConfig = MSQPConfig()
    ctp: CTPConfig = CTPConfig()
    losses: LossWeights = LossWeights()
    # token bookkeeping (SURVEY §8 invariants)
    visual_tokens: int = 256               # 16x16 grid spliced into the LLM sequence
    visual_grid: int = 16
    seg_token_id: int = -1                 # set after tokenizer build
    image_token_id: int = -200             # sentinel in raw input_ids
    ignore_index: int = -100
    seg_token_num: int = 1
    image_feature_scale_num: int = 1
    max_seq_len: int = 2048
    use_flash_attention: bool = True
    # Applies to the NON-flash einsum fallback only: bf16 bias/logits traffic
    # in SAM windowed attention (fp32 softmax stats). With flash attention on
    # (default) the packed Pallas window kernel is always used — its matmuls
    # run in the activation dtype with fp32 accumulation/softmax, which is
    # bit-exact in fp32 runs (the parity suite) and standard bf16-mixed
    # numerics in production.
    fast_windowed_attention: bool = False
    # tanh-approximate GELU in the SAM encoder MLPs (~3e-3 bf16 drift; the
    # erf chain costs ~5 ms/block at batch 16 on v5e). Same opt-in policy.
    fast_gelu: bool = False
    # quantized KV cache (per-row scales): False = full precision,
    # "int8"/True = halve decode-time cache HBM reads (convert fuses into
    # the attention dot), "int4" = KIVI-class heads-layout format option
    # (on current XLA/v5e the int4 convert is NOT fused and costs more than
    # it saves — see models/llm.py init_kv_cache). "int8_flat"/"int4_flat"
    # = flat-layout cache read by the fused Pallas decode-attention kernel
    # with in-VMEM dequant (ops/flash_attention.decode_attention_q):
    # full-rate rows, and int4_flat halves the bytes again (nibble-packed).
    kv_quant_cache: "bool | str" = False
    # SAM encoder sub-batch size for encode (0 = whole batch at once):
    # bounds ViT activation memory at large decode batches.
    sam_encode_chunk: int = 0
    # LLM prefill sub-batch size (0 = whole batch): bounds prefill
    # activation memory, letting decode run batches whose full-batch
    # prefill would blow HBM (runtime/generate._prefill).
    prefill_chunk: int = 0
    # [SEG] mask-decode tail chunk (0 = all segs at once): generate's tail
    # runs the SAM decoder + 1024^2 canvas upsample over max_segs in
    # lax.map slices of this size, bounding tail temps (which otherwise
    # push big programs past XLA's remat threshold — see
    # models/walkgpt.generate_and_segment).
    mask_decode_chunk: int = 64
    # cap on any single decode lax.scan's trip count (0 = uncapped). v5e
    # cliff measured 2026-08-18 (7B batch16, int8 KV, 912-slot cache):
    # 256-trip scans decode at 12.1 ms/step, a 512-trip scan at 58.7 —
    # past a trip-count threshold XLA's while-loop double-buffering stops
    # aliasing the quantized cache carry and re-copies it per iteration.
    # Segments share one full-length cache; tokens identical.
    decode_scan_segment: int = 256
    # decode in scan segments with a statically growing KV cache (slots):
    # segment k's attention reads a [*, T + (k+1)*step] cache instead of
    # the full T+max_new buffer. MEASURED REGRESSION on v5e (2026-08-18,
    # 1B batch16 512-token budget: 5782 ms/batch segmented vs 3837 ms
    # single-scan; 7B runs collapsed 4-5x under HBM pressure): XLA serves
    # the static prefix slices with per-layer cache-view copies that cost
    # far more than the masked-tail DMA they avoid. Keep 0 (single scan,
    # full-length cache) unless a future toolchain changes the lowering.
    decode_cache_grow: int = 0

    def replace(self, **kw) -> "WalkGPTConfig":
        return dataclasses.replace(self, **kw)


def demo_config(seg_token_id: int = 32000) -> WalkGPTConfig:
    """Mid-size full-pipeline config: every subsystem real, compiles in seconds
    on one chip. Used by __graft_entry__.entry()."""
    sam_demo = SAMEncoderConfig(img_size=256, patch_size=16, embed_dim=256,
                                depth=4, num_heads=8, out_chans=256,
                                window_size=8, global_attn_indexes=(1, 3))
    return WalkGPTConfig(
        llm=LLMConfig(vocab_size=32016, hidden_size=512, intermediate_size=1376,
                      num_layers=4, num_heads=8, num_kv_heads=8,
                      max_position_embeddings=2048),
        sam=sam_demo,
        prompt_encoder=PromptEncoderConfig(image_embedding_size=(16, 16),
                                           input_image_size=(256, 256)),
        mask_decoder=MaskDecoderConfig(),
        clip=CLIP_VIT_TINY,
        msqp=MSQPConfig(d_proj=256),
        ctp=CTPConfig(),
        seg_token_id=seg_token_id,
        max_seq_len=1024,
        use_flash_attention=False,
    )


def flagship_1b_config(seg_token_id: int = 32000) -> WalkGPTConfig:
    """WalkGPT-1B: full SAM ViT-H @1024 + a 1B-class LLaMA decoder — the
    largest single-v5e-chip configuration; bench.py's default subject."""
    return WalkGPTConfig(
        llm=dataclasses.replace(LLAMA_1B, vocab_size=32016),
        sam=SAM_VIT_H,
        seg_token_id=seg_token_id,
    )


def walkgpt_7b_config(seg_token_id: int = 32008) -> WalkGPTConfig:
    """WalkGPT-7B (reference parity scale; needs tp sharding on v5e)."""
    return WalkGPTConfig(llm=dataclasses.replace(LLAMA_7B, vocab_size=32016),
                         seg_token_id=seg_token_id)


def walkgpt_13b_config(seg_token_id: int = 32008) -> WalkGPTConfig:
    """WalkGPT-13B (the reference's released scale; v5e-8 tp=8)."""
    return WalkGPTConfig(llm=dataclasses.replace(LLAMA_13B, vocab_size=32016),
                         seg_token_id=seg_token_id)


def tiny_config(seg_token_id: int = 300) -> WalkGPTConfig:
    """A full-pipeline config small enough for CPU tests (all submodules real)."""
    return WalkGPTConfig(
        llm=LLAMA_TINY,
        sam=SAM_VIT_TINY,
        prompt_encoder=PromptEncoderConfig(embed_dim=32,
                                           image_embedding_size=(4, 4),
                                           input_image_size=(64, 64),
                                           mask_in_chans=4),
        mask_decoder=MaskDecoderConfig(transformer_dim=32, transformer_mlp_dim=64,
                                       transformer_num_heads=2),
        clip=CLIP_VIT_TINY,
        msqp=MSQPConfig(sam_dim=32, d_proj=32, num_heads=2, queries_x1=2, queries_x2=1,
                        queries_x4=0, queries_global=1, target_square_side=2,
                        gate_hidden=8),
        ctp=CTPConfig(out_dim=32),
        visual_tokens=16, visual_grid=4,
        seg_token_id=seg_token_id,
        max_seq_len=256,
        use_flash_attention=False,
    )
