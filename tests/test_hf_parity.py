"""Cross-framework parity: our LLM + converter vs HuggingFace torch models.

This is the SURVEY §7 'token-identical greedy decode' harness run at test
scale: a random-init HF LlamaForCausalLM's weights flow through
runtime/checkpoint.convert_llama into our decoder; fp32 logits must match and
greedy decodes must be token-identical. Same for the CLIP vision tower."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from walkgpt_tpu.core.config import CLIPVisionConfig, LLMConfig
from walkgpt_tpu.models import clip_vit, llm
from walkgpt_tpu.runtime import checkpoint as ck
from walkgpt_tpu.runtime.generate import greedy_generate


@pytest.fixture(scope="module")
def hf_llama():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        attn_implementation="eager")
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = LLMConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=4,
                    max_position_embeddings=256)
    sd = {k: np.asarray(v.detach().float().numpy())
          for k, v in model.state_dict().items()}
    params = ck.convert_llama(sd, num_layers=2)
    return model, cfg, params


def test_logits_parity(hf_llama):
    model, cfg, params = hf_llama
    rng = np.random.RandomState(0)
    ids = rng.randint(3, 128, (2, 11))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.float().numpy()
    hidden, _ = llm.forward(params, cfg, llm.embed(params, jnp.asarray(ids)))
    got = np.asarray(llm.lm_logits(params, cfg, hidden))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_greedy_decode_token_identical(hf_llama):
    model, cfg, params = hf_llama
    rng = np.random.RandomState(1)
    for trial in range(3):
        prompt = rng.randint(3, 128, (1, 5 + trial))
        with torch.no_grad():
            ref = model.generate(torch.from_numpy(prompt), max_new_tokens=12,
                                 do_sample=False, num_beams=1,
                                 eos_token_id=2, pad_token_id=0)
        ref_new = ref[0, prompt.shape[1]:].numpy().tolist()
        res = greedy_generate(params, cfg, llm.embed(params, jnp.asarray(prompt)),
                              jnp.ones(prompt.shape, bool), max_new_tokens=12,
                              eos_id=2, pad_id=0)
        got = np.asarray(res.tokens)[0][:int(res.lengths[0])].tolist()
        # HF stops at eos; compare the overlapping prefix
        n = min(len(got), len(ref_new))
        assert got[:n] == list(ref_new[:n]), (trial, got, ref_new)


def test_gqa_logits_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager")
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    cfg = LLMConfig(vocab_size=96, hidden_size=64, intermediate_size=96,
                    num_layers=2, num_heads=8, num_kv_heads=2,
                    max_position_embeddings=128)
    sd = {k: np.asarray(v.detach().float().numpy())
          for k, v in model.state_dict().items()}
    params = ck.convert_llama(sd, num_layers=2)
    ids = np.random.RandomState(2).randint(3, 96, (1, 9))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.float().numpy()
    hidden, _ = llm.forward(params, cfg, llm.embed(params, jnp.asarray(ids)))
    got = np.asarray(llm.lm_logits(params, cfg, hidden))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_clip_vision_parity():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        attn_implementation="eager")
    torch.manual_seed(2)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(image_size=28, native_image_size=28, patch_size=14,
                           hidden_size=32, num_layers=2, num_heads=2,
                           mlp_dim=64, select_layer=-2, aux_layer=-1)
    sd = {k: np.asarray(v.detach().float().numpy())
          for k, v in model.state_dict().items()}
    params = ck.convert_clip_vision(sd, num_layers=2, src_grid=2, dst_grid=2)
    x = np.random.RandomState(3).randn(2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x).permute(0, 3, 1, 2),
                    output_hidden_states=True)
    hs = clip_vit.apply(params, cfg, jnp.asarray(x))
    # compare every hidden state (embeddings + 2 layers)
    for ours, theirs in zip(hs, ref.hidden_states):
        np.testing.assert_allclose(np.asarray(ours), theirs.float().numpy(),
                                   rtol=5e-4, atol=5e-4)
