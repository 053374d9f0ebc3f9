import numpy as np
import pytest

from walkgpt_tpu.data.tokenizer import (ByteTokenizer, setup_walkgpt_tokens,
                                        tokenizer_image_token)
from walkgpt_tpu.data.conversation import IMAGE_TOKEN_INDEX


def make_tok():
    tok = ByteTokenizer(model_max_length=2048)
    st = setup_walkgpt_tokens(tok)
    return tok, st


def test_special_token_order():
    tok, st = make_tok()
    base = 3 + 256
    # exact registration order: [SEG], [p], [/p], [distance], [/distance],
    # [assessment], [/assessment], <im_start>, <im_end>
    assert st.seg_token_idx == base
    assert st.extra_ids["[p]"] == base + 1
    assert st.extra_ids["[/p]"] == base + 2
    assert st.extra_ids["[distance]"] == base + 3
    assert st.extra_ids["[/distance]"] == base + 4
    assert st.extra_ids["[assessment]"] == base + 5
    assert st.extra_ids["[/assessment]"] == base + 6
    assert st.im_start_id == base + 7
    assert st.im_end_id == base + 8


def test_roundtrip():
    tok, _ = make_tok()
    s = "Accessible: [p] sidewalk [/p][SEG] done."
    ids = tok.encode(s)
    assert ids[0] == tok.bos_token_id
    assert tok.decode(ids[1:]) == s


def test_eos_literal_is_single_token():
    tok, _ = make_tok()
    ids = tok.encode("a</s>", add_special_tokens=False)
    assert ids == [3 + ord("a"), tok.eos_token_id]


def test_multiseg_tokens():
    tok = ByteTokenizer()
    st = setup_walkgpt_tokens(tok, seg_token_num=3)
    assert isinstance(st.seg_token_idx, list) and len(st.seg_token_idx) == 3


def test_image_token_splice():
    tok, _ = make_tok()
    ids = tokenizer_image_token("<im_start><image><im_end>\nhi", tok)
    assert ids[0] == tok.bos_token_id
    assert IMAGE_TOKEN_INDEX in ids
    i = ids.index(IMAGE_TOKEN_INDEX)
    # <im_start> before, <im_end> after
    im_start = tok.convert_tokens_to_ids("<im_start>")
    im_end = tok.convert_tokens_to_ids("<im_end>")
    assert ids[i - 1] == im_start and ids[i + 1] == im_end
    # exactly one sentinel
    assert ids.count(IMAGE_TOKEN_INDEX) == 1


def test_image_token_splice_no_image():
    tok, _ = make_tok()
    ids = tokenizer_image_token("plain text", tok)
    assert IMAGE_TOKEN_INDEX not in ids
    assert ids == tok.encode("plain text")


def test_image_token_splice_np():
    tok, _ = make_tok()
    arr = tokenizer_image_token("a<image>b", tok, return_np=True)
    assert isinstance(arr, np.ndarray) and arr.dtype == np.int64


def test_bpe_tokenizer_protocol(tmp_path):
    """Self-trained BPE serves the same protocol as the byte tokenizer."""
    pytest.importorskip("tokenizers")
    from walkgpt_tpu.data.bpe_tokenizer import BPETokenizer, train_bpe
    corpus = ["the sidewalk is clear", "stairs ahead", "curb on the left",
              "USER: ASSISTANT:"] * 50
    tok = BPETokenizer(train_bpe(corpus, vocab_size=500))
    st = setup_walkgpt_tokens(tok)
    assert tok.convert_tokens_to_ids("[SEG]") == st.seg_token_idx
    ids = tok.encode("the sidewalk [SEG]")
    assert ids[0] == tok.bos_token_id
    assert st.seg_token_idx in ids
    assert tok.decode(ids[1:]) == "the sidewalk [SEG]"
    spliced = tokenizer_image_token("<im_start><image><im_end>\nhi", tok)
    assert IMAGE_TOKEN_INDEX in spliced


def test_hf_adapter_via_local_tokenizer_json(tmp_path):
    """build_tokenizer loads a local tokenizer.json through transformers and
    the adapter serves the full special-token protocol."""
    pytest.importorskip("transformers")
    pytest.importorskip("tokenizers")
    import json
    from walkgpt_tpu.data.bpe_tokenizer import train_bpe
    train_bpe(["sidewalk curb stairs"] * 30, vocab_size=400,
              save_path=str(tmp_path / "tokenizer.json"))
    json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
               "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
               "model_max_length": 512},
              open(tmp_path / "tokenizer_config.json", "w"))
    from walkgpt_tpu.data.tokenizer import (HFTokenizerAdapter, build_tokenizer)
    tok = build_tokenizer(str(tmp_path), model_max_length=512)
    assert isinstance(tok, HFTokenizerAdapter)
    st = setup_walkgpt_tokens(tok)
    ids = tok.encode("curb [SEG]")
    assert st.seg_token_idx in ids
    assert "[SEG]" in tok.decode(ids)


def test_build_tokenizer_fallback():
    from walkgpt_tpu.data.tokenizer import ByteTokenizer, build_tokenizer
    tok = build_tokenizer("/nonexistent/path", model_max_length=128)
    assert isinstance(tok, ByteTokenizer)
    assert tok.model_max_length == 128


def test_pave_bpe_asset_loads():
    """The tracked PAVE BPE asset (walkgpt_tpu/data/assets) loads without a
    corpus rebuild and serves the full special-token protocol — this is the
    tokenizer bench.py uses on fresh clones."""
    pytest.importorskip("tokenizers")
    import os
    import walkgpt_tpu
    asset = os.path.join(os.path.dirname(walkgpt_tpu.__file__), "data",
                         "assets", "pave_bpe_tokenizer.json")
    assert os.path.exists(asset), asset
    from walkgpt_tpu.data.bpe_tokenizer import BPETokenizer
    tok = BPETokenizer.load(asset, model_max_length=4096)
    st = setup_walkgpt_tokens(tok)
    assert tok.convert_tokens_to_ids("[SEG]") == st.seg_token_idx
    ids = tok.encode("the sidewalk is [p] accessible [/p][SEG]")
    assert st.seg_token_idx in ids
    spliced = tokenizer_image_token("<im_start><image><im_end>\nq", tok)
    assert IMAGE_TOKEN_INDEX in spliced
