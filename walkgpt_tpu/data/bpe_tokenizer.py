"""Self-trained byte-level BPE tokenizer.

No pretrained vocab ships in this environment (no sentencepiece, zero egress),
so the framework can train its own byte-level BPE over PAVE manifests with the
`tokenizers` library and serve it through the same protocol as
data/tokenizer.py. LLaMA-style id conventions: <unk>=0, <s>=1, </s>=2; BOS
prepended on encode; added special tokens appended at the vocab tail in
registration order (so setup_walkgpt_tokens invariants hold).

This is a *stand-in* vocabulary for benchmarking and self-contained runs —
loading the real LLaMA tokenizer files (when available) via
data/tokenizer.build_tokenizer remains the token-identical production path.
"""
from __future__ import annotations

import json
import os
from typing import Iterable, List, Optional, Sequence


def train_bpe(corpus: Iterable[str], *, vocab_size: int = 8192,
              save_path: Optional[str] = None):
    """Train a byte-level BPE and return a tokenizers.Tokenizer."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(corpus, trainer=trainer)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        tok.save(save_path)
    return tok


def pave_corpus(jsonl_path: str, labelmap_path: str) -> Iterable[str]:
    """Training text: PAVE questions + composed answers + the system prompt."""
    from .conversation import conv_templates
    from .pave import LabelMap, compose_answer_text, normalize_questions, read_jsonl
    lm = LabelMap.load(labelmap_path)
    yield conv_templates["llava_v1"].system
    yield "USER: ASSISTANT: <im_start><im_end>"
    for ex in read_jsonl(jsonl_path):
        for q in normalize_questions(ex):
            yield q
        yield compose_answer_text(ex, lm)


class BPETokenizer:
    """data/tokenizer.Tokenizer-protocol wrapper over a tokenizers.Tokenizer."""

    def __init__(self, tok, model_max_length: int = 2048):
        self.tok = tok
        self.model_max_length = model_max_length
        self.unk_token_id = tok.token_to_id("<unk>")
        self.bos_token_id = tok.token_to_id("<s>")
        self.eos_token_id = tok.token_to_id("</s>")
        self.pad_token_id = self.unk_token_id
        self._special_ids = {self.unk_token_id, self.bos_token_id,
                             self.eos_token_id}

    @classmethod
    def load(cls, path: str, model_max_length: int = 2048) -> "BPETokenizer":
        from tokenizers import Tokenizer
        return cls(Tokenizer.from_file(path), model_max_length)

    def __len__(self) -> int:
        return self.tok.get_vocab_size(with_added_tokens=True)

    def add_tokens(self, tokens, special_tokens: bool = False) -> int:
        from tokenizers import AddedToken
        if isinstance(tokens, str):
            tokens = [tokens]
        added = self.tok.add_tokens(
            [AddedToken(t, special=True, normalized=False) for t in tokens])
        if special_tokens:
            for t in tokens:
                self._special_ids.add(self.tok.token_to_id(t))
        return added

    def convert_tokens_to_ids(self, token: str) -> int:
        tid = self.tok.token_to_id(token)
        return self.unk_token_id if tid is None else tid

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        ids = self.tok.encode(text, add_special_tokens=False).ids
        return ([self.bos_token_id] + ids) if add_special_tokens else ids

    def __call__(self, text: str, add_special_tokens: bool = True):
        from .tokenizer import _EncodingResult
        return _EncodingResult(self.encode(text, add_special_tokens))

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = False) -> str:
        ids = [int(i) for i in ids]
        if skip_special_tokens:
            ids = [i for i in ids if i not in self._special_ids]
            return self.tok.decode(ids, skip_special_tokens=False)
        # keep added specials readable
        return self.tok.decode(ids, skip_special_tokens=False)


def build_pave_bpe(dataset_dir: str, *, vocab_size: int = 8192,
                   cache_path: Optional[str] = None,
                   model_max_length: int = 2048) -> BPETokenizer:
    """Train (or load cached) PAVE BPE from {dataset_dir}/val.jsonl."""
    if cache_path and os.path.exists(cache_path):
        return BPETokenizer.load(cache_path, model_max_length)
    corpus = pave_corpus(os.path.join(dataset_dir, "val.jsonl"),
                         os.path.join(dataset_dir, "labelmap.json"))
    tok = train_bpe(corpus, vocab_size=vocab_size, save_path=cache_path)
    return BPETokenizer(tok, model_max_length)
