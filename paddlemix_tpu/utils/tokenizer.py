"""General tokenizer wrapper for LLM/VLM checkpoints.

The reference leans on PaddleNLP tokenizers (SURVEY L0). Here: HF
`tokenizers` (tokenizer.json, present in every modern Llama/Qwen/OPT/T5
checkpoint) wrapped with the same call surface as models.clip.CLIPTokenizer,
so any component can take either."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Union

import numpy as np


class HFTokenizer:
    def __init__(self, tokenizer, bos_token_id=None, eos_token_id=None,
                 pad_token_id=None, model_max_length: int = 2048):
        self._tok = tokenizer
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id if pad_token_id is not None else (eos_token_id or 0)
        self.model_max_length = model_max_length

    @property
    def vocab_size(self) -> int:
        return self._tok.get_vocab_size()

    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        from tokenizers import Tokenizer

        from .hub import resolve_file

        tok_path = resolve_file(path, "tokenizer.json")
        tok = Tokenizer.from_file(tok_path)
        cfg_path = resolve_file(path, "tokenizer_config.json", required=False)
        gen_path = resolve_file(path, "generation_config.json", required=False)
        ids: Dict[str, Optional[int]] = {"bos_token_id": None, "eos_token_id": None,
                                         "pad_token_id": None}
        max_len = kwargs.pop("model_max_length", 2048)
        if cfg_path:
            with open(cfg_path) as f:
                cfg = json.load(f)
            max_len = int(min(cfg.get("model_max_length", max_len), 10 ** 9))
            for key in ids:
                name = cfg.get(key.replace("_id", ""))
                if isinstance(name, dict):
                    name = name.get("content")
                if isinstance(name, str):
                    tid = tok.token_to_id(name)
                    if tid is not None:
                        ids[key] = tid
        if gen_path:
            with open(gen_path) as f:
                gen = json.load(f)
            for key in ids:
                if ids[key] is None and isinstance(gen.get(key), int):
                    ids[key] = gen[key]
        return cls(tok, ids["bos_token_id"], ids["eos_token_id"], ids["pad_token_id"],
                   model_max_length=max_len, **kwargs)

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        out = self._tok.encode(text, add_special_tokens=add_special_tokens).ids
        return out

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        return self._tok.decode([int(i) for i in ids], skip_special_tokens=skip_special_tokens)

    def token_to_id(self, token: str) -> Optional[int]:
        return self._tok.token_to_id(token)

    def __call__(self, texts: Union[str, List[str]], max_length: Optional[int] = None,
                 padding: str = "longest", truncation: bool = True) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        rows = [self.encode(t) for t in texts]
        limit = max_length or self.model_max_length
        if truncation:
            rows = [r[:limit] for r in rows]
        width = limit if padding == "max_length" else max(len(r) for r in rows)
        ids = np.full((len(rows), width), self.pad_token_id, np.int32)
        mask = np.zeros((len(rows), width), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


class WordPieceTokenizer:
    """BERT-style WordPiece over a vocab.txt (greedy longest-match with ##
    continuations + basic whitespace/punct pre-split). Covers GroundingDINO /
    BERT checkpoints that ship only vocab.txt (reference leans on
    paddlenlp.BertTokenizer)."""

    def __init__(self, vocab: Dict[str, int], lowercase: bool = True,
                 model_max_length: int = 512):
        self.vocab = vocab
        self.ids_to_tokens = {v: k for k, v in vocab.items()}
        self.lowercase = lowercase
        self.model_max_length = model_max_length
        self.cls_token_id = vocab.get("[CLS]")
        self.sep_token_id = vocab.get("[SEP]")
        self.pad_token_id = vocab.get("[PAD]", 0)
        self.unk_token_id = vocab.get("[UNK]", 0)
        self.bos_token_id = self.cls_token_id
        self.eos_token_id = self.sep_token_id

    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        from .hub import resolve_file

        vocab_path = resolve_file(path, "vocab.txt")
        vocab: Dict[str, int] = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                vocab[line.rstrip("\n")] = i
        return cls(vocab, **kwargs)

    def _basic_split(self, text: str) -> List[str]:
        import re

        if self.lowercase:
            text = text.lower()
        return re.findall(r"\w+|[^\w\s]", text, re.UNICODE)

    def _wordpiece(self, word: str) -> List[int]:
        out, start = [], 0
        while start < len(word):
            end = len(word)
            piece_id = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    piece_id = self.vocab[piece]
                    break
                end -= 1
            if piece_id is None:
                return [self.unk_token_id]
            out.append(piece_id)
            start = end
        return out

    def encode(self, text: str, add_special_tokens: bool = True) -> List[int]:
        ids: List[int] = []
        for word in self._basic_split(text):
            ids.extend(self._wordpiece(word))
        if add_special_tokens and self.cls_token_id is not None:
            ids = [self.cls_token_id] + ids + [self.sep_token_id]
        return ids

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        return [self.vocab.get(t, self.unk_token_id) for t in tokens]

    def decode(self, ids: Sequence[int], skip_special_tokens: bool = True) -> str:
        toks = []
        for i in ids:
            t = self.ids_to_tokens.get(int(i), "[UNK]")
            if skip_special_tokens and t in ("[CLS]", "[SEP]", "[PAD]"):
                continue
            toks.append(t)
        text = " ".join(toks).replace(" ##", "")
        return text

    def __call__(self, texts: Union[str, List[str]],
                 max_length: Optional[int] = None, padding: str = "longest",
                 truncation: bool = True) -> Dict[str, np.ndarray]:
        if isinstance(texts, str):
            texts = [texts]
        rows = [self.encode(t) for t in texts]
        limit = max_length or self.model_max_length
        if truncation:
            rows = [r[:limit] for r in rows]
        width = limit if padding == "max_length" else max(len(r) for r in rows)
        ids = np.full((len(rows), width), self.pad_token_id, np.int32)
        mask = np.zeros((len(rows), width), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def load_tokenizer(path: str):
    """tokenizer.json -> HFTokenizer; CLIP vocab/merges -> CLIPTokenizer;
    vocab.txt -> WordPieceTokenizer."""
    from .hub import resolve_file

    if resolve_file(path, "tokenizer.json", required=False):
        return HFTokenizer.from_pretrained(path)
    if resolve_file(path, "vocab.json", required=False) and \
            resolve_file(path, "merges.txt", required=False):
        from ..models.clip.tokenizer import CLIPTokenizer

        return CLIPTokenizer.from_pretrained(path)
    if resolve_file(path, "vocab.txt", required=False):
        return WordPieceTokenizer.from_pretrained(path)
    raise FileNotFoundError(f"no known tokenizer files at {path!r}")
