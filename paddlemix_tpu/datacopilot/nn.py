"""DataCopilot model-backed ops: language ID + instruction-caption tagging.

Rebuild of the reference's paddlemix/datacopilot/nn/ (_lid.py FastTextLIDModel,
inscaptagger.py PP-InsCapTagger). The LID fast path is a dependency-free
character n-gram scorer over common scripts/languages (fasttext is not in the
image; the class upgrades itself transparently when fasttext + a model file
are available). The tagger drives any of this repo's instruction-following
VLMs/LMs through the reference tag prompt."""

from __future__ import annotations

import collections
import re
import unicodedata
from typing import Callable, List, Optional, Sequence, Tuple

from .dataset import MMDataset

# character-class heuristics: script detection settles most of the
# high-traffic cases the reference routes through fasttext lid.176
_SCRIPT_LANG = (
    # kana BEFORE the CJK range: Japanese text mixes kanji with kana, so any
    # meaningful kana fraction decides ja over zh
    (r"[぀-ヿ]", "ja"),
    (r"[一-鿿]", "zh"),
    (r"[가-힯]", "ko"),
    (r"[Ѐ-ӿ]", "ru"),
    (r"[؀-ۿ]", "ar"),
    (r"[฀-๿]", "th"),
    (r"[ऀ-ॿ]", "hi"),
)

# latin-script languages: tiny stopword profiles
_LATIN_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "it", "you", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "los", "del", "las", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "dans", "pour", "une"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "para"},
}


class FastTextLIDModel:
    """Language ID with the reference's predict() surface
    (nn/_lid.py:30-53): returns (labels, scores) like fasttext."""

    def __init__(self, path: Optional[str] = None, name: str = "lid.176.bin"):
        self._path = path
        self._model = None
        if path is not None:
            try:
                import fasttext

                self._model = fasttext.load_model(path)
            except ImportError:
                pass

    def predict(self, text: str, k: int = 1, threshold: float = 0.0):
        if self._model is not None:
            return self._model.predict(text, k=k, threshold=threshold)
        text = text.strip()
        for pat, lang in _SCRIPT_LANG:
            frac = len(re.findall(pat, text)) / max(len(text), 1)
            if frac > 0.2:
                return ([f"__label__{lang}"], [min(0.5 + frac, 1.0)])
        words = set(re.findall(r"[a-zA-Z']+", text.lower()))
        scores = {lang: len(words & prof) for lang, prof in
                  _LATIN_PROFILES.items()}
        best = sorted(scores.items(), key=lambda kv: -kv[1])[:k]
        total = sum(s for _, s in best) or 1
        labels = [f"__label__{l}" for l, _ in best]
        probs = [max(s / total, 1e-3) for _, s in best]
        if best[0][1] == 0:
            return (["__label__en"], [0.33])  # latin fallback
        return (labels, probs)


def language_of(text: str) -> str:
    labels, _ = FastTextLIDModel().predict(text)
    return labels[0].replace("__label__", "")


def filter_by_language(dataset: MMDataset, lang: str) -> MMDataset:
    def keep(item):
        text = " ".join(c.get("value", "")
                        for c in item.get("conversations", []))
        return language_of(text) == lang

    return dataset.filter(keep)


_TAG_PROMPT = (
    "You are an expert data annotator. Read the instruction-response pair "
    "and answer with comma-separated quality tags from: "
    "coherent, fluent, detailed, concise, hallucination, refusal, "
    "code, math, multi-turn, unsafe.\n\n{sample}\n\nTags:"
)


class PPInsCapTagger:
    """Instruction/caption quality tagger (reference
    nn/inscaptagger.py:33-135, PP-InsCapTagger): drives an
    instruction-following LM over each sample and attaches the tag list.

    ``generate_fn(prompt: str) -> str`` abstracts the backbone; pass e.g. a
    closure over models.llama greedy_generate + a tokenizer, or a Qwen2-VL
    chat wrapper for image-grounded tagging."""

    def __init__(self, generate_fn: Callable[[str], str],
                 prompt_template: str = _TAG_PROMPT):
        self.generate_fn = generate_fn
        self.prompt_template = prompt_template

    def _render(self, item) -> str:
        convo = "\n".join(f"{c.get('from')}: {c.get('value', '')}"
                          for c in item.get("conversations", []))
        return self.prompt_template.format(sample=convo)

    def __call__(self, item):
        raw = self.generate_fn(self._render(item))
        tags = [t.strip().lower() for t in raw.split(",") if t.strip()]
        out = dict(item)
        out["tags"] = tags
        return out

    def tag_dataset(self, dataset: MMDataset) -> MMDataset:
        return dataset.map(self)
