"""Caption / VQA evaluation metrics.

Rebuild of the reference evaluation reporters (paddlemix/trainer/
blip2_trainer.py:643-687 COCO caption + VQA eval): pure-python BLEU-n, CIDEr-D
and the VQAv2 consensus accuracy, no pycocoevalcap dependency."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from typing import Dict, List, Sequence


def _tokenize(text: str) -> List[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i: i + n]) for i in range(len(tokens) - n + 1))


def bleu(candidates: Sequence[str], references: Sequence[Sequence[str]],
         max_n: int = 4) -> float:
    """Corpus BLEU-max_n with brevity penalty (uniform weights)."""
    log_precisions = []
    cand_toks = [_tokenize(c) for c in candidates]
    ref_toks = [[_tokenize(r) for r in refs] for refs in references]
    for n in range(1, max_n + 1):
        match, total = 0, 0
        for cand, refs in zip(cand_toks, ref_toks):
            cg = _ngrams(cand, n)
            best = Counter()
            for r in refs:
                rg = _ngrams(r, n)
                for g, cnt in rg.items():
                    best[g] = max(best[g], cnt)
            match += sum(min(cnt, best[g]) for g, cnt in cg.items())
            total += max(sum(cg.values()), 0)
        if total == 0 or match == 0:
            return 0.0
        log_precisions.append(math.log(match / total))
    c_len = sum(len(c) for c in cand_toks)
    r_len = sum(min((abs(len(r) - len(c)), len(r)) for r in refs)[1]
                for c, refs in zip(cand_toks, ref_toks))
    bp = 1.0 if c_len > r_len else math.exp(1 - r_len / max(c_len, 1))
    return bp * math.exp(sum(log_precisions) / max_n)


def cider_d(candidates: Sequence[str], references: Sequence[Sequence[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D over the given corpus (document frequency from the references)."""
    cand_toks = [_tokenize(c) for c in candidates]
    ref_toks = [[_tokenize(r) for r in refs] for refs in references]
    n_images = len(candidates)
    score_total = 0.0
    for n in range(1, max_n + 1):
        # document frequency per ngram
        df = Counter()
        for refs in ref_toks:
            seen = set()
            for r in refs:
                seen.update(_ngrams(r, n).keys())
            df.update(seen)

        def tfidf(grams: Counter) -> Dict:
            total = max(sum(grams.values()), 1)
            return {g: (cnt / total) * math.log(max(n_images / max(df[g], 1), 1.0))
                    for g, cnt in grams.items()}

        def cosine(a: Dict, b: Dict, len_a: int, len_b: int) -> float:
            common = set(a) & set(b)
            num = sum(a[g] * b[g] for g in common)
            na = math.sqrt(sum(v * v for v in a.values()))
            nb = math.sqrt(sum(v * v for v in b.values()))
            if na == 0 or nb == 0:
                return 0.0
            penalty = math.exp(-((len_a - len_b) ** 2) / (2 * sigma ** 2))
            return penalty * num / (na * nb)

        s = 0.0
        for cand, refs in zip(cand_toks, ref_toks):
            cv = tfidf(_ngrams(cand, n))
            per_ref = [cosine(cv, tfidf(_ngrams(r, n)), len(cand), len(r)) for r in refs]
            s += sum(per_ref) / max(len(per_ref), 1)
        score_total += s / max(n_images, 1)
    return 10.0 * score_total / max_n


def vqa_accuracy(predictions: Sequence[str], answer_lists: Sequence[Sequence[str]]) -> float:
    """VQAv2 consensus: acc = min(#matching_humans / 3, 1), averaged."""
    total = 0.0
    for pred, answers in zip(predictions, answer_lists):
        p = " ".join(_tokenize(pred))
        matches = sum(1 for a in answers if " ".join(_tokenize(a)) == p)
        total += min(matches / 3.0, 1.0)
    return total / max(len(predictions), 1)
