"""VLM loading helper for appflow tasks."""

from __future__ import annotations


def load_vlm(path: str):
    from ..auto import AutoModel

    model = AutoModel.from_pretrained(path)

    class _Bundle:
        def answer(self, image=None, prompt=""):
            raise NotImplementedError("wire a processor for this model family")

    b = _Bundle()
    b.model = model
    return b
