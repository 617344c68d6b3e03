"""Checkpoint/file resolution.

The reference downloads from BOS / HF hub / aistudio
(ppdiffusers/ppdiffusers/utils/downloader/*, paddlemix/utils/downloader.py).
Here: local paths first (the common case on a TPU pod with a mounted FS), then
huggingface_hub when network is available. Everything degrades gracefully to a
clear error in zero-egress environments.
"""

from __future__ import annotations

import os
from typing import Optional

from .env import models_home
from .log import logger


def _join(base: str, subfolder: Optional[str], filename: str) -> str:
    return os.path.join(base, subfolder, filename) if subfolder else os.path.join(base, filename)


def resolve_file(
    path_or_repo: str,
    filename: str,
    subfolder: Optional[str] = None,
    required: bool = True,
) -> Optional[str]:
    """Resolve ``filename`` inside a local dir or (if possible) a hub repo."""
    if os.path.isfile(path_or_repo):
        return path_or_repo
    if os.path.isdir(path_or_repo):
        p = _join(path_or_repo, subfolder, filename)
        if os.path.exists(p):
            return p
        if required:
            raise FileNotFoundError(f"{filename} not found under {path_or_repo!r} (subfolder={subfolder!r})")
        return None
    # cached download dir
    cached_dir = os.path.join(models_home(), path_or_repo.replace("/", "--"))
    p = _join(cached_dir, subfolder, filename)
    if os.path.exists(p):
        return p
    # try huggingface_hub (works only with network)
    try:
        from huggingface_hub import hf_hub_download

        rel = f"{subfolder}/{filename}" if subfolder else filename
        return hf_hub_download(repo_id=path_or_repo, filename=rel)
    except Exception as e:  # zero-egress or missing repo
        if required:
            raise FileNotFoundError(
                f"could not resolve {filename!r} from {path_or_repo!r} "
                f"(not a local path; hub fetch failed: {type(e).__name__}: {e})"
            ) from e
        return None


def file_exists(path_or_repo: str, filename: str, subfolder: Optional[str] = None) -> bool:
    try:
        return resolve_file(path_or_repo, filename, subfolder=subfolder, required=False) is not None
    except Exception:
        return False
