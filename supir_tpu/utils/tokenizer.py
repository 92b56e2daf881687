"""CLIP tokenization (host-side).

Both SDXL towers use the CLIP BPE vocabulary (49408 tokens, <|startoftext|>
49406, <|endoftext|> 49407, context 77). We use the HF CLIPTokenizer when
its vocab files are available locally; in fully-offline environments
without the vocab, a deterministic hash fallback keeps the pipeline
runnable for tests (NOT semantically meaningful — real deployments must
provide the tokenizer files, exactly like the reference needs its CLIP
checkpoints).
"""

from __future__ import annotations

import functools
import hashlib
import re
from typing import List, Optional

import numpy as np

BOS = 49406
EOS = 49407
VOCAB = 49408
CONTEXT = 77


@functools.lru_cache(maxsize=1)
def _hf_tokenizer():
    try:
        from transformers import CLIPTokenizer, CLIPTokenizerFast

        for cls in (CLIPTokenizerFast, CLIPTokenizer):
            for name in ("openai/clip-vit-large-patch14",):
                try:
                    return cls.from_pretrained(name, local_files_only=True)
                except Exception:
                    continue
    except Exception:
        pass
    return None


def _hash_tokenize(text: str) -> List[int]:
    """Deterministic fallback: one pseudo-token per word, stable across runs."""
    words = re.findall(r"\w+|[^\w\s]", text.lower())
    toks = []
    for w in words:
        h = int(hashlib.sha1(w.encode()).hexdigest(), 16)
        toks.append(h % (VOCAB - 1000))  # keep away from special ids
    return toks


def tokenize(texts: List[str], max_length: int = CONTEXT) -> np.ndarray:
    """List of strings -> [B, 77] int32 (BOS ... EOS pad-with-EOS).

    Matches the padding convention of both reference towers (CLIP pads with
    EOS/eot so that argmax(ids) finds the pooled position).
    """
    tok = _hf_tokenizer()
    out = np.full((len(texts), max_length), EOS, np.int32)
    if tok is not None:
        enc = tok(
            texts, truncation=True, max_length=max_length, padding="max_length",
            return_tensors="np",
        )
        ids = enc["input_ids"].astype(np.int32)
        # HF pads with its pad token; normalize padding to EOS
        pad_id = tok.pad_token_id
        if pad_id is not None and pad_id != EOS:
            ids[ids == pad_id] = EOS
        return ids
    for i, t in enumerate(texts):
        body = _hash_tokenize(t)[: max_length - 2]
        out[i, 0] = BOS
        out[i, 1 : 1 + len(body)] = body
        out[i, 1 + len(body)] = EOS
    return out


def tokenizer_available() -> bool:
    return _hf_tokenizer() is not None
