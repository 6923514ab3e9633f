"""Tokenizer loading (HF transformers AutoTokenizer).

Ref: srt/utils/hf_transformers_utils.py get_tokenizer.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)

_CACHE = {}


def get_tokenizer(tokenizer_path: str, trust_remote_code: bool = False):
    key = (tokenizer_path, trust_remote_code)
    if key in _CACHE:
        return _CACHE[key]
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(
        tokenizer_path, trust_remote_code=trust_remote_code, use_fast=True
    )
    _CACHE[key] = tok
    return tok
