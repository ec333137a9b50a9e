"""Raw-text dataset preparation.

Parity target: reference unsloth/dataprep/raw_text.py — `RawTextDataLoader`
(:37) chunk/stride tokenization of .txt/.json files into causal-LM
examples, and `TextPreprocessor` (:306) cleanup hooks.
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, List, Optional


class TextPreprocessor:
    """Composable text cleanup (reference: raw_text.py:306)."""

    def __init__(self, lowercase: bool = False,
                 normalize_whitespace: bool = True,
                 strip_html: bool = False,
                 custom: Optional[Callable[[str], str]] = None):
        self.lowercase = lowercase
        self.normalize_whitespace = normalize_whitespace
        self.strip_html = strip_html
        self.custom = custom

    def __call__(self, text: str) -> str:
        if self.strip_html:
            text = re.sub(r"<[^>]+>", " ", text)
        if self.normalize_whitespace:
            text = re.sub(r"[ \t]+", " ", text)
            text = re.sub(r"\n{3,}", "\n\n", text)
        if self.lowercase:
            text = text.lower()
        if self.custom:
            text = self.custom(text)
        return text.strip()


class RawTextDataLoader:
    """Chunk/stride tokenization of raw text into LM examples
    (reference: raw_text.py:37).

    chunk_size tokens per example, advancing by stride (stride <
    chunk_size gives overlapping windows so no context is lost at chunk
    boundaries)."""

    def __init__(self, path_or_text: str, tokenizer=None,
                 chunk_size: int = 2048, stride: Optional[int] = None,
                 preprocessor: Optional[TextPreprocessor] = None):
        self.tokenizer = tokenizer
        self.chunk_size = chunk_size
        self.stride = stride or chunk_size
        assert 0 < self.stride <= self.chunk_size
        self.preprocessor = preprocessor
        self.text = self._load(path_or_text)

    def _load(self, path_or_text: str) -> str:
        if os.path.exists(path_or_text):
            if path_or_text.endswith(".json"):
                with open(path_or_text) as f:
                    data = json.load(f)
                if isinstance(data, list):
                    parts = [d.get("text", "") if isinstance(d, dict)
                             else str(d) for d in data]
                    text = "\n\n".join(parts)
                else:
                    text = data.get("text", "")
            else:
                with open(path_or_text, encoding="utf-8",
                          errors="replace") as f:
                    text = f.read()
        else:
            text = path_or_text
        if self.preprocessor:
            text = self.preprocessor(text)
        return text

    def as_examples(self) -> List[Dict[str, List[int]]]:
        """Tokenized, chunked examples [{"input_ids": [...]}]. Without a
        tokenizer, falls back to whitespace word chunks of text."""
        if self.tokenizer is None:
            words = self.text.split()
            return [{"text": " ".join(words[i:i + self.chunk_size])}
                    for i in range(0, max(len(words), 1), self.stride)]
        ids = self.tokenizer(self.text)["input_ids"]
        out = []
        for start in range(0, max(len(ids) - 1, 1), self.stride):
            chunk = ids[start:start + self.chunk_size]
            if len(chunk) < 2:
                break
            out.append({"input_ids": chunk})
            if start + self.chunk_size >= len(ids):
                break
        return out
