"""Synthetic data generation.

Parity target: reference unsloth/dataprep/synthetic.py — `SyntheticDataKit`
(:162) drives a vLLM server subprocess to generate QA pairs from documents
(with process-tree termination :52).

TPU-native: no server subprocess — generation runs on the same runtime
through the native generate loop, so there is nothing to spawn, babysit,
or kill. Documents are chunked, prompted for QA pairs, and parsed into
conversation examples ready for SFTTrainer.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence

from ..inference.generate import SamplingParams, generate
from .raw_text import TextPreprocessor

QA_PROMPT = (
    "Generate {n} question-answer pairs about the following text.\n"
    "Format each pair exactly as:\nQ: <question>\nA: <answer>\n\n"
    "Text:\n{chunk}\n\n"
)


@dataclasses.dataclass
class SyntheticConfig:
    chunk_size: int = 2048          # characters per document chunk
    overlap: int = 128
    pairs_per_chunk: int = 3
    max_new_tokens: int = 512
    temperature: float = 0.7
    max_chunks: Optional[int] = None


class SyntheticDataKit:
    """QA-pair generation from raw documents
    (reference API: SyntheticDataKit.from_pretrained + prepare_qa_generation
    + chunk/generate flow)."""

    def __init__(self, model, tokenizer=None,
                 config: Optional[SyntheticConfig] = None):
        self.model = model
        self.tokenizer = tokenizer or getattr(model, "tokenizer", None)
        self.config = config or SyntheticConfig()
        self.preprocessor = TextPreprocessor()

    @classmethod
    def from_pretrained(cls, model_name: str, load_in_4bit: bool = True,
                        **kw):
        from ..models.loader import FastLanguageModel

        model, tokenizer = FastLanguageModel.from_pretrained(
            model_name, load_in_4bit=load_in_4bit, **kw)
        return cls(model, tokenizer)

    def chunk_document(self, text: str) -> List[str]:
        text = self.preprocessor(text)
        cfg = self.config
        chunks = []
        step = max(cfg.chunk_size - cfg.overlap, 1)
        for start in range(0, len(text), step):
            chunk = text[start:start + cfg.chunk_size]
            if len(chunk) > 64:
                chunks.append(chunk)
            if cfg.max_chunks and len(chunks) >= cfg.max_chunks:
                break
        return chunks

    def _prompt_for(self, chunk: str) -> str:
        prompt = QA_PROMPT.format(n=self.config.pairs_per_chunk,
                                  chunk=chunk)
        tok = self.tokenizer
        if getattr(tok, "chat_template", None):
            return tok.apply_chat_template(
                [{"role": "user", "content": prompt}], tokenize=False,
                add_generation_prompt=True)
        return prompt

    @staticmethod
    def parse_qa_pairs(text: str) -> List[Dict[str, str]]:
        """Parse 'Q: ... A: ...' blocks (tolerates numbering/extra text)."""
        pairs = []
        pattern = re.compile(
            r"Q(?:\d+)?[:.)]\s*(.+?)\s*A(?:\d+)?[:.)]\s*(.+?)(?=(?:\n\s*Q(?:\d+)?[:.)])|\Z)",
            re.S | re.I)
        for m in pattern.finditer(text):
            q = m.group(1).strip()
            a = m.group(2).strip()
            if q and a:
                pairs.append({"question": q, "answer": a})
        return pairs

    def generate_qa(self, documents: Sequence[str],
                    batch_size: int = 4) -> List[Dict[str, Any]]:
        """documents -> [{"messages": [...]}, ...] SFT-ready examples."""
        cfg = self.config
        chunks: List[str] = []
        for doc in documents:
            chunks.extend(self.chunk_document(doc))
        examples = []
        sp = SamplingParams(max_tokens=cfg.max_new_tokens,
                            temperature=cfg.temperature, seed=0)
        for i in range(0, len(chunks), batch_size):
            prompts = [self._prompt_for(c) for c in chunks[i:i + batch_size]]
            outputs = generate(self.model, prompts, sp,
                               tokenizer=self.tokenizer)
            for out in outputs:
                for pair in self.parse_qa_pairs(out):
                    examples.append({"messages": [
                        {"role": "user", "content": pair["question"]},
                        {"role": "assistant", "content": pair["answer"]},
                    ]})
        return examples
