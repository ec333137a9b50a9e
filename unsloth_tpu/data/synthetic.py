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

    def chunk_tokens(self, text: str, max_seq_length: int = 2048,
                     max_generation_tokens: Optional[int] = None,
                     overlap: int = 64) -> List[str]:
        """Token-budget chunking with the reference's boundary math
        (reference: dataprep/synthetic.py:388-450 chunk_data): the chunk
        window is max_seq_length - 2*max_generation_tokens - 128 tokens;
        n_chunks = ceil((len - overlap) / (window - overlap)); linspace
        boundaries with the +overlap right edge."""
        import numpy as np

        gen = (max_generation_tokens
               if max_generation_tokens is not None
               else self.config.max_new_tokens)
        max_tokens = max_seq_length - gen * 2 - 128
        if max_tokens <= 5:
            raise RuntimeError("Generation length is way too long!")
        if max_tokens <= overlap:
            raise RuntimeError(
                f"chunk size ({max_tokens}) must exceed overlap "
                f"({overlap}); reduce overlap or max_generation_tokens")
        tok = self.tokenizer
        input_ids = tok(text, add_special_tokens=False)["input_ids"]
        length = len(input_ids)
        if length <= max_tokens:
            boundaries = [[0, length]] if length > 0 else []
        else:
            n_chunks = int(np.ceil((length - overlap)
                                   / (max_tokens - overlap)))
            pts = np.ceil(np.linspace(0, length - overlap,
                                      n_chunks + 1)).astype(int)
            boundaries = np.stack((pts[:-1], (pts + overlap)[1:])).T
            boundaries = np.minimum(boundaries, length).tolist()
        return [tok.decode(input_ids[lo:hi]) for lo, hi in boundaries]

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

    # -- curation (reference: the kit's cleanup stage — rates each QA
    # pair with the model and keeps those >= cleanup_threshold;
    # prepare_qa_generation knobs cleanup_{threshold,batch_size,
    # temperature}, synthetic.py:451-530) ------------------------------

    @staticmethod
    def dedup_pairs(pairs: List[Dict[str, str]]) -> List[Dict[str, str]]:
        """Exact + normalized-question dedup."""
        seen = set()
        out = []
        for p in pairs:
            key = re.sub(r"\W+", " ", p["question"].lower()).strip()
            if key and key not in seen:
                seen.add(key)
                out.append(p)
        return out

    RATE_PROMPT = (
        "Rate the following question-answer pair for factual grounding "
        "and usefulness on a scale of 1-10. Reply with ONLY the number."
        "\n\nQ: {q}\nA: {a}\n\nRating:")

    def cleanup_qa_pairs(self, pairs: List[Dict[str, str]],
                         threshold: float = 7.0, batch_size: int = 4,
                         temperature: float = 0.3
                         ) -> List[Dict[str, str]]:
        """LLM-judged curation: keep pairs rated >= threshold."""
        sp = SamplingParams(max_tokens=8, temperature=temperature, seed=0)
        kept = []
        for i in range(0, len(pairs), batch_size):
            batch = pairs[i:i + batch_size]
            prompts = [self.RATE_PROMPT.format(q=p["question"],
                                               a=p["answer"])
                       for p in batch]
            outputs = generate(self.model, prompts, sp,
                               tokenizer=self.tokenizer)
            for p, out in zip(batch, outputs):
                m = re.search(r"\d+(?:\.\d+)?", out)
                rating = float(m.group()) if m else 0.0
                if rating >= threshold:
                    kept.append(dict(p, rating=rating))
        return kept

    def run_pipeline(self, documents: Sequence[str],
                     output_folder: str = "data",
                     cleanup_threshold: float = 0.0,
                     batch_size: int = 4) -> List[Dict[str, Any]]:
        """Full generate -> dedup -> (optional) curate pipeline writing
        the reference's directory layout (generated/cleaned/final jsonl;
        reference: prepare_qa_generation's output folders)."""
        import json
        import os

        for sub in ("generated", "cleaned", "final"):
            os.makedirs(os.path.join(output_folder, sub), exist_ok=True)

        def dump(sub, name, rows):
            path = os.path.join(output_folder, sub, name)
            with open(path, "w", encoding="utf-8") as f:
                for r in rows:
                    f.write(json.dumps(r, ensure_ascii=False) + "\n")
            return path

        examples = self.generate_qa(documents, batch_size=batch_size)
        pairs = [{"question": ex["messages"][0]["content"],
                  "answer": ex["messages"][1]["content"]}
                 for ex in examples]
        dump("generated", "qa_pairs.jsonl", pairs)
        pairs = self.dedup_pairs(pairs)
        if cleanup_threshold > 0:
            pairs = self.cleanup_qa_pairs(pairs,
                                          threshold=cleanup_threshold,
                                          batch_size=batch_size)
        dump("cleaned", "qa_pairs.jsonl", pairs)
        final = [{"messages": [
            {"role": "user", "content": p["question"]},
            {"role": "assistant", "content": p["answer"]}]}
            for p in pairs]
        dump("final", "qa_pairs.jsonl", final)
        return final
