"""RAG engine: knowledge-base CRUD, document ingestion, vector search.

Parity target: the reference's RAG stack (studio/backend/routes/rag.py —
KB CRUD, uploads, ingestion, search; core/rag/{config,ingestion,
retrieval,store}.py) built on sqlite-vec + an embedding server.

TPU-native form: plain sqlite holds KBs/docs/chunks with vectors as fp32
BLOBs, and retrieval is exact brute-force cosine — one [N, d] @ [d]
matmul (numpy on host, or the TPU for big KBs), which at studio KB scale
(<1e6 chunks) beats maintaining an ANN index and is exact. The embedder
is pluggable: any ``texts -> [N, d] float array`` callable works, so the
repo's own sentence-transformer stack (models/sentence_transformer.py)
plugs in when a model is loaded; the default is a deterministic hashed
bag-of-ngrams embedder that needs no model (the availability-marker
analog of the reference's "RAG still mounts without sqlite-vec").
"""

from __future__ import annotations

import hashlib
import os
import re
import sqlite3
import time
import uuid
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# Chunking (reference: core/rag/ingestion.py splits uploads into chunks)
# ---------------------------------------------------------------------------

def chunk_text(text: str, chunk_chars: int = 1200,
               overlap: int = 200) -> List[str]:
    """Paragraph-aware sliding chunks: split on blank lines, pack
    paragraphs up to ``chunk_chars``, carry ``overlap`` tail characters
    into the next chunk so answers spanning a boundary stay findable."""
    paras = [p.strip() for p in re.split(r"\n\s*\n", text) if p.strip()]
    chunks: List[str] = []
    cur = ""
    for p in paras:
        while len(p) > chunk_chars:          # oversized paragraph
            if cur:
                chunks.append(cur)
                cur = cur[-overlap:] if overlap else ""
            head, p = p[:chunk_chars], p[chunk_chars - overlap:]
            chunks.append(head)
            cur = ""
        if len(cur) + len(p) + 2 > chunk_chars and cur:
            chunks.append(cur)
            cur = cur[-overlap:] if overlap else ""
        cur = (cur + "\n\n" + p).strip() if cur else p
    if cur:
        chunks.append(cur)
    return chunks


# ---------------------------------------------------------------------------
# Default embedder (model-free, deterministic, offline)
# ---------------------------------------------------------------------------

_STOPWORDS = frozenset(
    "a an and are as at be but by can do does for from had has have how "
    "i if in into is it its may much not of on or our so than that the "
    "their then there these they this to until was were what when where "
    "which who will with you your".split())


class HashEmbedder:
    """Hashed bag-of-words+bigrams embedding, L2-normalized.

    Deterministic and dependency-free — the always-available fallback so
    the RAG routes answer without a loaded model. Real deployments pass
    an ``encode``-style callable from models/sentence_transformer.py.
    Stopwords are dropped and term counts are sqrt-damped so content
    words dominate the cosine rather than collision noise."""

    def __init__(self, dim: int = 1024):
        self.dim = dim

    @staticmethod
    def _tokens(text: str) -> List[str]:
        toks = [t for t in re.findall(r"[a-z0-9]+", text.lower())
                if t not in _STOPWORDS]
        return toks + [a + "_" + b for a, b in zip(toks, toks[1:])]

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            counts: Dict[str, int] = {}
            for tok in self._tokens(t):
                counts[tok] = counts.get(tok, 0) + 1
            for tok, n in counts.items():
                h = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                    "little")
                sign = 1.0 if (h >> 62) & 1 else -1.0
                # unigrams carry double the weight of hashed bigrams
                w = 2.0 if "_" not in tok else 1.0
                out[i, h % self.dim] += sign * w * float(np.sqrt(n))
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        return out / np.maximum(norms, 1e-8)


# ---------------------------------------------------------------------------
# Store
# ---------------------------------------------------------------------------

_SCHEMA = """
CREATE TABLE IF NOT EXISTS kbs (
    id TEXT PRIMARY KEY, name TEXT UNIQUE NOT NULL, created REAL);
CREATE TABLE IF NOT EXISTS docs (
    id TEXT PRIMARY KEY, kb_id TEXT NOT NULL, name TEXT NOT NULL,
    sha256 TEXT NOT NULL, n_chunks INTEGER, created REAL);
CREATE TABLE IF NOT EXISTS chunks (
    id INTEGER PRIMARY KEY AUTOINCREMENT, kb_id TEXT NOT NULL,
    doc_id TEXT NOT NULL, seq INTEGER, text TEXT, vec BLOB);
CREATE INDEX IF NOT EXISTS chunks_kb ON chunks (kb_id);
"""


class RagStore:
    """sqlite-backed vector store with exact cosine retrieval."""

    def __init__(self, path: str,
                 embedder: Optional[Callable] = None,
                 chunk_chars: int = 1200, overlap: int = 200):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self.embedder = embedder or HashEmbedder()
        self.chunk_chars = chunk_chars
        self.overlap = overlap
        self._vec_cache: Dict[str, tuple] = {}   # kb_id -> (ids, texts, mat)
        with self._conn() as c:
            c.executescript(_SCHEMA)

    def _conn(self):
        c = sqlite3.connect(self.path)
        c.row_factory = sqlite3.Row
        return c

    # -- KBs ------------------------------------------------------------

    def create_kb(self, name: str) -> Dict:
        if not name or not all(ch.isalnum() or ch in "-_ ." for ch in name):
            raise TypeError("kb name must be alphanumeric/-_ .")
        kid = "kb-" + uuid.uuid4().hex[:12]
        with self._conn() as c:
            try:
                c.execute("INSERT INTO kbs VALUES (?, ?, ?)",
                          (kid, name, time.time()))
            except sqlite3.IntegrityError:
                raise RuntimeError(f"kb {name!r} already exists")
        return {"id": kid, "name": name}

    def list_kbs(self) -> List[Dict]:
        with self._conn() as c:
            rows = c.execute(
                "SELECT k.id, k.name, k.created,"
                " (SELECT COUNT(*) FROM docs d WHERE d.kb_id = k.id)"
                " AS n_docs,"
                " (SELECT COUNT(*) FROM chunks ch WHERE ch.kb_id = k.id)"
                " AS n_chunks FROM kbs k ORDER BY k.created").fetchall()
        return [dict(r) for r in rows]

    def delete_kb(self, kb_id: str) -> None:
        with self._conn() as c:
            c.execute("DELETE FROM chunks WHERE kb_id = ?", (kb_id,))
            c.execute("DELETE FROM docs WHERE kb_id = ?", (kb_id,))
            n = c.execute("DELETE FROM kbs WHERE id = ?", (kb_id,)).rowcount
        self._vec_cache.pop(kb_id, None)
        if not n:
            raise FileNotFoundError(kb_id)

    def _require_kb(self, c, kb_id: str) -> None:
        if not c.execute("SELECT 1 FROM kbs WHERE id = ?",
                         (kb_id,)).fetchone():
            raise FileNotFoundError(kb_id)

    # -- documents ------------------------------------------------------

    def add_document(self, kb_id: str, name: str, text: str) -> Dict:
        """Chunk + embed + store. Re-uploading identical content to the
        same KB is a no-op (sha dedupe, as the reference's ingestion
        skips unchanged files)."""
        sha = hashlib.sha256(text.encode()).hexdigest()
        with self._conn() as c:
            self._require_kb(c, kb_id)
            dup = c.execute(
                "SELECT id, n_chunks FROM docs WHERE kb_id = ? AND "
                "sha256 = ?", (kb_id, sha)).fetchone()
            if dup:
                return {"id": dup["id"], "name": name,
                        "n_chunks": dup["n_chunks"], "deduped": True}
        chunks = chunk_text(text, self.chunk_chars, self.overlap)
        if not chunks:
            raise TypeError("document has no content")
        vecs = np.asarray(self.embedder(chunks), np.float32)
        did = "doc-" + uuid.uuid4().hex[:12]
        with self._conn() as c:
            c.execute("INSERT INTO docs VALUES (?, ?, ?, ?, ?, ?)",
                      (did, kb_id, name, sha, len(chunks), time.time()))
            c.executemany(
                "INSERT INTO chunks (kb_id, doc_id, seq, text, vec) "
                "VALUES (?, ?, ?, ?, ?)",
                [(kb_id, did, i, t, v.tobytes())
                 for i, (t, v) in enumerate(zip(chunks, vecs))])
        self._vec_cache.pop(kb_id, None)
        return {"id": did, "name": name, "n_chunks": len(chunks),
                "deduped": False}

    def list_docs(self, kb_id: str) -> List[Dict]:
        with self._conn() as c:
            self._require_kb(c, kb_id)
            rows = c.execute(
                "SELECT id, name, sha256, n_chunks, created FROM docs "
                "WHERE kb_id = ? ORDER BY created", (kb_id,)).fetchall()
        return [dict(r) for r in rows]

    def delete_doc(self, kb_id: str, doc_id: str) -> None:
        with self._conn() as c:
            c.execute("DELETE FROM chunks WHERE doc_id = ?", (doc_id,))
            n = c.execute("DELETE FROM docs WHERE id = ? AND kb_id = ?",
                          (doc_id, kb_id)).rowcount
        self._vec_cache.pop(kb_id, None)
        if not n:
            raise FileNotFoundError(doc_id)

    # -- retrieval ------------------------------------------------------

    def _kb_matrix(self, kb_id: str):
        cached = self._vec_cache.get(kb_id)
        if cached is not None:
            return cached
        with self._conn() as c:
            self._require_kb(c, kb_id)
            rows = c.execute(
                "SELECT id, doc_id, seq, text, vec FROM chunks WHERE "
                "kb_id = ? ORDER BY id", (kb_id,)).fetchall()
        if rows:
            mat = np.stack([np.frombuffer(r["vec"], np.float32)
                            for r in rows])
        else:
            mat = np.zeros((0, 1), np.float32)
        meta = [(r["id"], r["doc_id"], r["seq"], r["text"]) for r in rows]
        self._vec_cache[kb_id] = (meta, mat)
        return meta, mat

    def search(self, kb_id: str, query: str, k: int = 5) -> List[Dict]:
        meta, mat = self._kb_matrix(kb_id)
        if not len(meta):
            return []
        q = np.asarray(self.embedder([query]), np.float32)[0]
        qn = q / max(np.linalg.norm(q), 1e-8)
        mn = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-8)
        scores = mn @ qn
        order = np.argsort(-scores)[:k]
        return [{"chunk_id": meta[i][0], "doc_id": meta[i][1],
                 "seq": meta[i][2], "text": meta[i][3],
                 "score": round(float(scores[i]), 6)} for i in order]

    def context_for(self, kb_id: str, query: str, k: int = 5,
                    max_chars: int = 6000) -> str:
        """Concatenated top-k chunk text — the prompt-side context block
        the reference's chat-with-RAG path injects."""
        parts, total = [], 0
        for hit in self.search(kb_id, query, k):
            t = hit["text"]
            if total + len(t) > max_chars:
                t = t[:max_chars - total]
            parts.append(t)
            total += len(t)
            if total >= max_chars:
                break
        return "\n\n---\n\n".join(parts)
