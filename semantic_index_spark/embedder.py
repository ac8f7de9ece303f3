"""Pluggable embedders.

The reference calls the OpenAI embeddings API per item
(`SemanticDatabase.cs:162,334,404`, model default `text-embedding-3-large`
at `:31`). That network call is external and non-deterministic, so the
engine treats embedding as a pluggable interface:

  * ``DeterministicEmbedder`` — hash-based bag-of-words vectors; fully
    deterministic, used by every test and oracle (SURVEY.md §5.2).
  * A production embedder would wrap any HTTP/ONNX client with the same
    interface; it is invoked through the same Arrow-batched pandas_udf so
    the network boundary moves from per-item (reference, `:198-206` loops
    sequentially — N items = N calls) to per-Arrow-batch on executors.

Note the reference quirk (SURVEY.md §2.A row 15): item embedding uses the
configured model but *query* embedding omits the options and falls back to
the client default (`SemanticDatabase.cs:162` vs `:334`). We deliberately
diverge: one embedder for both sides.
"""

from __future__ import annotations

import hashlib
import re
from typing import Protocol

import numpy as np
import pandas as pd


class Embedder(Protocol):
    """Embedding interface: texts in, unit-norm float32 vectors out."""

    dim: int

    def embed_batch(self, texts: list[str]) -> "np.ndarray":  # (n, dim) float32
        ...


class DeterministicEmbedder:
    """Hash-based bag-of-words embedder.

    Each lowercase whitespace token seeds a PRNG (md5 of the token) that
    draws a fixed gaussian vector; a text's embedding is the unit-normalized
    sum of its token vectors. Properties:
      * fully deterministic across processes/machines (no global seed),
      * texts sharing tokens are similar (cosine > 0), enabling meaningful
        nearest-neighbor tests without a network call,
      * unit-norm output, so dot == cosine — matching the reference's
        "dot product over unit-norm OpenAI vectors" regime
        (`SemanticDatabase.cs:279`, SURVEY.md §2.C.1).
    """

    def __init__(self, dim: int = 64):
        self.dim = dim
        self._token_cache: dict[str, np.ndarray] = {}

    def _token_vec(self, token: str) -> "np.ndarray":
        v = self._token_cache.get(token)
        if v is None:
            seed = int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16)
            rng = np.random.RandomState(seed)
            v = rng.standard_normal(self.dim).astype(np.float64)
            self._token_cache[token] = v
        return v

    def embed_one(self, text: str) -> "np.ndarray":
        # strip punctuation so an item's canonical-JSON form ('"cat"') and a
        # raw query ('cat') share tokens — the analogue of a real embedder
        # treating both as the same word (items are embedded via their JSON
        # serialization, SemanticDatabase.cs:161; queries via raw text, :334).
        toks = re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
        if not toks:
            out = np.zeros(self.dim, dtype=np.float64)
            out[0] = 1.0
            return out.astype(np.float32)
        acc = np.zeros(self.dim, dtype=np.float64)
        for t in toks:
            acc += self._token_vec(t)
        n = float(np.linalg.norm(acc))
        if n == 0.0:
            acc = np.zeros(self.dim, dtype=np.float64)
            acc[0] = 1.0
            n = 1.0
        return (acc / n).astype(np.float32)

    def embed_batch(self, texts: list[str]) -> "np.ndarray":
        return np.vstack([self.embed_one(t) for t in texts])


class OpenAIStyleEmbedder:
    """Shell for a production HTTP embedder with the reference's config
    surface: mutable ``api_key`` (`SemanticDatabase.cs:67-71` passthrough
    property) and ``model`` (default ``text-embedding-3-large``,
    `SemanticDatabase.cs:29-32,76-80`).

    The actual network call is NOT implemented here (no network in this
    environment, and tests/oracles must never depend on one —
    SURVEY.md §5.2): ``embed_batch`` raises unless a ``transport`` callable
    (texts, model, api_key) -> (n, dim) float32 is injected. Everything
    else — batching via the Arrow pandas_udf, unit-norm contract, the
    per-batch (not per-item) call pattern — is real.
    """

    DEFAULT_MODEL = "text-embedding-3-large"  # SemanticDatabase.cs:31

    def __init__(
        self,
        api_key: str | None = None,
        model: str = DEFAULT_MODEL,
        dim: int = 3072,
        transport=None,
    ):
        self.api_key = api_key
        self.model = model
        self.dim = dim
        self._transport = transport

    def embed_batch(self, texts: list[str]) -> "np.ndarray":
        if self._transport is None:
            raise NotImplementedError(
                "no embedding network transport in this environment — inject "
                "transport=(texts, model, api_key) -> ndarray, or use "
                "DeterministicEmbedder for tests"
            )
        out = np.asarray(self._transport(texts, self.model, self.api_key), dtype=np.float64)
        if out.shape != (len(texts), self.dim):
            raise ValueError(f"transport returned {out.shape}, expected {(len(texts), self.dim)}")
        # enforce the engine-wide unit-norm contract (dot == cosine,
        # SURVEY.md §2.C.1) rather than trusting the transport: a provider
        # returning unnormalized vectors would silently skew every ranking.
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return (out / norms).astype(np.float32)


def embed_udf(embedder: Embedder):
    """Wrap an embedder as an Arrow-batched pandas_udf returning
    array<float>. This is the ONLY Python-UDF hot path in the core engine
    (the reference's one 'UDF' is likewise its embedding call —
    `SemanticDatabase.cs:162`); everything downstream stays JVM-side."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        mat = embedder.embed_batch(texts.fillna("").astype(str).tolist())
        return pd.Series(list(mat))

    return _embed
