"""Pure-numpy neural kernels: FFN, biaffine, softmax, stable hashing.

These are the math primitives of SURVEY.md §2.7 X5 — the fork-specific
**biaffine** form ``x1ᵀ W_l x2 + w_l·[x1;x2] + b_l`` [BASELINE] plus the
feedforward / softmax / sigmoid building blocks of the model modules
(ref:dygie/models/*). All float32 with a fixed reduction order so the
decode is bit-deterministic across partitionings (SURVEY.md §4.3).

The north_star slots TorchScript here on a real cluster; in this
sandbox (no torch) numpy implements the identical math behind the same
function signatures, so the swap is local to this module.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def fnv1a64(data: bytes) -> int:
    """Stable 64-bit FNV-1a hash (python ``hash`` is seed-randomized and
    therefore unusable for reproducible token bucketing)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def token_ids(tokens: list[str], n_buckets: int) -> np.ndarray:
    """Hash tokens into embedding buckets. Retained as the cheap
    hashed-bucket indexer (and to keep the weight-fixture draw order
    stable); the decode path now uses kernel/wordpiece.py greedy
    segmentation + mean-pool for X3."""
    return np.fromiter(
        (fnv1a64(t.encode("utf-8")) % n_buckets for t in tokens),
        dtype=np.int64,
        count=len(tokens),
    )


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, F32(0))


def gelu(x: np.ndarray) -> np.ndarray:
    """GELU, tanh approximation (the BERT-family FFN activation;
    ref:dygie embedder transformer blocks). float32, fixed reduction
    order — deterministic across partitionings like the rest of the
    kernel."""
    x = x.astype(F32)
    c = F32(0.7978845608028654)  # sqrt(2/pi)
    return (F32(0.5) * x
            * (F32(1) + np.tanh(c * (x + F32(0.044715) * x * x * x)))
            ).astype(F32)


def sigmoid(x: np.ndarray) -> np.ndarray:
    return F32(1) / (F32(1) + np.exp(-x.astype(F32)))


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    x = x.astype(F32)
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def layer_norm(x: np.ndarray, g: np.ndarray,
               b: np.ndarray, eps: float = 1e-5) -> np.ndarray:
    """LayerNorm over the last axis (the transformer-block normalizer
    the reference's BERT-style embedder applies around attention and
    FFN sublayers). float32, fixed reduction order."""
    x = x.astype(F32)
    mu = x.mean(axis=-1, keepdims=True)
    var = np.square(x - mu).mean(axis=-1, keepdims=True)
    return ((x - mu) / np.sqrt(var + F32(eps)) * g + b).astype(F32)


def ffn(x: np.ndarray, w1: np.ndarray, b1: np.ndarray, w2: np.ndarray,
        b2: np.ndarray) -> np.ndarray:
    """Two-layer feedforward scorer (the upstream pair/mention scorer
    shape, ref:dygie/models/entity_beam_pruner.py::Pruner)."""
    h = relu(x.astype(F32) @ w1 + b1)
    return h @ w2 + b2


def biaffine(x1: np.ndarray, x2: np.ndarray, u: np.ndarray,
             w: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Biaffine pair scorer [BASELINE — the fork's scorer form].

    x1: [n1, d1], x2: [n2, d2], u: [L, d1, d2], w: [L, d1 + d2], b: [L]
    returns logits [n1, n2, L]:
        logit[i,j,l] = x1[i]ᵀ u[l] x2[j] + w[l]·[x1[i]; x2[j]] + b[l]
    """
    x1 = x1.astype(F32)
    x2 = x2.astype(F32)
    # bil[i,j,l] = x1[i] @ u[l] @ x2[j], via two matmuls (no einsum
    # path-search overhead): [n1,L,d2] = tensordot(x1,u) ; @ x2.T
    tmp = np.tensordot(x1, u, axes=([1], [1]))    # [n1, L, d2]
    bil = np.matmul(tmp, x2.T).transpose(0, 2, 1)  # [n1, n2, L]
    d1 = x1.shape[1]
    lin1 = x1 @ w[:, :d1].T          # [n1, L]
    lin2 = x2 @ w[:, d1:].T          # [n2, L]
    return bil + lin1[:, None, :] + lin2[None, :, :] + b[None, None, :]


def bilinear_scalar(x1: np.ndarray, x2: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Scalar bilinear compatibility x1ᵀ U x2 -> [n1, n2] (the coref
    antecedent scorer core, ref:dygie/models/coref.py::CorefResolver)."""
    return (x1.astype(F32) @ u) @ x2.astype(F32).T
