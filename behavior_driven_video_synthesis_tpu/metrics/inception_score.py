"""Inception Score from class-probability predictions.

Math matches reference lib/metrics.py:362-415: mean-KL(p(y|x) || p(y)) per
split, exponentiated; returns (mean, std) over splits.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def inception_score_from_probs(probs: np.ndarray, splits: int = 1):
    """probs: (N, n_classes) softmax outputs."""
    probs = np.asarray(probs)
    N = probs.shape[0]
    scores = []
    for k in range(splits):
        part = probs[k * (N // splits):(k + 1) * (N // splits)]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(py + 1e-12))
        scores.append(float(np.exp(kl.sum(axis=1).mean())))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score_from_logits(logits, splits: int = 1):
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    return inception_score_from_probs(probs, splits)
