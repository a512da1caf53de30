"""Criterion registry and the default cross-entropy.

Criterion contract (framework-wide): ``criterion(outputs: dict, batch: dict)
-> scalar loss`` where ``outputs`` is the model's output dict (contains at
least 'logits') and ``batch`` has 'label' (int [B]) or soft 'label' [B, C].
Built from ``config.train.criterion`` by name; the reference's default is
``CrossEntropyLoss(label_smoothing=0.1)`` (``train.py:211-212``).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..registry import LOSS


def cross_entropy(logits, labels, label_smoothing=0.0, weights=None):
    """CE over int or soft labels; ``weights`` [B] masks padded samples."""
    c = logits.shape[-1]
    if labels.ndim == logits.ndim:  # soft labels (mixup/cutmix)
        target = labels.astype(jnp.float32)
    else:
        import jax

        target = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    if label_smoothing:
        target = target * (1.0 - label_smoothing) + label_smoothing / c
    losses = optax.softmax_cross_entropy(logits, target)
    if weights is None:
        return losses.mean()
    w = weights.astype(jnp.float32)
    return (losses * w).sum() / jnp.maximum(w.sum(), 1.0)


class CrossEntropyLoss:
    """Label-smoothed softmax cross entropy on ``outputs['logits']``."""

    def __init__(self, config=None):
        cfg = config or {}
        self.label_smoothing = float(
            cfg.get("label_smoothing", 0.1) if hasattr(cfg, "get") else 0.1)

    def __call__(self, outputs, batch):
        return cross_entropy(outputs["logits"], batch["label"],
                             self.label_smoothing, weights=batch.get("weight"))


LOSS.register(CrossEntropyLoss, name="CrossEntropyLoss")


def build_criterion(criterion_config):
    # late imports: loss modules register themselves on import
    from . import apinet  # noqa: F401
    from . import cin  # noqa: F401
    from . import crossx  # noqa: F401
    from . import dcl  # noqa: F401
    from . import mamc  # noqa: F401
    from . import pair_confusion  # noqa: F401
    from . import peer_learning  # noqa: F401
    from . import nts  # noqa: F401
    from . import s3n  # noqa: F401
    from . import interp_parts  # noqa: F401
    from . import mge  # noqa: F401
    from . import apcnn  # noqa: F401
    from . import prototree  # noqa: F401

    if criterion_config is None or "name" not in criterion_config:
        return CrossEntropyLoss()
    return LOSS.get(criterion_config.name)(criterion_config)
