"""Peer-Learning: webly-supervised co-teaching of two peer networks.

Reference: ``model/methods/PeerLearningNet.py`` — two copies of a nested base
model (BCNN in the shipped configs, built from ``config.base_model``), the
second with a re-initialized classifier; both see every batch and exchange
small-loss samples (``model/loss/peer_learning_loss.py``).
"""

from __future__ import annotations

import flax.linen as nn

from ...registry import MODEL


class PeerLearningNet(nn.Module):
    base_config: dict

    def setup(self):
        from ...config import ConfigNode

        base_cfg = ConfigNode(
            {k: v for k, v in dict(self.base_config).items()})
        self.base_model = MODEL.get(base_cfg["name"])(base_cfg)
        self.base_model2 = MODEL.get(base_cfg["name"])(base_cfg)

    def __call__(self, x, train: bool = False):
        out1 = self.base_model(x, train=train)
        out2 = self.base_model2(x, train=train)
        return {
            # mean of peers for default accuracy reporting; the reference
            # tracks acc1/acc2/max separately (Examples/PeerLearning.py:25-39)
            "logits": (out1["logits"] + out2["logits"]) / 2.0,
            "logits1": out1["logits"],
            "logits2": out2["logits"],
        }


@MODEL.register(name="PeerLearningNet")
def build_peer_learning(config):
    from ...config import ConfigNode

    base = config.base_model
    if isinstance(base, ConfigNode):
        base = base.clone().defrost()
    return PeerLearningNet(base_config=dict(base))
