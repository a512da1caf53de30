"""Loss-level numerical parity vs the reference criteria (VERDICT r1 item 1).

Each test feeds identical random tensors to the reference torch criterion
and our jax criterion and asserts the scalar losses agree. The reference
losses hard-code ``.cuda()`` in places (``NTS_loss.py:39``,
``InterpParts_loss.py:78``); those calls are monkeypatched to no-ops so the
reference math runs on CPU unchanged.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import hawkeye_tpu.models  # noqa: F401

# In the default tier (part of its measured ~62 min); deselectable for the
# quick tier with -m "not slow and not parity" (see pytest.ini).
pytestmark = pytest.mark.parity

from refutil import RefCfg, load_reference

torch = pytest.importorskip("torch")


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """Neutralize .cuda()/.cuda(device) and torch.cuda.FloatTensor."""
    load_reference()
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.cuda, "FloatTensor", torch.FloatTensor,
                        raising=False)
    return None


def _r(shape, seed=0, scale=1.0):
    return (np.random.RandomState(seed).randn(*shape) * scale).astype(np.float32)


def test_mamc_loss_parity():
    load_reference()
    from model.loss.MAMC_loss import MAMCLoss as RefMAMC

    from hawkeye_tpu.losses.mamc import MAMCLoss

    b, p, d, c = 6, 2, 8, 4
    logits = _r((b, c), 1)
    parts = _r((b, p, d), 2)
    labels = np.array([0, 0, 1, 1, 2, 2])

    ref = RefMAMC(RefCfg({"lambda_a": 0.5}))
    with torch.no_grad():
        ref_val = ref((torch.from_numpy(logits), torch.from_numpy(parts)),
                      torch.from_numpy(labels)).item()
    mine = MAMCLoss({"lambda_a": 0.5})(
        {"logits": jnp.asarray(logits), "parts": jnp.asarray(parts)},
        {"label": jnp.asarray(labels)})
    assert np.isclose(float(mine), ref_val, rtol=1e-5), (float(mine), ref_val)


def test_nts_loss_parity(cpu_cuda):
    from model.loss.NTS_loss import NTSLoss as RefNTS

    from hawkeye_tpu.losses.nts import NTSLoss

    b, m, c = 3, 4, 5
    raw = _r((b, c), 1)
    concat = _r((b, c), 2)
    part = _r((b, m, c), 3)
    top_prob = _r((b, m), 4)
    labels = np.array([0, 2, 4])

    ref = RefNTS(RefCfg({"proposal_num": m}))
    with torch.no_grad():
        ref_val = ref((torch.from_numpy(raw), torch.from_numpy(concat),
                       torch.from_numpy(part), None,
                       torch.from_numpy(top_prob)),
                      torch.from_numpy(labels)).item()
    mine = NTSLoss()(
        {"raw_logits": jnp.asarray(raw), "logits": jnp.asarray(concat),
         "part_logits": jnp.asarray(part), "top_prob": jnp.asarray(top_prob)},
        {"label": jnp.asarray(labels)})
    assert np.isclose(float(mine), ref_val, rtol=1e-5), (float(mine), ref_val)


def test_apinet_loss_parity():
    load_reference()
    from model.loss.APINet_loss import APINetLoss as RefLoss

    from hawkeye_tpu.losses.apinet import APINetLoss

    b2, c = 8, 5  # 2N pair rows
    self_logits = _r((2 * b2, c), 1)
    other_logits = _r((2 * b2, c), 2)
    l1 = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    l2 = np.array([1, 0, 3, 2, 2, 3, 0, 1])

    ref = RefLoss(RefCfg({}))
    with torch.no_grad():
        ref_val = ref((torch.from_numpy(self_logits),
                       torch.from_numpy(other_logits),
                       torch.from_numpy(l1), torch.from_numpy(l2)),
                      None).item()
    mine = APINetLoss()(
        {"self_logits": jnp.asarray(self_logits),
         "other_logits": jnp.asarray(other_logits),
         "pair_labels": jnp.asarray(np.concatenate([l1, l2]))},
        {"label": None})
    assert np.isclose(float(mine), ref_val, rtol=1e-5), (float(mine), ref_val)


def test_multismooth_loss_parity():
    load_reference()
    from model.loss.S3N_loss import MultiSmoothLoss as RefLoss

    from hawkeye_tpu.losses.s3n import MultiSmoothLoss

    b, c = 4, 6
    heads = [_r((b, c), s) for s in range(4)]
    labels = np.array([0, 2, 4, 5])

    ref = RefLoss(RefCfg({"smooth_ratio": 0.85}))
    ref_val = ref(tuple(torch.from_numpy(h) for h in heads),
                  torch.from_numpy(labels)).item()
    mine = MultiSmoothLoss({"smooth_ratio": 0.85})(
        {"logits": jnp.asarray(heads[0]), "agg_origin": jnp.asarray(heads[1]),
         "agg_sampler": jnp.asarray(heads[2]),
         "agg_sampler1": jnp.asarray(heads[3])},
        {"label": jnp.asarray(labels)})
    assert np.isclose(float(mine), ref_val, rtol=1e-5), (float(mine), ref_val)


def test_crossx_loss_parity():
    load_reference()
    from model.loss.CrossX_loss import CrossXLoss as RefLoss

    from hawkeye_tpu.losses.crossx import CrossXLoss

    b, c, d, p = 4, 5, 16, 2
    xf, xp, xc = _r((b, c), 1), _r((b, c), 2), _r((b, c), 3)
    ulti = np.abs(_r((b, p, d), 4)) + 0.1  # positive features like pooled relu
    plty = np.abs(_r((b, p, d), 5)) + 0.1
    cmbn = np.abs(_r((b, p, d), 6)) + 0.1
    labels = np.array([0, 1, 2, 3])
    gamma = [0.5, 0.25, 0.75]

    ref = RefLoss(RefCfg({"num_parts": p, "gamma": gamma}))
    to_t = lambda a: [torch.from_numpy(a[:, i]).reshape(b, d, 1, 1)  # noqa: E731
                      for i in range(p)]
    with torch.no_grad():
        ref_val = ref((torch.from_numpy(xf), torch.from_numpy(xp),
                       torch.from_numpy(xc), to_t(ulti), to_t(plty),
                       to_t(cmbn)), torch.from_numpy(labels)).item()
    mine = CrossXLoss({"num_parts": p, "gamma": gamma})(
        {"logits_ulti": jnp.asarray(xf), "logits_plty": jnp.asarray(xp),
         "logits_cmbn": jnp.asarray(xc), "ulti_parts": jnp.asarray(ulti),
         "plty_parts": jnp.asarray(plty), "cmbn_parts": jnp.asarray(cmbn)},
        {"label": jnp.asarray(labels)})
    assert np.isclose(float(mine), ref_val, rtol=1e-4), (float(mine), ref_val)


def test_dcl_loss_parity():
    load_reference()
    from model.loss.DCL_loss import DCLLoss as RefLoss

    from hawkeye_tpu.losses.dcl import DCLLoss

    b, c, k = 4, 5, 8
    logits = _r((b, c), 1)
    swap_logits = _r((b, 2), 2)
    mask = np.tanh(_r((b, k), 3))
    swap_law = np.tanh(_r((b, k), 4))
    labels = np.array([0, 1, 2, 3])
    label_swap = np.array([0, 1, 0, 1])

    ref = RefLoss(RefCfg({"alpha": 1.0, "beta": 0.5, "gamma": 0.1}))
    with torch.no_grad():
        ref_val = ref([torch.from_numpy(logits), torch.from_numpy(swap_logits),
                       torch.from_numpy(mask)],
                      torch.from_numpy(labels), torch.from_numpy(label_swap),
                      torch.from_numpy(swap_law)).item()
    mine = DCLLoss({"alpha": 1.0, "beta": 0.5, "gamma": 0.1})(
        {"logits": jnp.asarray(logits), "swap_logits": jnp.asarray(swap_logits),
         "mask": jnp.asarray(mask)},
        {"label": jnp.asarray(labels), "label_swap": jnp.asarray(label_swap),
         "swap_law": jnp.asarray(swap_law)})
    assert np.isclose(float(mine), ref_val, rtol=1e-5), (float(mine), ref_val)


def test_pair_confusion_loss_parity():
    load_reference()
    from model.loss.pair_confusion import PairwiseConfusionLoss as RefLoss

    from hawkeye_tpu.losses.pair_confusion import PairwiseConfusionLoss

    b, c = 6, 5
    logits = _r((b, c), 1)
    labels = np.array([0, 1, 2, 2, 1, 4])

    ref = RefLoss(RefCfg({"lambda_a": 10}))
    with torch.no_grad():
        ref_val = ref(torch.from_numpy(logits),
                      torch.from_numpy(labels)).item()
    mine = PairwiseConfusionLoss({"lambda_a": 10})(
        {"logits": jnp.asarray(logits)}, {"label": jnp.asarray(labels)})
    assert np.isclose(float(mine), ref_val, rtol=1e-5), (float(mine), ref_val)


def test_interp_parts_loss_parity(cpu_cuda):
    import model.loss.InterpParts_loss as ref_mod

    from hawkeye_tpu.losses.interp_parts import InterpPartsLoss

    b, k, h, c = 4, 5, 9, 6
    logits = _r((b, c), 1)
    assign = np.abs(_r((b, k, h, h), 2))  # softmax-ish positive maps
    assign /= assign.sum(axis=1, keepdims=True)
    labels = np.array([0, 1, 2, 3])

    ref_mod.prev_bs = 0  # reset the module-global prior cache
    cfg = {"radius": 2, "std": 0.4, "num_parts": k, "alpha": 1.0,
           "beta": 0.001, "coeff": 0.5}
    ref = ref_mod.InterpPartsLoss(RefCfg(cfg))
    with torch.no_grad():
        ref_val = ref((torch.from_numpy(logits), None,
                       torch.from_numpy(assign)),
                      torch.from_numpy(labels)).item()
    mine = InterpPartsLoss(cfg)(
        {"logits": jnp.asarray(logits),
         "assign": jnp.asarray(assign.transpose(0, 2, 3, 1))},
        {"label": jnp.asarray(labels)})
    assert np.isclose(float(mine), ref_val, rtol=1e-4), (float(mine), ref_val)


def test_peer_learning_loss_parity():
    load_reference()
    from model.loss.peer_learning_loss import PeerLearningLoss as ref_fn

    from hawkeye_tpu.losses.peer_learning import peer_learning_losses

    b, c = 12, 6
    logits1 = _r((b, c), 1)
    logits2 = _r((b, c), 2)
    # force a mix of agreement/disagreement
    logits2[:5] = logits1[:5]
    labels = np.random.RandomState(3).randint(0, c, size=b)

    for drop_rate in (0.0, 0.25, 0.5):
        l1_ref, l2_ref = ref_fn(torch.from_numpy(logits1),
                                torch.from_numpy(logits2),
                                torch.from_numpy(labels), drop_rate)
        l1, l2 = peer_learning_losses(jnp.asarray(logits1),
                                      jnp.asarray(logits2),
                                      jnp.asarray(labels), drop_rate)
        assert np.isclose(float(l1), l1_ref.item(), rtol=1e-5), drop_rate
        assert np.isclose(float(l2), l2_ref.item(), rtol=1e-5), drop_rate
