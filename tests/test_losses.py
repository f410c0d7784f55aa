"""Loss-library tests: jit-ability, finite gradients, hand goldens, and
differential parity against the reference torch implementations."""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cldrd_tpu.losses import (
    bweight_lambda_mrr_loss,
    kl_div_loss,
    lambda_loss,
    lambda_mrr_loss,
    margin_mse_loss,
    ranknet_loss,
    weighted_pointwise_loss,
)

from conftest import REFERENCE_ROOT, reference_available


def _load_ref_module(name):
    path = os.path.join(REFERENCE_ROOT, "losses", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# -------------------------------------------------------------- hand goldens

Y_TRUE = np.array([[1.0, 0.5, 0.0, 0.0], [1.0, 0.5, 0.0, 0.0]], np.float32)
Y_PERFECT = np.array([[2.01, 1.23, 1.02, 0.4], [3.12, 1.04, 1.02, 0.45]], np.float32)
Y_SHUFFLED = np.array([[1.23, 2.01, 0.4, 1.02], [0.45, 1.04, 1.02, 3.12]], np.float32)


def test_lambda_mrr_ordering_sensitivity():
    """A perfectly ordered prediction must incur lower loss than a shuffled one."""
    perfect = float(lambda_mrr_loss(jnp.array(Y_PERFECT), jnp.array(Y_TRUE)))
    shuffled = float(lambda_mrr_loss(jnp.array(Y_SHUFFLED), jnp.array(Y_TRUE)))
    assert perfect < shuffled


def test_margin_mse_golden():
    # reference losses/margin_mse.py:21-26 __main__ tensors
    m_s = jnp.array([[2.0, 1.0, 1.0], [3.0, 1.5, 2.5]])
    m_t = jnp.array([[2.5, 1.5, 2.0], [3.0, 2.0, 2.5]])
    # hand computation: mean over 2x3x3 pair-difference errors
    ds = np.array(m_s)[:, :, None] - np.array(m_s)[:, None, :]
    dt = np.array(m_t)[:, :, None] - np.array(m_t)[:, None, :]
    expected = ((ds - dt) ** 2).mean()
    assert float(margin_mse_loss(m_s, m_t)) == pytest.approx(float(expected), rel=1e-6)


def test_kl_div_matches_scipy_formula():
    m_s = np.array([[2.0, 1.0, 1.0], [3.0, 1.5, 2.5]], np.float64)
    m_t = np.array([[2.5, 1.5, 2.0], [3.0, 2.0, 2.5]], np.float64)
    p = np.exp(m_s) / np.exp(m_s).sum(-1, keepdims=True)
    q = np.exp(m_t) / np.exp(m_t).sum(-1, keepdims=True)
    expected = (q * (np.log(q) - np.log(p))).sum() / 2
    got = float(kl_div_loss(jnp.array(m_s), jnp.array(m_t)))
    # jnp computes in float32 (x64 disabled) — tolerance accounts for that
    assert got == pytest.approx(expected, rel=1e-3)


def test_weighted_pointwise_golden():
    y_w = jnp.array([[1.0, 0.5, 1 / 3, 0.0, 0.0, 0.0, 0.0]])
    y_p = jnp.array([[2.3, 1.2, 1.1, 0.5, 0.23, 0.0, 40.0]])
    expected = np.mean(np.log1p(np.exp(-np.array(y_p))) * np.array(y_w))
    assert float(weighted_pointwise_loss(y_p, y_w)) == pytest.approx(float(expected), rel=1e-3)


# ----------------------------------------------------------------- jit + grad

def test_losses_jit_and_grad_finite():
    rng = np.random.default_rng(1)
    y_pred = jnp.array(rng.normal(100, 2, (4, 30)), jnp.float32)
    y_true = jnp.array(np.sort(rng.uniform(0, 8, (4, 30)))[:, ::-1].copy(), jnp.float32)

    for fn in [lambda_mrr_loss, ranknet_loss]:
        loss, grad = jax.jit(jax.value_and_grad(lambda p: fn(p, y_true)))(y_pred)
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.array(grad)))

    loss, grad = jax.jit(
        jax.value_and_grad(
            lambda p: lambda_loss(p, y_true, weighing_scheme="ndcgLoss1_scheme")
        )
    )(y_pred)
    assert np.isfinite(float(loss)) and np.all(np.isfinite(np.array(grad)))


def test_lambda_mrr_padding_grad_finite():
    """Padded slots (-1) must not poison the gradient with nan."""
    y_true = jnp.array([[1.0, 0.5, -1.0, -1.0]])
    y_pred = jnp.array([[1.0, 2.0, 0.3, 0.4]])
    loss, grad = jax.value_and_grad(lambda p: lambda_mrr_loss(p, y_true))(y_pred)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.array(grad)))
    # padded positions must receive zero gradient
    assert np.array(grad)[0, 2] == 0.0 and np.array(grad)[0, 3] == 0.0


# ------------------------------------------------- differential vs reference

@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
class TestDifferential:
    def _rand(self, bz=3, n=30, seed=0):
        rng = np.random.default_rng(seed)
        y_pred = rng.normal(100, 2, (bz, n)).astype(np.float32)
        y_true = np.sort(rng.uniform(0, 8, (bz, n)), axis=-1)[:, ::-1].astype(np.float32).copy()
        return y_pred, y_true

    def test_lambda_mrr(self):
        import torch

        ref = _load_ref_module("lambda_rank")
        for seed in range(3):
            y_pred, y_true = self._rand(seed=seed)
            want = float(ref.lambda_mrr_loss(torch.tensor(y_pred), torch.tensor(y_true)))
            got = float(lambda_mrr_loss(jnp.array(y_pred), jnp.array(y_true)))
            assert got == pytest.approx(want, rel=1e-4)
            want = float(
                ref.lambda_mrr_loss(torch.tensor(y_pred), torch.tensor(y_true), reduction="sum")
            )
            got = float(lambda_mrr_loss(jnp.array(y_pred), jnp.array(y_true), reduction="sum"))
            assert got == pytest.approx(want, rel=1e-4)

    def test_lambda_mrr_with_padding(self):
        import torch

        ref = _load_ref_module("lambda_rank")
        y_pred, y_true = self._rand(seed=7)
        y_true[:, -5:] = -1.0
        want = float(ref.lambda_mrr_loss(torch.tensor(y_pred), torch.tensor(y_true)))
        got = float(lambda_mrr_loss(jnp.array(y_pred), jnp.array(y_true)))
        assert got == pytest.approx(want, rel=1e-4)

    def test_bweight_lambda_mrr(self):
        import torch

        ref = _load_ref_module("lambda_rank")
        y_pred, y_true = self._rand(seed=2)
        bw = np.array([0.9, 1.3, 0.5], np.float32)
        want = float(
            ref.bweight_lambda_mrr_loss(
                torch.tensor(y_pred), torch.tensor(y_true), torch.tensor(bw)
            )
        )
        got = float(
            bweight_lambda_mrr_loss(jnp.array(y_pred), jnp.array(y_true), jnp.array(bw))
        )
        assert got == pytest.approx(want, rel=1e-4)

    def test_ranknet(self):
        import torch

        ref = _load_ref_module("ranknet")
        y_pred, y_true = self._rand(seed=3)
        want = float(ref.ranknet_loss(torch.tensor(y_pred), torch.tensor(y_true)))
        got = float(ranknet_loss(jnp.array(y_pred), jnp.array(y_true)))
        assert got == pytest.approx(want, rel=1e-4)

    @pytest.mark.parametrize(
        "scheme",
        [
            None,
            "ndcgLoss1_scheme",
            "ndcgLoss2_scheme",
            "lambdaRank_scheme",
            "ndcgLoss2PP_scheme",
            "rankNet_scheme",
            "rankNetWeightedByGTDiff_scheme",
            "rankNetWeightedByGTDiffPowed_scheme",
        ],
    )
    def test_lambda_loss_schemes(self, scheme):
        import torch

        ref = _load_ref_module("standard_lambda_rank")
        y_pred, y_true = self._rand(seed=4, n=10)
        # scale labels down so 2**label stays small for power gain
        y_true = (y_true / 2).astype(np.float32)
        want = float(
            ref.lambda_loss(
                torch.tensor(y_pred), torch.tensor(y_true), weighing_scheme=scheme
            )
        )
        got = float(
            lambda_loss(jnp.array(y_pred), jnp.array(y_true), weighing_scheme=scheme)
        )
        assert got == pytest.approx(want, rel=1e-3), scheme

    @pytest.mark.parametrize("k", [3, 5, None])
    @pytest.mark.parametrize("reduction_log", ["natural", "binary"])
    def test_lambda_loss_k_and_log(self, k, reduction_log):
        import torch

        ref = _load_ref_module("standard_lambda_rank")
        y_pred, y_true = self._rand(seed=5, n=10)
        y_true = (y_true / 2).astype(np.float32)
        want = float(
            ref.lambda_loss(
                torch.tensor(y_pred),
                torch.tensor(y_true),
                weighing_scheme="ndcgLoss1_scheme",
                k=k,
                reduction_log=reduction_log,
            )
        )
        got = float(
            lambda_loss(
                jnp.array(y_pred),
                jnp.array(y_true),
                weighing_scheme="ndcgLoss1_scheme",
                k=k,
                reduction_log=reduction_log,
            )
        )
        assert got == pytest.approx(want, rel=1e-3)

    def test_lambda_loss_padding(self):
        import torch

        ref = _load_ref_module("standard_lambda_rank")
        y_pred, y_true = self._rand(seed=6, n=10)
        y_true = (y_true / 2).astype(np.float32)
        y_true[:, -3:] = -1.0
        for scheme in ["ndcgLoss1_scheme", "lambdaRank_scheme"]:
            want = float(
                ref.lambda_loss(
                    torch.tensor(y_pred), torch.tensor(y_true), weighing_scheme=scheme
                )
            )
            got = float(
                lambda_loss(jnp.array(y_pred), jnp.array(y_true), weighing_scheme=scheme)
            )
            assert got == pytest.approx(want, rel=1e-3), scheme

    def test_margin_mse_and_kl(self):
        import torch

        ref_mse = _load_ref_module("margin_mse")
        ref_kl = _load_ref_module("kl_div")
        m_s = np.random.default_rng(8).normal(0, 2, (4, 8)).astype(np.float32)
        m_t = np.random.default_rng(9).normal(0, 2, (4, 8)).astype(np.float32)
        want = float(ref_mse.MarginMSE()(torch.tensor(m_s), torch.tensor(m_t)))
        got = float(margin_mse_loss(jnp.array(m_s), jnp.array(m_t)))
        assert got == pytest.approx(want, rel=1e-4)

        for T in [1.0, 50.0]:
            want = float(ref_kl.KLDiv(T=T)(torch.tensor(m_s), torch.tensor(m_t)))
            got = float(kl_div_loss(jnp.array(m_s), jnp.array(m_t), T=T))
            # high-T softmax is cancellation-heavy in fp32 — allow small abs slack
            assert got == pytest.approx(want, rel=1e-3, abs=1e-5)

    def test_weighted_pointwise(self):
        import torch

        ref = _load_ref_module("weighted_pointwise")
        y_p = np.random.default_rng(10).normal(0, 3, (4, 8)).astype(np.float32)
        y_w = np.abs(np.random.default_rng(11).normal(0, 1, (4, 8))).astype(np.float32)
        for T in [1.0, 10.0]:
            want = float(
                ref.weighted_pointwise_loss(torch.tensor(y_p), torch.tensor(y_w), T=T)
            )
            got = float(weighted_pointwise_loss(jnp.array(y_p), jnp.array(y_w), T=T))
            assert got == pytest.approx(want, rel=1e-4)
