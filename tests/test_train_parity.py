"""Step-for-step differential training parity vs the reference math.

The strongest available proxy for training-quality parity while real
MS MARCO data / TAS-B weights are unobtainable in this environment (zero
network egress; see BASELINE.md): run the reference's exact training math
in torch — dual DistilBERT towers, CLS-dot logits, the reference's own
``lambda_mrr_loss`` loaded from ``/root/reference/losses/lambda_rank.py``,
AdamW with no-decay groups (``nway_listwise_1.py:257-266``), linear warmup
(HF ``get_linear_schedule_with_warmup``), clip 1.0, scheduler-after-step —
against our jitted SPMD train step, from IDENTICAL initial weights on
IDENTICAL batches, and require the loss trajectories and final parameters
to coincide.
"""
import importlib.util
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

torch = pytest.importorskip("torch")
import transformers  # noqa: E402

from cldrd_tpu.models import (  # noqa: E402
    DistilBertConfig,
    NwayDualEncoder,
    dual_encoder_flax_to_torch,
)
from cldrd_tpu.parallel import DATA_AXIS, make_mesh  # noqa: E402
from cldrd_tpu.train import TrainConfig, Trainer, make_train_step  # noqa: E402

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not present"
)

# dropout off on both sides: torch and JAX PRNGs cannot be aligned
CFG = DistilBertConfig.tiny(dropout=0.0, attention_dropout=0.0)

BZ, NWAY, LQ, LP = 4, 6, 8, 10
STEPS = 8
LR, WARMUP, WD, EPS, CLIP = 5e-4, 2, 0.01, 1e-8, 1.0


def _load_ref_lambda_mrr():
    path = os.path.join(REFERENCE_ROOT, "losses", "lambda_rank.py")
    spec = importlib.util.spec_from_file_location("ref_lambda_rank", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.lambda_mrr_loss


class TorchDualTower(torch.nn.Module):
    """The reference ``NwayDualEncoder`` semantics
    (``models/nway_dual_encoder.py:6-67``): two DistilBERT towers, CLS
    pooling, dot-product scores over flattened n-way passages."""

    def __init__(self, hf_cfg):
        super().__init__()
        self.query_encoder = transformers.DistilBertModel(hf_cfg)
        self.passage_encoder = transformers.DistilBertModel(hf_cfg)

    def forward(self, queries, nway_passages):
        q = self.query_encoder(**queries).last_hidden_state[:, 0, :]
        bz, nway, lp = nway_passages["input_ids"].shape
        flat = {k: v.reshape(bz * nway, lp) for k, v in nway_passages.items()}
        p = self.passage_encoder(**flat).last_hidden_state[:, 0, :]
        p = p.reshape(bz, nway, -1)
        return torch.sum(q.unsqueeze(1) * p, dim=-1)


def _make_batches(rng):
    """STEPS fixed batches of token ids + graded labels (mode-8 style:
    1/rank for 2 relT + -0.25/-0.5 negatives)."""
    labels_row = np.array([1.0, 0.5, -0.25, -0.25, -0.5, -0.5], np.float32)
    batches = []
    for _ in range(STEPS):
        q_ids = rng.integers(1, CFG.vocab_size, (BZ, LQ)).astype(np.int32)
        p_ids = rng.integers(1, CFG.vocab_size, (BZ, NWAY, LP)).astype(np.int32)
        batches.append(
            {
                "query": {
                    "input_ids": q_ids,
                    "attention_mask": np.ones((BZ, LQ), np.int32),
                },
                "nway_passages": {
                    "input_ids": p_ids,
                    "attention_mask": np.ones((BZ, NWAY, LP), np.int32),
                },
                "labels": np.tile(labels_row, (BZ, 1)),
            }
        )
    return batches


def _run_reference_torch(flax_params, batches):
    """The reference training loop, faithfully: AdamW no-decay groups,
    linear warmup, clip-then-step, scheduler.step() after optimizer.step()
    (``nway_listwise_1.py:257-266, 351-367``)."""
    ref_loss = _load_ref_lambda_mrr()
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=CFG.vocab_size,
        max_position_embeddings=CFG.max_position_embeddings,
        dim=CFG.dim,
        n_layers=CFG.n_layers,
        n_heads=CFG.n_heads,
        hidden_dim=CFG.hidden_dim,
        dropout=0.0,
        attention_dropout=0.0,
    )
    model = TorchDualTower(hf_cfg)
    sd = dual_encoder_flax_to_torch(flax_params)
    model.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    model.train()

    no_decay = ["bias", "LayerNorm.weight"]
    groups = [
        {
            "params": [p for n, p in model.named_parameters()
                       if not any(nd in n for nd in no_decay)],
            "weight_decay": WD,
        },
        {
            "params": [p for n, p in model.named_parameters()
                       if any(nd in n for nd in no_decay)],
            "weight_decay": 0.0,
        },
    ]
    optimizer = torch.optim.AdamW(groups, lr=LR, eps=EPS)
    scheduler = transformers.get_linear_schedule_with_warmup(
        optimizer, num_warmup_steps=WARMUP, num_training_steps=STEPS
    )

    losses = []
    for batch in batches:
        queries = {
            "input_ids": torch.tensor(batch["query"]["input_ids"], dtype=torch.long),
            "attention_mask": torch.tensor(
                batch["query"]["attention_mask"], dtype=torch.long
            ),
        }
        passages = {
            "input_ids": torch.tensor(
                batch["nway_passages"]["input_ids"], dtype=torch.long
            ),
            "attention_mask": torch.tensor(
                batch["nway_passages"]["attention_mask"], dtype=torch.long
            ),
        }
        logits = model(queries, passages)
        loss = ref_loss(logits, torch.tensor(batch["labels"]))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        optimizer.step()
        scheduler.step()
        optimizer.zero_grad()
        losses.append(float(loss))
    final = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    return losses, final


def _run_ours(flax_params, batches, tmp_path):
    cfg = TrainConfig(
        label_mode="1",
        batch_size=BZ,
        num_train_epochs=1,
        learning_rate=LR,
        warmup_steps=WARMUP,
        weight_decay=WD,
        adam_epsilon=EPS,
        max_grad_norm=CLIP,
        max_query_len=LQ,
        max_passage_len=LP,
        compute_dtype="float32",
        run_folder=str(tmp_path),
        experiment_name="parity",
    )
    mesh = make_mesh(1, DATA_AXIS)
    trainer = Trainer(cfg, CFG, mesh=mesh)
    optimizer = trainer._make_optimizer(total_steps=STEPS)
    state = trainer.init_state(
        total_steps=STEPS, init_params=flax_params, optimizer=optimizer
    )
    step_fn = make_train_step(trainer.model, optimizer, cfg, mesh)

    rng = jax.random.PRNGKey(0)  # dropout is 0.0; rng is inert
    losses = []
    for batch in batches:
        pytree = {
            "query": {k: jnp.asarray(v) for k, v in batch["query"].items()},
            "nway_passages": {
                k: jnp.asarray(v) for k, v in batch["nway_passages"].items()
            },
            "labels": jnp.asarray(batch["labels"]),
            "teacher_scores": jnp.asarray(batch["labels"]),
        }
        state, metrics = step_fn(state, pytree, rng)
        losses.append(float(metrics["loss"]))
    final = dual_encoder_flax_to_torch(jax.device_get(state.params))
    return losses, final


def _torch_batch(batch):
    queries = {
        "input_ids": torch.tensor(batch["query"]["input_ids"], dtype=torch.long),
        "attention_mask": torch.tensor(
            batch["query"]["attention_mask"], dtype=torch.long
        ),
    }
    passages = {
        "input_ids": torch.tensor(
            batch["nway_passages"]["input_ids"], dtype=torch.long
        ),
        "attention_mask": torch.tensor(
            batch["nway_passages"]["attention_mask"], dtype=torch.long
        ),
    }
    return queries, passages


def _reference_torch_grads(flax_params, batch):
    """Loss + named gradients for one batch under the reference math."""
    ref_loss = _load_ref_lambda_mrr()
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=CFG.vocab_size,
        max_position_embeddings=CFG.max_position_embeddings,
        dim=CFG.dim,
        n_layers=CFG.n_layers,
        n_heads=CFG.n_heads,
        hidden_dim=CFG.hidden_dim,
        dropout=0.0,
        attention_dropout=0.0,
    )
    model = TorchDualTower(hf_cfg)
    sd = dual_encoder_flax_to_torch(flax_params)
    model.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    model.train()
    queries, passages = _torch_batch(batch)
    loss = ref_loss(model(queries, passages), torch.tensor(batch["labels"]))
    loss.backward()
    grads = {
        n: p.grad.detach().numpy().copy()
        for n, p in model.named_parameters()
        if p.grad is not None
    }
    return float(loss), grads


def _our_grads(flax_params, batch):
    """Loss + gradients for the same batch through our flax model + loss,
    exported in reference state_dict layout for comparison."""
    from cldrd_tpu.losses import lambda_mrr_loss

    model = NwayDualEncoder(config=CFG, dtype=jnp.float32)

    def compute_loss(params):
        logits = model.apply(
            {"params": params},
            {k: jnp.asarray(v) for k, v in batch["query"].items()},
            {k: jnp.asarray(v) for k, v in batch["nway_passages"].items()},
            deterministic=True,
        )
        return lambda_mrr_loss(logits, jnp.asarray(batch["labels"]))

    params = jax.tree_util.tree_map(jnp.asarray, flax_params)
    loss, grads = jax.value_and_grad(compute_loss)(params)
    return float(loss), dual_encoder_flax_to_torch(jax.device_get(grads))


def test_training_step_parity_with_reference_math(tmp_path):
    rng = np.random.default_rng(0)
    batches = _make_batches(rng)

    # one shared random init, created on our side
    model = NwayDualEncoder(config=CFG, dtype=jnp.float32)
    dummy_q = {
        "input_ids": jnp.zeros((1, LQ), jnp.int32),
        "attention_mask": jnp.ones((1, LQ), jnp.int32),
    }
    dummy_p = {
        "input_ids": jnp.zeros((1, 1, LP), jnp.int32),
        "attention_mask": jnp.ones((1, 1, LP), jnp.int32),
    }
    flax_params = model.init(jax.random.PRNGKey(7), dummy_q, dummy_p)["params"]
    flax_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), flax_params
    )

    # --- tight check: gradient parity on one batch. Post-Adam parameter
    # equality is NOT chaos-free (the first real Adam update is
    # ~sign(grad)*lr elementwise, so fp32 noise on near-zero gradients
    # flips whole update elements); raw gradients compare cleanly.
    ref_loss0, ref_grads = _reference_torch_grads(flax_params, batches[0])
    our_loss0, our_grads = _our_grads(flax_params, batches[0])
    np.testing.assert_allclose(our_loss0, ref_loss0, rtol=1e-5)
    for k, g_ref in ref_grads.items():
        g_ours = np.asarray(our_grads[k], np.float32)
        num = np.linalg.norm(g_ours - g_ref)
        den = np.linalg.norm(g_ref)
        assert num <= 1e-4 * den + 1e-7, (k, num, den)

    # --- trajectory check: over 8 steps fp32 op-order noise is amplified
    # by the recurrence (torch and XLA schedule matmuls differently, and
    # Adam's sign-like first update amplifies near-zero-grad noise to
    # O(lr)), so tolerances widen — the trajectories must still coincide
    # step for step
    ref_losses, ref_final = _run_reference_torch(flax_params, batches)
    our_losses, our_final = _run_ours(flax_params, batches, tmp_path)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-4)
    # and training actually moved: the trajectory is not constant
    assert abs(ref_losses[0] - ref_losses[-1]) > 1e-4
    for k, ref_v in ref_final.items():
        if "position_ids" in k:
            continue
        np.testing.assert_allclose(
            np.asarray(our_final[k], np.float32), ref_v,
            atol=8 * LR,  # bounded by a few sign-flipped Adam updates
            err_msg=f"param {k} diverged after {STEPS} steps",
        )
