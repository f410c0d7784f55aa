"""Trainer tests: optimizer/schedule parity, batch metrics, config system,
checkpoint/resume, and a full (tiny) SPMD training run on the 8-device mesh.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cldrd_tpu.data.nway_dataset import NwayDataset
from cldrd_tpu.data.tokenization import HashTokenizer
from cldrd_tpu.models import DistilBertConfig
from cldrd_tpu.parallel import make_mesh
from cldrd_tpu.train import (
    TrainConfig,
    Trainer,
    batch_mrr_recall,
    curriculum_iterations,
    latest_checkpoint,
    linear_warmup_schedule,
    load_checkpoint,
    make_loss_fn,
    run_curriculum,
    save_checkpoint,
)
from cldrd_tpu.train.optim import _decay_mask


# ----------------------------------------------------------- schedule/optim


def test_linear_warmup_schedule_matches_hf():
    torch = pytest.importorskip("torch")
    from transformers import get_linear_schedule_with_warmup

    peak, warmup, total = 7e-6, 10, 100
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=peak)
    sched = get_linear_schedule_with_warmup(opt, warmup, total)
    ours = linear_warmup_schedule(peak, warmup, total)
    for step in range(total):
        hf_lr = sched.get_last_lr()[0]
        assert float(ours(step)) == pytest.approx(hf_lr, rel=1e-6), step
        opt.step()
        sched.step()


def test_decay_mask_matches_reference_substring_filter():
    """The reference's ['bias', 'LayerNorm.weight'] SUBSTRING filter
    (nway_listwise_1.py:259) exempts every bias and the embedding
    LayerNorm — but NOT the blocks' sa_layer_norm/output_layer_norm
    weights, which DO decay (verified differentially in
    tests/test_train_parity.py)."""
    params = {
        "layer": {"kernel": np.zeros(2), "bias": np.zeros(2)},
        "LayerNorm": {"scale": np.ones(2), "bias": np.zeros(2)},
        "sa_layer_norm": {"scale": np.ones(2), "bias": np.zeros(2)},
        "output_layer_norm": {"scale": np.ones(2), "bias": np.zeros(2)},
        "emb": {"embedding": np.zeros((2, 2))},
    }
    mask = _decay_mask(params)
    assert mask["layer"]["kernel"] is True
    assert mask["layer"]["bias"] is False
    assert mask["LayerNorm"]["scale"] is False   # embedding LN exempt
    assert mask["LayerNorm"]["bias"] is False
    assert mask["sa_layer_norm"]["scale"] is True       # block LNs decay
    assert mask["output_layer_norm"]["scale"] is True
    assert mask["sa_layer_norm"]["bias"] is False
    assert mask["emb"]["embedding"] is True  # embeddings DO decay (reference)


# ------------------------------------------------------------ batch metrics


def _reference_batch_metrics(logits, labels, cutoff=10):
    """numpy transliteration of nway_listwise_1.py:369-394."""
    sorted_idxs = np.argsort(-logits, axis=-1, kind="stable")
    labels = np.take_along_axis(labels, sorted_idxs, axis=-1)
    b_first_pos = np.where(labels == 1)[1]
    remain = b_first_pos[b_first_pos < cutoff]
    if len(remain) == 0:
        return 0.0, 0.0
    return (
        np.sum(1 / (remain + 1.0)) / len(b_first_pos),
        len(remain) / len(b_first_pos),
    )


def test_batch_mrr_recall_matches_reference():
    rng = np.random.default_rng(0)
    for _ in range(10):
        bz, nway = 4, 12
        logits = rng.normal(size=(bz, nway)).astype(np.float32)
        labels = np.full((bz, nway), -0.25, np.float32)
        # one label==1 per row at a random position
        for b in range(bz):
            labels[b, rng.integers(nway)] = 1.0
        ref_mrr, ref_rec = _reference_batch_metrics(logits, labels)
        mrr, rec = batch_mrr_recall(jnp.asarray(logits), jnp.asarray(labels))
        assert float(mrr) == pytest.approx(ref_mrr, abs=1e-6)
        assert float(rec) == pytest.approx(ref_rec, abs=1e-6)


def test_batch_mrr_recall_multiple_ones_per_row():
    # Label modes 2/4 produce several 1.0 labels per row; the reference's
    # flattened np.where(labels==1) counts every occurrence
    # (nway_listwise_1.py:377-385).
    rng = np.random.default_rng(1)
    for _ in range(10):
        bz, nway = 4, 12
        logits = rng.normal(size=(bz, nway)).astype(np.float32)
        labels = np.full((bz, nway), -0.25, np.float32)
        for b in range(bz):
            for pos in rng.choice(nway, size=rng.integers(1, 4), replace=False):
                labels[b, pos] = 1.0
        ref_mrr, ref_rec = _reference_batch_metrics(logits, labels)
        mrr, rec = batch_mrr_recall(jnp.asarray(logits), jnp.asarray(labels))
        assert float(mrr) == pytest.approx(ref_mrr, abs=1e-6)
        assert float(rec) == pytest.approx(ref_rec, abs=1e-6)


def test_batch_mrr_recall_no_relevant():
    logits = jnp.ones((2, 6))
    labels = jnp.zeros((2, 6))
    mrr, rec = batch_mrr_recall(logits, labels)
    assert float(mrr) == 0.0 and float(rec) == 0.0


# ------------------------------------------------------------------ config


def test_config_yaml_roundtrip(tmp_path):
    cfg = TrainConfig(label_mode="9", learning_rate=3e-6, model_checkpoint="/x/y.msgpack")
    path = str(tmp_path / "config.yaml")
    cfg.save_yaml(path)
    back = TrainConfig.from_yaml(path)
    assert back == cfg


def test_curriculum_defaults_match_paper():
    iters = curriculum_iterations()
    assert [c.label_mode for c in iters] == ["8", "9", "10"]
    assert [c.learning_rate for c in iters] == [7e-6, 3e-6, 3e-6]
    assert [c.num_train_epochs for c in iters] == [4, 2, 2]
    assert all(c.warmup_steps == 4000 and c.batch_size == 8 for c in iters)
    assert all(not c.share_weights for c in iters)


# ------------------------------------------------------------ loss dispatch


@pytest.mark.parametrize(
    "loss", ["lambda_mrr", "ranknet", "lambda_loss", "kl_div", "margin_mse",
             "weighted_pointwise", "kd"]
)
def test_loss_dispatch_finite_grads(loss):
    cfg = TrainConfig(loss=loss, temperature=2.0, lambda_weight=0.5)
    fn = make_loss_fn(cfg)
    logits = jnp.asarray([[2.0, 1.0, 0.5, -0.3], [0.1, 0.2, 0.3, 0.4]])
    labels = jnp.asarray([[1.0, 0.5, 0.25, 0.1], [1.0, 0.5, 0.3, 0.2]])
    teacher = jnp.asarray([[9.0, 4.0, 2.0, 0.5], [8.0, 3.0, 2.5, 1.0]])
    val, grad = jax.value_and_grad(lambda lg: fn(lg, labels, teacher))(logits)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_kd_losses_use_teacher_scores():
    """margin_mse / kl_div must depend on teacher_scores, not labels."""
    logits = jnp.asarray([[2.0, 1.0, 0.5, -0.3]])
    labels = jnp.asarray([[1.0, 0.5, 0.25, 0.1]])
    t1 = jnp.asarray([[9.0, 4.0, 2.0, 0.5]])
    t2 = jnp.asarray([[1.0, 7.0, 3.0, 2.5]])
    for loss in ("margin_mse", "kl_div"):
        fn = make_loss_fn(TrainConfig(loss=loss))
        assert float(fn(logits, labels, t1)) != pytest.approx(
            float(fn(logits, labels, t2))
        )


# ----------------------------------------------------- end-to-end training


def _tiny_dataset(n_examples=16, label_mode="1"):
    tok = HashTokenizer(vocab_size=512)
    qid_to_query = {q: f"query about topic {q}" for q in range(n_examples)}
    pid_to_passage = {}
    examples = []
    pid = 0
    for q in range(n_examples):
        rel = pid
        pid_to_passage[pid] = f"passage exactly answering topic {q}"
        pid += 1
        negs = []
        for j in range(5):
            pid_to_passage[pid] = f"unrelated filler text {pid} banana {j}"
            negs.append(pid)
            pid += 1
        examples.append({"qid": q, "relT_pids": [rel], "neg_pids": negs})
    return NwayDataset(
        qid_to_query, pid_to_passage, examples, tok,
        max_query_len=12, max_passage_len=16, label_mode=label_mode,
    )


def _tiny_cfg(tmp_path, **overrides):
    base = dict(
        label_mode="1",
        batch_size=8,
        num_train_epochs=2,
        learning_rate=1e-3,
        warmup_steps=1,
        logging_steps=1,
        evaluate_steps=2,
        max_query_len=12,
        max_passage_len=16,
        compute_dtype="float32",
        run_folder=str(tmp_path),
        seed=0,
    )
    base.update(overrides)
    return TrainConfig(**base)


def test_train_loop_8device_loss_decreases(tmp_path):
    assert jax.device_count() == 8
    cfg = _tiny_cfg(tmp_path, experiment_name="t8", num_train_epochs=10)
    model_cfg = DistilBertConfig.tiny()
    trainer = Trainer(cfg, model_cfg, mesh=make_mesh(8))
    dataset = _tiny_dataset()
    history = []
    state = trainer.train(dataset, step_hook=lambda s, m: history.append(m["loss"]))
    assert int(state.step) == 2 * 10  # 16/8 steps/epoch * 10 epochs
    assert np.mean(history[-4:]) < np.mean(history[:4])
    # artifacts: config.yaml + TSV log + checkpoints
    run_dir = os.path.join(str(tmp_path), "t8")
    assert os.path.exists(os.path.join(run_dir, "config.yaml"))
    log = open(os.path.join(run_dir, "train_logs.log")).read().splitlines()
    assert log[0].startswith("epoch\tstep\tloss\tmrr@10")
    assert len(log) == 1 + 20  # header + one row per step (logging_steps=1)
    assert latest_checkpoint(run_dir) is not None


def test_train_loop_8device_pallas_attention(tmp_path):
    """The fused train-attention kernels (attention_impl='pallas',
    in-kernel counter-hash dropout — interpret mode on CPU) through the
    REAL SPMD train loop on the 8-device mesh: the step must execute,
    losses stay finite, and the model must still learn the separable toy
    task. Integration coverage for custom_vjp pallas kernels under
    jit-with-shardings + donated state."""
    assert jax.device_count() == 8
    cfg = _tiny_cfg(tmp_path, experiment_name="t8p", num_train_epochs=6)
    model_cfg = DistilBertConfig.tiny(attention_impl="pallas",
                                      dropout=0.1, attention_dropout=0.1)
    trainer = Trainer(cfg, model_cfg, mesh=make_mesh(8))
    dataset = _tiny_dataset()
    history = []
    state = trainer.train(dataset,
                          step_hook=lambda s, m: history.append(m["loss"]))
    assert int(state.step) == 2 * 6
    assert np.isfinite(history).all()
    assert np.mean(history[-4:]) < np.mean(history[:4])


def test_in_batch_loss_disables_reg(tmp_path):
    """The reference applies the L2 logit regularizer only on the
    non-in_batch_loss branch (nway_listwise_1.py:339-350): with both flags
    set, reg must stay zero."""
    cfg = _tiny_cfg(
        tmp_path, experiment_name="ibl", in_batch_loss=True,
        all_in_batch_neg=True, reg_lambda=0.01, num_train_epochs=1,
    )
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
    metrics = []
    trainer.train(_tiny_dataset(), step_hook=lambda s, m: metrics.append(m))
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert all(m["reg_loss"] == 0 for m in metrics)


def test_reg_lambda_applies_without_in_batch_loss(tmp_path):
    cfg = _tiny_cfg(
        tmp_path, experiment_name="reg", reg_lambda=0.01, num_train_epochs=1,
    )
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
    metrics = []
    trainer.train(_tiny_dataset(), step_hook=lambda s, m: metrics.append(m))
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert all(m["reg_loss"] > 0 for m in metrics)
    log = open(os.path.join(str(tmp_path), "reg", "train_logs.log")).read()
    assert "reg_loss" in log and "total_aux_ratio" in log


def test_checkpoint_resume_restores_state(tmp_path):
    cfg = _tiny_cfg(tmp_path, experiment_name="ck", num_train_epochs=1)
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
    state = trainer.train(_tiny_dataset())
    ckpt = latest_checkpoint(trainer.run_dir)
    template = trainer.init_state(total_steps=4)
    restored = load_checkpoint(ckpt, template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_warm_start_from_msgpack(tmp_path):
    cfg1 = _tiny_cfg(tmp_path, experiment_name="w1", num_train_epochs=1)
    t1 = Trainer(cfg1, DistilBertConfig.tiny(), mesh=make_mesh(8))
    s1 = t1.train(_tiny_dataset())
    ckpt = latest_checkpoint(t1.run_dir)

    cfg2 = _tiny_cfg(tmp_path, experiment_name="w2", num_train_epochs=1,
                     model_checkpoint=ckpt)
    t2 = Trainer(cfg2, DistilBertConfig.tiny(), mesh=make_mesh(8))
    seen = {}

    def hook(step, m):
        seen.setdefault("first_loss", m["loss"])

    s2 = t2.train(_tiny_dataset(), step_hook=hook)
    assert int(s2.step) == 2
    assert np.isfinite(seen["first_loss"])


def test_run_curriculum_hands_off_weights(tmp_path):
    model_cfg = DistilBertConfig.tiny()
    iters = [
        _tiny_cfg(tmp_path, experiment_name="c1", num_train_epochs=1),
        _tiny_cfg(tmp_path, experiment_name="c2", num_train_epochs=1,
                  learning_rate=5e-4),
    ]
    dataset = _tiny_dataset()
    calls = []
    state = run_curriculum(
        iters, model_cfg, dataset_factory=lambda cfg: dataset,
        mesh=make_mesh(8),
        after_iteration=lambda i, s, t: calls.append((i, int(s.step))),
    )
    assert calls == [(0, 2), (1, 2)]
    assert os.path.exists(os.path.join(str(tmp_path), "c2", "train_logs.log"))


def test_resume_skips_consumed_batches(tmp_path):
    """Mid-epoch resume must continue from the exact batch (no replay, no
    schedule overshoot): total optimizer steps across interrupt + resume
    equals a single uninterrupted run."""
    dataset = _tiny_dataset()  # 16 examples -> 2 steps/epoch at bz 8
    mesh = make_mesh(8)

    # run 1: train 2 epochs saving every step; grab the MID-EPOCH ckpt (step 3)
    cfg1 = _tiny_cfg(tmp_path, experiment_name="r1", num_train_epochs=2,
                     evaluate_steps=1)
    t1 = Trainer(cfg1, DistilBertConfig.tiny(), mesh=mesh)
    s_full = t1.train(dataset)
    assert int(s_full.step) == 4
    ckpt3 = os.path.join(t1.run_dir, "checkpoint_3.msgpack")
    assert os.path.exists(ckpt3)

    # run 2: resume from step 3 -> exactly ONE more step
    cfg2 = _tiny_cfg(tmp_path, experiment_name="r2", num_train_epochs=2,
                     evaluate_steps=100, resume=ckpt3)
    t2 = Trainer(cfg2, DistilBertConfig.tiny(), mesh=mesh)
    steps_seen = []
    s_res = t2.train(dataset, step_hook=lambda s, m: steps_seen.append(s))
    assert steps_seen == [4], steps_seen
    assert int(s_res.step) == 4
    # resumed final params == uninterrupted final params (same data order,
    # same per-step dropout rng folded from global_step)
    for a, b in zip(jax.tree_util.tree_leaves(s_res.params),
                    jax.tree_util.tree_leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_remat_training_matches_no_remat(tmp_path):
    """remat=True recomputes the forward in backward — same math, possibly
    different op scheduling. Losses must coincide tightly; parameters stay
    within Adam sign-noise bounds (near-zero-gradient elements amplify
    last-ulp gradient differences to O(lr))."""
    results = {}
    for remat in (False, True):
        cfg = _tiny_cfg(
            tmp_path, experiment_name=f"remat_{remat}", num_train_epochs=1,
            remat=remat,
        )
        trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
        assert trainer.model_config.remat is remat
        metrics = []
        state = trainer.train(_tiny_dataset(), step_hook=lambda s, m: metrics.append(m))
        results[remat] = ([m["loss"] for m in metrics], state.params)
    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-5)
    lr = _tiny_cfg(tmp_path).learning_rate
    for a, b in zip(jax.tree_util.tree_leaves(results[False][1]),
                    jax.tree_util.tree_leaves(results[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=4 * lr)


def test_packed_training_matches_flat(tmp_path):
    """One SPMD train step with pack_passages=True produces the same loss,
    metrics, and updated params as the flat layout (dropout off, fp32) —
    packing changes FLOPs, not math."""
    from cldrd_tpu.train.trainer import _batch_to_pytree, make_train_step

    model_cfg = DistilBertConfig.tiny(dropout=0.0, attention_dropout=0.0)
    mesh = make_mesh(8)
    outs = {}
    for packed in (False, True):
        cfg = _tiny_cfg(tmp_path, experiment_name=f"pk{int(packed)}",
                        pack_passages=packed)
        trainer = Trainer(cfg, model_cfg, mesh=mesh)
        ds = _tiny_dataset()
        ds.pack_passages = packed
        optimizer = trainer._make_optimizer(10)
        state = trainer.init_state(10, optimizer=optimizer, seed=0)
        step = make_train_step(trainer.model, optimizer, cfg, mesh)
        batch = next(ds.batches(8, shuffle=False))
        assert (batch.packed_passages is not None) == packed
        new_state, metrics = step(state, _batch_to_pytree(batch),
                                  jax.random.PRNGKey(0))
        outs[packed] = (new_state, {k: float(v) for k, v in metrics.items()})

    m_flat, m_pack = outs[False][1], outs[True][1]
    assert m_pack["loss"] == pytest.approx(m_flat["loss"], rel=1e-5)
    assert m_pack["mrr"] == pytest.approx(m_flat["mrr"], abs=1e-6)
    flat_leaves = jax.tree_util.tree_leaves(outs[False][0].params)
    pack_leaves = jax.tree_util.tree_leaves(outs[True][0].params)
    for a, b in zip(flat_leaves, pack_leaves):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


def test_train_loop_packed_loss_decreases(tmp_path):
    """Full tiny training run with packing on the 8-device mesh."""
    cfg = _tiny_cfg(tmp_path, experiment_name="t8pk", num_train_epochs=10,
                    pack_passages=True)
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
    dataset = _tiny_dataset()
    dataset.pack_passages = True
    history = []
    trainer.train(dataset, step_hook=lambda s, m: history.append(m["loss"]))
    assert np.mean(history[-4:]) < np.mean(history[:4])


def test_grad_accum_optimizer_exact_equivalence(tmp_path):
    """Two accumulated micro-updates == ONE inner update with the mean
    gradient, exactly — including the schedule advancing per OPTIMIZER
    step, not per micro-batch (HF parity: the reference steps its
    scheduler once per optimizer.step())."""
    cfg1 = _tiny_cfg(tmp_path, experiment_name="o1")
    cfg2 = _tiny_cfg(tmp_path, experiment_name="o2", grad_accum_steps=2)
    mcfg = DistilBertConfig.tiny()
    t1 = Trainer(cfg1, mcfg, mesh=make_mesh(4))
    t2 = Trainer(cfg2, mcfg, mesh=make_mesh(4))
    # total micro-steps 8 for the accum config -> 4 optimizer steps, the
    # same schedule horizon as 4 plain steps
    opt1 = t1._make_optimizer(4)
    opt2 = t2._make_optimizer(8)

    params = {"w": jnp.ones((3,), jnp.float32),
              "layer_norm_bias": jnp.ones((3,), jnp.float32)}
    g1 = {"w": jnp.asarray([0.1, -0.2, 0.3]),
          "layer_norm_bias": jnp.asarray([0.5, 0.0, -0.1])}
    g2 = {"w": jnp.asarray([-0.3, 0.4, 0.1]),
          "layer_norm_bias": jnp.asarray([0.1, 0.2, 0.3])}
    g_mean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    s1 = opt1.init(params)
    u, s1 = opt1.update(g_mean, s1, params)
    ref = optax.apply_updates(params, u)

    s2 = opt2.init(params)
    p2 = params
    for g in (g1, g2):
        u, s2 = opt2.update(g, s2, p2)
        p2 = optax.apply_updates(p2, u)
    for k in params:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(ref[k]),
                                   rtol=1e-7, atol=1e-7)


def test_grad_accumulation_tracks_large_batch(tmp_path):
    """End-to-end: grad_accum_steps=2 at batch_size=4 follows the
    batch_size=8 run (same examples per optimizer step, same schedule).
    AdamW's normalizer amplifies last-ulp gradient-summation differences
    where a gradient is ~0, so params match to a loose tolerance rather
    than exactly; step accounting is exact."""
    ds = _tiny_dataset()
    cfg_a = _tiny_cfg(tmp_path, experiment_name="big", batch_size=8,
                      num_train_epochs=2)
    cfg_b = _tiny_cfg(tmp_path, experiment_name="acc", batch_size=4,
                      grad_accum_steps=2, num_train_epochs=2)
    mesh = make_mesh(4)
    # dropout draws a fresh mask per micro-step, which no accumulation
    # scheme can reconcile with the large-batch run — compare without it
    mcfg = DistilBertConfig.tiny(dropout=0.0, attention_dropout=0.0)
    sa = Trainer(cfg_a, mcfg, mesh=mesh).train(ds)
    sb = Trainer(cfg_b, mcfg, mesh=mesh).train(ds)
    assert int(sa.step) * 2 == int(sb.step)  # micro-steps double
    fa = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(sa.params)])
    fb = np.concatenate([np.asarray(x).ravel()
                         for x in jax.tree_util.tree_leaves(sb.params)])
    # trajectories agree to ~lr-scale noise on a tiny fraction of params
    assert np.abs(fa - fb).mean() < 5e-5
    assert (np.abs(fa - fb) > 1e-3).mean() < 0.01


def test_resume_with_grad_accumulation(tmp_path):
    """MultiSteps accumulation state rides opt_state through the msgpack
    checkpoint: resuming mid-run with grad_accum_steps=2 reproduces the
    uninterrupted run exactly (same mid-cycle accumulator)."""
    dataset = _tiny_dataset()
    mesh = make_mesh(4)
    mcfg = DistilBertConfig.tiny()

    cfg1 = _tiny_cfg(tmp_path, experiment_name="ga1", batch_size=4,
                     grad_accum_steps=2, num_train_epochs=2,
                     evaluate_steps=1)
    t1 = Trainer(cfg1, mcfg, mesh=mesh)
    s_full = t1.train(dataset)
    assert int(s_full.step) == 8  # 16/4 micro-steps x 2 epochs
    # resume from an ODD micro-step: the accumulator is mid-cycle
    ckpt5 = os.path.join(t1.run_dir, "checkpoint_5.msgpack")
    assert os.path.exists(ckpt5)

    cfg2 = _tiny_cfg(tmp_path, experiment_name="ga2", batch_size=4,
                     grad_accum_steps=2, num_train_epochs=2,
                     evaluate_steps=100, resume=ckpt5)
    t2 = Trainer(cfg2, mcfg, mesh=mesh)
    s_res = t2.train(dataset)
    assert int(s_res.step) == 8
    for a, b in zip(jax.tree_util.tree_leaves(s_res.params),
                    jax.tree_util.tree_leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_tensorboard_optional_logging(tmp_path):
    """cfg.tensorboard=True writes event files under <run_dir>/tb at every
    logging boundary; the TSV/JSONL contract is unchanged."""
    pytest.importorskip("torch.utils.tensorboard")
    cfg = _tiny_cfg(tmp_path, experiment_name="tb", num_train_epochs=1,
                    tensorboard=True)
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(8))
    trainer.train(_tiny_dataset())
    tb_dir = os.path.join(trainer.run_dir, "tb")
    events = [p for p in os.listdir(tb_dir) if "tfevents" in p]
    assert events, os.listdir(tb_dir)
    # TSV log still written alongside
    assert os.path.exists(os.path.join(trainer.run_dir, "train_logs.log"))


def test_packed_accum_tensorboard_compose(tmp_path):
    """Feature composition smoke: sequence packing + gradient accumulation
    + TensorBoard in one run — finite losses, correct step accounting."""
    pytest.importorskip("torch.utils.tensorboard")
    cfg = _tiny_cfg(tmp_path, experiment_name="combo", batch_size=4,
                    grad_accum_steps=2, num_train_epochs=1,
                    pack_passages=True, tensorboard=True)
    trainer = Trainer(cfg, DistilBertConfig.tiny(), mesh=make_mesh(4))
    metrics = []
    state = trainer.train(_tiny_dataset(),
                          step_hook=lambda s, m: metrics.append(m))
    assert int(state.step) == 4  # 16/4 micro-steps
    assert all(np.isfinite(m["loss"]) for m in metrics)
    assert os.path.isdir(os.path.join(trainer.run_dir, "tb"))


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-run (SURVEY §5.3: TPU eviction grace window) makes the
    trainer flush pending metrics, write ONE atomic checkpoint at the
    current step, restore the previous handler, and return — and resuming
    from that checkpoint reproduces the uninterrupted run exactly (seeded
    per-epoch shuffle + step-indexed dropout rng)."""
    import signal

    dataset = _tiny_dataset()  # 16 examples -> 2 steps/epoch at bz 8
    mesh = make_mesh(8)
    prev = signal.getsignal(signal.SIGTERM)

    # preempted run: SIGTERM delivered from the step-3 metrics hook
    cfg1 = _tiny_cfg(tmp_path, experiment_name="pre1", num_train_epochs=3,
                     evaluate_steps=1000)
    t1 = Trainer(cfg1, DistilBertConfig.tiny(), mesh=mesh)

    def hook(step, m):
        if step == 3:
            os.kill(os.getpid(), signal.SIGTERM)

    s1 = t1.train(dataset, step_hook=hook)
    assert signal.getsignal(signal.SIGTERM) is prev  # handler restored
    stopped = int(s1.step)
    assert stopped == 3, stopped  # stopped at the signal's step boundary
    ckpt = latest_checkpoint(t1.run_dir)
    assert ckpt is not None and ckpt.endswith(f"checkpoint_{stopped}.msgpack")

    # resume completes the remaining 3 steps
    cfg2 = _tiny_cfg(tmp_path, experiment_name="pre2", num_train_epochs=3,
                     evaluate_steps=1000, resume=ckpt)
    t2 = Trainer(cfg2, DistilBertConfig.tiny(), mesh=mesh)
    s2 = t2.train(dataset)
    assert int(s2.step) == 6

    # uninterrupted oracle run
    cfg3 = _tiny_cfg(tmp_path, experiment_name="pre3", num_train_epochs=3,
                     evaluate_steps=1000)
    s3 = Trainer(cfg3, DistilBertConfig.tiny(), mesh=mesh).train(dataset)
    assert int(s3.step) == 6
    for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
