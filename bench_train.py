"""Training-step benchmark: the curriculum train step on one TPU chip.

Measures the reference's dominant-FLOPs path (``nway_listwise_1.py:330-367``):
one full optimization step of the 66M-param dual-encoder at the real
workload shape — nway=30 passages of 256 tokens + queries of 30 tokens,
bf16 compute / fp32 params+Adam, lambda_mrr loss, grad clip, in-graph batch
MRR/Recall — i.e. exactly what ``cldrd_tpu.train.make_train_step`` jits in
production.

Two batch sizes are reported:
- bz=8: the reference's *global* batch (4 GPUs x 2), for parity context.
- bz=32: a TPU-saturating batch (the step is per-chip; a v4-8 data-parallel
  mesh multiplies examples/s by the chip count at the same per-chip shape).

The reference publishes no train-rate figure, so ``vs_baseline`` is
examples/s at bz=8 relative to the whole reference 4-GPU setup processing
its global batch of 8 at the optimistic rate of one step per second
(~8 ex/s) — a conservative stand-in documented here for transparency.

Timing protocol mirrors bench.py: data staged on device, marginal cost =
(time(N steps) - time(1 step)) / (N-1) with a scalar fetch, removing the
fixed tunnel round-trip.

Prints ONE JSON line per batch size: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

NWAY, LQ, LP = 30, 30, 256
MEASURE_ITERS = 8
BASELINE_EX_PER_S = 8.0
PEAK_BF16_TFLOPS = 197.0  # TPU v5e chip


def train_step_flops(cfg, bz: int, remat: bool, remat_policy: str = "full") -> float:
    """Analytic FLOPs for one optimization step (fwd + bwd [+ remat fwd]).

    Per token, per layer: weight matmuls = 2 * (4*D^2 + 2*D*H) MACs·2;
    attention scores+AV = 2 * 2 * L * D. Backward ~= 2x forward; full
    block remat adds one extra forward; 'dots' remat re-runs only the
    attention-score/softmax part of the forward (weight-matmul outputs are
    saved). Embeddings/pool/loss are negligible (<1%)."""
    D, H, L_layers = cfg.dim, cfg.hidden_dim, cfg.n_layers

    def encoder_flops(n_seq, L):
        tokens = n_seq * L
        matmul = 2.0 * tokens * (4 * D * D + 2 * D * H) * L_layers
        attn = 2.0 * 2 * tokens * L * D * L_layers
        fwd = matmul + attn
        mult = 3.0  # fwd + bwd(2x)
        if remat:
            if remat_policy == "dots":
                mult += attn / fwd  # only attention recomputed
            else:
                mult += 1.0  # full extra forward
        return fwd * mult

    # per step: bz queries (L=30) + bz*NWAY passages (L=256)
    return encoder_flops(bz, LQ) + encoder_flops(bz * NWAY, LP)


def bench_batch_size(bz: int, remat: bool = False,
                     remat_policy: str = "full",
                     fused_qkv: bool = False,
                     softmax_bf16: bool = False,
                     attention_impl: str = "xla") -> dict:
    from cldrd_tpu.models import DistilBertConfig
    from cldrd_tpu.parallel import DATA_AXIS, make_mesh
    from cldrd_tpu.train import TrainConfig, Trainer, make_train_step

    cfg = TrainConfig(
        label_mode="8",
        batch_size=bz,
        num_train_epochs=1,
        learning_rate=7e-6,
        warmup_steps=4000,
        max_query_len=LQ,
        max_passage_len=LP,
        compute_dtype="bfloat16",
        remat=remat,
        pack_passages=False,  # this bench builds the flat [bz, nway, L] batch
        run_folder="/tmp/cldrd_bench_train",
        experiment_name=f"bz{bz}",
    )
    model_cfg = DistilBertConfig(remat_policy=remat_policy,
                                 fused_qkv=fused_qkv,
                                 softmax_in_compute_dtype=softmax_bf16,
                                 attention_impl=attention_impl,
                                 )  # real 66M arch
    mesh = make_mesh(1, DATA_AXIS)
    trainer = Trainer(cfg, model_cfg, mesh=mesh)
    total_steps = 10_000
    optimizer = trainer._make_optimizer(total_steps)
    state = trainer.init_state(total_steps, optimizer=optimizer)
    step_fn = make_train_step(trainer.model, optimizer, cfg, mesh)

    # mode-8 labels: 1/rank x5, -0.25 x12, -0.5 x13 (nway_dataset.py:62-64)
    labels_row = np.concatenate([
        1.0 / np.arange(1, 6), np.full(12, -0.25), np.full(13, -0.5)
    ]).astype(np.float32)

    key = jax.random.PRNGKey(0)
    batch = {
        "query": {
            "input_ids": jax.random.randint(
                key, (bz, LQ), 0, model_cfg.vocab_size, jnp.int32),
            "attention_mask": jnp.ones((bz, LQ), jnp.int32),
        },
        "nway_passages": {
            "input_ids": jax.random.randint(
                key, (bz, NWAY, LP), 0, model_cfg.vocab_size, jnp.int32),
            "attention_mask": jnp.ones((bz, NWAY, LP), jnp.int32),
        },
        "labels": jnp.tile(labels_row, (bz, 1)),
        "teacher_scores": jnp.tile(labels_row, (bz, 1)),
    }
    _ = np.asarray(batch["labels"][0, 0])  # force staging

    rng = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch, rng)  # compile + first step
    _ = float(metrics["loss"])

    def run(n, state):
        m = None
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step_fn(state, batch, rng)
        _ = float(m["loss"])
        return time.perf_counter() - t0, state

    t1, state = run(1, state)
    for _ in range(2):
        t, state = run(1, state)
        t1 = min(t1, t)
    tn, state = run(MEASURE_ITERS, state)
    per_step = (tn - t1) / (MEASURE_ITERS - 1)

    ex_per_s = bz / per_step
    flops = train_step_flops(model_cfg, bz, remat, remat_policy)
    mfu = flops / per_step / (PEAK_BF16_TFLOPS * 1e12)
    tag = "_remat" if remat else ""
    if remat and remat_policy != "full":
        tag += f"_{remat_policy}"
    if fused_qkv:
        tag += "_fusedqkv"
    if softmax_bf16:
        tag += "_softmaxbf16"
    if attention_impl != "xla":
        tag += f"_{attention_impl}attn"
    return {
        "metric": f"train_step_examples_per_s_bz{bz}{tag}_nway30_q30_p256",
        "value": round(ex_per_s, 2),
        "unit": "examples/s",
        "vs_baseline": round(ex_per_s / BASELINE_EX_PER_S, 3),
        "steps_per_s": round(1.0 / per_step, 3),
        "mfu_pct": round(100 * mfu, 1),
    }


def bench_packed(bz: int, softmax_bf16: bool = False,
                 attention_impl: str = "auto") -> dict:
    """The train step with sequence packing (data/packing.py) at realistic
    MS MARCO passage lengths (clipped lognormal, ~70-token mean — the same
    distribution as examples/bench_bucketed_encode.py). Flat padding makes
    the step length-independent (the bz=8 row above IS the flat cost at
    any length distribution); packing makes it ~token-proportional."""
    import numpy as np

    from cldrd_tpu.data.packing import pack_nway_batch
    from cldrd_tpu.models import DistilBertConfig
    from cldrd_tpu.parallel import DATA_AXIS, make_mesh
    from cldrd_tpu.train import TrainConfig, Trainer, make_train_step
    from cldrd_tpu.train.trainer import _batch_to_pytree

    cfg = TrainConfig(
        label_mode="8", batch_size=bz, num_train_epochs=1,
        learning_rate=7e-6, warmup_steps=4000,
        max_query_len=LQ, max_passage_len=LP,
        compute_dtype="bfloat16", pack_passages=True,
        run_folder="/tmp/cldrd_bench_train", experiment_name=f"pk{bz}",
    )
    model_cfg = DistilBertConfig(softmax_in_compute_dtype=softmax_bf16,
                                 attention_impl=attention_impl)
    mesh = make_mesh(1, DATA_AXIS)
    trainer = Trainer(cfg, model_cfg, mesh=mesh)
    optimizer = trainer._make_optimizer(10_000)
    state = trainer.init_state(10_000, optimizer=optimizer)
    step_fn = make_train_step(trainer.model, optimizer, cfg, mesh)

    rng = np.random.default_rng(0)
    lengths = np.clip(
        np.exp(rng.normal(4.2, 0.45, size=(bz, NWAY))), 8, LP
    ).astype(np.int32)
    p_ids = rng.integers(3, model_cfg.vocab_size, size=(bz, NWAY, LP))
    p_mask = (np.arange(LP)[None, None, :] < lengths[:, :, None]).astype(np.int32)
    p_ids = (p_ids * p_mask).astype(np.int32)
    packed = pack_nway_batch(p_ids, p_mask)
    rows = packed.input_ids.shape[1]

    labels_row = np.concatenate([
        1.0 / np.arange(1, 6), np.full(12, -0.25), np.full(13, -0.5)
    ]).astype(np.float32)
    batch = {
        "query": {
            "input_ids": jnp.asarray(
                rng.integers(3, model_cfg.vocab_size, size=(bz, LQ)), jnp.int32),
            "attention_mask": jnp.ones((bz, LQ), jnp.int32),
        },
        "packed_passages": {
            k: jnp.asarray(v) for k, v in packed.as_dict().items()
        },
        "labels": jnp.tile(labels_row, (bz, 1)),
        "teacher_scores": jnp.tile(labels_row, (bz, 1)),
    }
    _ = np.asarray(batch["labels"][0, 0])

    rng_j = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch, rng_j)
    _ = float(metrics["loss"])

    def run(n, state):
        m = None
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step_fn(state, batch, rng_j)
        _ = float(m["loss"])
        return time.perf_counter() - t0, state

    t1, state = run(1, state)
    for _ in range(2):
        t, state = run(1, state)
        t1 = min(t1, t)
    tn, state = run(MEASURE_ITERS, state)
    per_step = (tn - t1) / (MEASURE_ITERS - 1)

    # device FLOPs actually executed: rows packed sequences per example
    D, H, L_layers = model_cfg.dim, model_cfg.hidden_dim, model_cfg.n_layers
    def enc(n_seq, L):
        t = n_seq * L
        return 3.0 * (2.0 * t * (4 * D * D + 2 * D * H) * L_layers
                      + 2.0 * 2 * t * L * D * L_layers)
    flops = enc(bz, LQ) + enc(bz * rows, LP)
    tag = "_softmaxbf16" if softmax_bf16 else ""
    if attention_impl != "xla":
        tag += f"_{attention_impl}attn"
    out = {
        "metric": f"train_step_examples_per_s_bz{bz}_packed{tag}_msmarco_lengths",
        "value": round(bz / per_step, 2),
        "unit": "examples/s",
        "vs_baseline": round(bz / per_step / BASELINE_EX_PER_S, 3),
        "steps_per_s": round(1.0 / per_step, 3),
        "packed_rows_per_example": rows,
        "mfu_pct": round(100 * flops / per_step / (PEAK_BF16_TFLOPS * 1e12), 1),
    }
    if attention_impl == "auto":
        from cldrd_tpu.models import resolve_attention_impl

        out["attention_impl_resolved"] = resolve_attention_impl("auto", True)
    return out


def main():
    # Measured on v5e (16 GB HBM): bz=8 (240 seqs/step) fits without
    # rematerialization; bz=16 does NOT (the saved attention probs alone
    # are [480, 12, 256, 256] bf16 ~= 4.3 GB/layer-group) -> 'dots' remat
    # (save weight-matmul outputs, recompute attention internals) is the
    # sweet spot there; bz>=24 exceeds HBM even under 'dots' (the saved
    # q/k/v/ffn outputs are ~14 KB/token x 6 layers) -> full-block remat.
    for bz, remat, policy, attn in [
        (8, False, "full", "pallas"),   # best flat: fused train attention
        (8, False, "full", "xla"),
        (16, True, "dots", "xla"),
        (16, True, "full", "xla"),
        (24, True, "full", "xla"),
        (32, True, "full", "xla"),
    ]:
        try:
            print(json.dumps(bench_batch_size(bz, remat=remat,
                                              remat_policy=policy,
                                              attention_impl=attn)))
        except Exception as e:  # e.g. OOM on a configuration that no longer fits
            print(json.dumps({
                "metric": f"train_step_bz{bz}_remat{int(remat)}_{policy}_{attn}",
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }))
    # the "auto" row is the NO-FLAGS default configuration: on TPU it must
    # match the explicit packed+pallas row (the measured-best path is the
    # product default, VERDICT r4 item 1)
    # packed rows. (16, "pallas") / (32, "pallas") probe whether the fused
    # kernels' memory win (the [B,H,L,L] probs tensor never reaches HBM)
    # lets larger packed batches beat the bz=8 rate — the r4 finding that
    # "scaling packed batches does not help" was measured on the XLA path,
    # where bz=16 needs remat.
    for bz, attn in ((8, "auto"), (8, "pallas"), (8, "xla"), (16, "xla"),
                     (16, "pallas"), (32, "pallas")):
        try:
            print(json.dumps(bench_packed(bz, attention_impl=attn)))
        except Exception as e:
            print(json.dumps({
                "metric": f"train_step_bz{bz}_packed_{attn}",
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }))


if __name__ == "__main__":
    main()
