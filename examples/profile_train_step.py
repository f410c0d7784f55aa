"""Profile the production train step on one TPU chip: where do the
non-MFU milliseconds go?

bench_train.py measures ~37% MFU at bz=8 (the reference's global batch,
``/root/reference/trainer/multistep-curriculum/nway_listwise_1.py:330-367``
is the equivalent loop). This script traces a few steps with
``jax.profiler`` and aggregates per-op device time from the trace protobuf
JSON, attributing each XLA fusion to its source op via the compiled HLO
metadata — the round-2-proven recipe (see .claude/skills/verify/SKILL.md).

Prints a JSON summary plus a top-op table to stderr.
"""
import glob
import gzip
import json
import sys
import time
from collections import defaultdict

TRACE_DIR = "/tmp/jaxtrace_train"
PROFILE_STEPS = 4


def main():
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import numpy as np
    from bench_train import bench_batch_size  # noqa: F401 (import side effects)
    import bench_train as bt

    # rebuild the bz=8 step exactly as bench_train does
    from cldrd_tpu.models import DistilBertConfig
    from cldrd_tpu.parallel import DATA_AXIS, make_mesh
    from cldrd_tpu.train import TrainConfig, Trainer, make_train_step
    import jax.numpy as jnp

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    packed = "--packed" in sys.argv
    bz = int(argv[0]) if argv else 8
    cfg = TrainConfig(
        label_mode="8", batch_size=bz, num_train_epochs=1,
        learning_rate=7e-6, warmup_steps=4000,
        max_query_len=bt.LQ, max_passage_len=bt.LP,
        compute_dtype="bfloat16", remat=False, pack_passages=packed,
        run_folder="/tmp/cldrd_bench_train", experiment_name=f"prof{bz}",
    )
    model_cfg = DistilBertConfig()
    mesh = make_mesh(1, DATA_AXIS)
    trainer = Trainer(cfg, model_cfg, mesh=mesh)
    optimizer = trainer._make_optimizer(10_000)
    state = trainer.init_state(10_000, optimizer=optimizer)
    step_fn = make_train_step(trainer.model, optimizer, cfg, mesh)

    labels_row = np.concatenate([
        1.0 / np.arange(1, 6), np.full(12, -0.25), np.full(13, -0.5)
    ]).astype(np.float32)
    key = jax.random.PRNGKey(0)
    batch = {
        "query": {
            "input_ids": jax.random.randint(
                key, (bz, bt.LQ), 0, model_cfg.vocab_size, jnp.int32),
            "attention_mask": jnp.ones((bz, bt.LQ), jnp.int32),
        },
        "labels": jnp.tile(labels_row, (bz, 1)),
        "teacher_scores": jnp.tile(labels_row, (bz, 1)),
    }
    if packed:
        # realistic MS MARCO length distribution, same as bench_train
        from cldrd_tpu.data.packing import pack_nway_batch
        rng_np = np.random.default_rng(0)
        lengths = np.clip(
            np.exp(rng_np.normal(4.2, 0.45, size=(bz, bt.NWAY))), 8, bt.LP
        ).astype(np.int32)
        p_ids = rng_np.integers(3, model_cfg.vocab_size, size=(bz, bt.NWAY, bt.LP))
        p_mask = (np.arange(bt.LP)[None, None, :] < lengths[:, :, None]).astype(np.int32)
        pb = pack_nway_batch((p_ids * p_mask).astype(np.int32), p_mask)
        batch["packed_passages"] = {
            k: jnp.asarray(v) for k, v in pb.as_dict().items()}
        print(f"packed rows/example: {pb.input_ids.shape[1]}", file=sys.stderr)
    else:
        batch["nway_passages"] = {
            "input_ids": jax.random.randint(
                key, (bz, bt.NWAY, bt.LP), 0, model_cfg.vocab_size, jnp.int32),
            "attention_mask": jnp.ones((bz, bt.NWAY, bt.LP), jnp.int32),
        }
    _ = np.asarray(batch["labels"][0, 0])

    rng = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch, rng)  # compile
    _ = float(metrics["loss"])

    # map fusion names -> source op_name via the compiled HLO metadata
    hlo = step_fn.lower(state, batch, rng).compile().as_text()
    import re
    op_src = {}
    for m in re.finditer(
        r"%?([\w.\-]+) = [^\n]*metadata=\{[^}]*op_name=\"([^\"]+)\"", hlo
    ):
        op_src[m.group(1)] = m.group(2)
    state, metrics = step_fn(state, batch, rng)  # one warm step
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    jax.profiler.start_trace(TRACE_DIR)
    m = None
    for _ in range(PROFILE_STEPS):
        state, m = step_fn(state, batch, rng)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    # ---- aggregate device events from the trace ----
    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True))
    if not paths:
        print(json.dumps({"error": "no trace written"}))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # identify device-track pids (process names containing TPU/device)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "Axon" in n}

    def category(fusion_name: str) -> str:
        """Attribute a device event to a model component via HLO op_name."""
        src = op_src.get(fusion_name.lstrip("%"), "")
        if not src:
            return f"(unmapped) {fusion_name[:40]}"
        s = src.lower()
        if "threefry" in s or "random_bits" in s or "dropout" in s:
            return "dropout RNG + masking"
        for tag, label in (
            ("adamw", "optimizer (AdamW update)"),
            ("scale_by_adam", "optimizer (AdamW update)"),
            ("global_norm", "grad global-norm/clip"),
            ("clip", "grad global-norm/clip"),
            ("lambda_mrr", "loss (lambda_mrr)"),
            ("sort", "loss sort / batch metrics"),
            ("top_k", "loss sort / batch metrics"),
            ("embedding", "embeddings"),
            ("attention", None),  # refined below
            ("ffn", None),
            ("lin", None),
        ):
            if tag in s and label:
                return label
        # encoder interior: split matmul-rooted vs elementwise fusions
        if "dot_general" in s or "einsum" in s or "conv" in s:
            if "transpose" in s.split("dot_general")[0][-40:]:
                return "encoder matmuls (bwd)"
            return "encoder matmuls"
        if "layer_norm" in s or "reduce" in s or "softmax" in s or "exp" in s:
            return "encoder norm/softmax/elementwise"
        return "other: " + src.rsplit("/", 1)[-1][:48]

    by_name = defaultdict(float)
    by_raw = defaultdict(float)
    total = 0.0
    import re as _re
    step_level = _re.compile(r"^(\d+|jit_step_fn.*)$")
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids and "dur" in e:
            name = e.get("name", "?")
            if name.startswith(("Infeed", "Outfeed")):
                continue
            if step_level.match(name):
                continue  # whole-program / per-step envelope events
            by_name[category(name)] += e["dur"]
            src = op_src.get(name.lstrip("%"), "")
            by_raw[f"{name[:40]}  <-  {src[-100:]}"] += e["dur"]
            total += e["dur"]

    per_step_us = total / PROFILE_STEPS
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])[:30]
    print(f"device tracks: {sorted(pid_name[p] for p in dev_pids)}",
          file=sys.stderr)
    print(f"wall/step {wall / PROFILE_STEPS * 1e3:.1f} ms, "
          f"device-busy/step {per_step_us / 1e3:.1f} ms", file=sys.stderr)
    for name, dur in rows:
        print(f"{dur / PROFILE_STEPS / 1e3:9.3f} ms  {100 * dur / total:5.1f}%"
              f"  {name[:110]}", file=sys.stderr)
    if "--raw" in sys.argv:
        print("--- raw ops (top 30) ---", file=sys.stderr)
        for name, dur in sorted(by_raw.items(), key=lambda kv: -kv[1])[:30]:
            print(f"{dur / PROFILE_STEPS / 1e3:9.3f} ms "
                  f"{100 * dur / total:5.1f}%  {name[:170]}", file=sys.stderr)

    print(json.dumps({
        "metric": f"train_step_profile_bz{bz}",
        "wall_ms_per_step": round(wall / PROFILE_STEPS * 1e3, 2),
        "device_busy_ms_per_step": round(per_step_us / 1e3, 2),
        "top_ops": [
            {"name": n[:80], "ms_per_step": round(d / PROFILE_STEPS / 1e3, 3),
             "pct": round(100 * d / total, 1)} for n, d in rows[:12]
        ],
    }))


if __name__ == "__main__":
    main()
