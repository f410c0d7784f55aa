"""Length-bucketed cross-encoder rerank throughput on one TPU chip.

The CL-DRD data-creation pipeline teacher-scores ~30M (query, passage)
pairs (500k train queries x 60 candidates). Joined ``q ++ [SEP] ++ p``
rows average ~85 WordPiece tokens, but flat collation pads every pair to
``max_len=256``. ``--bucket-lengths`` on ``cldrd-create-training-data``
regroups pairs into the 32/64/128/256 ladder with token-balanced batch
sizes (``RerankingDataset.batches_bucketed``) — identical scores at
~token-proportional device cost.

This bench isolates the device cost: both variants pre-collate every
batch host-side (tokenization is shared work at identical cost), then
time the jitted cross-encoder score loop. Full-size DistilBERT (66M,
random weights — throughput is weight-independent), bf16, batch 256 at
L=256. Prints one JSON line per variant plus the speedup and a projected
30M-pair wall-clock.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 512
CANDS = 60          # pairs = 30,720
MAX_LEN = 256
BATCH = 256
MEAN_LOG, SIGMA_LOG = 4.2, 0.45  # passage ~ exp(N(4.2, .45)) tokens
PROD_PAIRS = 502_939 * 60


def synth_texts():
    """Query/passage texts whose HashTokenizer lengths follow MS MARCO:
    ~8-token queries, lognormal ~70-token passages (1 word = 1 token)."""
    rng = np.random.default_rng(0)
    qid_to_query = {
        q: " ".join(f"q{q}w{j}" for j in range(int(rng.integers(5, 12))))
        for q in range(N_QUERIES)
    }
    plens = np.clip(
        np.exp(rng.normal(MEAN_LOG, SIGMA_LOG, size=N_QUERIES * CANDS)),
        4, MAX_LEN - 20,
    ).astype(np.int32)
    pid_to_passage = {
        p: " ".join(f"p{p}w{j}" for j in range(int(plens[p])))
        for p in range(N_QUERIES * CANDS)
    }
    pairs = [(q, q * CANDS + c) for q in range(N_QUERIES) for c in range(CANDS)]
    return qid_to_query, pid_to_passage, pairs


def main():
    import jax
    import jax.numpy as jnp

    from cldrd_tpu.data.reranking_dataset import RerankingDataset
    from cldrd_tpu.data.tokenization import HashTokenizer
    from cldrd_tpu.evaluation import make_cross_encoder_score_fn
    from cldrd_tpu.models import CrossEncoder, DistilBertConfig

    cfg = DistilBertConfig()
    model = CrossEncoder(config=cfg, dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 8), jnp.int32),
         "attention_mask": jnp.ones((1, 8), jnp.int32)},
    )["params"]
    score_fn = make_cross_encoder_score_fn(model, params)

    qid_to_query, pid_to_passage, pairs = synth_texts()
    ds = RerankingDataset.from_pairs(
        pairs, qid_to_query, pid_to_passage, HashTokenizer(cfg.vocab_size),
        is_cross_encoder=True, max_len=MAX_LEN,
    )

    results = {}
    for name, batches in (
        ("flat", list(ds.batches(BATCH))),
        ("bucketed", list(ds.batches_bucketed(BATCH))),
        ("packed", list(ds.batches_packed(BATCH))),
    ):
        shapes = sorted({b.query_passage["input_ids"].shape for b in batches})
        for b in batches:  # warmup: compile every bucket executable
            _ = score_fn(b)
        n = 0
        t0 = time.perf_counter()
        s = None
        for b in batches:
            s = score_fn(b)  # np.asarray inside forces per batch
            n += b.n_valid
        dt = time.perf_counter() - t0
        results[name] = n / dt
        print(json.dumps({
            "metric": f"teacher_rerank_pairs_per_s_{name}",
            "value": round(n / dt, 1),
            "unit": "pairs/s/chip",
            "batch_shapes": [list(sh) for sh in shapes],
            "projected_30M_pair_rerank_min": round(PROD_PAIRS / (n / dt) / 60, 1),
        }), flush=True)

    # score identity spot-check (bf16: same-batch-shape caveat documented
    # on batches_bucketed; compare loosely here, exactly in the fp32 tests)
    flat_scores = {}
    for b in ds.batches(BATCH):
        s = score_fn(b)
        for i in range(b.n_valid):
            flat_scores[(int(b.qids[i]), int(b.pids[i]))] = float(s[i])
    for name, batches in (("bucketed", ds.batches_bucketed(BATCH)),
                          ("packed", ds.batches_packed(BATCH))):
        worst = 0.0
        for b in batches:
            s = score_fn(b)
            for i in range(b.n_valid):
                worst = max(worst, abs(
                    flat_scores[(int(b.qids[i]), int(b.pids[i]))] - float(s[i])))
        print(json.dumps({
            "metric": f"{name}_rerank_speedup",
            "value": round(results[name] / results["flat"], 2),
            "unit": "x",
            "max_abs_score_delta_bf16": worst,
        }), flush=True)


if __name__ == "__main__":
    main()
