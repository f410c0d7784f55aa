"""Length-bucketed corpus encode throughput on one TPU chip.

Flat encoding pads every passage to max_length=256, but MS MARCO passages
average ~70 WordPiece tokens — ~3x the FLOPs (and host->device bytes) of
the tokens actually present. ``--bucket-lengths`` regroups rows by valid
length into a 32/64/128/256 ladder with token-balanced batch sizes
(``cldrd_tpu/data/bucketing.py``); embeddings are identical (padding is
masked out of attention — asserted here on a sample).

This bench measures flat vs bucketed encode passages/s at the production
shape: full-size DistilBERT (66M params, random weights — throughput is
weight-independent), CLS-pooled passage tower, bf16 compute, batch 512 at
L=256. The corpus is synthetic with a realistic length distribution
(clipped lognormal, mean ~= 70 tokens, cap 256), streamed through the real
``TokenCacheDataset`` -> ``encode_dataset`` path.

Timing: each variant runs one warmup pass (compiles every bucket
executable) then one timed pass over the same rows. Host->device transfer
rides the compacted uint16/uint8 token payload either way.

Prints one JSON line per variant plus the speedup.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 131_072
MAX_LEN = 256
BATCH = 512
MEAN_LOG, SIGMA_LOG = 4.2, 0.45  # exp-> ~median 67, clipped [8, 256]


def synth_cache(tmp_dir: str) -> None:
    rng = np.random.default_rng(0)
    lengths = np.clip(
        np.exp(rng.normal(MEAN_LOG, SIGMA_LOG, size=N_ROWS)), 8, MAX_LEN
    ).astype(np.int32)
    tokens = np.lib.format.open_memmap(
        os.path.join(tmp_dir, "cache_tokens.npy"),
        mode="w+", dtype=np.uint16, shape=(N_ROWS, MAX_LEN),
    )
    # vocab-range token ids; padding zeros beyond each row's length
    block = 8192
    for s in range(0, N_ROWS, block):
        e = min(s + block, N_ROWS)
        t = rng.integers(3, 30000, size=(e - s, MAX_LEN), dtype=np.uint16)
        t[np.arange(MAX_LEN)[None, :] >= lengths[s:e, None]] = 0
        tokens[s:e] = t
    tokens.flush()
    np.save(os.path.join(tmp_dir, "cache_lengths.npy"), lengths)
    np.save(os.path.join(tmp_dir, "cache_ids.npy"),
            np.arange(N_ROWS, dtype=np.int64))
    with open(os.path.join(tmp_dir, "token_cache_meta.json"), "w") as f:
        json.dump({"n": N_ROWS, "max_length": MAX_LEN, "format_version": 1}, f)


def run_pass(enc, ds, bucket_lengths):
    from cldrd_tpu.index.builder import _batch_stream
    from cldrd_tpu.data.prefetch import prefetch

    batches, _, _ = _batch_stream(ds, BATCH, bucket_lengths)
    out = None
    n = 0
    for b in prefetch(batches, depth=4):
        out = enc(b.tokens)
        n += b.n_valid
    np.asarray(out[0, 0])  # force
    return n


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from cldrd_tpu.data import TokenCacheDataset
    from cldrd_tpu.index import make_encode_fn
    from cldrd_tpu.models import DistilBertConfig, NwayDualEncoder

    tmp = tempfile.mkdtemp(prefix="bucketed_bench_")
    synth_cache(tmp)
    ds = TokenCacheDataset(tmp)

    cfg = DistilBertConfig()
    model = NwayDualEncoder(config=cfg, share_weights=True, dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        {"input_ids": jnp.zeros((1, 4), jnp.int32),
         "attention_mask": jnp.ones((1, 4), jnp.int32)},
        {"input_ids": jnp.zeros((1, 1, 4), jnp.int32),
         "attention_mask": jnp.ones((1, 1, 4), jnp.int32)},
    )["params"]
    enc = make_encode_fn(model, params, "passage_embs")

    results = {}
    for name, buckets in (("flat", None), ("bucketed", (32, 64, 128, 256))):
        run_pass(enc, ds, buckets)  # warmup: compiles every bucket shape
        t0 = time.perf_counter()
        n = run_pass(enc, ds, buckets)
        dt = time.perf_counter() - t0
        results[name] = n / dt
        print(json.dumps({
            "metric": f"encode_passages_per_s_{name}",
            "value": round(n / dt, 1),
            "unit": "passages/s/chip",
            "vs_baseline": round((n / dt) / (8_800_000 / (2.5 * 3600)), 2),
        }), flush=True)

    # identity spot-check: same ids -> same embeddings (bf16 tolerance)
    from cldrd_tpu.index import encode_dataset

    small = TokenCacheDataset(tmp)
    small.n = 4096
    small.tokens = small.tokens[:4096]
    small.lengths = small.lengths[:4096]
    small.ids = small.ids[:4096]
    e1, i1 = encode_dataset(enc, small, BATCH)
    e2, i2 = encode_dataset(enc, small, BATCH, bucket_lengths=(32, 64, 128, 256))
    ref = {int(i): e for i, e in zip(i1, e1)}
    worst = max(
        float(np.abs(ref[int(i)] - e).max()) for i, e in zip(i2, e2)
    )
    print(json.dumps({
        "metric": "bucketed_vs_flat_speedup",
        "value": round(results["bucketed"] / results["flat"], 2),
        "unit": "x",
        "max_abs_embedding_delta": worst,
    }), flush=True)


if __name__ == "__main__":
    main()
