"""Host tokenization throughput vs the device encode rate.

VERDICT r1 #4: the index-build budget (<15 min for 8.8M passages on a
v4-8) was only demonstrated with the lightweight hash tokenizer; this
measures REAL WordPiece subword tokenization (HF ``tokenizers`` Rust,
batch-parallel ``encode_batch``) on full-length ~256-token passages and
compares it with the measured device encode rate to show the prefetch
thread can hide the host work.

The budget math: 8.8M passages / 8 chips / 15 min needs ~9.8k passages/s
of host tokenization feeding ~1.2k passages/s/chip of device encode. A
single host must therefore tokenize >= ~10k p/s; the Rust tokenizer
parallelizes a 512-text ``encode_batch`` across cores.

Run:  python examples/tokenizer_throughput.py [--n 50000] [--words 60]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_realistic_texts(n: int, words_per_text: int, seed: int = 0):
    """Zipf-distributed words over a large synthetic lexicon built from
    syllables, so WordPiece must split many words into several pieces —
    like real English against a 30522 vocab."""
    rng = np.random.default_rng(seed)
    syllables = np.array([
        c + v for c in "bcdfghjklmnpqrstvwz" for v in
        ("a", "e", "i", "o", "u", "ar", "en", "il", "on", "ut")
    ])
    n_lexicon = 200_000
    lengths = rng.integers(2, 6, n_lexicon)
    lexicon = np.array([
        "".join(rng.choice(syllables, L)) for L in lengths
    ])
    # Zipf ranks: common words dominate, the tail forces subword splits
    ranks = rng.zipf(1.3, size=(n, words_per_text)).clip(1, n_lexicon) - 1
    return [" ".join(lexicon[row]) for row in ranks]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--words", type=int, default=60,
                    help="words per passage (~60 words -> ~150-256 subwords)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--max-length", type=int, default=256)
    ap.add_argument("--vocab", type=int, default=30522)
    ap.add_argument("--train-texts", type=int, default=200_000)
    args = ap.parse_args()

    from cldrd_tpu.data.tokenization import train_wordpiece_tokenizer

    print(f"synthesizing {args.n} passages of {args.words} words ...",
          file=sys.stderr)
    texts = make_realistic_texts(max(args.n, args.train_texts), args.words)

    print("training WordPiece vocab (one-time, stands in for the "
          "downloadable distilbert-base-uncased vocab) ...", file=sys.stderr)
    t0 = time.perf_counter()
    tok = train_wordpiece_tokenizer(texts[: args.train_texts], args.vocab)
    train_s = time.perf_counter() - t0

    bench_texts = texts[: args.n]
    # realism check: average subword tokens per passage
    sample = tok(bench_texts[:256], args.max_length)
    avg_tokens = float(sample["attention_mask"].sum(axis=1).mean())

    # warmup (rayon pool spin-up)
    tok(bench_texts[: args.batch], args.max_length)

    t0 = time.perf_counter()
    done = 0
    for start in range(0, len(bench_texts), args.batch):
        chunk = bench_texts[start : start + args.batch]
        out = tok(chunk, args.max_length)
        done += out["input_ids"].shape[0]
    elapsed = time.perf_counter() - t0
    per_s = done / elapsed

    # the production answer for repeated builds (the curriculum re-encodes
    # the same collection after every iteration): pre-tokenized cache
    import tempfile

    from cldrd_tpu.data import (
        SequenceDataset, TokenCacheDataset, write_token_cache,
    )

    id_to_seq = {i: t for i, t in enumerate(bench_texts)}
    ds = SequenceDataset(id_to_seq, tok, args.max_length, is_query=False)
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        write_token_cache(ds, tmp, batch_size=args.batch)
        cache_build_s = time.perf_counter() - t0
        cds = TokenCacheDataset(tmp)
        t0 = time.perf_counter()
        n = 0
        for b in cds.batches(args.batch):
            n += b.n_valid
        cache_read_s = time.perf_counter() - t0
    cached_per_s = n / cache_read_s

    n_cores = os.cpu_count() or 1
    report = {
        "passages": done,
        "words_per_passage": args.words,
        "avg_subword_tokens": round(avg_tokens, 1),
        "max_length": args.max_length,
        "batch": args.batch,
        "host_cores": n_cores,
        "vocab_train_s": round(train_s, 1),
        "tokenize_passages_per_s": round(per_s, 1),
        "tokenize_passages_per_s_per_core": round(per_s / n_cores, 1),
        "token_cache_build_s": round(cache_build_s, 1),
        "token_cache_read_passages_per_s": round(cached_per_s, 1),
        "device_encode_per_chip_s": 3832,  # measured, see README
        "host_feeds_n_chips_live": round(per_s / 3832, 2),
        "host_feeds_n_chips_cached": round(cached_per_s / 3832, 2),
        "budget_8p8M_over_8_chips_min": round(8_800_000 / 8 / 1230 / 60, 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
